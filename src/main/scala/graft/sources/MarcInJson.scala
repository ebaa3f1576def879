package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** MARC-in-JSON codec with the reference's legacy-format support
  * (reference: src/RecordManager/Base/Marc/Serialization/MarcInJson.php).
  *
  * Wire shapes handled:
  *   - Proper MARC-in-JSON: `{"leader": "...", "fields": [{"001": "v"},
  *     {"245": {"ind1": "1", "ind2": "4", "subfields": [{"a": "v"}, ...]}}]}`
  *   - Legacy v1 (MarcInJson.php:74): `{tag: ["<i1><i2><US>a<val>..."]}`
  *     — ISO 2709-style field strings with 0x1F subfield delimiters, tag
  *     000 carrying the leader.
  *   - Legacy v2 (MarcInJson.php:101): `{"v": 2, "f": {tag: [{"i1": " ",
  *     "i2": " ", "s": [{"c": "a", "v": "..."}]}]}}` — leader is the one
  *     non-array entry.
  *   - Legacy v3 (MarcInJson.php:127): like v2 but subfields are
  *     single-pair objects `{"a": "..."}` and 000 is explicit.
  *
  * Jackson (a Spark classpath dependency) does the JSON work; the codec is
  * a pure per-record transformation used inside typed `map`/
  * `mapPartitions`, feeding the same columnar record model as the ISO 2709
  * and MARCXML codecs.
  */
object MarcInJson {

  /** One MARC field occurrence: control fields (tag < "010") carry
    * `value`; data fields carry indicators + subfields.
    */
  final case class Field(
      tag: String,
      ind1: String,
      ind2: String,
      value: String,
      subfields: Seq[(String, String)]
  )

  /** 0x1F — the legacy v1 subfield delimiter, shared with ISO 2709. */
  private val Delim = Iso2709.SubfieldDelim

  private lazy val mapper = new ObjectMapper()

  /** Serialize to proper MARC-in-JSON. */
  def build(leader: String, fields: Seq[Field]): String = {
    val root = mapper.createObjectNode()
    root.put("leader", leader)
    val arr = root.putArray("fields")
    fields.foreach { f =>
      val fo = mapper.createObjectNode()
      // Control-field shape also round-trips a value-carrying field with
      // a data tag (parseProper accepts textual fields at any tag) — the
      // subfield branch would silently drop its value.
      if (f.tag < "010" || (f.subfields.isEmpty && f.value.nonEmpty)) fo.put(f.tag, f.value)
      else {
        val body = mapper.createObjectNode()
        body.put("ind1", f.ind1)
        body.put("ind2", f.ind2)
        val sfs = body.putArray("subfields")
        f.subfields.foreach { case (c, v) =>
          val so = mapper.createObjectNode()
          so.put(c, v)
          sfs.add(so)
        }
        fo.set(f.tag, body)
      }
      arr.add(fo)
    }
    mapper.writeValueAsString(root)
  }

  /** Serialize to the legacy v1 shape (for migration-compatibility tests). */
  def buildLegacyV1(leader: String, fields: Seq[Field]): String = {
    val root = mapper.createObjectNode()
    // Tag "000" is reserved for the leader in the v1 shape — a (malformed)
    // field carrying that tag must not clobber it.
    val byTag = fields.filter(_.tag != "000").groupBy(_.tag).toSeq.sortBy(_._1)
    root.putArray("000").add(leader)
    byTag.foreach { case (tag, fs) =>
      val arr = root.putArray(tag)
      fs.foreach { f =>
        if (f.tag < "010" || (f.subfields.isEmpty && f.value.nonEmpty)) arr.add(f.value)
        else
          arr.add(
            f.ind1 + f.ind2 +
              f.subfields.map { case (c, v) => s"$Delim$c$v" }.mkString
          )
      }
    }
    mapper.writeValueAsString(root)
  }

  /** Parse MARC-in-JSON or any legacy version into (leader, fields).
    * Malformed input yields ("", Nil) — callers quarantine at scale.
    */
  def parse(json: String): (String, Seq[Field]) =
    try {
      val n = mapper.readTree(json)
      // Either key marks the proper shape: a record missing just its
      // leader (or just fields) must not fall through to the v1 parser,
      // which would mangle "fields" into a MARC tag.
      if (n.has("leader") || n.has("fields")) parseProper(n)
      else if (!n.has("v")) parseLegacyV1(n)
      else if (n.get("v").asInt == 2) parseLegacyV23(n, v3 = false)
      else if (n.get("v").asInt == 3) parseLegacyV23(n, v3 = true)
      else ("", Seq.empty)
    } catch {
      // Jackson parse errors are IOExceptions, not RuntimeExceptions.
      case scala.util.control.NonFatal(_) => ("", Seq.empty)
    }

  /** Flatten to the columnar (tag, code, value) model shared by all
    * codecs; control fields surface with code "".
    */
  def toSubfields(fields: Seq[Field]): Seq[Iso2709.Subfield] =
    fields.flatMap { f =>
      if (f.tag < "010") Seq(Iso2709.Subfield(f.tag, "", f.value))
      else f.subfields.map { case (c, v) => Iso2709.Subfield(f.tag, c, v) }
    }

  private def parseProper(n: JsonNode): (String, Seq[Field]) = {
    // asText(default) maps JSON null to the default ('' / ' '), matching
    // PHP json_decode + string coercion; bare asText would yield the
    // 4-char string "null".
    val leader = Option(n.get("leader")).map(_.asText("")).getOrElse("")
    val fields = scala.collection.mutable.ArrayBuffer[Field]()
    Option(n.get("fields")).foreach(_.forEach { fo =>
      val it = fo.fields()
      while (it.hasNext) {
        val e = it.next()
        val tag = e.getKey
        val v = e.getValue
        if (v.isTextual) fields += Field(tag, "", "", v.asText, Nil)
        else {
          val sfs = scala.collection.mutable.ArrayBuffer[(String, String)]()
          Option(v.get("subfields")).foreach(_.forEach { so =>
            val sit = so.fields()
            while (sit.hasNext) {
              val se = sit.next()
              sfs += (se.getKey -> se.getValue.asText(""))
            }
          })
          fields += Field(
            tag,
            Option(v.get("ind1")).map(_.asText(" ")).getOrElse(" "),
            Option(v.get("ind2")).map(_.asText(" ")).getOrElse(" "),
            "",
            sfs.toSeq
          )
        }
      }
    })
    (leader, fields.toSeq)
  }

  private def parseLegacyV1(n: JsonNode): (String, Seq[Field]) = {
    var leader = ""
    val fields = scala.collection.mutable.ArrayBuffer[Field]()
    val it = n.fields()
    while (it.hasNext) {
      val e = it.next()
      val tag = e.getKey
      e.getValue.forEach { dn =>
        val data = dn.asText("")
        if (data.contains(Delim)) {
          // "<i1><i2><US>a..." — indicators then delimited subfields
          // (MarcInJson.php:78: substr($data, 3) skips both indicators and
          // the first delimiter).
          // drop/take degrade gracefully on short data, like PHP substr —
          // a truncated field must not quarantine the whole record.
          val padded = data + "  "
          val sfs = data
            .drop(3)
            .split(Delim)
            .toSeq
            .filter(_.nonEmpty)
            .map(sf => sf.substring(0, 1) -> sf.substring(1))
          fields += Field(tag, padded.substring(0, 1), padded.substring(1, 2), "", sfs)
        } else if (tag == "000") leader = data
        else fields += Field(tag, "", "", data, Nil)
      }
    }
    (leader, fields.toSeq)
  }

  private def parseLegacyV23(n: JsonNode, v3: Boolean): (String, Seq[Field]) = {
    var leader = ""
    val fields = scala.collection.mutable.ArrayBuffer[Field]()
    val it = n.get("f").fields()
    while (it.hasNext) {
      val e = it.next()
      val tag = e.getKey
      val v = e.getValue
      if (v3 && tag == "000") {
        leader = if (v.isArray) { if (v.size > 0) v.get(0).asText("") else "" } else v.asText("")
      } else if (!v3 && !v.isArray) {
        // v2: the leader is the one non-array entry.
        leader = v.asText("")
      } else {
        v.forEach { fn =>
          if (fn.isTextual) fields += Field(tag, "", "", fn.asText, Nil)
          else {
            val sfs = scala.collection.mutable.ArrayBuffer[(String, String)]()
            Option(fn.get("s")).foreach(_.forEach { so =>
              if (v3) {
                val sit = so.fields()
                while (sit.hasNext) {
                  val se = sit.next()
                  sfs += (se.getKey -> se.getValue.asText(""))
                }
              } else
                sfs += (Option(so.get("c")).map(_.asText("")).getOrElse("") ->
                  Option(so.get("v")).map(_.asText("")).getOrElse(""))
            })
            fields += Field(
              tag,
              Option(fn.get("i1")).map(_.asText(" ")).getOrElse(" "),
              Option(fn.get("i2")).map(_.asText(" ")).getOrElse(" "),
              "",
              sfs.toSeq
            )
          }
        }
      }
    }
    (leader, fields.toSeq)
  }
}
