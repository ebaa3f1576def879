package graft.sources

/** ISO 2709 (binary MARC exchange format) record codec.
  *
  * Spark-native re-expression of the wire-format handling in the
  * reference's MARC record class (reference: src/RecordManager/Base/Marc/
  * Marc.php and Serialization/Iso2709.php): leader(24) + directory of
  * 12-byte entries (tag 3, length 4, start 5) + field data, with 0x1E
  * field / 0x1F subfield / 0x1D record terminators.
  *
  * Pure per-record string transformation — used inside `mapPartitions`
  * over a Dataset of raw records, so parsing distributes with the data
  * and feeds the columnar array<struct<tag,code,val>> record model that
  * every downstream operator (extraction, dedup keys, mapping) consumes.
  */
object Iso2709 {

  final case class Subfield(tag: String, code: String, value: String)

  val FieldTerm = '\u001e'
  val SubfieldDelim = '\u001f'
  val RecordTerm = '\u001d'

  /** Serialize (tag, code, value) triples into one ISO 2709 record.
    * Control fields (tag < "010") take the value directly; data fields get
    * blank indicators and one subfield each. One field per triple —
    * repeated tags are legal in MARC and must survive the round trip.
    */
  def build(fields: Seq[Subfield]): String = {
    val data = fields.map { sf =>
      val body =
        if (sf.tag < "010") sf.value
        else "  " + s"$SubfieldDelim${sf.code}${sf.value}"
      (sf.tag, body + FieldTerm)
    }
    val dir = new StringBuilder
    var start = 0
    data.foreach { case (tag, body) =>
      // Directory fields are fixed-width: oversized values would widen the
      // entry and silently corrupt every subsequent offset on parse.
      require(body.length <= 9999, s"ISO2709 field $tag exceeds 9999 chars")
      require(start <= 99999, "ISO2709 record exceeds 99999 data chars")
      dir.append(tag)
      dir.append(f"${body.length}%04d")
      dir.append(f"$start%05d")
      start += body.length
    }
    val dirStr = dir.toString + FieldTerm
    val base = 24 + dirStr.length
    val recLen = base + start + 1
    val leader = f"$recLen%05d" + "nam a22" + f"$base%05d" + "   4500"
    leader + dirStr + data.map(_._2).mkString + RecordTerm
  }

  /** Parse one ISO 2709 record back to (tag, code, value) triples; control
    * fields surface with code "". Malformed records yield an empty list
    * (callers route them to a quarantine side-output at scale).
    */
  def parse(record: String): Seq[Subfield] = {
    try {
      val base = record.substring(12, 17).trim.toInt
      val dirEnd = record.indexOf(FieldTerm.toInt, 24)
      if (dirEnd < 0) return Seq.empty
      val dir = record.substring(24, dirEnd)
      dir
        .grouped(12)
        .filter(_.length == 12)
        .flatMap { entry =>
          val tag = entry.substring(0, 3)
          val len = entry.substring(3, 7).toInt
          val start = entry.substring(7, 12).toInt
          val raw = record.substring(base + start, base + start + len - 1)
          if (tag < "010") Seq(Subfield(tag, "", raw))
          else
            raw
              .dropWhile(_ != SubfieldDelim)
              .split(SubfieldDelim)
              .toSeq
              .filter(_.nonEmpty)
              .map(sf => Subfield(tag, sf.substring(0, 1), sf.substring(1)))
        }
        .toSeq
    } catch {
      case _: RuntimeException => Seq.empty
    }
  }
}
