package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

/** ISO 2709 (binary MARC exchange format) record codec.
  *
  * Spark-native re-expression of the wire-format handling in the
  * reference's MARC record class (reference: src/RecordManager/Base/Marc/
  * Marc.php and Serialization/Iso2709.php): leader(24) + directory of
  * 12-byte entries (tag 3, length 4, start 5) + field data, with 0x1E
  * field / 0x1F subfield / 0x1D record terminators.
  *
  * Directory lengths and offsets are BYTE counts (the wire format — and the
  * reference, which uses strlen/substr on raw bytes — define them that
  * way), so records containing multibyte UTF-8 parse correctly whether they
  * were built here or arrived from an external MARC exchange file. The
  * record travels as a String whose UTF-8 encoding is the wire image; both
  * directions encode/decode with UTF-8 explicitly.
  *
  * Pure per-record transformation — used inside `mapPartitions` over a
  * Dataset of raw records, so parsing distributes with the data and feeds
  * the columnar array<struct<tag,code,val>> record model that every
  * downstream operator (extraction, dedup keys, mapping) consumes.
  */
object Iso2709 {

  final case class Subfield(tag: String, code: String, value: String)

  val FieldTerm = '\u001e'
  val SubfieldDelim = '\u001f'
  val RecordTerm = '\u001d'
  private val FieldTermByte = 0x1e.toByte

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
      (sf.tag, body + FieldTerm, (body + FieldTerm).getBytes(UTF_8).length)
    }
    val dir = new StringBuilder
    var start = 0
    data.foreach { case (tag, _, nBytes) =>
      // Directory fields are fixed-width: oversized values would widen the
      // entry and silently corrupt every subsequent offset on parse.
      require(nBytes <= 9999, s"ISO2709 field $tag exceeds 9999 bytes")
      require(start <= 99999, "ISO2709 record exceeds 99999 data bytes")
      dir.append(tag)
      dir.append(f"$nBytes%04d")
      dir.append(f"$start%05d")
      start += nBytes
    }
    val dirStr = dir.toString + FieldTerm
    // leader + directory are pure ASCII, so their byte and char lengths
    // coincide; data lengths are the byte counts accumulated above.
    val base = 24 + dirStr.length
    val recLen = base + start + 1
    val leader = f"$recLen%05d" + "nam a22" + f"$base%05d" + "   4500"
    leader + dirStr + data.map(_._2).mkString + RecordTerm
  }

  /** Parse one ISO 2709 record back to (tag, code, value) triples; control
    * fields surface with code "". Malformed records yield an empty list
    * (callers route them to a quarantine side-output at scale).
    */
  def parse(record: String): Seq[Subfield] = parseBytes(record.getBytes(UTF_8))

  /** Byte-level parse — the form to feed external binary MARC (e.g. from
    * `spark.read.format("binaryFile")`) without a lossy decode first.
    */
  def parseBytes(rec: Array[Byte]): Seq[Subfield] = {
    try {
      val base = new String(rec, 12, 5, UTF_8).trim.toInt
      var dirEnd = 24
      while (dirEnd < rec.length && rec(dirEnd) != FieldTermByte) dirEnd += 1
      if (dirEnd >= rec.length) return Seq.empty
      val dir = new String(rec, 24, dirEnd - 24, UTF_8)
      dir
        .grouped(12)
        .filter(_.length == 12)
        .flatMap { entry =>
          val tag = entry.substring(0, 3)
          val len = entry.substring(3, 7).toInt
          val start = entry.substring(7, 12).toInt
          // len includes the field terminator; strip it from the decode.
          val raw = new String(rec, base + start, len - 1, UTF_8)
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
