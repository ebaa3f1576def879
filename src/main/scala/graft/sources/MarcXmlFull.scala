package graft.sources

import scala.xml.{Node, XML}

/** Full-fidelity MARCXML model: unlike the flat [[Iso2709.Subfield]]
  * triple stream (which serves the byte/stream codecs), this model keeps
  * the leader, the field grouping of repeated tags, both indicators, and
  * subfield order — everything `Record/Marc.php`'s `toSolrArray` getters
  * consume (non-filing indicators, 880 linkage via `$6`, per-field
  * subfield chains like 650 `$a..$z` topic strings).
  *
  * The columnar Spark shape is `leader: string`,
  * `controls: array<struct<tag,v>>`,
  * `fields: array<struct<tag,i1,i2,subs: array<struct<c,v>>>>` — the
  * whole record stays one row, so every getter in
  * [[graft.operators.MarcToSolr]] is a codegen'd higher-order-function
  * projection with zero shuffles.
  */
object MarcXmlFull {

  final case class Subf(c: String, v: String)
  final case class Field(tag: String, i1: String, i2: String, subs: Seq[Subf])
  final case class Ctl(tag: String, v: String)
  final case class Rec(leader: String, controls: Seq[Ctl], fields: Seq[Field])

  /** Parse a MARCXML document (a `collection` of `record`s or a bare
    * `record`). Namespace-agnostic: matches local element names like the
    * reference's parser.
    */
  def parseCollection(xml: String): Seq[Rec] = {
    val root = XML.loadString(xml)
    val records =
      if (root.label == "record") Seq(root) else (root \ "record")
    records.map(parseRecord)
  }

  def parseRecord(rec: Node): Rec = {
    val leader = (rec \ "leader").headOption.map(_.text).getOrElse("")
    val controls = (rec \ "controlfield").map { n =>
      Ctl((n \ "@tag").text, n.text)
    }
    val fields = (rec \ "datafield").map { df =>
      Field(
        (df \ "@tag").text,
        (df \ "@ind1").text,
        (df \ "@ind2").text,
        (df \ "subfield").map(sf => Subf((sf \ "@code").text, sf.text))
      )
    }
    Rec(leader, controls, fields)
  }
}
