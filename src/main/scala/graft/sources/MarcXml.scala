package graft.sources

import graft.sources.Iso2709.Subfield

import scala.xml.{Elem, XML}

/** MARCXML record codec (reference: src/RecordManager/Base/Marc/
  * Serialization/MarcXml.php). Same per-record transformation contract as
  * [[Iso2709]]: runs inside `mapPartitions` and feeds the columnar record
  * model.
  */
object MarcXml {

  def build(fields: Seq[Subfield]): String = {
    // One field element per triple — repeated tags must round-trip.
    val body = fields.map { sf =>
      if (sf.tag < "010")
        s"""<controlfield tag="${sf.tag}">${xmlEscape(sf.value)}</controlfield>"""
      else
        s"""<datafield tag="${sf.tag}" ind1=" " ind2=" "><subfield code="${xmlEscape(sf.code)}">${xmlEscape(sf.value)}</subfield></datafield>"""
    }.mkString
    s"""<record>$body</record>"""
  }

  def parse(xml: String): Seq[Subfield] =
    try {
      val root: Elem = XML.loadString(xml)
      val control = (root \ "controlfield").map { n =>
        Subfield((n \ "@tag").text, "", n.text)
      }
      val data = (root \ "datafield").flatMap { df =>
        val tag = (df \ "@tag").text
        (df \ "subfield").map(sf => Subfield(tag, (sf \ "@code").text, sf.text))
      }
      control ++ data
    } catch {
      case _: Exception => Seq.empty
    }

  // Quote/apostrophe escaping matters because the builder interpolates
  // into attribute values (subfield code) as well as element text.
  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;")
      .replace("<", "&lt;")
      .replace(">", "&gt;")
      .replace("\"", "&quot;")
      .replace("'", "&apos;")
}
