package graft.sources

import graft.sources.Iso2709.Subfield

/** Line-based ("tagged") MARC codec (reference: src/RecordManager/Base/
  * Utils/LineBasedMarcFormatter.php — Alma/OCLC tagged output, `$x`
  * subfield delimiter variant). One record = one line per field:
  * `TAG II $aValue$bValue` for data fields, `TAG value` for control
  * fields. Same distributed-parse contract as [[Iso2709]].
  *
  * Caveat (inherent to the tagged format, not this codec): the format has
  * no escaping, so a literal '$' or newline inside a subfield value is
  * ambiguous on re-parse — exactly as in the reference's
  * LineBasedMarcFormatter, which keys on the same delimiters. Use ISO 2709
  * or MARCXML for values that may contain delimiter characters.
  */
object LineMarc {

  def build(fields: Seq[Subfield]): String =
    fields
      .map { sf =>
        if (sf.tag < "010") s"${sf.tag} ${sf.value}"
        else s"${sf.tag}    " + "$" + sf.code + sf.value
      }
      .mkString("\n")

  private val DataLine = "^(\\d{3}) +(\\$.*)$".r
  private val ControlLine = "^(\\d{3}) (.*)$".r

  def parse(record: String): Seq[Subfield] =
    record
      .split("\n")
      .toSeq
      .filter(_.nonEmpty)
      .flatMap {
        case DataLine(tag, rest) =>
          rest
            .split("\\$")
            .toSeq
            .filter(_.nonEmpty)
            .map(sf => Subfield(tag, sf.substring(0, 1), sf.substring(1)))
        case ControlLine(tag, value) => Seq(Subfield(tag, "", value))
        case _ => Seq.empty
      }
}
