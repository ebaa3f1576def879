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

  /** One line-based-MARC dialect config (reference:
    * LineBasedMarcFormatter.php `$lineBasedMarcFormats` + the
    * per-source override shape its unit test exercises for GeniePlus).
    */
  final case class Format(
      subfieldRegex: String, // one capture group: the subfield code
      endOfLineMarker: Option[Char] = None,
      contentOffset: Int = 4,
      leaderOffset: Int = 0,
      ind1Offset: Int = 4,
      ind2Offset: Int = 5,
      firstSubfieldOffset: Int = 7
  )

  /** The reference's built-in dialects: OCLC `$x`, Alma `|x `, `‡x `. */
  val DefaultFormats: Seq[Format] = Seq(
    Format("\\$([a-z0-9])"),
    Format("\\|([a-z0-9]) "),
    Format("‡([a-z0-9]) ")
  )

  /** A parsed field with indicators; the leader is tag `LDR` with
    * code/inds empty. Collapses to the 3-column [[Subfield]] model via
    * `toSubfield` for the shared record operators.
    */
  final case class Field(tag: String, ind1: String, ind2: String, code: String, value: String) {
    def toSubfield: Subfield = Subfield(tag, code, value)
  }

  private def intvalPrefix(s: String): Int = {
    val digits = s.takeWhile(_.isDigit)
    if (digits.isEmpty) 0 else digits.toInt
  }

  /** Config-driven conversion (LineBasedMarcFormatter.php:105
    * convertLineBasedMarcToXml, minus the XML serialization — the
    * columnar record model is this engine's wire format). Semantics
    * ported line for line: dialect = the config whose subfield regex
    * matches MOST OFTEN (first wins ties), per line the end-of-line
    * marker strips, quotes around content strip, `LDR`/`000` becomes a
    * 24-padded leader, numeric-prefix tags < 10 are control fields,
    * data fields read indicators at configured offsets (`_` ≙ blank)
    * and split subfields on the capturing regex, skipping empty values.
    * Returns the fields plus the illegal-XML-character RUN count (the
    * reference's getIllegalXmlCharacterCount, counted over the whole
    * input like its final preg_replace). Runs per record inside
    * `mapPartitions` — the same distributed-parse contract as the other
    * codecs.
    */
  def convertConfigured(
      metadata: String,
      formats: Seq[Format] = DefaultFormats
  ): (Seq[Field], Int) = {
    val fmt = formats
      .map(f => f -> java.util.regex.Pattern.compile(f.subfieldRegex, java.util.regex.Pattern.DOTALL))
      .foldLeft(Option.empty[(Format, Int)]) { case (best, (f, p)) =>
        val m = p.matcher(metadata)
        var cnt = 0
        while (m.find()) cnt += 1
        best match {
          case Some((_, bc)) if cnt <= bc => best
          case _                          => Some(f -> cnt)
        }
      }
      .map(_._1)
      .getOrElse(DefaultFormats.head)
    val subRe = java.util.regex.Pattern.compile(fmt.subfieldRegex)

    val fields = metadata.split("\n").toSeq.flatMap { raw =>
      var line = raw.trim
      fmt.endOfLineMarker.foreach { eol =>
        if (line.nonEmpty && line.last == eol) line = line.dropRight(1)
      }
      if (line.isEmpty) Seq.empty
      else {
        val tag = line.take(3)
        var content = if (line.length > fmt.contentOffset) line.substring(fmt.contentOffset) else ""
        if (content.length >= 2 && content.head == '\'' && content.last == '\'')
          content = content.substring(1, content.length - 1)
        if (tag == "LDR" || tag == "000") {
          val sliced = content.drop(fmt.leaderOffset).take(24)
          Seq(Field("LDR", "", "", "", sliced.padTo(24, ' ')))
        } else if (intvalPrefix(tag) < 10) {
          Seq(Field(tag, "", "", "", content))
        } else {
          def ind(off: Int): String = {
            val c = if (line.length > off) line.charAt(off) else ' '
            if (c == '_') " " else c.toString
          }
          val subsStr = {
            val from = fmt.firstSubfieldOffset - fmt.contentOffset
            if (content.length > from) content.substring(from) else ""
          }
          // PREG_SPLIT_DELIM_CAPTURE: [prefix, code, value, code, value…]
          val parts = scala.collection.mutable.ArrayBuffer.empty[String]
          val m = subRe.matcher(subsStr)
          var last = 0
          while (m.find()) {
            parts += subsStr.substring(last, m.start())
            parts += m.group(1)
            last = m.end()
          }
          parts += subsStr.substring(last)
          parts.drop(1).grouped(2).toSeq.collect {
            case scala.collection.mutable.ArrayBuffer(code, value) if value != "" =>
              Field(tag, ind(fmt.ind1Offset), ind(fmt.ind2Offset), code, value)
          }
        }
      }
    }
    val bad = {
      val m = java.util.regex.Pattern
        .compile("[^\\x{0009}\\x{000a}\\x{000d}\\x{0020}-\\x{D7FF}\\x{E000}-\\x{FFFD}]+")
        .matcher(metadata)
      var cnt = 0
      while (m.find()) cnt += 1
      cnt
    }
    (fields, bad)
  }
}
