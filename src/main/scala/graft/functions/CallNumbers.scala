package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dewey and Library of Congress call-number parsing and sort keys.
  *
  * Spark-native re-expression of the reference's call-number utilities
  * (reference: src/RecordManager/Base/Utils/DeweyCallNumber.php,
  * LcCallNumber.php, AbstractCallNumber.php:74 createSortableString).
  * All pure column expressions; the length-prefix collation trick (each
  * digit run prefixed with the digit count of its zero-stripped value)
  * makes lexicographic ordering equal numeric ordering without parsing
  * numbers — exactly the property the reference relies on for Solr sort
  * fields, and here it survives any engine's string collation.
  */
object CallNumbers {

  /** AbstractCallNumber.php:74 createSortableString: uppercase, prefix
    * every digit run with the length of its leading-zero-stripped form,
    * collapse multi-spaces. `intval` semantics are reproduced with a
    * zero-strip (no numeric cast, so arbitrarily long runs are safe).
    */
  def sortableString(c: Column): Column = {
    val tokens = regexp_extract_all(upper(c), lit("[0-9]+|[^0-9]+"), lit(0))
    val mapped = transform(
      tokens,
      t => {
        val stripped = regexp_replace(t, "^0+", "")
        val norm = when(stripped === "", "0").otherwise(stripped)
        when(t.rlike("^[0-9]+$"), concat(length(norm).cast("string"), t))
          .otherwise(t)
      }
    )
    regexp_replace(array_join(mapped, ""), "\\s{2,}", " ")
  }

  private val DeweyRe = "^((\\d+)(\\.\\d+)?)(.*)"
  private val DeweyCutterRe = " *\\.?([A-Z]\\d{1,3}(?:[A-Z]+)?) *(.+)?"

  /** Dewey parse columns (DeweyCallNumber.php:95). */
  def deweyDigits(c: Column): Column = regexp_extract(trim(c), DeweyRe, 2)
  def deweyDecimal(c: Column): Column = regexp_extract(trim(c), DeweyRe, 3)
  def deweyClassification(c: Column): Column = regexp_extract(trim(c), DeweyRe, 1)
  private def deweyRest(c: Column): Column = regexp_extract(trim(c), DeweyRe, 4)
  def deweyCutter(c: Column): Column =
    regexp_extract(deweyRest(c), DeweyCutterRe, 1)
  def deweySuffix(c: Column): Column = {
    val rest = deweyRest(c)
    when(rest.rlike(DeweyCutterRe), regexp_extract(rest, DeweyCutterRe, 2))
      .otherwise(rest)
  }

  def deweyValid(c: Column): Column = trim(c).rlike("^\\d")

  /** Classification floored to a precision bucket, zero-padded to three
    * digits — the Solr dewey-hundreds/tens/ones fields
    * (DeweyCallNumber.php:140 getNumber). Empty when the call number has
    * no leading classification.
    */
  def deweyNumber(c: Column, precision: Int): Column =
    when(
      deweyValid(c),
      format_string(
        "%03.0f",
        (floor(deweyClassification(c).cast("double") / precision) * precision).cast("double")
      )
    ).otherwise(lit(""))

  /** DeweyCallNumber.php:154 getSearchString. */
  def deweySearchString(c: Column): Column =
    when(deweyValid(c), upper(regexp_replace(trim(c), " ", ""))).otherwise(lit(""))

  /** DeweyCallNumber.php:165 getSortKey. The reference's suffix member
    * is NEVER null after construction (the cutter regex's trailing group
    * when a cutter matched, else the whole rest), so the suffix segment
    * ALWAYS appends — including a trailing space when the prefix is
    * non-empty and the suffix empty. The reference's own unit test pins
    * this: getSortKey('1 .I39') = "11 I39 " (trailing space). Found by
    * porting that test table (ReferenceParitySpec); previously this
    * dropped the empty-suffix segment.
    */
  def deweySortKey(c: Column): Column = {
    val base = concat(sortableString(deweyDigits(c)), deweyDecimal(c))
    val withCutter = when(
      deweyCutter(c) =!= "",
      concat(base, when(base =!= "", " ").otherwise(""), deweyCutter(c))
    ).otherwise(base)
    concat(
      withCutter,
      when(withCutter =!= "", " ").otherwise(""),
      sortableString(deweySuffix(c))
    )
  }

  private val LcRe = "^([a-zA-Z]+) *(?:(\\d+)(\\.\\d+)?)?(.*)$"
  private val LcCutterRe = "(\\.?[A-Za-z]\\d+|^\\.[A-Za-z]| \\.[A-Za-z])"

  def lcLetters(c: Column): Column = trim(regexp_extract(trim(c), LcRe, 1))
  def lcDigits(c: Column): Column = trim(regexp_extract(trim(c), LcRe, 2))
  def lcDecimal(c: Column): Column = trim(regexp_extract(trim(c), LcRe, 3))
  private def lcRest(c: Column): Column = trim(regexp_extract(trim(c), LcRe, 4))

  /** First cutter match inside the remainder; the remainder before it is
    * the suffix (LcCallNumber.php:120 — the reference splits at the match
    * offset; for well-formed call numbers the leftmost literal occurrence
    * of the match is that offset).
    */
  private def lcSplit(c: Column): (Column, Column) = {
    val rest = lcRest(c)
    val m = regexp_extract(rest, LcCutterRe, 1)
    val pos = instr(rest, m)
    val suffix = when(m === "", rest).otherwise(trim(rest.substr(lit(1), pos - 1)))
    val cutter = when(m === "", lit("")).otherwise(trim(rest.substr(pos, length(rest))))
    (suffix, cutter)
  }

  def lcSuffix(c: Column): Column = lcSplit(c)._1
  def lcCutter(c: Column): Column = lcSplit(c)._2

  /** LcCallNumber.php isValid: letters + digits present, first letter not
    * one of I, O, W, X, Y.
    */
  def lcValid(c: Column): Column =
    lcLetters(c) =!= "" && lcDigits(c) =!= "" &&
      !upper(substring(lcLetters(c), 1, 1)).isin("I", "O", "W", "X", "Y")

  /** One LC classification category range (a row of the reference's
    * LcCallNumberCategories mapping: letters between a1..a2 byte-wise,
    * intval(digits) between d1..d2, intval(decimal) between f1..f2 →
    * cat). The mapping data ships separately from the reference, so the
    * table is caller-supplied config.
    */
  final case class LcCategoryRange(
      a1: String,
      a2: String,
      d1: Int,
      d2: Int,
      f1: Int,
      f2: Int,
      cat: String
  )

  /** LcCallNumber.php:197 getCategory: the FIRST table row whose ranges
    * contain the parsed call number, '' when invalid or nothing matches.
    * PHP intval semantics: '' → 0, and the stored decimal keeps its
    * leading dot so intval of any real decimal is 0 — both reproduced
    * here. Category tables are small config, so the first-match rule
    * compiles to a codegen'd when-chain (same treatment as
    * FieldMapping's CASE chains).
    */
  def lcCategory(c: Column, table: Seq[LcCategoryRange]): Column = {
    val letters = lcLetters(c)
    def intval(s: Column): Column = {
      val lead = regexp_extract(s, "^(-?[0-9]+)", 1)
      when(lead === "", 0).otherwise(lead.cast("int"))
    }
    val digits = intval(lcDigits(c))
    val dec = intval(lcDecimal(c))
    val chain = table
      .foldLeft(when(lit(false), lit(""))) { (acc, r) =>
        acc.when(
          letters >= r.a1 && letters <= r.a2 &&
            digits.between(r.d1, r.d2) && dec.between(r.f1, r.f2),
          lit(r.cat)
        )
      }
      .otherwise(lit(""))
    when(lcValid(c), chain).otherwise(lit(""))
  }

  /** LcCallNumber.php getSortKey: letters, length-prefixed digits,
    * decimal, sortable suffix ('_'-marked when alphabetic), sortable
    * cutter segments.
    */
  def lcSortKey(c: Column): Column = {
    val letters = upper(lcLetters(c))
    val digits = lcDigits(c)
    val stripped = regexp_replace(digits, "^0+", "")
    val norm = when(stripped === "", "0").otherwise(stripped)
    val k1 = when(
      digits =!= "",
      concat(
        letters,
        when(letters =!= "", " ").otherwise(""),
        length(norm).cast("string"),
        digits
      )
    ).otherwise(letters)
    val k2 = concat(k1, lcDecimal(c))
    val (suffix, cutter) = lcSplit(c)
    val k3 = when(
      suffix =!= "",
      concat(
        k2,
        when(k2 =!= "", concat(lit(" "), when(suffix.rlike("^[A-Za-z]"), "_").otherwise(""))).otherwise(""),
        sortableString(suffix)
      )
    ).otherwise(k2)
    val cutters = regexp_extract_all(cutter, lit("[A-Za-z]\\d+"), lit(0))
    val cutterKey = array_join(transform(cutters, x => sortableString(x)), " ")
    when(
      cutterKey =!= "",
      concat(k3, when(k3 =!= "", " ").otherwise(""), cutterKey)
    ).otherwise(k3)
  }
}
