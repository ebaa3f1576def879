package graft.operators

import graft.{Q, Tables}
import graft.functions.CallNumbers._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dewey / LC call-number query registrations with DuckDB oracles. The
  * oracle SQL mirrors the column expressions via the shared templates
  * below.
  */
object CallNumberQueries {

  private val Alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"

  // ---- DuckDB templates ----

  private def strip0(t: String) =
    s"(CASE WHEN regexp_replace($t, '^0+', '') = '' THEN '0' ELSE regexp_replace($t, '^0+', '') END)"

  def sortableSql(x: String): String =
    s"regexp_replace(array_to_string(list_transform(" +
      s"regexp_extract_all(upper($x), '[0-9]+|[^0-9]+'), " +
      s"t -> CASE WHEN regexp_matches(t, '^[0-9]+$$') " +
      s"THEN cast(length(${strip0("t")}) as varchar) || t ELSE t END), ''), " +
      s"'\\s{2,}', ' ', 'g')"

  val all: Seq[Q] = Seq(
    Q(
      "dewey_callnum",
      (s, d) => {
        val k = col("p_partkey")
        val alpha = lit(Alpha)
        val c1 = alpha.substr((k % 26 + 1).cast("int"), lit(1))
        val input = when(k % 4 === 0, (k % 1000).cast("string"))
          .when(
            k % 4 === 1,
            concat((k % 1000).cast("string"), lit("."), lpad((k % 100).cast("string"), 2, "0"))
          )
          .when(
            k % 4 === 2,
            concat(
              (k % 1000).cast("string"),
              lit("."),
              (k % 10).cast("string"),
              lit(" ."),
              c1,
              (k % 900).cast("string")
            )
          )
          .otherwise(concat(lit("00"), (k % 10).cast("string"), lit(" X")))
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            input.as("callnum"),
            deweyValid(input).as("valid"),
            deweyClassification(input).as("classification"),
            deweyCutter(input).as("cutter"),
            deweySearchString(input).as("search_string"),
            deweySortKey(input).as("sort_key")
          )
      },
      Some {
        val rest = "regexp_extract(trim(callnum), '^((\\d+)(\\.\\d+)?)(.*)', 4)"
        val cutterRe = " *\\.?([A-Z]\\d{1,3}(?:[A-Z]+)?) *(.+)?"
        s"""WITH t AS (SELECT p_partkey,
           |  (CASE WHEN p_partkey % 4 = 0 THEN cast(p_partkey % 1000 as varchar)
           |        WHEN p_partkey % 4 = 1 THEN cast(p_partkey % 1000 as varchar) || '.' || lpad(cast(p_partkey % 100 as varchar), 2, '0')
           |        WHEN p_partkey % 4 = 2 THEN cast(p_partkey % 1000 as varchar) || '.' || cast(p_partkey % 10 as varchar) || ' .' || substr('$Alpha', cast(p_partkey % 26 + 1 as int), 1) || cast(p_partkey % 900 as varchar)
           |        ELSE '00' || cast(p_partkey % 10 as varchar) || ' X' END) AS callnum
           |  FROM part),
           |p AS (SELECT p_partkey, callnum,
           |  regexp_matches(trim(callnum), '^\\d') AS valid,
           |  regexp_extract(trim(callnum), '^((\\d+)(\\.\\d+)?)(.*)', 1) AS classification,
           |  regexp_extract(trim(callnum), '^((\\d+)(\\.\\d+)?)(.*)', 2) AS digits,
           |  regexp_extract(trim(callnum), '^((\\d+)(\\.\\d+)?)(.*)', 3) AS dec,
           |  $rest AS rest
           |  FROM t),
           |q AS (SELECT *, regexp_extract(rest, '$cutterRe', 1) AS cutter,
           |  (CASE WHEN regexp_matches(rest, '$cutterRe') THEN regexp_extract(rest, '$cutterRe', 2) ELSE rest END) AS suffix
           |  FROM p),
           |r AS (SELECT *, ${sortableSql("digits")} || dec AS base FROM q),
           |w AS (SELECT *, (CASE WHEN cutter != '' THEN base || (CASE WHEN base != '' THEN ' ' ELSE '' END) || cutter ELSE base END) AS withcut FROM r)
           |SELECT p_partkey, callnum, valid, classification, cutter,
           |  (CASE WHEN valid THEN upper(replace(trim(callnum), ' ', '')) ELSE '' END) AS search_string,
           |  withcut || (CASE WHEN withcut != '' THEN ' ' ELSE '' END) || coalesce(${sortableSql("suffix")}, '') AS sort_key
           |FROM w""".stripMargin
      }
    ),
    Q(
      "lc_callnum",
      (s, d) => {
        val k = col("p_partkey")
        val alpha = lit(Alpha)
        val l1 = alpha.substr((k % 26 + 1).cast("int"), lit(1))
        val l2 = alpha.substr((k % 20 + 1).cast("int"), lit(1))
        val c1 = alpha.substr((k * 7 % 26 + 1).cast("int"), lit(1))
        val input = when(k % 5 === 0, concat(l1, l2, lit(" general works")))
          .otherwise(
            concat(
              l1,
              l2,
              (k % 3000).cast("string"),
              lit("."),
              (k % 10).cast("string"),
              lit(" ."),
              c1,
              (k % 99).cast("string")
            )
          )
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            input.as("callnum"),
            lcValid(input).as("valid"),
            lcLetters(input).as("letters"),
            lcDigits(input).as("digits"),
            lcSuffix(input).as("suffix"),
            lcCutter(input).as("cutter"),
            lcSortKey(input).as("sort_key")
          )
      },
      Some {
        val lcRe = "^([a-zA-Z]+) *(?:(\\d+)(\\.\\d+)?)?(.*)$"
        val cutRe = "(\\.?[A-Za-z]\\d+|^\\.[A-Za-z]| \\.[A-Za-z])"
        s"""WITH t AS (SELECT p_partkey,
           |  (CASE WHEN p_partkey % 5 = 0
           |        THEN substr('$Alpha', cast(p_partkey % 26 + 1 as int), 1) || substr('$Alpha', cast(p_partkey % 20 + 1 as int), 1) || ' general works'
           |        ELSE substr('$Alpha', cast(p_partkey % 26 + 1 as int), 1) || substr('$Alpha', cast(p_partkey % 20 + 1 as int), 1) || cast(p_partkey % 3000 as varchar) || '.' || cast(p_partkey % 10 as varchar) || ' .' || substr('$Alpha', cast(p_partkey * 7 % 26 + 1 as int), 1) || cast(p_partkey % 99 as varchar)
           |   END) AS callnum FROM part),
           |p AS (SELECT p_partkey, callnum,
           |  trim(regexp_extract(trim(callnum), '$lcRe', 1)) AS letters,
           |  trim(regexp_extract(trim(callnum), '$lcRe', 2)) AS digits,
           |  trim(regexp_extract(trim(callnum), '$lcRe', 3)) AS dec,
           |  trim(regexp_extract(trim(callnum), '$lcRe', 4)) AS rest
           |  FROM t),
           |q AS (SELECT *, regexp_extract(rest, '$cutRe', 1) AS m FROM p),
           |r AS (SELECT *,
           |  (CASE WHEN m = '' THEN rest ELSE trim(substr(rest, 1, strpos(rest, m) - 1)) END) AS suffix,
           |  (CASE WHEN m = '' THEN '' ELSE trim(substr(rest, strpos(rest, m))) END) AS cutter
           |  FROM q),
           |k1 AS (SELECT *,
           |  (CASE WHEN digits != ''
           |        THEN upper(letters) || (CASE WHEN letters != '' THEN ' ' ELSE '' END) || cast(length(${strip0("digits")}) as varchar) || digits
           |        ELSE upper(letters) END) || dec AS k2
           |  FROM r),
           |k3t AS (SELECT *,
           |  (CASE WHEN suffix != ''
           |        THEN k2 || (CASE WHEN k2 != '' THEN ' ' || (CASE WHEN regexp_matches(suffix, '^[A-Za-z]') THEN '_' ELSE '' END) ELSE '' END) || ${sortableSql("suffix")}
           |        ELSE k2 END) AS k3,
           |  array_to_string(list_transform(regexp_extract_all(cutter, '[A-Za-z]\\d+'), x -> ${sortableSql("x")}), ' ') AS cutterkey
           |  FROM k1)
           |SELECT p_partkey, callnum,
           |  (letters != '' AND digits != '' AND NOT upper(substr(letters, 1, 1)) IN ('I', 'O', 'W', 'X', 'Y')) AS valid,
           |  letters, digits, suffix, cutter,
           |  (CASE WHEN cutterkey != '' THEN k3 || (CASE WHEN k3 != '' THEN ' ' ELSE '' END) || cutterkey ELSE k3 END) AS sort_key
           |FROM k3t""".stripMargin
      }
    ),
    // LC classification category (reference: LcCallNumber.php:197
    // getCategory over the LcCallNumberCategories mapping): the FIRST
    // config row whose (letters, intval(digits), intval(decimal)) ranges
    // contain the parsed call number; '' when the call number is invalid
    // or no row matches. The mapping data ships separately from the
    // reference, so a small demo table stands in — specific rows before
    // general ones exercise the first-match rule, and the QA 76 row
    // exercises the digit ranges. Map-only when-chain inside the scan's
    // codegen stage.
    Q(
      "lc_category",
      (s, d) => {
        import graft.functions.CallNumbers._
        val k = col("p_partkey")
        val alpha = lit(Alpha)
        val l1 = alpha.substr((k % 26 + 1).cast("int"), lit(1))
        val input = when(k % 7 === 0, concat(lit("QA"), (k % 150).cast("string"), lit(".5 .C2")))
          .when(k % 7 === 1, lit("no digits here"))
          .otherwise(concat(l1, (k % 3000).cast("string"), lit(" .B"), (k % 9).cast("string")))
        val table = Seq(
          LcCategoryRange("QA", "QA", 76, 76, 0, 99, "Computer science"),
          LcCategoryRange("Q", "QZ", 0, 9999, 0, 99, "Science"),
          LcCategoryRange("A", "FZ", 0, 9999, 0, 99, "Humanities range"),
          LcCategoryRange("L", "PZ", 0, 9999, 0, 99, "Language and education")
        )
        Tables
          .part(s, d)
          .select(
            k.as("p_partkey"),
            input.as("callnum"),
            lcCategory(input, table).as("category")
          )
      },
      Some {
        val lcRe = "^([a-zA-Z]+) *(?:(\\d+)(\\.\\d+)?)?(.*)$"
        s"""WITH t AS (SELECT p_partkey,
           |  (CASE WHEN p_partkey % 7 = 0 THEN 'QA' || cast(p_partkey % 150 as varchar) || '.5 .C2'
           |        WHEN p_partkey % 7 = 1 THEN 'no digits here'
           |        ELSE substr('$Alpha', cast(p_partkey % 26 + 1 as int), 1) || cast(p_partkey % 3000 as varchar) || ' .B' || cast(p_partkey % 9 as varchar)
           |   END) AS callnum FROM part),
           |p AS (SELECT p_partkey, callnum,
           |  trim(regexp_extract(trim(callnum), '$lcRe', 1)) AS letters,
           |  trim(regexp_extract(trim(callnum), '$lcRe', 2)) AS digits
           |  FROM t),
           |v AS (SELECT *,
           |  (letters != '' AND digits != '' AND NOT upper(substr(letters, 1, 1)) IN ('I', 'O', 'W', 'X', 'Y')) AS valid,
           |  (CASE WHEN digits = '' THEN 0 ELSE cast(digits as int) END) AS dig
           |  FROM p)
           |SELECT p_partkey, callnum,
           |  (CASE WHEN NOT valid THEN ''
           |        WHEN letters >= 'QA' AND letters <= 'QA' AND dig BETWEEN 76 AND 76 THEN 'Computer science'
           |        WHEN letters >= 'Q' AND letters <= 'QZ' AND dig BETWEEN 0 AND 9999 THEN 'Science'
           |        WHEN letters >= 'A' AND letters <= 'FZ' AND dig BETWEEN 0 AND 9999 THEN 'Humanities range'
           |        WHEN letters >= 'L' AND letters <= 'PZ' AND dig BETWEEN 0 AND 9999 THEN 'Language and education'
           |        ELSE '' END) AS category
           |FROM v""".stripMargin
      }
    )
  )
}
