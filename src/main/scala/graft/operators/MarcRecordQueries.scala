package graft.operators

import graft.{Q, Tables}
import graft.functions.MetadataFunctions._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deeper MARC extraction: title assembly with subfield punctuation and
  * non-filing indicators, the publication-year fallback chain, and page
  * counts (reference: Record/Marc.php:799 getTitle, :1067
  * getPublicationYear, :1101 getPageCount). The record model here carries
  * indicators and an 008 control field alongside the subfields.
  */
object MarcRecordQueries {

  val all: Seq[Q] = Seq(
    Q(
      "marc_title_year_pages",
      (s, d) => {
        val k = col("p_partkey")
        // Record model per row: 245 $a (with ind2 non-filing count),
        // optional $b; 260 $c for some; 264 ind2=1 $c for others; 008 with
        // dates; 300 $a extent.
        val titleA = when(k % 4 === 0, concat(lit("The "), col("p_name")))
          .otherwise(col("p_name"))
        val nonfiling = when(k % 4 === 0, lit(4)).otherwise(lit(0)).cast("int")
        val titleB = col("p_type")
        val c260 = when(k % 3 === 0, concat(lit("c"), (lit(1900) + k % 100).cast("string"), lit(".")))
          .otherwise(lit(""))
        val c264 = when(k % 3 === 1, concat(lit("["), (lit(1800) + k % 100).cast("string"), lit("]")))
          .otherwise(lit(""))
        val f008 = concat(lit("       "), (lit(1700) + k % 100).cast("string"))
        val extent = concat((k % 900 + 20).cast("string"), lit(" pages : illustrations"))

        // getTitle (subset: 245 $a + $b with ': ' separator when $a has no
        // trailing punctuation, else ' '; reference Marc.php:799).
        val sep = when(MetadataQueries2.hasTrailingPunctuation(titleA), lit(" "))
          .otherwise(lit(" : "))
        // getTitle(forFiling=true): drop ind2 non-filing chars, strip
        // punctuation, lowercase.
        val filingBase = when(
          nonfiling > 0,
          titleA.substr(nonfiling + 1, length(titleA))
        ).otherwise(titleA)

        // Staged selects: stripTrailingPunctuation / stripPunctuation
        // re-reference their operands ~300×, so they run over aliased
        // attributes (l2), not over the assembled title trees directly —
        // the single-select form inlined ~166k expression nodes.
        val l1 = Tables
          .part(s, d)
          .select(
            k.as("record_id"),
            concat(titleA, sep, titleB).as("full_raw"),
            concat(filingBase, sep, titleB).as("filing_raw"),
            extractYear(c260).as("y260"),
            extractYear(c264).as("y264"),
            substring(f008, 8, 4).as("y008raw"),
            regexp_extract(extent, "(\\d+)", 1).as("page_count")
          )
        val l2 = l1.select(
          col("record_id"),
          stripTrailingPunctuation(col("full_raw")).as("title"),
          lower(stripPunctuation(col("filing_raw"))).as("filing_p"),
          col("y260"),
          col("y264"),
          when(col("y008raw") === "0000" || col("y008raw") === "9999", lit(""))
            .otherwise(extractYear(col("y008raw"))).as("y008"),
          col("page_count")
        )
        // getPublicationYear: 260$c year, else 264(ind2=1)$c year, else
        // 008 positions 7-10 when not 0000/9999.
        l2.select(
          col("record_id"),
          col("title"),
          stripTrailingPunctuation(col("filing_p")).as("title_filing"),
          when(col("y260") =!= "", col("y260"))
            .when(col("y264") =!= "", col("y264"))
            .otherwise(col("y008")).as("pub_year"),
          col("page_count")
        )
      },
      Some {
        import MetadataQueries._
        val titleA =
          "(CASE WHEN p_partkey % 4 = 0 THEN 'The ' || p_name ELSE p_name END)"
        s"""WITH t AS (SELECT p_partkey, $titleA AS ta,
           |  (CASE WHEN p_partkey % 4 = 0 THEN 4 ELSE 0 END) AS nonfiling,
           |  p_type AS tb,
           |  (CASE WHEN p_partkey % 3 = 0 THEN 'c' || cast(1900 + p_partkey % 100 as varchar) || '.' ELSE '' END) AS c260,
           |  (CASE WHEN p_partkey % 3 = 1 THEN '[' || cast(1800 + p_partkey % 100 as varchar) || ']' ELSE '' END) AS c264,
           |  '       ' || cast(1700 + p_partkey % 100 as varchar) AS f008,
           |  cast(p_partkey % 900 + 20 as varchar) || ' pages : illustrations' AS extent
           |  FROM part),
           |sep AS (SELECT *,
           |  (CASE WHEN length(ta) > 0 AND (
           |     substr(rtrim(ta, ' '), -1, 1) IN ('/', ':', ';', ',', '=', '(', '[')
           |     OR (ends_with(ta, '.') AND (CASE WHEN length(ta) >= 3 THEN substr(ta, length(ta)-2, 1) ELSE substr(ta,1,1) END) != ' ')
           |   ) THEN ' ' ELSE ' : ' END) AS s FROM t),
           |full_t AS (SELECT *, ta || s || tb AS full_title,
           |  (CASE WHEN nonfiling > 0 THEN substr(ta, nonfiling + 1) ELSE ta END) || s || tb AS filing_raw
           |  FROM sep),
           |fil AS (SELECT *, lower(${stripPunctSql("filing_raw")}) AS filing_p FROM full_t),
           |${stripTrailStagesSql("fil", "full_title", "title", "wt")},
           |${stripTrailStagesSql("wt4", "filing_p", "title_filing", "vt")}
           |SELECT p_partkey AS record_id, title, title_filing,
           |  (CASE WHEN regexp_extract(c260, '(-?\\d{4})', 1) != '' THEN regexp_extract(c260, '(-?\\d{4})', 1)
           |        WHEN regexp_extract(c264, '(-?\\d{4})', 1) != '' THEN regexp_extract(c264, '(-?\\d{4})', 1)
           |        WHEN substr(f008, 8, 4) IN ('0000', '9999') THEN ''
           |        ELSE regexp_extract(substr(f008, 8, 4), '(-?\\d{4})', 1) END) AS pub_year,
           |  regexp_extract(extent, '(\\d+)', 1) AS page_count
           |FROM vt4""".stripMargin
      }
    )
  )
}
