package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Relational pivot: the long→wide reshape every corpus report ends
  * with (one row per source, one column per language). Spark's
  * `groupBy().pivot(col, values)` with EXPLICIT pivot values — at
  * 100 TB the implicit-values variant runs a whole extra distinct scan
  * to discover the columns, and nondeterministic column sets break
  * downstream schemas; pinning the values keeps the pivot a single
  * map-side-combined aggregate.
  */
object PivotQueries {

  private val Langs = Seq("de", "en", "es", "fr", "zh")

  /** The wide source×language frame both queries reshape — one
    * definition so the unpivot round-trips exactly the table the pivot
    * publishes.
    */
  private def wide(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables
      .documents(s, d)
      .groupBy("source")
      .pivot("lang", Langs)
      .agg(count(lit(1)))
      .na
      .fill(0L, Langs)

  private val pivotLangs = Q(
    "corpus_pivot_langs",
    (s, d) => wide(s, d).select(col("source") +: Langs.map(l => col(l).as(s"n_$l")): _*),
    Some {
      val cols = Langs
        .map(l => s"cast(count(*) FILTER (lang = '$l') as bigint) AS n_$l")
        .mkString(",\n  ")
      s"""SELECT source,
         |  $cols
         |FROM documents GROUP BY source""".stripMargin
    }
  )

  /** The inverse reshape: wide→long via `unpivot` (melt), round-tripping
    * the pivoted report back to tidy rows. Zero-count cells are dropped
    * on both engines so the long form carries only observed pairs —
    * at scale an unpivot multiplies rows by the column count, and
    * filtering the empties BEFORE downstream joins is the difference
    * between a tidy table and columns×rows of nulls.
    */
  private val unpivotLangs = Q(
    "corpus_unpivot_langs",
    (s, d) =>
      wide(s, d)
        .unpivot(
          Array(col("source")),
          Langs.map(l => col(l)).toArray,
          "lang",
          "n_docs"
        )
        .filter(col("n_docs") > 0),
    Some(
      // Pinned to the same lang universe as the Spark pivot values — an
      // unrestricted GROUP BY would emit rows for any future 6th fixture
      // language that the 5-column unpivot can never produce.
      s"""SELECT source, lang, cast(count(*) as bigint) AS n_docs
         |FROM documents
         |WHERE lang IN (${Langs.map(l => s"'$l'").mkString(", ")})
         |GROUP BY 1, 2""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(pivotLangs, unpivotLangs)
}
