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

  private val pivotLangs = Q(
    "corpus_pivot_langs",
    (s, d) =>
      Tables
        .documents(s, d)
        .groupBy("source")
        .pivot("lang", Langs)
        .agg(count(lit(1)))
        .na
        .fill(0L, Langs)
        .select(col("source") +: Langs.map(l => col(l).as(s"n_$l")): _*),
    Some {
      val cols = Langs
        .map(l => s"cast(count(*) FILTER (lang = '$l') as bigint) AS n_$l")
        .mkString(",\n  ")
      s"""SELECT source,
         |  $cols
         |FROM documents GROUP BY source""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(pivotLangs)
}
