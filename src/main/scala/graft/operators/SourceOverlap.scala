package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-source duplication matrix (Dodge et al. 2021, "Documenting
  * Large Webtext Corpora", measured C4↔CC-style overlap this way): the
  * LSH near-dup candidate pairs rolled up to (source_a, source_b)
  * counts, telling a curation pipeline WHICH feeds duplicate WHICH —
  * the number that decides dedup ordering and source pruning. Rides the
  * already-capped minhash candidate join (`LlmQueries.minhashPairsOf`),
  * then two broadcast-dimension lookups and a 20×20-bounded aggregate:
  * nothing new shuffles at corpus scale.
  *
  * The duplicate-injected dedup corpus maps injected ids back to their
  * base document's source (`+100000` verbatim copies, `+200000`
  * tail-append near-copies), so within-source AND the diagonal pairs
  * both appear under the gate.
  */
object SourceOverlap {

  /** Base doc_id of a (possibly injected) corpus id. */
  private def baseId(c: Column): Column =
    when(c >= 200000, c - 200000).when(c >= 100000, c - 100000).otherwise(c)

  private val sourceOverlap = Q(
    "docs_source_overlap",
    (s, d) => {
      val pairs = LlmQueries.minhashPairsOf(LlmQueries.corpus(s, d))
      val src = Tables.documents(s, d).select(col("doc_id").as("bid"), col("source"))
      val withSrc = pairs
        .join(broadcast(src), baseId(col("doc_a")) === col("bid"))
        .withColumnRenamed("source", "src_a")
        .drop("bid")
        .join(broadcast(src), baseId(col("doc_b")) === col("bid"))
        .withColumnRenamed("source", "src_b")
      withSrc
        .groupBy(
          least(col("src_a"), col("src_b")).as("source_a"),
          greatest(col("src_a"), col("src_b")).as("source_b")
        )
        .agg(count(lit(1)).as("n_pairs"))
    },
    Some(
      s"""WITH ${LlmQueries.CorpusSql}, ${LlmQueries.SigSql},
         |based AS (
         |  SELECT
         |    (CASE WHEN doc_a >= 200000 THEN doc_a - 200000
         |          WHEN doc_a >= 100000 THEN doc_a - 100000 ELSE doc_a END) AS ba,
         |    (CASE WHEN doc_b >= 200000 THEN doc_b - 200000
         |          WHEN doc_b >= 100000 THEN doc_b - 100000 ELSE doc_b END) AS bb
         |  FROM pairs),
         |srcd AS (
         |  SELECT da.source AS src_a, db.source AS src_b
         |  FROM based
         |  JOIN documents da ON based.ba = da.doc_id
         |  JOIN documents db ON based.bb = db.doc_id)
         |SELECT least(src_a, src_b) AS source_a,
         |  greatest(src_a, src_b) AS source_b,
         |  cast(count(*) as bigint) AS n_pairs
         |FROM srcd GROUP BY 1, 2""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(sourceOverlap)
}
