package graft.operators

import graft.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion of heterogeneous ANN candidate lists
  * (Cormack, Clarke & Buettcher, SIGIR 2009) — the standard hybrid-
  * search combiner: rankers with different blind spots (here the
  * sign-LSH bucket ranker and the IVF cell ranker, whose partitions
  * cut the embedding space along different projections) each
  * contribute 1/(k₀ + rank) per candidate, and the fused order
  * recovers neighbors either partition would have missed alone —
  * ensemble recall without comparing raw scores across rankers (RRF's
  * whole point: ranks are scale-free, scores are not).
  *
  * Determinism: the contribution is the INTEGER 10⁶ div (60 + rank)
  * (k₀ = 60, the paper's constant) summed as longs, so fused scores
  * and tie-breaks (by neighbor id) are bit-identical across engines —
  * a float 1/(60+r) sum would depend on addition order.
  *
  * Scale shape: both input rankers are the already-certified bounded
  * queries (top-5 per probe out of capped bucket/cell candidate
  * sets), so the fusion frame is ≤ 2×5 rows per probe; the group-by
  * and the re-rank window touch only that bounded frame. Fusing adds
  * ZERO corpus passes — it reuses the rankers' own plans.
  */
object HybridFusion {

  private val K0 = 60
  private val TopK = 5

  private def ranker(name: String) = {
    val q = (LlmQueries.all ++ LlmQueries2.all).find(_.name == name).get
    (q.fn, q.oracle.get)
  }

  /** Fuse pooled (query_id, neighbor_id, rank) lists: integer RRF sum,
    * re-rank, top-k. Input must already be bounded per query.
    */
  def fuse(pooled: org.apache.spark.sql.DataFrame, k: Int = TopK): org.apache.spark.sql.DataFrame = {
    val rrf = pooled
      .groupBy("query_id", "neighbor_id")
      .agg(
        sum(expr(s"1000000 div ($K0 + rank)")).as("rrf"),
        count(lit(1)).as("n_lists")
      )
    val w = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("neighbor_id"))
    rrf
      .withColumn("fused_rank", row_number().over(w).cast("long"))
      .filter(col("fused_rank") <= k)
  }

  private val hybridQ = Q(
    "ann_hybrid_rrf",
    (s, d) => {
      val (lshFn, _) = ranker("ann_lsh")
      val (ivfFn, _) = ranker("ann_ivf")
      fuse(
        lshFn(s, d)
          .select(col("query_id"), col("neighbor_id"), col("rank"))
          .unionByName(ivfFn(s, d).select(col("query_id"), col("neighbor_id"), col("rank")))
      )
    },
    Some {
      val (_, lshSql) = ranker("ann_lsh")
      val (_, ivfSql) = ranker("ann_ivf")
      s"""WITH lsh AS ($lshSql),
         |ivf AS ($ivfSql),
         |pooled AS (SELECT query_id, neighbor_id, rank FROM lsh
         |           UNION ALL SELECT query_id, neighbor_id, rank FROM ivf),
         |rrf AS (
         |  SELECT query_id, neighbor_id,
         |    cast(sum(1000000 // ($K0 + rank)) as bigint) AS rrf,
         |    count(*) AS n_lists
         |  FROM pooled GROUP BY 1, 2),
         |fused AS (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS fr
         |  FROM rrf)
         |SELECT query_id, neighbor_id, rrf, n_lists, cast(fr as bigint) AS fused_rank
         |FROM fused WHERE fr <= $TopK""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(hybridQ)
}
