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

  /** Recall certification of the fusion: per-query recall@5 against
    * brute-force cosine ground truth for all three systems side by
    * side (lsh, ivf, hybrid) — the number that justifies running two
    * rankers. Reuses [[AnnEval]]'s determinism discipline (6-decimal
    * round, id tie-break, integer per-mille) and the rankers' own
    * plans; the only corpus-sized work is the deliberately-small
    * brute-force truth (5 probes, PlanSpec-whitelisted class).
    */
  private val hybridRecallQ = Q(
    "ann_recall_hybrid",
    (s, d) => {
      val (lshFn, _) = ranker("ann_lsh")
      val (ivfFn, _) = ranker("ann_ivf")
      val lsh = lshFn(s, d).select(col("query_id"), col("neighbor_id"), col("rank"))
      val ivf = ivfFn(s, d).select(col("query_id"), col("neighbor_id"), col("rank"))
      val hybrid = fuse(lsh.unionByName(ivf))
        .select(col("query_id"), col("neighbor_id"))
      val truth = AnnEval.truthTopK(
        graft.Tables.embeddings(s, d),
        nQueries = 5,
        k = TopK
      )
      Seq(
        "lsh" -> lsh.select(col("query_id"), col("neighbor_id").as("approx_id")),
        "ivf" -> ivf.select(col("query_id"), col("neighbor_id").as("approx_id")),
        "hybrid" -> hybrid.select(col("query_id"), col("neighbor_id").as("approx_id"))
      ).map { case (sys, approx) =>
        AnnEval
          .recallOf(truth, approx)
          .select(lit(sys).as("system"), col("query_id"), col("k"), col("n_overlap"), col("recall_permille"))
      }.reduce(_ unionByName _)
    },
    Some {
      val (_, lshSql) = ranker("ann_lsh")
      val (_, ivfSql) = ranker("ann_ivf")
      def recallFor(sys: String, src: String) =
        s"""SELECT '$sys' AS system, t.query_id, cast(count(*) as bigint) AS k,
           |  cast(count(a.neighbor_id) as bigint) AS n_overlap,
           |  cast(count(a.neighbor_id) * 1000 // count(*) as bigint) AS recall_permille
           |FROM truth t LEFT JOIN $src a
           |  ON t.query_id = a.query_id AND t.neighbor_id = a.neighbor_id
           |GROUP BY t.query_id""".stripMargin
      s"""WITH lshq AS ($lshSql),
         |ivfq AS ($ivfSql),
         |pooled AS (SELECT query_id, neighbor_id, rank FROM lshq
         |           UNION ALL SELECT query_id, neighbor_id, rank FROM ivfq),
         |rrf AS (
         |  SELECT query_id, neighbor_id,
         |    cast(sum(1000000 // ($K0 + rank)) as bigint) AS rrf
         |  FROM pooled GROUP BY 1, 2),
         |fusedq AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rrf DESC, neighbor_id) AS fr
         |    FROM rrf) WHERE fr <= $TopK),
         |v AS (SELECT vec_id, cast(embedding as double[]) AS vec FROM embeddings),
         |truth AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |        round(list_dot_product(q.vec, e.vec) /
         |              (sqrt(list_dot_product(q.vec, q.vec)) * sqrt(list_dot_product(e.vec, e.vec))), 6) DESC,
         |        e.vec_id) AS rank
         |    FROM v e JOIN v q ON q.vec_id < 5 AND e.vec_id != q.vec_id)
         |  WHERE rank <= $TopK)
         |${recallFor("lsh", "lshq")}
         |UNION ALL
         |${recallFor("ivf", "ivfq")}
         |UNION ALL
         |${recallFor("hybrid", "fusedq")}""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(hybridQ, hybridRecallQ)
}
