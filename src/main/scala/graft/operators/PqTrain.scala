package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product-quantization codebook TRAINING (Jégou, Douze & Schmid 2011
  * §II-A): per-subspace k-means over the sub-vectors — the step that
  * turns `embed_pq_encode`'s deterministic placeholder codewords into a
  * trained codebook, completing the IVF-PQ training story
  * ([[KMeans]] trains the coarse quantizer; this trains the fine one).
  * Eighth certified training loop in the registry (after dedup-EM,
  * classifier, k-means, BPE, PCA, nearest-class-mean, unigram-EM).
  *
  * Scale shape per Lloyd round: all 8 subspaces train in ONE frame —
  * the corpus explodes to 8 sub-vector rows per vector (map-only), the
  * 8×16 = 128 current centroids collapse into 8 per-subspace broadcast
  * rows (BroadcastHashJoin on the subspace key — never a nested loop),
  * assignment is the per-row [[KMeans.nearestCell]] argmin, and the
  * update aggregates to the (subspace, code, dim) key space — 1,024
  * keys whatever the corpus size, so the shuffle is ~pure map-side
  * combine. The corpus is rescanned per round (Lloyd's shape); only
  * the 128-row model is checkpointed between rounds.
  *
  * Engine determinism: distances are sequential double sums over 8
  * dims (the certified `embed_kmeans_step` arithmetic), ties keep the
  * lowest code, and the OUTPUT is the final round's sufficient
  * statistics — per (sub, code, dim) member count and exact integer
  * micro-unit sum (new centroid = s_mu/(1e6·n), computed by the
  * consumer) — so the hash compare is integer-exact. Empty cells drop
  * (classic Lloyd); the oracle replays both rounds as unrolled CTEs.
  */
object PqTrain {

  private val M = 8
  private val Dsub = 8
  private val Kc = 16
  private val Iters = 2

  /** (vec_id, m, sv): the 8-dim double sub-vector of each subspace. */
  private def subvecs(embs: DataFrame): DataFrame =
    embs
      .select(col("vec_id"), explode(sequence(lit(0), lit(M - 1))).as("m"), col("embedding"))
      .select(
        col("vec_id"),
        col("m"),
        expr(s"transform(slice(embedding, m * $Dsub + 1, $Dsub), x -> cast(x as double))")
          .as("sv")
      )

  /** One Lloyd round over every subspace at once: assignment under the
    * current per-subspace codebooks + the (m, cell, dim) sufficient
    * statistics.
    */
  private def assignStep(sub: DataFrame, seeds: DataFrame): DataFrame = {
    val cents = seeds
      .groupBy("m")
      .agg(sort_array(collect_list(struct(col("cell"), col("cv")))).as("cents"))
    sub
      .join(broadcast(cents), Seq("m"))
      .select(col("m"), KMeans.nearestCell(col("sv"), col("cents")).as("cell"), posexplode(col("sv")))
      .select(col("m"), col("cell"), (col("pos") + 1).cast("long").as("dim"), col("col").as("x"))
      .groupBy("m", "cell", "dim")
      .agg(count(lit(1)).as("n"), sum(round(col("x") * 1e6).cast("long")).as("s_mu"))
  }

  /** The full per-subspace training loop: seeds = the first 16 vectors'
    * sub-vectors, `Iters` Lloyd rounds, final-round statistics out.
    */
  def trainOf(embs: DataFrame): DataFrame = {
    val sub = subvecs(embs)
    var seeds = sub
      .filter(col("vec_id") < Kc)
      .select(col("m"), col("vec_id").as("cell"), col("sv").as("cv"))
    var stats: DataFrame = null
    var ckpt: Option[org.apache.spark.rdd.RDD[_]] = None
    for (_ <- 1 to Iters) {
      // The 1,024-row statistics table is the only state carried between
      // rounds — checkpoint it (Bpe.train discipline), never the corpus.
      stats = assignStep(sub, seeds).localCheckpoint()
      val prev = ckpt
      ckpt = graft.Lineage.checkpointRdd(stats, "PqTrain")
      seeds = stats
        .groupBy("m", "cell")
        .agg(
          transform(
            array_sort(
              collect_list(struct(col("dim"), (col("s_mu") / (col("n") * 1e6)).as("v")))
            ),
            _.getField("v")
          ).as("cv")
        )
      prev.foreach(_.unpersist(false))
    }
    stats.select(
      col("m").cast("long").as("sub"),
      col("cell").cast("long").as("code"),
      col("dim"),
      col("n"),
      col("s_mu")
    )
  }

  private def oracleSql: String = {
    def round(r: Int): String =
      s"""d$r AS (
         |  SELECT s.vec_id, s.m, c.cell,
         |    list_sum(list_transform(range(1, ${Dsub + 1}),
         |      i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS dist
         |  FROM sv s JOIN c${r - 1} c ON c.m = s.m),
         |a$r AS (
         |  SELECT vec_id, m, cell,
         |    row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cell) AS rn
         |  FROM d$r),
         |x$r AS (
         |  SELECT a.m, a.cell, unnest(range(1, ${Dsub + 1})) AS dim, unnest(s.sv) AS x
         |  FROM (SELECT vec_id, m, cell FROM a$r WHERE rn = 1) a
         |  JOIN sv s ON s.vec_id = a.vec_id AND s.m = a.m),
         |st$r AS MATERIALIZED (
         |  SELECT m, cell, dim, count(*) AS n,
         |    sum(cast(round(x * 1e6) as bigint)) AS s_mu
         |  FROM x$r GROUP BY 1, 2, 3),
         |c$r AS (
         |  SELECT m, cell, list(s_mu / (n * 1e6) ORDER BY dim) AS cv
         |  FROM st$r GROUP BY m, cell)""".stripMargin
    s"""WITH e AS (SELECT vec_id, cast(embedding as double[]) AS v FROM embeddings),
       |sv AS MATERIALIZED (
       |  SELECT vec_id, m,
       |    list_transform(range(1, ${Dsub + 1}), i -> v[m * $Dsub + i]) AS sv
       |  FROM (SELECT vec_id, v, unnest(range(0, $M)) AS m FROM e) _s),
       |c0 AS (SELECT m, vec_id AS cell, sv AS cv FROM sv WHERE vec_id < $Kc),
       |${(1 to Iters).map(round).mkString(",\n")}
       |SELECT cast(m as bigint) AS sub, cast(cell as bigint) AS code,
       |  cast(dim as bigint) AS dim, cast(n as bigint) AS n, cast(s_mu as bigint) AS s_mu
       |FROM st$Iters""".stripMargin
  }

  private val trainQ = Q(
    "embed_pq_train",
    (s, d) => trainOf(Tables.embeddings(s, d)),
    Some(oracleSql)
  )

  val all: Seq[Q] = Seq(trainQ)
}
