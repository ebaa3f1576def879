package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Top-principal-component extraction by distributed POWER ITERATION
  * (the von Mises iteration; the dominant-eigenvector kernel under
  * PCA/LSI/spectral methods — and the embedding-drift / anisotropy
  * diagnostic a 100-TB embedding pipeline wants: "all my vectors
  * collapsed onto one direction" is the classic embedding-collapse
  * failure, visible as a dominant component with outsized mass).
  *
  * v_{k+1} ∝ Σ_i (x_i − μ)·((x_i − μ)ᵀ v_k) — each iteration is ONE
  * map pass over the embeddings plus a 64-key (dimension-keyed)
  * aggregate with map-side combine; the 64-long model vector collects
  * to the driver between iterations exactly like [[KMeans.step]]'s
  * centroids and [[Classifier]]'s weights (bounded MODEL state, not
  * data). The covariance matrix is never materialized (64×64 would be
  * fine here, but the matrix-free form is what survives when dim is
  * 4096).
  *
  * Engine determinism (the DuckDB oracle replays all K iterations as
  * chained CTEs, certifying TRAINING): embeddings quantize once to
  * integer milli-units; the per-row projection d_i and the per-dim
  * M-step sums are pure int64 arithmetic (order-free); each iteration's
  * only doubles are the norm (Σw² summed EXACTLY — BigInt here,
  * HUGEINT in DuckDB — then one correctly-rounded conversion + sqrt)
  * and the normalize division, both fixed-order expressions identical
  * in both engines. Int64 headroom: per-row |d| ≤ dim·Δ·1e6 ≈ 1.3e11,
  * rescaled to ds = d div 1e6 before the M-step, so Σ|ds·Δ| bounds the
  * row count at ~3.5·10¹⁰; beyond that drop the embedding quantum a
  * decade (the [[BlockingEval]] FsQuantum discipline).
  *
  * The sign of the eigenvector is pinned by the deterministic init
  * (uniform positive vector), so the output is reproducible, not just
  * up-to-sign.
  */
object PcaPower {

  private val Dim = 64
  private val K = 6

  /** Embedding quantum: milli-units. */
  private val EQ = 1000L

  /** Eigenvector quantum: micro-units (‖v‖ ≈ 1e6). */
  private val VQ = 1000000L

  /** Round half AWAY FROM ZERO — DuckDB `round()` semantics (and Spark
    * SQL's). JVM `math.round` is floor(x+0.5), which differs on
    * negative exact halves — and means/components here ARE negative.
    */
  private def roundAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  private def eqArr = transform(
    col("embedding"),
    x => round(x.cast("double") * EQ).cast("long")
  )

  /** Quantized frame (vec_id, e: array<long>). */
  private def eqOf(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), eqArr.as("e"))

  /** Embedding-health / ANISOTROPY report (Ethayarajh 2019's "how
    * anisotropic is my embedding space" diagnostic, in its cheapest
    * sound form): one row with the corpus size, the mean vector norm,
    * and the mean (signed and absolute) cosine of every vector to the
    * CORPUS MEAN direction — mean |cos| near 1 = the space has
    * collapsed onto a cone (the failure the power-iteration row
    * detects structurally, here as a monitorable scalar); near 0 =
    * directions are balanced.
    *
    * Scale shape: ONE dimension-keyed aggregate builds the mean vector
    * (64 keys, map-side combine), it rides back as a one-row broadcast,
    * scoring is MAP-ONLY int64 dots, and the rollup is a single
    * aggregate. Determinism: per-row scores quantize BEFORE summing
    * (norm to milli-units, cosine to permyriad — one IEEE
    * division/sqrt chain on exact int64 inputs per row), so the means
    * are integer divs, order-independent.
    */
  def anisotropyOf(embs: DataFrame): DataFrame = {
    val eq = eqOf(embs)
    val sums = eq
      .select(posexplode(col("e")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
    val mrow = sums.agg(
      transform(
        array_sort(
          collect_list(
            struct(
              col("j"),
              round(col("s").cast("double") / col("n")).cast("long").as("m")
            )
          )
        ),
        _.getField("m")
      ).as("mq")
    )
    val dot = expr("aggregate(sequence(0, 63), 0L, (acc, j) -> acc + e[j] * mq[j])")
    val nrm2 = expr("aggregate(e, 0L, (acc, x) -> acc + x * x)")
    val mq2 = expr("aggregate(mq, 0L, (acc, x) -> acc + x * x)")
    eq.withColumn("j", (col("vec_id") - col("vec_id") + 1).cast("int"))
      .join(
        broadcast(mrow.select((size(col("mq")) - size(col("mq")) + 1).cast("int").as("j"), col("mq"))),
        Seq("j")
      )
      .withColumn("nrm2", nrm2)
      .withColumn("mq2", mq2)
      .withColumn("dot", dot)
      .withColumn("norm_mu", round(sqrt(col("nrm2").cast("double"))).cast("long"))
      .withColumn(
        "cos_pm",
        when(
          col("nrm2") > 0 && col("mq2") > 0,
          round(
            col("dot").cast("double") /
              (sqrt(col("nrm2").cast("double")) * sqrt(col("mq2").cast("double"))) * 10000
          ).cast("long")
        ).otherwise(lit(0L))
      )
      .agg(
        count(lit(1)).as("n"),
        expr("sum(norm_mu) div count(1)").as("mean_norm_mu"),
        expr("sum(cos_pm) div count(1)").as("mean_cos_pm"),
        expr("sum(abs(cos_pm)) div count(1)").as("mean_abs_cos_pm")
      )
  }

  private def anisotropyOracle: String =
    s"""WITH eq AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS double) * $EQ) AS BIGINT)) AS e
       |  FROM embeddings),
       |dims AS (SELECT CAST(j AS INT) AS j FROM range(1, ${Dim + 1}) t(j)),
       |m AS (
       |  SELECT dims.j,
       |    CAST(round(CAST(sum(e[dims.j]) AS double) / count(*)) AS BIGINT) AS mq
       |  FROM eq CROSS JOIN dims GROUP BY dims.j),
       |ma AS (SELECT list(mq ORDER BY j) AS mq FROM m),
       |sc AS (
       |  SELECT
       |    CAST(list_sum(list_transform(range(1, ${Dim + 1}), j -> e[j] * e[j])) AS BIGINT) AS nrm2,
       |    CAST(list_sum(list_transform(range(1, ${Dim + 1}), j -> mq[j] * mq[j])) AS BIGINT) AS mq2,
       |    CAST(list_sum(list_transform(range(1, ${Dim + 1}), j -> e[j] * mq[j])) AS BIGINT) AS dot
       |  FROM eq, ma),
       |q AS (
       |  SELECT CAST(round(sqrt(CAST(nrm2 AS double))) AS BIGINT) AS norm_mu,
       |    CASE WHEN nrm2 > 0 AND mq2 > 0
       |      THEN CAST(round(CAST(dot AS double) /
       |        (sqrt(CAST(nrm2 AS double)) * sqrt(CAST(mq2 AS double))) * 10000) AS BIGINT)
       |      ELSE 0 END AS cos_pm
       |  FROM sc)
       |SELECT CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(norm_mu) // count(*) AS BIGINT) AS mean_norm_mu,
       |  CAST(sum(cos_pm) // count(*) AS BIGINT) AS mean_cos_pm,
       |  CAST(sum(abs(cos_pm)) // count(*) AS BIGINT) AS mean_abs_cos_pm
       |FROM q""".stripMargin

  /** The K power iterations over a quantized frame; returns (mean,
    * final v), both integer-quantized. Mirrored expression-for-
    * expression by the oracle CTEs.
    */
  private[graft] def fit(eq: DataFrame): (Array[Long], Array[Long]) = {
    val cached = eq.persist()
    try fitCached(cached)
    finally cached.unpersist(false)
  }

  /** The iteration body over an already-persisted frame; every read of
    * the corpus happens in here, so the caller can scope the cache with
    * try/finally (the whole model collects to the driver — nothing
    * downstream re-reads `eq`).
    */
  private def fitCached(cached: DataFrame): (Array[Long], Array[Long]) = {
    val n = math.max(cached.count(), 1L)
    val sums = cached
      .select(posexplode(col("e")).as(Seq("j", "x")))
      .groupBy("j")
      .agg(sum("x").as("s"))
      .collect()
      .map(r => r.getAs[Int]("j") -> r.getAs[Long]("s"))
      .toMap
    val mq = Array.tabulate(Dim)(j => roundAway(sums.getOrElse(j, 0L).toDouble / n.toDouble))
    var v = Array.fill(Dim)(roundAway(VQ.toDouble / 8.0))
    for (_ <- 1 to K) {
      val mLit = typedLit(mq.toSeq)
      val vLit = typedLit(v.toSeq)
      // d = Σ_j (e[j] − m[j])·v[j], exact int64; rescale before the
      // per-dimension sum so products stay in headroom.
      val d = aggregate(
        sequence(lit(0), lit(Dim - 1)),
        lit(0L),
        (acc, j) =>
          acc + (element_at(col("e"), j.cast("int") + 1) - element_at(mLit, j.cast("int") + 1)) *
            element_at(vLit, j.cast("int") + 1)
      )
      val w = cached
        .withColumn("ds", d)
        .withColumn("ds", expr(s"ds div ${VQ}L"))
        .select(col("ds"), posexplode(col("e")).as(Seq("j", "x")))
        .groupBy("j")
        .agg(sum(col("ds") * (col("x") - element_at(typedLit(mq.toSeq), col("j") + 1))).as("w"))
        .collect()
        .map(r => r.getAs[Int]("j") -> r.getAs[Long]("w"))
        .toMap
      val warr = Array.tabulate(Dim)(j => w.getOrElse(j, 0L))
      // Exact Σw² (BigInt ↔ HUGEINT), ONE correctly-rounded conversion.
      val nrm = math.sqrt(warr.map(x => BigInt(x) * BigInt(x)).sum.toDouble)
      if (nrm > 0)
        v = warr.map(x => roundAway((VQ.toDouble * x.toDouble) / nrm))
    }
    (mq, v)
  }

  def pcaOf(embs: DataFrame): DataFrame = {
    val (mq, v) = fit(eqOf(embs))
    val s = embs.sparkSession
    import s.implicits._
    (0 until Dim)
      .map(j => (j.toLong, mq(j), v(j)))
      .toDF("dim", "mean_mq", "v_mu")
  }

  private def oracleSql: String = {
    def iter(k: Int): String =
      s"""va$k AS MATERIALIZED (SELECT list(v ORDER BY j) AS varr FROM v${k - 1}),
         |d$k AS MATERIALIZED (
         |  SELECT CAST(list_sum(list_transform(range(1, ${Dim + 1}),
         |           j -> (e[j] - marr[j]) * varr[j])) AS BIGINT) // $VQ AS ds, e
         |  FROM eq, ma, va$k),
         |w$k AS MATERIALIZED (
         |  SELECT dims.j, CAST(coalesce(sum(ds * (e[dims.j] - marr[dims.j])), 0) AS BIGINT) AS w
         |  FROM d$k CROSS JOIN dims, ma GROUP BY dims.j),
         |n$k AS MATERIALIZED (
         |  SELECT sqrt(CAST(sum(CAST(w AS HUGEINT) * CAST(w AS HUGEINT)) AS double)) AS nrm FROM w$k),
         |v$k AS MATERIALIZED (
         |  SELECT w$k.j,
         |    CASE WHEN nrm > 0
         |      THEN CAST(round(($VQ.0 * CAST(w AS double)) / nrm) AS BIGINT)
         |      ELSE (SELECT v FROM v${k - 1} p WHERE p.j = w$k.j) END AS v
         |  FROM w$k, n$k)""".stripMargin
    s"""WITH eq AS MATERIALIZED (
       |  SELECT vec_id,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS double) * $EQ) AS BIGINT)) AS e
       |  FROM embeddings),
       |dims AS (SELECT CAST(j AS INT) AS j FROM range(1, ${Dim + 1}) t(j)),
       |nrow AS (SELECT count(*) AS n FROM eq),
       |m AS MATERIALIZED (
       |  SELECT dims.j,
       |    CAST(round(CAST(sum(e[dims.j]) AS double) / (SELECT greatest(n, 1) FROM nrow)) AS BIGINT) AS mq
       |  FROM eq CROSS JOIN dims GROUP BY dims.j),
       |ma AS MATERIALIZED (SELECT list(mq ORDER BY j) AS marr FROM m),
       |v0 AS (SELECT j, CAST(${math.round(VQ.toDouble / 8.0)} AS BIGINT) AS v FROM dims),
       |${(1 to K).map(iter).mkString(",\n")}
       |SELECT CAST(m.j - 1 AS BIGINT) AS dim, m.mq AS mean_mq, v$K.v AS v_mu
       |FROM m JOIN v$K ON v$K.j = m.j""".stripMargin
  }

  private val pcaQ = Q(
    "embed_pca_power",
    (s, d) => pcaOf(Tables.embeddings(s, d)),
    Some(oracleSql)
  )

  /** Persisted-model twin: the fitted (mean, dominant vector) model —
    * which IS this operator's output — round-trips through a parquet
    * model table and the LOADED rows are emitted, certifying integer-
    * exact model storage. Shares `embed_pca_power`'s oracle verbatim;
    * registered via [[ModelStore]].
    */
  def pcaStoredOf(s: SparkSession, d: String, path: String): DataFrame = {
    pcaOf(Tables.embeddings(s, d)).coalesce(1).write.mode("overwrite").parquet(path)
    s.read.parquet(path).select(col("dim"), col("mean_mq"), col("v_mu"))
  }

  private[operators] def pcaOracleSqlShared: String = pcaQ.oracle.get

  private val anisotropyQ = Q(
    "embed_anisotropy",
    (s, d) => anisotropyOf(Tables.embeddings(s, d)),
    Some(anisotropyOracle)
  )

  /** Per-dimension mean/variance profile of the embedding matrix — the
    * quantization-prep diagnostic read before PQ/int8 codebook design
    * (a dimension whose variance dwarfs the rest wrecks a uniform
    * subspace split; a near-zero-variance dimension is free to prune)
    * and the drift axis PCA summarizes away. One posexplode + one
    * 64-key aggregate, map-side combinable; elements quantized to
    * integer milli-units ([[eqOf]]) so all sums are exact, variance
    * via (n·Σx² − (Σx)²) div n² — integer end-to-end.
    */
  def varianceProfileOf(embs: DataFrame): DataFrame =
    eqOf(embs)
      .select(posexplode(col("e")).as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        sum("x").as("s"),
        sum(expr("cast(x as decimal(38,0)) * x")).as("q")
      )
      .select(
        col("dim").cast("long").as("dim"),
        col("n"),
        expr("s div n").as("mean_mq"),
        expr("cast((n * q - cast(s as decimal(38,0)) * s) div (cast(n as decimal(38,0)) * n) as bigint)")
          .as("var_mq2")
      )

  private val varianceQ = Q(
    "embed_variance_profile",
    (s, d) => varianceProfileOf(graft.Tables.embeddings(s, d)),
    Some(
      s"""WITH eq AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(round(CAST(x AS double) * $EQ) AS BIGINT)) AS e
         |  FROM embeddings),
         |px AS (
         |  SELECT unnest(range(1, len(e) + 1)) AS d1, unnest(e) AS x FROM eq),
         |agg AS (
         |  SELECT d1 - 1 AS dim, count(*) AS n, sum(x) AS s, sum(CAST(x AS HUGEINT) * x) AS q
         |  FROM px GROUP BY 1)
         |SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
         |  CAST(s // n AS BIGINT) AS mean_mq,
         |  CAST((n * q - CAST(s AS HUGEINT) * s) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS var_mq2
         |FROM agg""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(pcaQ, anisotropyQ, varianceQ)
}
