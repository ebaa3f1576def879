package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Nearest-class-mean (Rocchio) classification over the embedding
  * table's labels — the supervised twin of [[KMeans]]: train centroids
  * from a deterministic split, classify the held-out rows by nearest
  * centroid, emit the confusion matrix. This is the lightweight "did
  * my embedding space keep the classes separable" check an embedding
  * pipeline runs after every re-train — and the class-assignment shape
  * (fixed centroids, map-only argmin) is the inference half of any
  * centroid model at 100 TB.
  *
  * Scale shape: centroid training is a (label, dim)-keyed aggregate —
  * ≤ |classes|·dim keys, map-side combined; the 10×64 model collects to
  * the driver (bounded MODEL state) and rides back as ONE literal
  * nested array, so classification is MAP-ONLY — the per-row argmin
  * folds over the label axis inside the row, no join, no shuffle; the
  * confusion matrix is a ≤ |classes|² aggregate.
  *
  * Engine determinism: embeddings quantize to integer milli-units;
  * centroids are half-away-rounded integer means; squared-Euclidean
  * distances are exact int64 (|diff| ≤ 2·10⁴ ⇒ Σ over 64 dims ≤
  * 2.6·10¹⁰); the argmin packs (dist, label) into dist·16 + label so
  * tie-breaks are integer-total-ordered identically in both engines.
  */
object CentroidClassify {

  private val Dim = 64
  private val Labels = 10
  private val EQ = 1000L

  private def roundAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  private def eqOf(embs: DataFrame): DataFrame =
    embs.select(
      col("vec_id"),
      col("label"),
      transform(col("embedding"), x => round(x.cast("double") * EQ).cast("long")).as("e")
    )

  /** vec_id % 5 == 0 → held-out test row (a fifth of the corpus). */
  private def isTest: Column = col("vec_id") % 5 === 0

  /** Train centroids: label → 64 integer means (driver-side bounded
    * model, the KMeans/Classifier discipline).
    */
  private[graft] def centroids(eq: DataFrame): Map[Int, Array[Long]] = {
    val rows = eq
      .filter(!isTest)
      .select(col("label"), posexplode(col("e")).as(Seq("j", "x")))
      .groupBy("label", "j")
      .agg(sum("x").as("s"), count(lit(1)).as("n"))
      .collect()
    rows
      .groupBy(_.getAs[Int]("label"))
      .map { case (l, rs) =>
        val arr = new Array[Long](Dim)
        rs.foreach { r =>
          arr(r.getAs[Int]("j")) =
            roundAway(r.getAs[Long]("s").toDouble / r.getAs[Long]("n").toDouble)
        }
        l -> arr
      }
  }

  /** Confusion matrix (label, pred, n) of nearest-centroid assignment
    * over the held-out rows.
    */
  def confusionOf(embs: DataFrame): DataFrame = {
    // The cache only serves the centroid collect; the returned frame's
    // map-only classify pass recomputes eqOf cheaply, so the cache is
    // scoped to the training action (no block outlives this call).
    val eqCached = eqOf(embs).persist()
    val ctr =
      try centroids(eqCached)
      finally eqCached.unpersist(false)
    confusionWithCentroids(embs, ctr)
  }

  /** The classify pass under an EXPLICIT centroid model — the seam the
    * persisted-model twin loads through ([[ModelStore]]).
    */
  private[operators] def confusionWithCentroids(
      embs: DataFrame,
      ctr: Map[Int, Array[Long]]
  ): DataFrame = {
    val eq = eqOf(embs)
    val present = (0 until Labels).filter(ctr.contains)
    // Empty training split (e.g. an empty embeddings table): no
    // centroids exist, so there is nothing to classify — return an
    // empty frame with the output schema instead of building a
    // degenerate descending sequence(0, -1) fold (the oracle's join
    // against an empty `carr` likewise yields zero rows).
    if (present.isEmpty)
      return eq
        .filter(lit(false))
        .select(
          col("label").cast("long").as("label"),
          lit(0L).as("pred"),
          lit(0L).as("n")
        )
    // The packed argmin below encodes dist*16 + label and unpacks with
    // % 16 — sound ONLY while every label fits in 4 bits. If the
    // fixture's label law ever grows past 15, both engines would agree
    // on the same ALIASED key and the hash gate could not catch it, so
    // fail loudly at model time instead.
    require(
      present.forall(_ < 16),
      s"CentroidClassify packs labels into 4 bits; got labels ${present.filter(_ >= 16).mkString(",")} >= 16"
    )
    // label-major flat centroid table: carr[l*Dim + j] = c_l[j].
    val flat = typedLit(present.flatMap(l => ctr(l).toSeq))
    val lbls = typedLit(present.map(_.toLong))
    val dist = (li: Column) =>
      aggregate(
        sequence(lit(0), lit(Dim - 1)),
        lit(0L),
        (acc, j) => {
          val d = element_at(col("e"), j.cast("int") + 1) -
            element_at(flat, (li * Dim + j).cast("int") + 1)
          acc + d * d
        }
      )
    val bestKey = aggregate(
      sequence(lit(0), lit(present.size - 1)),
      lit(Long.MaxValue),
      (acc, li) => least(acc, dist(li) * 16 + element_at(lbls, li.cast("int") + 1))
    )
    eq.filter(isTest)
      .withColumn("pred", (bestKey % 16).cast("int"))
      .groupBy("label", "pred")
      .agg(count(lit(1)).as("n"))
      .select(
        col("label").cast("long").as("label"),
        col("pred").cast("long").as("pred"),
        col("n")
      )
  }

  /** Simplified silhouette of the trained nearest-class-mean model
    * (Hruschka 2004's centroid-based silhouette, over the Rocchio
    * centroids instead of O(n²) pairwise distances): per vector, a =
    * distance to the NEAREST centroid, b = distance to the second
    * nearest, s = 1 − a/b ∈ [0, 1] — the class-separability report an
    * embedding pipeline reads next to the confusion matrix (mean s
    * near 0 = classes collapse onto shared centroids).
    *
    * Scale shape: the ≤10×64 centroid model rides in as literals (the
    * confusion-matrix discipline) so scoring is MAP-ONLY; the rollup is
    * a ≤ |classes| aggregate. Determinism: squared distances are exact
    * int64; s quantizes PER ROW as round((1 − sqrt(a/b))·10⁴) — one
    * IEEE division + sqrt on identical inputs — and the per-cluster
    * mean is an integer div, order-independent.
    */
  def silhouetteOf(embs: DataFrame): DataFrame = {
    val eqCached = eqOf(embs).persist()
    val ctr =
      try centroids(eqCached)
      finally eqCached.unpersist(false)
    val eq = eqOf(embs)
    val present = (0 until Labels).filter(ctr.contains)
    if (present.size < 2)
      return eq
        .filter(lit(false))
        .select(lit(0L).as("cluster"), lit(0L).as("n"), lit(0L).as("mean_sil_pm"))
    val flat = typedLit(present.flatMap(l => ctr(l).toSeq))
    val lbls = typedLit(present.map(_.toLong))
    val dist = (li: Column) =>
      aggregate(
        sequence(lit(0), lit(Dim - 1)),
        lit(0L),
        (acc, j) => {
          val d = element_at(col("e"), j.cast("int") + 1) -
            element_at(flat, (li * Dim + j).cast("int") + 1)
          acc + d * d
        }
      )
    val dists = transform(sequence(lit(0), lit(present.size - 1)), li => dist(li))
    val bestKey = aggregate(
      sequence(lit(0), lit(present.size - 1)),
      lit(Long.MaxValue),
      (acc, li) => least(acc, dist(li) * 16 + element_at(lbls, li.cast("int") + 1))
    )
    eq.withColumn("ds", dists)
      .withColumn("cluster", (bestKey % 16).cast("long"))
      .withColumn("d1", element_at(array_sort(col("ds")), 1))
      .withColumn("d2", element_at(array_sort(col("ds")), 2))
      .withColumn(
        "s_pm",
        when(
          col("d2") > 0,
          round((lit(1.0) - sqrt(col("d1").cast("double") / col("d2").cast("double"))) * 10000)
            .cast("long")
        ).otherwise(lit(0L))
      )
      .groupBy("cluster")
      .agg(count(lit(1)).as("n"), expr("sum(s_pm) div count(1)").as("mean_sil_pm"))
  }

  private def silhouetteOracle: String =
    s"""WITH eq AS MATERIALIZED (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS double) * $EQ) AS BIGINT)) AS e
       |  FROM embeddings),
       |dims AS (SELECT CAST(j AS INT) AS j FROM range(1, ${Dim + 1}) t(j)),
       |ctr AS MATERIALIZED (
       |  SELECT label, dims.j,
       |    CAST(round(CAST(sum(e[dims.j]) AS double) / count(*)) AS BIGINT) AS c
       |  FROM eq CROSS JOIN dims WHERE vec_id % 5 != 0 GROUP BY label, dims.j),
       |carr AS MATERIALIZED (
       |  SELECT label AS clabel, list(c ORDER BY j) AS cs FROM ctr GROUP BY label),
       |scored AS (
       |  SELECT t.vec_id, c.clabel,
       |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
       |      j -> (t.e[j] - c.cs[j]) * (t.e[j] - c.cs[j]))) AS BIGINT) AS dist
       |  FROM eq t CROSS JOIN carr c),
       |rk AS (
       |  SELECT vec_id, clabel, dist,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rn,
       |    min(dist * 16 + clabel) OVER (PARTITION BY vec_id) AS bestkey
       |  FROM scored),
       |sv AS (
       |  SELECT vec_id, any_value(bestkey) % 16 AS cluster,
       |    min(CASE WHEN rn = 1 THEN dist END) AS d1,
       |    min(CASE WHEN rn = 2 THEN dist END) AS d2
       |  FROM rk GROUP BY vec_id)
       |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN d2 > 0
       |    THEN CAST(round((1.0 - sqrt(CAST(d1 AS double) / CAST(d2 AS double))) * 10000) AS BIGINT)
       |    ELSE 0 END) // count(*) AS BIGINT) AS mean_sil_pm
       |FROM sv GROUP BY cluster""".stripMargin

  private def oracleSql: String =
    s"""WITH eq AS MATERIALIZED (
       |  SELECT vec_id, label,
       |    list_transform(embedding, x -> CAST(round(CAST(x AS double) * $EQ) AS BIGINT)) AS e
       |  FROM embeddings),
       |dims AS (SELECT CAST(j AS INT) AS j FROM range(1, ${Dim + 1}) t(j)),
       |ctr AS MATERIALIZED (
       |  SELECT label, dims.j,
       |    CAST(round(CAST(sum(e[dims.j]) AS double) / count(*)) AS BIGINT) AS c
       |  FROM eq CROSS JOIN dims WHERE vec_id % 5 != 0 GROUP BY label, dims.j),
       |carr AS MATERIALIZED (
       |  SELECT label AS clabel, list(c ORDER BY j) AS cs FROM ctr GROUP BY label),
       |scored AS (
       |  SELECT t.vec_id, t.label,
       |    CAST(list_sum(list_transform(range(1, ${Dim + 1}),
       |      j -> (t.e[j] - c.cs[j]) * (t.e[j] - c.cs[j]))) AS BIGINT) * 16 + c.clabel AS key
       |  FROM eq t CROSS JOIN carr c WHERE t.vec_id % 5 = 0),
       |pred AS (SELECT vec_id, label, min(key) % 16 AS pred FROM scored GROUP BY 1, 2)
       |SELECT CAST(label AS BIGINT) AS label, CAST(pred AS BIGINT) AS pred,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM pred GROUP BY 1, 2""".stripMargin

  private val confusionQ = Q(
    "embed_centroid_classify",
    (s, d) => confusionOf(Tables.embeddings(s, d)),
    Some(oracleSql)
  )

  /** Persisted-model twin: the Rocchio centroids round-trip through a
    * (label, dim, c_mu) parquet model table and classification runs
    * from the LOADED state only. Shares `embed_centroid_classify`'s
    * oracle verbatim; registered via [[ModelStore]].
    */
  def confusionStoredOf(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      path: String
  ): DataFrame = {
    val embs = Tables.embeddings(s, d)
    val eqCached = eqOf(embs).persist()
    val ctr =
      try centroids(eqCached)
      finally eqCached.unpersist(false)
    import s.implicits._
    ctr.toSeq
      .flatMap { case (l, arr) => arr.zipWithIndex.map { case (v, j) => (l, j, v) } }
      .toDF("label", "j", "c_mu")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(path)
    val loaded = s.read
      .parquet(path)
      .collect()
      .groupBy(_.getAs[Int]("label"))
      .map { case (l, rs) =>
        val arr = new Array[Long](Dim)
        rs.foreach(r => arr(r.getAs[Int]("j")) = r.getAs[Long]("c_mu"))
        l -> arr
      }
    confusionWithCentroids(embs, loaded)
  }

  private[operators] def confusionOracleSqlShared: String = confusionQ.oracle.get

  private val silhouetteQ = Q(
    "embed_silhouette",
    (s, d) => silhouetteOf(Tables.embeddings(s, d)),
    Some(silhouetteOracle)
  )

  val all: Seq[Q] = Seq(confusionQ, silhouetteQ)
}
