package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Cross-source DISTINCT-overlap estimation from mergeable KMV
  * registers (Beyer et al. 2007, "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations") — the sketch path of
  * `docs_source_overlap`'s exact duplication matrix. The exact matrix
  * joins the corpus against itself on the text hash; at 100 TB the
  * decision "do sources A and B share content?" should come from
  * sketches instead: per-source sharded-KMV registers (the
  * `corpus_distinct_kmv` construction, sources × 256 bounded rows) are
  * UNION-mergeable by element-wise shard-min, and the pairwise
  * intersection follows by inclusion-exclusion
  * |A∩B| ≈ est(A) + est(B) − est(A∪B), clamped at 0.
  *
  * Scale shape: ONE bounded map-side-combined aggregation over the
  * corpus (the same stage-1 the distinct sketch uses — at production
  * scale the registers would be computed once and shared); everything
  * after operates on |sources| × 256 register rows — the source-pair
  * fan-out is a broadcast-sized self-join on the bounded register
  * table, never a second corpus pass. Estimates use the registry's
  * integer KMV form `(k−1)·2^48 div h_k`, so every output column is an
  * exact long in both engines.
  */
object SketchOverlap {

  private val K = SketchQueries.KmvShards // reuse the 256-shard layout
  private val KmvK = 64

  /** Overlap estimates of any (source, text) input — factored for specs. */
  def overlapOf(input: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val h = SketchQueries.hash48(coalesce(col("text"), lit("")))
      // Sentinel-coalesced source: a null source would survive the
      // oracle's pair CTEs but vanish through the Spark hash-key join.
      val regs = input
        .select(coalesce(col("source"), lit(" ")).as("source"), h.as("h"), (h % K).as("shard"))
        .groupBy("source", "shard")
        .agg(min(col("h")).as("minh"))
      // Bounded register table from here on: estimates per source...
      val est = regs
        .groupBy("source")
        .agg(count(lit(1)).as("ns"), sort_array(collect_list(col("minh"))).as("ms"))
        .select(col("source"), SketchQueries.kmvEstimate("ms", col("ns"), KmvK).as("est"))
      // ...and per unordered pair: union registers are the per-shard min
      // over both sources' registers, INCLUDING shards populated by only
      // one side (a shard-equi self-join would silently drop those, and
      // sparse sources don't fill all 256 shards) — so fan registers out
      // through an explicit bounded pair table instead.
      // Bounded pair fan-out through a non-foldable hash key (the
      // registry convention: a bare inequality join would plan the
      // BroadcastNestedLoopJoin the plan suite reserves for knn).
      val srcs = regs.select(col("source")).distinct()
      val pairTable = srcs
        .select(col("source").as("src_a"), (length(col("source")) - length(col("source")) + 1).as("j"))
        .join(
          srcs.select(col("source").as("src_b"), (length(col("source")) - length(col("source")) + 1).as("j")),
          Seq("j")
        )
        .filter(col("src_a") < col("src_b"))
        .drop("j")
      val sideA = pairTable.join(regs.withColumnRenamed("source", "src_a"), Seq("src_a"))
      val sideB = pairTable.join(regs.withColumnRenamed("source", "src_b"), Seq("src_b"))
      val pairs = sideA
        .unionByName(sideB)
        .groupBy("src_a", "src_b", "shard")
        .agg(min(col("minh")).as("minh"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("ns"), sort_array(collect_list(col("minh"))).as("ms"))
        .select(col("src_a"), col("src_b"), SketchQueries.kmvEstimate("ms", col("ns"), KmvK).as("est_union"))
      pairs
        .join(est.select(col("source").as("src_a"), col("est").as("est_a")), Seq("src_a"))
        .join(est.select(col("source").as("src_b"), col("est").as("est_b")), Seq("src_b"))
        .select(
          col("src_a"),
          col("src_b"),
          col("est_a"),
          col("est_b"),
          col("est_union"),
          greatest(col("est_a") + col("est_b") - col("est_union"), lit(0L)).as("est_intersect")
        )
  }

  private val overlapQ = Q(
    "corpus_overlap_kmv",
    (s, d) => overlapOf(Tables.documents(s, d)),
    Some {
      val space = SketchQueries.Hash48Space
      s"""WITH h AS (
         |  SELECT coalesce(source, ' ') AS source,
         |    ('0x' || substr(md5(coalesce(text, '')), 1, 12))::bigint AS h
         |  FROM documents),
         |regs AS (
         |  SELECT source, h % $K AS shard, min(h) AS minh
         |  FROM h GROUP BY 1, 2),
         |est AS (
         |  SELECT source, ns, ms FROM (
         |    SELECT source, count(*) AS ns, list_sort(list(minh)) AS ms
         |    FROM regs GROUP BY 1) _e),
         |est2 AS (
         |  SELECT source,
         |    (CASE WHEN ns >= $KmvK AND ms[$KmvK] > 0
         |          THEN ${(KmvK - 1).toLong * space} // ms[$KmvK]
         |          ELSE cast(ns as bigint) END) AS est
         |  FROM est),
         |srcs AS (SELECT DISTINCT source FROM regs),
         |pairt AS (
         |  SELECT a.source AS src_a, b.source AS src_b
         |  FROM srcs a JOIN srcs b ON a.source < b.source),
         |u AS (
         |  SELECT src_a, src_b, shard, min(minh) AS minh FROM (
         |    SELECT p.src_a, p.src_b, r.shard, r.minh
         |    FROM pairt p JOIN regs r ON r.source = p.src_a
         |    UNION ALL
         |    SELECT p.src_a, p.src_b, r.shard, r.minh
         |    FROM pairt p JOIN regs r ON r.source = p.src_b) _u
         |  GROUP BY 1, 2, 3),
         |us AS (
         |  SELECT src_a, src_b, count(*) AS ns, list_sort(list(minh)) AS ms
         |  FROM u GROUP BY 1, 2),
         |uest AS (
         |  SELECT src_a, src_b,
         |    (CASE WHEN ns >= $KmvK AND ms[$KmvK] > 0
         |          THEN ${(KmvK - 1).toLong * space} // ms[$KmvK]
         |          ELSE cast(ns as bigint) END) AS est_union
         |  FROM us)
         |SELECT src_a, src_b, ea.est AS est_a, eb.est AS est_b, est_union,
         |  greatest(ea.est + eb.est - est_union, 0) AS est_intersect
         |FROM uest
         |JOIN est2 ea ON uest.src_a = ea.source
         |JOIN est2 eb ON uest.src_b = eb.source""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(overlapQ)
}
