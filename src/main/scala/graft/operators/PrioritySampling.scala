package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority sampling (Duffield, Lund & Thorup, JACM 2007): a weighted
  * sample WITHOUT replacement of k items per group with near-optimal
  * variance for subset-sum estimation — the principled way to draw a
  * quality-weighted training subset whose token/loss totals remain
  * unbiasedly estimable from the sample alone (the per-document sibling
  * of the per-language temperature/UniMax mixture samplers).
  *
  * Each item gets priority q = w / u with u uniform in (0, 1]; the k
  * highest-priority items are the sample, τ is the (k+1)-th priority,
  * and ŵ = max(w, τ) is the estimator weight: E[Σ_selected ŵ] = Σ w
  * exactly (their Theorem 1), with zero variance when k exceeds the
  * group size (sample = population, ŵ = w).
  *
  * Determinism discipline: u = (H + 1) / 2^48 with H the 48-bit md5
  * prefix of doc_id, and the priority is computed as the INTEGER floor
  * division p = (w · 2^48) div (H + 1) — w is capped at 10^4 basis
  * points so the numerator stays under 2^62. No ln/exp/pow crosses the
  * engine boundary (libm is not correctly rounded; integer division
  * is), so ranks and τ are bit-identical in Spark and DuckDB.
  *
  * Scale shape (the reason this file exists — a naive top-k is a
  * per-group TOTAL order, the exact anti-pattern the round-7 verdict
  * retired): priorities are first bucketed by BIT LENGTH (length of
  * bin(p)), a ≤62-value integer computed with no float math. Per-group
  * bucket counts form a bounded (groups × 62) frame; a cumulative
  * window over THAT frame classifies each bucket keep / edge / drop,
  * and only keep+edge docs survive the broadcast join back. Because
  * P(q > t) = min(1, w/t), each doubling bucket below the top holds
  * geometrically fewer items, so the surviving frame is O(k) per group
  * in expectation and the final exact rank window sorts only that. The
  * corpus itself is touched by one map-only projection, one bounded
  * aggregation, and one broadcast-join gate — it never total-orders.
  */
object PrioritySampling {

  private val K = 100
  private val Pow48 = 281474976710656L // 2^48

  /** Top-k priority sample per group over (groupCol, idCol, wCol); wCol
    * must be a long in [1, 10^4]. Returns one row per selected item
    * with its priority, exact per-group rank, τ, and estimator weight.
    */
  def prioritySample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      wCol: String,
      k: Int = K
  ): DataFrame = {
    // Sentinel-coalesced group key (the topkPerGroup lesson: an
    // equi-join on a null key silently drops null groups).
    val withP = df
      .withColumn("__g", coalesce(col(groupCol).cast("string"), lit(" ")))
      .withColumn(
        "__h",
        expr(s"conv(substring(md5(cast($idCol as string)), 1, 12), 16, 10)")
          .cast("long") + lit(1L)
      )
      .withColumn("__p", expr(s"(($wCol) * ${Pow48}L) div __h"))
      .withColumn("__b", length(bin(col("__p"))))
      .persist()
    val hist = withP.groupBy("__g", "__b").agg(count(lit(1)).as("__c"))
    val byBucketDesc = Window.partitionBy("__g").orderBy(col("__b").desc)
    // Bounded frame: ≤62 buckets per group.
    val cells = hist
      .withColumn(
        "__before",
        coalesce(
          sum(col("__c")).over(byBucketDesc.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)
        )
      )
      .filter(col("__before") < k) // keep + the straddling edge bucket
      .select("__g", "__b")
    // keep/edge docs only: O(k) per group in expectation (geometric
    // bucket tail), exact rank over that bounded survivor frame.
    val survivors = withP.join(broadcast(cells), Seq("__g", "__b"))
    val rk = row_number().over(
      Window.partitionBy("__g").orderBy(col("__p").desc, col(idCol).asc)
    )
    val ranked = survivors.withColumn("__rk", rk.cast("long"))
    val selected = ranked.filter(col("__rk") <= k)
    // τ = the (k+1)-th priority per group = max priority among the
    // non-selected (bounded map-side-combined max; null when the whole
    // group was selected, where DLT's estimator degenerates to w).
    val tauEdge = ranked.filter(col("__rk") > k).select(col("__g"), col("__p"))
    val tauDropped = withP
      .join(broadcast(cells), Seq("__g", "__b"), "left_anti")
      .select(col("__g"), col("__p"))
    val tau = tauEdge
      .unionByName(tauDropped)
      .groupBy("__g")
      .agg(max(col("__p")).as("__tau"))
    selected
      .join(broadcast(tau), Seq("__g"), "left")
      .select(
        col("__g").as(groupCol),
        col(idCol),
        col(wCol),
        col("__p").as("priority"),
        col("__rk").as("rank"),
        greatest(col(wCol), coalesce(col("__tau"), col(wCol))).as("est_w")
      )
  }

  private val samplePriority = Q(
    "docs_sample_priority",
    (s, d) => {
      // The docs_sample_quality score in basis points, floored at 1 so
      // every document has positive inclusion probability.
      val t = col("text")
      val ws = graft.functions.TextFunctions.words(t)
      val punct = length(regexp_replace(t, "[^\\p{P}]", ""))
      val quality = round(
        least(size(ws).cast("double") / 100, lit(1.0)) *
          (lit(1.0) - punct.cast("double") / length(t)),
        4
      )
      val perDoc = Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          col("lang"),
          greatest(round(quality * 10000).cast("long"), lit(1L)).as("w_bp")
        )
      prioritySample(perDoc, "lang", "doc_id", "w_bp")
    },
    Some {
      val ws = s"string_split(${LlmQueries.normSql("text")}, ' ')"
      val quality =
        s"""round(least(cast(len($ws) as double) / 100, 1.0) *
           |        (1.0 - cast(length(regexp_replace(text, '[^\\p{P}]', '', 'g')) as double) / length(text)), 4)""".stripMargin
      // The oracle is the NAIVE per-group total order — DuckDB need not
      // be scale-safe; it certifies the bounded-cut plan picks exactly
      // the same k items, ranks, and τ.
      s"""WITH q AS (
         |  SELECT doc_id, coalesce(lang, ' ') AS lang,
         |    greatest(cast(round($quality * 10000) as bigint), 1) AS w_bp
         |  FROM documents),
         |p AS (
         |  SELECT doc_id, lang, w_bp,
         |    (w_bp * ${Pow48}) // (('0x' || substr(md5(cast(doc_id as varchar)), 1, 12))::bigint + 1) AS priority
         |  FROM q),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY lang ORDER BY priority DESC, doc_id) AS rk FROM p),
         |tau AS (SELECT lang, max(priority) AS tau FROM r WHERE rk > $K GROUP BY lang)
         |SELECT r.lang, r.doc_id, r.w_bp, r.priority, cast(r.rk as bigint) AS rank,
         |  greatest(r.w_bp, coalesce(t.tau, r.w_bp)) AS est_w
         |FROM r LEFT JOIN tau t ON r.lang = t.lang
         |WHERE r.rk <= $K""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(samplePriority)
}
