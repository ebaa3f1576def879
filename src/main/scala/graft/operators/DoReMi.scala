package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions.words
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
  * Optimizing Data Mixtures Speeds Up Language Model Pretraining",
  * arXiv:2305.10429): one multiplicative-weights update over domain
  * mixture weights from per-domain EXCESS LOSS — how much worse a weak
  * proxy model does than a reference model on that domain. Domains
  * where the proxy lags most get upweighted (they carry the most
  * learnable signal); domains both models handle equally are already
  * easy or already memorized.
  *
  * The published method uses two trained LMs. This container has no
  * model runtime, so the proxy/reference pair is the corpus's own
  * n-gram ladder — proxy = unigram model (loss −avg log c(w)/T),
  * reference = Laplace bigram model (−avg log (c(w1w2)+1)/(c(w1)+V),
  * the docs_lm_score model): strictly weaker vs strictly stronger
  * corpus models, the same shape as DoReMi's small-proxy/reference
  * pair. A deployment drops real per-document model losses into the
  * same (doc_id, source, excess) frame and keeps everything downstream.
  *
  * Update: with per-domain excess ε_d (clamped at 0, documents with <2
  * tokens contribute 0), weight α_d = (1−c)·exp(η·ε_d)/Σ_d exp(η·ε_d)
  * + c/K — the paper's exponentiated-gradient step with uniform
  * smoothing c.
  *
  * Scale shape: the two count-table aggregations are map-side-combined
  * word shuffles (the docs_lm_score plan); per-document losses are
  * fact-to-dimension equi-joins plus one per-doc aggregate; everything
  * after that lives on a K-row (one per domain) frame — K is the
  * domain count, bounded by construction, so the softmax/normalization
  * is a broadcast of a constant-size table no matter the corpus size.
  * Floats are rounded (4 dp) at the domain level before exp so both
  * engines exponentiate identical doubles.
  */
object DoReMi {

  /** 1-row-dimension broadcast join key that does not constant-fold
    * (the docs_lm_score `j` trick). */
  private def jKey(c: Column): Column = (c - c + lit(1)).cast("int")

  /** Per-domain excess loss and one multiplicative-weights step.
    * Output: (source, n_docs, excess, weight), weights summing to ~1.
    */
  def domainWeights(docs: DataFrame, eta: Double = 1.0, smooth: Double = 0.2): DataFrame = {
    val toks = docs.select(col("doc_id"), col("source"), words(col("text")).as("ws"))

    val uni = toks
      .select(explode(col("ws")).as("w"))
      .groupBy("w")
      .agg(count(lit(1)).as("cu"))
    // Token total T (unigram denominator) and vocabulary V (Laplace
    // denominator) — two 1-row aggregates broadcast into the fact side.
    val totals = uni.agg(sum(col("cu")).as("t"), count(lit(1)).as("v"))

    // Proxy loss: unigram surprisal −avg log(c(w)/T) per document.
    val proxy = toks
      .select(col("doc_id"), explode(col("ws")).as("w"))
      .join(uni, Seq("w"))
      .withColumn("j", jKey(col("cu")))
      .join(broadcast(totals.select(jKey(col("t")).as("j"), col("t"))), Seq("j"))
      .groupBy("doc_id")
      .agg((-avg(log(col("cu").cast("double") / col("t")))).as("l_proxy"))

    // Reference loss: Laplace bigram −avg log((c(w1w2)+1)/(c(w1)+V)).
    val bg = toks
      .filter(size(col("ws")) >= 2)
      .select(
        col("doc_id"),
        explode(
          zip_with(
            slice(col("ws"), lit(1), size(col("ws")) - 1),
            slice(col("ws"), lit(2), size(col("ws")) - 1),
            (a, b) => concat(a, lit(" "), b)
          )
        ).as("bg")
      )
    val bgCounts = bg.groupBy("bg").agg(count(lit(1)).as("cb"))
    val ref = bg
      .join(bgCounts, Seq("bg"))
      .withColumn("w1", element_at(split(col("bg"), " "), 1))
      .join(uni.withColumnRenamed("w", "w1"), Seq("w1"))
      .withColumn("j", jKey(col("cu")))
      .join(broadcast(totals.select(jKey(col("v")).as("j"), col("v"))), Seq("j"))
      .groupBy("doc_id")
      .agg((-avg(log((col("cb") + lit(1.0)) / (col("cu") + col("v"))))).as("l_ref"))

    // Per-domain clamped excess, rounded BEFORE exp so the K-row softmax
    // input is bit-identical across engines.
    val domain = docs
      .select(col("doc_id"), col("source"))
      .join(proxy, Seq("doc_id"), "left")
      .join(ref, Seq("doc_id"), "left")
      .withColumn(
        "ex",
        greatest(coalesce(col("l_proxy") - col("l_ref"), lit(0.0)), lit(0.0))
      )
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), round(avg(col("ex")), 4).as("excess"))

    // K-row tail: exp, normalize, smooth. The normalizer is itself a
    // 1-row aggregate of a bounded frame — broadcast, never a shuffle
    // of the corpus.
    val expd = domain.withColumn("e", exp(lit(eta) * col("excess")))
    val z = expd.agg(sum(col("e")).as("z"), count(lit(1)).as("k"))
    expd
      .withColumn("j", jKey(col("e")))
      .join(broadcast(z.select(jKey(col("z")).as("j"), col("z"), col("k"))), Seq("j"))
      .select(
        col("source"),
        col("n_docs"),
        col("excess"),
        round(
          lit(1.0 - smooth) * col("e") / col("z") + lit(smooth) / col("k"),
          4
        ).as("weight")
      )
  }

  private val doremiQ = Q(
    "docs_doremi_weights",
    (s, d) => domainWeights(Tables.documents(s, d)),
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      s"""WITH toks AS (SELECT doc_id, source, string_split($norm, ' ') AS ws FROM documents),
         |u AS (SELECT w, count(*) AS cu FROM (SELECT unnest(ws) AS w FROM toks) _t GROUP BY w),
         |tot AS (SELECT sum(cu) AS t, count(*) AS v FROM u),
         |proxy AS (
         |  SELECT doc_id, -avg(ln(cast(cu AS double) / tot.t)) AS l_proxy
         |  FROM (SELECT doc_id, unnest(ws) AS w FROM toks) tw
         |  JOIN u USING (w) CROSS JOIN tot
         |  GROUP BY doc_id),
         |bgl AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS bg
         |  FROM toks WHERE len(ws) >= 2),
         |b AS (SELECT bg, count(*) AS cb FROM bgl GROUP BY bg),
         |ref AS (
         |  SELECT doc_id, -avg(ln((cb + 1.0) / (cu + tot.v))) AS l_ref
         |  FROM bgl
         |  JOIN b USING (bg)
         |  JOIN u ON string_split(bgl.bg, ' ')[1] = u.w
         |  CROSS JOIN tot
         |  GROUP BY doc_id),
         |dom AS (
         |  SELECT d.source, count(*) AS n_docs,
         |    round(avg(greatest(coalesce(p.l_proxy - r.l_ref, 0.0), 0.0)), 4) AS excess
         |  FROM documents d
         |  LEFT JOIN proxy p USING (doc_id)
         |  LEFT JOIN ref r USING (doc_id)
         |  GROUP BY d.source),
         |e AS (SELECT source, n_docs, excess, exp(1.0 * excess) AS e FROM dom),
         |z AS (SELECT sum(e) AS z, count(*) AS k FROM e)
         |SELECT source, n_docs, excess,
         |  round(0.8 * e / z.z + 0.2 / z.k, 4) AS weight
         |FROM e CROSS JOIN z""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(doremiQ)
}
