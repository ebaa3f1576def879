package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions.words
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stupid Backoff trigram scoring (Brants, Popat, Xu, Och & Dean 2007,
  * "Large Language Models in Machine Translation" — the smoothing-free
  * backoff designed FOR distributed web-scale counts, where Kneser-Ney's
  * normalized discounts are impractical): S(w₃|w₁w₂) = c₁₂₃/c₁₂ when
  * the trigram is attested, else α·S(w₃|w₂) with α = 0.4, bottoming out
  * at α²·(c₃+1)/(N+V) (add-one at the unigram floor, the
  * `docs_ppl_holdout` OOV discipline). The registry's LM family now
  * spans smoothing philosophies: add-one unigram (ppl), interpolated
  * Kneser-Ney bigram (kn_score), and count-ratio backoff trigram — the
  * one actually run at 100-TB count scale.
  *
  * Train/eval separation (without it backoff NEVER fires in-corpus —
  * every attested trigram has c₁₂₃ ≥ 1): the model trains on the 90%
  * doc split and scores the held-out 10%, so unseen trigrams exercise
  * every backoff level, and the output counts how often each level
  * fired — the diagnostic that says whether the trigram table is big
  * enough to be worth its storage.
  *
  * Scale shape: the n-gram tables are the classic map-side-combinable
  * count aggregates (vocabulary-bounded keys — the tables grow ~log in
  * corpus size); scoring is five vocab-keyed equi-joins from the
  * exploded held-out positions — no window, no self-join of anything
  * corpus-sized. Engine determinism: one ln per position over the
  * identical double expression (α spelled 4e-1/16e-2 so DuckDB types it
  * DOUBLE, not DECIMAL), quantized to integer micro-nats per position
  * BEFORE the order-independent integer sum; the per-doc mean divides
  * with truncation toward zero in both engines.
  */
object StupidBackoff {

  /** The trained model: the three n-gram count tables of the 90% train
    * split as ONE tall frame (kind u/b/t, gram, count) — the shape a
    * deployment persists once and scores against forever.
    */
  private[operators] def ngramModelOf(docs: DataFrame): DataFrame = {
    val train = docs
      .select(col("doc_id"), words(col("text")).as("ws"))
      .filter(col("doc_id") % 10 =!= 0)
    val uni = train
      .select(explode(col("ws")).as("g"))
      .groupBy("g")
      .agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("u"))
    val bi = train
      .filter(size(col("ws")) >= 2)
      .select(
        explode(
          zip_with(
            slice(col("ws"), lit(1), size(col("ws")) - 1),
            slice(col("ws"), lit(2), size(col("ws")) - 1),
            (a, b) => concat(a, lit(" "), b)
          )
        ).as("g")
      )
      .groupBy("g")
      .agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("b"))
    val tri = train
      .filter(size(col("ws")) >= 3)
      .select(
        explode(
          transform(
            sequence(lit(1), size(col("ws")) - 2),
            i =>
              concat(
                element_at(col("ws"), i),
                lit(" "),
                element_at(col("ws"), i + 1),
                lit(" "),
                element_at(col("ws"), i + 2)
              )
          )
        ).as("g")
      )
      .groupBy("g")
      .agg(count(lit(1)).as("c"))
      .withColumn("kind", lit("t"))
    uni.unionByName(bi).unionByName(tri).select("kind", "g", "c")
  }

  def scoresOf(docs: DataFrame): DataFrame =
    scoresWithModel(docs, ngramModelOf(docs))

  /** Scoring under an EXPLICIT n-gram model frame — the seam the
    * persisted-model twin loads through ([[ModelStore]]).
    */
  private[operators] def scoresWithModel(docs: DataFrame, model: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), words(col("text")).as("ws"))
    val ev = toks.filter(col("doc_id") % 10 === 0 && size(col("ws")) >= 3)

    val uni = model.filter(col("kind") === "u").select(col("g").as("w"), col("c").as("cu"))
    val nv = uni.agg(sum(col("cu")).as("n"), count(lit(1)).as("v"))
    val bi = model.filter(col("kind") === "b").select("g", "c")
    val tri = model.filter(col("kind") === "t").select("g", "c")

    val pos = ev
      .select(
        col("doc_id"),
        explode(
          transform(
            sequence(lit(1), size(col("ws")) - 2),
            i =>
              struct(
                element_at(col("ws"), i).as("w1"),
                element_at(col("ws"), i + 1).as("w2"),
                element_at(col("ws"), i + 2).as("w3")
              )
          )
        ).as("t")
      )
      .select(col("doc_id"), col("t.w1"), col("t.w2"), col("t.w3"))

    val joined = pos
      .join(
        tri.select(col("g").as("g123"), col("c").as("c3")),
        concat(col("w1"), lit(" "), col("w2"), lit(" "), col("w3")) === col("g123"),
        "left"
      )
      .join(
        bi.select(col("g").as("g12"), col("c").as("c12")),
        concat(col("w1"), lit(" "), col("w2")) === col("g12"),
        "left"
      )
      .join(
        bi.select(col("g").as("g23"), col("c").as("c23")),
        concat(col("w2"), lit(" "), col("w3")) === col("g23"),
        "left"
      )
      .join(uni.select(col("w").as("w2"), col("cu").as("c2u")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("cu").as("c3u")), Seq("w3"), "left")
      // 1-row (N, V) dimension through a non-foldable broadcast hash key
      .withColumn("j", (col("doc_id") - col("doc_id") + 1).cast("int"))
      .join(
        broadcast(nv.select((col("n") - col("n") + 1).cast("int").as("j"), col("n"), col("v"))),
        Seq("j")
      )

    val value = when(col("c3").isNotNull, col("c3").cast("double") / col("c12").cast("double"))
      .when(
        col("c23").isNotNull,
        (lit(0.4) * col("c23").cast("double")) / col("c2u").cast("double")
      )
      .otherwise(
        (lit(0.16) * (coalesce(col("c3u"), lit(0L)) + lit(1)).cast("double")) /
          (col("n") + col("v")).cast("double")
      )
    val lvl = when(col("c3").isNotNull, 0).when(col("c23").isNotNull, 1).otherwise(2)

    joined
      .select(
        col("doc_id"),
        lvl.as("lvl"),
        round(log(value) * 1e6).cast("long").as("smu")
      )
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_trigrams"),
        sum(when(col("lvl") === 0, 1L).otherwise(0L)).as("n_tri_hit"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_bi_back"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_uni_back"),
        sum(col("smu")).as("sum_smu")
      )
      .select(
        col("doc_id"),
        col("n_trigrams"),
        col("n_tri_hit"),
        col("n_bi_back"),
        col("n_uni_back"),
        expr("sum_smu div n_trigrams").as("mean_score_mu")
      )
  }

  private val scoreQ = Q(
    "docs_stupid_backoff",
    (s, d) => scoresOf(Tables.documents(s, d)),
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      s"""WITH toks AS (SELECT doc_id, string_split($norm, ' ') AS ws FROM documents),
         |tr AS (SELECT doc_id, ws FROM toks WHERE doc_id % 10 != 0),
         |ev AS (SELECT doc_id, ws FROM toks WHERE doc_id % 10 = 0 AND len(ws) >= 3),
         |uni AS (SELECT w, count(*) AS cu FROM (SELECT unnest(ws) AS w FROM tr) _u GROUP BY w),
         |nv AS (SELECT CAST(sum(cu) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS v FROM uni),
         |bi AS (SELECT g, count(*) AS c FROM (
         |  SELECT unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS g
         |  FROM tr WHERE len(ws) >= 2) _b GROUP BY g),
         |tri AS (SELECT g, count(*) AS c FROM (
         |  SELECT unnest(list_transform(range(1, len(ws) - 1),
         |    i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2])) AS g
         |  FROM tr WHERE len(ws) >= 3) _t GROUP BY g),
         |pos AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3
         |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws) - 1)) AS i FROM ev) _p),
         |j AS (SELECT p.doc_id, t.c AS c3, b12.c AS c12, b23.c AS c23,
         |    u2.cu AS c2u, u3.cu AS c3u, nv.n, nv.v
         |  FROM pos p
         |  LEFT JOIN tri t ON t.g = p.w1 || ' ' || p.w2 || ' ' || p.w3
         |  LEFT JOIN bi b12 ON b12.g = p.w1 || ' ' || p.w2
         |  LEFT JOIN bi b23 ON b23.g = p.w2 || ' ' || p.w3
         |  LEFT JOIN uni u2 ON u2.w = p.w2
         |  LEFT JOIN uni u3 ON u3.w = p.w3
         |  CROSS JOIN nv),
         |sc AS (SELECT doc_id,
         |    CASE WHEN c3 IS NOT NULL THEN 0 WHEN c23 IS NOT NULL THEN 1 ELSE 2 END AS lvl,
         |    CAST(round(1e6 * ln(
         |      CASE WHEN c3 IS NOT NULL THEN CAST(c3 AS DOUBLE) / CAST(c12 AS DOUBLE)
         |           WHEN c23 IS NOT NULL THEN (4e-1 * CAST(c23 AS DOUBLE)) / CAST(c2u AS DOUBLE)
         |           ELSE (16e-2 * CAST(coalesce(c3u, 0) + 1 AS DOUBLE)) / CAST(n + v AS DOUBLE)
         |      END)) AS BIGINT) AS smu
         |  FROM j)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
         |  CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tri_hit,
         |  CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bi_back,
         |  CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_uni_back,
         |  CAST(trunc(CAST(sum(smu) AS DOUBLE) / count(*)) AS BIGINT) AS mean_score_mu
         |FROM sc GROUP BY doc_id""".stripMargin
    }
  )

  /** Persisted-model twin: the three count tables round-trip through
    * one parquet model table before scoring. Shares
    * `docs_stupid_backoff`'s oracle verbatim; registered via
    * [[ModelStore]].
    */
  def scoresStoredOf(s: SparkSession, d: String, path: String): DataFrame = {
    val docs = Tables.documents(s, d)
    ngramModelOf(docs).write.mode("overwrite").parquet(path)
    scoresWithModel(docs, s.read.parquet(path))
  }

  private[operators] def backoffOracleSqlShared: String = scoreQ.oracle.get

  val all: Seq[Q] = Seq(scoreQ)
}
