package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Interpolated Kneser-Ney bigram scoring — the standard smoothed n-gram
  * model (Kneser & Ney 1995; Chen & Goodman 1999's interpolated form)
  * that CCNet-style perplexity filtering actually uses, upgrading the
  * Laplace model behind `docs_lm_score`:
  *
  *   P_KN(w2|w1) = (c(w1 w2) − D) / c(w1·)
  *               + D · N1+(w1·) / c(w1·) · N1+(·w2) / B
  *
  * with absolute discount D = 0.75, context count c(w1·) = Σ_w c(w1 w),
  * continuation counts N1+(w1·) = |{w : c(w1 w) > 0}| and
  * N1+(·w2) = |{w : c(w w2) > 0}|, and B = |distinct bigrams|. The
  * continuation distribution N1+(·w2)/B is Kneser-Ney's key idea: the
  * back-off weight of a word is how many CONTEXTS it follows, not how
  * often it occurs (so "Francisco" — frequent but only after "San" —
  * backs off low). Scoring the training corpus itself means every doc
  * bigram has c ≥ 1 > D, so the discounted term never clips.
  *
  * Scale shape: everything derives from the corpus bigram count table —
  * ONE map-side-combined aggregation keyed by the bigram vocabulary.
  * The three model tables (per-w1 context stats, per-w2 continuation
  * counts, the 1-row B total) are aggregations OVER that bounded count
  * table, not over the corpus; scoring is then word-keyed equi-joins
  * from the exploded doc bigrams into those dimensions plus one per-doc
  * aggregate. No window, no all-pairs, no key beyond vocabulary
  * cardinality — the docs_lm_score shape with a better estimator. In
  * production the model tables persist once and amortize across scoring
  * passes.
  *
  * Cross-engine determinism: the probability is assembled in one
  * fixed-association double expression — (cb−D)/ctx + ((D·n1f)/ctx) ·
  * (n1b/B) — written identically in both engines, so the pre-round
  * doubles are bit-identical; avg is rounded to 4 dp like every score
  * column in the registry.
  */
object SmoothedLm {

  private val D = 0.75

  /** Per-document bigram occurrences of a (doc_id, text) frame. */
  private def bigramsOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), words(col("text")).as("ws"))
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

  /** KN-scored frame of any (doc_id, text) input — factored for specs. */
  def knScoreOf(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bg = bigramsOf(docs)
    knScoreWithModel(bg, bg.groupBy("bg").agg(count(lit(1)).as("cb")))
  }

  /** Scoring under an EXPLICIT bigram-count model table `bc(bg, cb)` —
    * the trained KN state is exactly that one table (the w1/w2
    * continuation rollups and the bigram-type total derive from it), so
    * the persisted-model twin stores `bc` and scores from the loaded
    * copy ([[ModelStore]]).
    */
  private[operators] def knScoreWithModel(
      bg: org.apache.spark.sql.DataFrame,
      bc: org.apache.spark.sql.DataFrame
  ): org.apache.spark.sql.DataFrame = {
      val byW1 = bc
        .withColumn("w1", element_at(split(col("bg"), " "), 1))
        .groupBy("w1")
        .agg(sum(col("cb")).as("ctx"), count(lit(1)).as("n1f"))
      val byW2 = bc
        .withColumn("w2", element_at(split(col("bg"), " "), 2))
        .groupBy("w2")
        .agg(count(lit(1)).as("n1b"))
      val btot = bc.agg(count(lit(1)).as("bt"))

      val p =
        (col("cb").cast("double") - lit(D)) / col("ctx") +
          ((lit(D) * col("n1f")) / col("ctx")) * (col("n1b").cast("double") / col("bt"))

      bg.join(bc, Seq("bg"))
        .withColumn("w1", element_at(split(col("bg"), " "), 1))
        .withColumn("w2", element_at(split(col("bg"), " "), 2))
        .join(byW1, Seq("w1"))
        .join(byW2, Seq("w2"))
        // 1-row dimension through the registry's non-foldable hash-join
        // key convention (a bare crossJoin plans the one
        // BroadcastNestedLoopJoin the plan suite reserves for knn).
        .withColumn("j", (col("cb") - col("cb") + 1).cast("int"))
        .join(broadcast(btot.select((col("bt") - col("bt") + 1).cast("int").as("j"), col("bt"))), Seq("j"))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_bigrams"),
          round(avg(log(p)), 4).as("kn_score")
        )
  }

  private val knQ = Q(
    "docs_kn_score",
    (s, d) => knScoreOf(Tables.documents(s, d)),
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      s"""WITH toks AS (SELECT doc_id, string_split($norm, ' ') AS ws FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS bg
         |  FROM toks WHERE len(ws) >= 2),
         |bc AS (SELECT bg, count(*) AS cb FROM bg GROUP BY bg),
         |w1t AS (
         |  SELECT string_split(bg, ' ')[1] AS w1, sum(cb) AS ctx, count(*) AS n1f
         |  FROM bc GROUP BY 1),
         |w2t AS (
         |  SELECT string_split(bg, ' ')[2] AS w2, count(*) AS n1b
         |  FROM bc GROUP BY 1),
         |bt AS (SELECT count(*) AS bt FROM bc)
         |SELECT doc_id, count(*) AS n_bigrams,
         |  round(avg(ln(
         |    (cast(cb AS double) - $D) / ctx +
         |    (($D * n1f) / ctx) * (cast(n1b AS double) / bt.bt))), 4) AS kn_score
         |FROM bg
         |JOIN bc USING (bg)
         |JOIN w1t ON string_split(bg.bg, ' ')[1] = w1t.w1
         |JOIN w2t ON string_split(bg.bg, ' ')[2] = w2t.w2
         |CROSS JOIN bt
         |GROUP BY doc_id""".stripMargin
    }
  )

  /** Persisted-model twin: the bigram-count model table round-trips
    * through parquet before scoring. Shares `docs_kn_score`'s oracle
    * verbatim; registered via [[ModelStore]].
    */
  def knScoreStoredOf(
      s: org.apache.spark.sql.SparkSession,
      d: String,
      path: String
  ): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    val bg = bigramsOf(docs)
    bg.groupBy("bg").agg(count(lit(1)).as("cb")).write.mode("overwrite").parquet(path)
    knScoreWithModel(bg, s.read.parquet(path))
  }

  private[operators] def knOracleSqlShared: String = knQ.oracle.get

  val all: Seq[Q] = Seq(knQ)
}
