package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier — distributed full-batch logistic
  * regression over hashed bag-of-words features, then corpus-wide
  * scoring. This is the quality-filtering shape modern pretraining
  * pipelines use (a small linear classifier scores every document and a
  * threshold or sampling pass keeps the high end); the heuristic
  * `docs_quality` rules are its hand-written cousin. Label here: the
  * document's language flag (en vs rest) — a stand-in for any binary
  * curation label (high/low quality, toxic/clean, domain match) carried
  * the same way. 256 hash buckets bound the model size; a production
  * deployment widens to 2^18 buckets with the same shapes.
  *
  * Features are CENTERED by the global bucket shares (x_b − M_b/M).
  * This is not cosmetic: raw bucket frequencies sum to 1, so any
  * uniform or corpus-mean component of the weight vector acts as a
  * second intercept scaled by the learning rate — measured on this
  * corpus, every uncentered variant saturated the sigmoid on one side
  * within two iterations. Centering zeroes that drift exactly in
  * integer arithmetic, and needs only the 256 global bucket masses — a
  * bounded aggregate computed once.
  *
  * Training is Lloyd-style: K full-batch gradient-descent iterations,
  * each ONE map pass over the feature frame plus 256-key aggregates —
  * the [[KMeans.step]] scale shape. The corpus is never shuffled after
  * the feature frame is built:
  *  - the feature frame (doc → sorted (bucket, count) pairs, built once
  *    and persisted) is corpus-sized but map-only to score;
  *  - the weight vector, the global-mass dot product, and the residual
  *    sum each collapse to a 1-row frame joined in on a computed
  *    constant key (BroadcastHashJoin — never a nested loop);
  *  - gradients key on 256 buckets + 1 bias: bounded, map-side
  *    combined, independent of corpus size. The centering correction
  *    (Σrmu · M_b) needs no corpus pass at all.
  *
  * Engine determinism (what lets a DuckDB oracle certify TRAINING, not
  * just inference): all state is integer micro-units. The logit is an
  * integer; the only libm call is one exp() on that integer-determined
  * argument, immediately re-quantized (`round(…*1e6)` → long), so a
  * sub-ulp libm difference must land within 5e-7 of a rounding
  * boundary to matter. Integer division truncates toward zero in BOTH
  * engines (verified: Spark `div` and DuckDB `//` give -7÷2 = -3), and
  * both round half away from zero.
  */
object Classifier {

  /** Hash buckets (model width). */
  private val B = 256

  /** Training iterations. */
  private val K = 3

  /** Bias learning rate: w0 -= (LrBias * Σr) div N. */
  private val LrBias = 4L

  /** Bucket learning rate — larger because centered features are small
    * (|x_b − m_b| ~ 1/B): chosen by sweep; 8192 separates the classes
    * without saturating.
    */
  private val LrW = 8192L

  /** md5 hex-digit bucket 0..255 — the docs_dsir_weight construction
    * widened to two full hex digits, identical in both engines.
    */
  private val BucketSpark =
    "((instr('0123456789abcdef', substr(md5(term), 31, 1)) - 1) * 16 + " +
      s"(instr('0123456789abcdef', substr(md5(term), 32, 1)) - 1)) % $B"
  private val BucketDuck =
    "((strpos('0123456789abcdef', substr(md5(term), 31, 1)) - 1) * 16 + " +
      s"(strpos('0123456789abcdef', substr(md5(term), 32, 1)) - 1)) % $B"

  /** Per-document (y, n, pairs) feature frame; pairs sorted by bucket. */
  private[graft] def features(docs: DataFrame): DataFrame = {
    val cnts = docs
      .select(col("doc_id"), explode(Retrieval.tokens).as("term"))
      .withColumn("bk", expr(BucketSpark))
      .groupBy("doc_id", "bk")
      .agg(count(lit(1)).as("cnt"))
    val pairs = cnts
      .groupBy("doc_id")
      .agg(
        sort_array(collect_list(struct(col("bk"), col("cnt")))).as("pairs"),
        sum("cnt").as("n")
      )
    docs
      .select(
        col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y")
      )
      .join(pairs, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("y"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("pairs"), array().cast("array<struct<bk:int,cnt:bigint>>")).as("pairs")
      )
  }

  /** Global per-bucket token masses (bk, mb) — B rows, computed once. */
  private def massOf(docf: DataFrame): DataFrame =
    docf
      .select(explode(col("pairs")).as("p"))
      .groupBy(col("p.bk").as("bk"))
      .agg(sum(col("p.cnt")).as("mb"))

  /** The model between iterations: bias + B bucket weights, all integer
    * micro-units. 257 longs — MODEL state, not data; collecting it per
    * iteration is the documented Lloyd-loop pattern ([[KMeans]]), and
    * embedding it back as a literal array keeps every iteration's plan
    * FLAT. (A fully lazy weight chain re-expands the previous iteration
    * at each of its four use sites: 4^K plan copies — measured at seven
    * minutes for K=3 on 500 documents, all of it catalyst/job overhead.)
    */
  private final case class Model(biasMu: Long, wMu: Array[Long]) {
    /** Σ_b w_b·M_b div M — the centering term, exact driver integers
      * (JVM `/` truncates toward zero like Spark `div` / DuckDB `//`).
      */
    def wdotDivM(mass: Map[Int, Long], mTot: Long): Long = {
      var dot = 0L
      for ((bk, mb) <- mass) dot += wMu(bk) * mb
      dot / mTot
    }
  }

  /** Integer logit + quantized sigmoid residual for every document.
    * lmu = bias + (Σ_b w_b·cnt_b) div n − (Σ_b w_b·M_b) div M. The
    * weight vector rides into the plan as ONE literal array — map-only,
    * no join at all.
    */
  private def scoredOf(
      docf: DataFrame,
      m: Model,
      mass: Map[Int, Long],
      mTot: Long
  ): DataFrame = {
    val warr = typedLit(m.wMu.toSeq)
    docf
      .withColumn(
        "s",
        aggregate(
          col("pairs"),
          lit(0L),
          (acc, p) =>
            acc + element_at(warr, (p.getField("bk") + 1).cast("int")) *
              p.getField("cnt")
        )
      )
      .withColumn(
        "lmu",
        lit(m.biasMu) +
          when(col("n") > 0, expr("s div n")).otherwise(lit(0L)) -
          lit(m.wdotDivM(mass, mTot))
      )
      .withColumn("p", lit(1.0) / (lit(1.0) + exp(-(col("lmu") / lit(1e6)))))
      .withColumn("rmu", round((col("p") - col("y")) * 1e6).cast("long"))
  }

  /** One full-batch GD iteration: aggregate centered gradients (256
    * bucket keys + bias), collect them, update the model in the driver.
    * Centered gradient: g_b = Σ_docs (rmu·cnt_b) div n − (Σrmu · M_b) div M.
    */
  private def iterate(
      docf: DataFrame,
      m: Model,
      mass: Map[Int, Long],
      mTot: Long,
      nDocs: Long
  ): Model = {
    val scored = scoredOf(docf, m, mass, mTot)
    val rows = scored
      .select(col("rmu"), col("n"), explode_outer(col("pairs")).as("p"))
      .groupBy(coalesce(col("p.bk"), lit(-1)).as("b"))
      .agg(
        sum(expr("coalesce((rmu * p.cnt) div greatest(n, 1L), 0L)")).as("graw"),
        count(lit(1)).as("cnt")
      )
      .collect()
    val graw = rows.map(r => r.getAs[Int]("b") -> r.getAs[Long]("graw")).toMap
    // Σrmu needs each doc once, not once per pair — separate tiny agg.
    val rsum = scored.agg(sum("rmu")).collect()(0).getLong(0)
    val newW = Array.tabulate(B) { bk =>
      val g = graw.getOrElse(bk, 0L) - (rsum * mass.getOrElse(bk, 0L)) / mTot
      m.wMu(bk) - (LrW * g) / nDocs
    }
    Model(m.biasMu - (LrBias * rsum) / nDocs, newW)
  }

  /** DuckDB oracle replaying the identical K iterations. Exposed to the
    * rerank oracle, which appends its own CTEs + final select as `tail`
    * (a tail may start with ",\n" to extend the WITH block).
    */
  private[operators] def oracleSql(tail: String): String = {
    val score = (w: String, out: String) =>
      s"""${out}_wdot AS MATERIALIZED (
         |  SELECT CAST(coalesce(sum(w.w_mu * m.mb), 0) AS BIGINT) AS wdot
         |  FROM mass m JOIN $w w ON w.b = m.bk),
         |$out AS MATERIALIZED (
         |  SELECT f.doc_id, f.y, f.n,
         |    (SELECT w_mu FROM $w WHERE b = -1) +
         |      CASE WHEN f.n > 0 THEN sc.s // f.n ELSE 0 END -
         |      (SELECT wdot FROM ${out}_wdot) // (SELECT mt FROM mtot) AS lmu
         |  FROM docf f
         |  JOIN (SELECT f2.doc_id, CAST(coalesce(sum(w.w_mu * c.cnt), 0) AS BIGINT) AS s
         |        FROM docf f2
         |        LEFT JOIN cnts c ON c.doc_id = f2.doc_id
         |        LEFT JOIN $w w ON w.b = c.bk
         |        GROUP BY 1) sc ON sc.doc_id = f.doc_id)""".stripMargin
    val resid = (l: String, out: String) =>
      s"""$out AS MATERIALIZED (
         |  SELECT doc_id, y, n,
         |    CAST(round((1.0 / (1.0 + exp(-(lmu / 1000000.0))) - y) * 1000000) AS BIGINT) AS rmu
         |  FROM $l)""".stripMargin
    val update = (w: String, r: String, out: String) =>
      s"""$out AS MATERIALIZED (
         |  SELECT w.b,
         |    CAST(w.w_mu - ((CASE WHEN w.b = -1 THEN $LrBias ELSE $LrW END) *
         |      coalesce(g.g_mu, 0)) // (SELECT nd FROM nrow) AS BIGINT) AS w_mu
         |  FROM $w w
         |  LEFT JOIN (
         |    SELECT c.bk AS b,
         |      CAST(sum((r.rmu * c.cnt) // greatest(r.n, 1)) AS BIGINT) -
         |        ((SELECT CAST(sum(rmu) AS BIGINT) FROM $r) * any_value(m.mb)) //
         |          (SELECT mt FROM mtot) AS g_mu
         |    FROM $r r JOIN cnts c USING (doc_id) JOIN mass m ON m.bk = c.bk
         |    GROUP BY c.bk
         |    UNION ALL SELECT -1, CAST(sum(rmu) AS BIGINT) FROM $r) g USING (b))""".stripMargin

    val iters = (1 to K)
      .map { k =>
        Seq(
          score(s"w${k - 1}", s"l$k"),
          resid(s"l$k", s"r$k"),
          update(s"w${k - 1}", s"r$k", s"w$k")
        ).mkString(",\n")
      }
      .mkString(",\n")

    s"""WITH tok AS MATERIALIZED (
       |  SELECT doc_id, term, $BucketDuck AS bk
       |  FROM (SELECT doc_id, unnest(${Retrieval.NormSql}) AS term FROM documents) _t),
       |cnts AS MATERIALIZED (SELECT doc_id, bk, count(*) AS cnt FROM tok GROUP BY 1, 2),
       |dl AS MATERIALIZED (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM cnts GROUP BY 1),
       |docf AS MATERIALIZED (
       |  SELECT d.doc_id, CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y,
       |    coalesce(dl.n, 0) AS n
       |  FROM documents d LEFT JOIN dl USING (doc_id)),
       |mass AS MATERIALIZED (SELECT bk, CAST(sum(cnt) AS BIGINT) AS mb FROM cnts GROUP BY 1),
       |mtot AS MATERIALIZED (SELECT CAST(sum(mb) AS BIGINT) AS mt FROM mass),
       |nrow AS MATERIALIZED (SELECT count(*) AS nd FROM docf),
       |w0 AS MATERIALIZED (SELECT CAST(b AS INT) AS b, CAST(0 AS BIGINT) AS w_mu FROM range(-1, $B) t(b)),
       |$iters,
       |${score(s"w$K", "lf")}
       |$tail""".stripMargin
  }

  private def scoreTail: String =
    """SELECT doc_id, y, n AS n_tokens,
      |  CAST(round(1000000.0 / (1.0 + exp(-(lmu / 1000000.0)))) AS BIGINT) AS p_mu
      |FROM lf""".stripMargin

  private def weightsTail: String =
    s"""SELECT b, w_mu FROM w$K"""

  /** Run the K training iterations over a documents frame; returns the
    * persisted feature frame, the model configuration, and the model.
    */
  private def train(docs: DataFrame): (DataFrame, Map[Int, Long], Long, Model) = {
    val docf = features(docs).persist()
    // Bounded model configuration resolved up front (mirrors reading
    // table statistics): 256 bucket masses + the doc count.
    val mass = massOf(docf)
      .collect()
      .map(r => r.getAs[Int]("bk") -> r.getAs[Long]("mb"))
      .toMap
    val mTot = math.max(mass.values.sum, 1L)
    val nDocs = math.max(docf.count(), 1L)
    val w0 = Model(0L, Array.fill(B)(0L))
    val wK = (1 to K).foldLeft(w0)((m, _) => iterate(docf, m, mass, mTot, nDocs))
    (docf, mass, mTot, wK)
  }

  /** Train K iterations + score: the full operator over any documents
    * frame carrying (doc_id, text, lang).
    */
  def scoreOf(docs: DataFrame): DataFrame = {
    val (docf, mass, mTot, wK) = train(docs)
    finalScore(scoredOf(docf, wK, mass, mTot))
  }

  private def finalScore(scored: DataFrame): DataFrame =
    scored.select(
      col("doc_id"),
      col("y"),
      col("n").as("n_tokens"),
      round(lit(1e6) / (lit(1.0) + exp(-(col("lmu") / lit(1e6))))).cast("long").as("p_mu")
    )

  /** Persisted-model production shape: train once, write the FULL
    * inference state to a parquet model table — bias + 256 bucket
    * weights AND the bucket-mass centering statistics (the
    * feature-scaler half of the model a literal-weights dump forgets) —
    * then score from the LOADED state only. Hash-equal to
    * `docs_classifier_score` by construction; registered via
    * [[ModelStore]].
    */
  def scoreStoredOf(s: SparkSession, d: String, path: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val (docf, mass, _, wK) = train(docs)
    val rows = (("w", -1L, wK.biasMu) +:
      wK.wMu.zipWithIndex.toSeq.map { case (w, b) => ("w", b.toLong, w) }) ++
      mass.toSeq.map { case (bk, mb) => ("m", bk.toLong, mb) }
    rows.toDF("kind", "k", "v").coalesce(1).write.mode("overwrite").parquet(path)
    val loaded = s.read.parquet(path).collect()
    val lw = new Array[Long](B)
    var bias = 0L
    val lmass = scala.collection.mutable.Map[Int, Long]()
    loaded.foreach { r =>
      val v = r.getAs[Long]("v")
      val k = r.getAs[Long]("k")
      if (r.getAs[String]("kind") == "w") { if (k < 0) bias = v else lw(k.toInt) = v }
      else lmass(k.toInt) = v
    }
    val mTot = math.max(lmass.values.sum, 1L)
    // Reuse the persisted training feature frame: recomputing
    // features(docs) here would run the tokenize+bucket kernel a second
    // time over the corpus (and the weights/mass are loaded state, so
    // inference itself is unchanged). Released by the caller's
    // clearCache() per the registry convention.
    finalScore(scoredOf(docf, Model(bias, lw), lmass.toMap, mTot))
  }

  private val classifier = Q(
    "docs_classifier_score",
    (s, d) => scoreOf(Tables.documents(s, d)),
    Some(oracleSql(scoreTail)),
    bench = false
  )

  /** The trained model itself as rows — the oracle replays training and
    * must land on the SAME 257 integers, certifying every gradient step
    * (a score mismatch could hide in sigmoid plateaus; weights cannot).
    */
  private val weights = Q(
    "docs_classifier_weights",
    (s, d) => {
      val (docf, _, _, wK) = train(Tables.documents(s, d))
      // The output is literal weight rows — nothing downstream reads the
      // feature frame, so release it eagerly instead of waiting for the
      // caller's clearCache().
      docf.unpersist()
      import s.implicits._
      ((-1, wK.biasMu) +: wK.wMu.zipWithIndex.map { case (w, b) => (b, w) }.toSeq)
        .toDF("b", "w_mu")
    },
    Some(oracleSql(weightsTail)),
    bench = false
  )

  /** Reliability diagram — the post-training eval every deployed quality
    * classifier needs: decile-bucketed predicted probability vs observed
    * positive rate. A calibrated model has obs_permille tracking the
    * bucket's mean prediction; systematic gaps mean the score threshold
    * chosen for filtering does not mean what it claims. One bounded
    * 10-key aggregate over the scored table; integer per-mille / micro
    * units end to end.
    */
  private val calibration = Q(
    "docs_classifier_calibration",
    (s, d) => {
      scoreOf(Tables.documents(s, d))
        .select(least(expr("p_mu div 100000"), lit(9L)).as("bucket"), col("y"), col("p_mu"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("n"),
          sum(col("y")).as("n_pos"),
          sum(col("p_mu")).as("sp")
        )
        .select(
          col("bucket"),
          col("n"),
          col("n_pos").cast("long").as("n_pos"),
          expr("(n_pos * 1000) div n").as("obs_permille"),
          expr("sp div n").as("pred_mu_mean")
        )
    },
    Some(
      oracleSql(
        """SELECT least(p_mu // 100000, 9) AS bucket,
          |  cast(count(*) as bigint) AS n,
          |  cast(sum(y) as bigint) AS n_pos,
          |  cast((sum(y) * 1000) // count(*) as bigint) AS obs_permille,
          |  cast(sum(p_mu) // count(*) as bigint) AS pred_mu_mean
          |FROM (
          |  SELECT y, CAST(round(1000000.0 / (1.0 + exp(-(lmu / 1000000.0)))) AS BIGINT) AS p_mu
          |  FROM lf) _p
          |GROUP BY 1""".stripMargin
      )
    ),
    bench = false
  )

  /** Ranking quality (AUC) of the trained classifier — the companion to
    * the calibration diagram: calibration says whether the probability
    * MEANS what it claims, AUC whether the ORDERING separates classes
    * at all. Computed as the bucketed Mann-Whitney statistic: scores
    * land in 64 fixed micro-probability cells (the registry's
    * bounded-histogram discipline — an exact AUC would total-order the
    * corpus by score), cross-bucket positive/negative pairs count fully
    * and same-bucket pairs half, all in exact integer arithmetic:
    * AUC_permyriad = Σ_b pos_b·(2·cumNeg_below + neg_b) · 10⁴
    * div (2·P·N). The cumulative window runs over the 64-row aggregated
    * frame, never the corpus.
    */
  private val auc = Q(
    "docs_classifier_auc",
    (s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
        .orderBy("bucket")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      scoreOf(Tables.documents(s, d))
        .select(least(expr("p_mu div 15625"), lit(63L)).as("bucket"), col("y"))
        .groupBy("bucket")
        .agg(
          sum(col("y")).as("pos"),
          sum(lit(1) - col("y")).as("neg")
        )
        .withColumn("cnb", coalesce(sum(col("neg")).over(w), lit(0L)))
        .agg(
          sum(col("pos")).as("n_pos"),
          sum(col("neg")).as("n_neg"),
          sum(col("pos") * (lit(2) * col("cnb") + col("neg"))).as("numer2")
        )
        .select(
          col("n_pos").cast("long").as("n_pos"),
          col("n_neg").cast("long").as("n_neg"),
          expr("numer2 * 10000 div (2 * n_pos * n_neg)").as("auc_pm")
        )
    },
    Some(
      oracleSql(
        """SELECT cast(n_pos as bigint) AS n_pos, cast(n_neg as bigint) AS n_neg,
          |  numer2 * 10000 // (2 * n_pos * n_neg) AS auc_pm
          |FROM (
          |  SELECT cast(sum(pos) as bigint) AS n_pos, cast(sum(neg) as bigint) AS n_neg,
          |    cast(sum(pos * (2 * cnb + neg)) as bigint) AS numer2
          |  FROM (
          |    SELECT bucket, pos, neg,
          |      coalesce(sum(neg) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
          |    FROM (
          |      SELECT least(p_mu // 15625, 63) AS bucket,
          |        sum(y) AS pos, sum(1 - y) AS neg
          |      FROM (
          |        SELECT y, CAST(round(1000000.0 / (1.0 + exp(-(lmu / 1000000.0)))) AS BIGINT) AS p_mu
          |        FROM lf) _p
          |      GROUP BY 1) _b) _c) _a""".stripMargin
      )
    ),
    bench = false
  )

  val all: Seq[Q] = Seq(classifier, weights, calibration, auc)
}
