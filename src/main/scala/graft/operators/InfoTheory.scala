package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Information-theoretic corpus signals:
  *
  * `docs_entropy` — per-document word-distribution statistics: Shannon
  * entropy of the within-document unigram distribution (Shannon 1948;
  * the gibberish/keyword-stuffing filter axis — near-zero entropy is a
  * repeated token, implausibly high entropy for the length is random
  * noise), the type-token ratio, and the entropy's ratio to its ln(n)
  * maximum. Entropy via H = ln n − (Σ c·ln c)/n so each (doc, word)
  * count contributes ONE fixed term — the aggregate is a plain sum.
  *
  * `docs_ks_drift` — pairwise two-sample Kolmogorov-Smirnov statistic
  * between per-source quality-score distributions: the corpus-drift
  * gate run before mixing a new crawl into training data (the
  * distributional sibling of `events_cusum_drift`'s time axis). The
  * statistic rides the registry's bounded-histogram discipline: scores
  * land in 64 fixed buckets, per-source CDFs come from a cumulative
  * window over a DENSE source×64 scaffold (every missing bucket
  * materialized as 0, so the pair join is a bucket equi-join), and
  * KS = max |cdf_a − cdf_b| in exact integer permyriad. Sources × 64
  * rows regardless of corpus size — the corpus itself contributes one
  * map-side-combined count aggregation.
  *
  * Scale shape: `docs_entropy` keys one shuffle by (doc_id, word) — the
  * docs_tfidf precedent — then one per-doc aggregate; `docs_ks_drift`
  * is one bounded-key count plus arithmetic on a constant-size frame.
  */
object InfoTheory {

  private val KsBuckets = 64

  private val entropyQ = Q(
    "docs_entropy",
    (s, d) => {
      val toks = Tables
        .documents(s, d)
        .select(col("doc_id"), explode(words(col("text"))).as("w"))
      toks
        .groupBy("doc_id", "w")
        .agg(count(lit(1)).as("c"))
        .groupBy("doc_id")
        .agg(
          sum(col("c")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(col("c").cast("double") * log(col("c").cast("double"))).as("clogc")
        )
        .select(
          col("doc_id"),
          col("n_tokens"),
          col("n_types"),
          expr(s"n_types * 10000 div n_tokens").as("ttr_pm"),
          // `+ 0.0` kills IEEE −0.0: a single-type doc of n tokens has
          // H = ln n − (n·ln n)/n ≈ −2e-16 for many n (6, 22, 26, …) and
          // the two engines round the sign differently (see zipf_slope).
          (round(
            log(col("n_tokens").cast("double")) - col("clogc") / col("n_tokens"),
            4
          ) + lit(0.0)).as("entropy"),
          // Normalized entropy H/ln(n) ∈ [0,1]; a single-token doc has
          // ln(n) = 0 — define it as 1 (the distribution is trivially
          // uniform over its one type).
          when(col("n_tokens") === 1, lit(1.0))
            .otherwise(
              round(
                (log(col("n_tokens").cast("double")) - col("clogc") / col("n_tokens")) /
                  log(col("n_tokens").cast("double")),
                4
              ) + lit(0.0)
            )
            .as("entropy_norm")
        )
    },
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split($norm, ' ')) AS w FROM documents),
         |wc AS (SELECT doc_id, w, count(*) AS c FROM toks GROUP BY 1, 2),
         |agg AS (
         |  SELECT doc_id, cast(sum(c) AS bigint) AS n_tokens, count(*) AS n_types,
         |    sum(cast(c AS double) * ln(cast(c AS double))) AS clogc
         |  FROM wc GROUP BY 1)
         |SELECT doc_id,
         |  n_tokens,
         |  cast(n_types AS bigint) AS n_types,
         |  n_types * 10000 // n_tokens AS ttr_pm,
         |  round(ln(cast(n_tokens AS double)) - clogc / n_tokens, 4) + 0.0 AS entropy,
         |  (CASE WHEN n_tokens = 1 THEN 1.0
         |        ELSE round((ln(cast(n_tokens AS double)) - clogc / n_tokens) /
         |                   ln(cast(n_tokens AS double)), 4) + 0.0 END) AS entropy_norm
         |FROM agg""".stripMargin
    }
  )

  private val ksQ = Q(
    "docs_ks_drift",
    (s, d) => {
      // Integerize the shared quality score, then bucket 0..63. The
      // score is already 4-dp-rounded upstream semantics; ×KsBuckets on
      // the raw double then floor+clamp keeps the binning identical in
      // both engines (score ∈ [0,1]).
      val bucket = least(
        floor(LlmQueries.qualityExpr(col("text")) * KsBuckets).cast("int"),
        lit(KsBuckets - 1)
      )
      // Sentinel-coalesced source (the pplBucketsOf lesson): a null
      // source would survive the oracle's scaffold but vanish through
      // the Spark hash-key join.
      val counts = Tables
        .documents(s, d)
        .select(coalesce(col("source"), lit(" ")).as("source"), bucket.as("bucket"))
        .groupBy("source", "bucket")
        .agg(count(lit(1)).as("n"))
      // Dense scaffold: every (source, bucket) cell exists, so the CDF
      // window and the pair equi-join see a CONSTANT 64-row frame per
      // source (bounded regardless of corpus size).
      // Dense scaffold through a non-foldable hash key (a bare crossJoin
      // would plan the BroadcastNestedLoopJoin the plan suite reserves
      // for knn); both sides are bounded.
      val scaffold = counts
        .select(col("source"), (length(col("source")) - length(col("source")) + 1).as("j")).distinct()
        .join(
          counts.sparkSession
            .range(0, KsBuckets)
            .select(col("id").cast("int").as("bucket"), (col("id") - col("id") + 1).cast("int").as("j")),
          Seq("j")
        )
        .drop("j")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source")
        .orderBy("bucket")
      val cdf = scaffold
        .join(counts, Seq("source", "bucket"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .withColumn("cum", sum(col("n")).over(w))
        .withColumn("ntot", sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy("source")))
      cdf
        .select(col("source").as("src_a"), col("bucket"), col("cum").as("cum_a"), col("ntot").as("n_a"))
        .join(
          cdf.select(col("source").as("src_b"), col("bucket"), col("cum").as("cum_b"), col("ntot").as("n_b")),
          Seq("bucket")
        )
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
          max(abs(expr("cum_a * 10000 div n_a") - expr("cum_b * 10000 div n_b"))).as("ks_pm"),
          first(col("n_a")).as("n_a"),
          first(col("n_b")).as("n_b")
        )
    },
    Some {
      val ws = s"string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
      val quality =
        s"least(cast(len($ws) as double) / 100, 1.0) * " +
          s"(1.0 - cast(length(regexp_replace(text, '[^\\p{P}]', '', 'g')) as double) / length(text))"
      s"""WITH b AS (
         |  SELECT coalesce(source, ' ') AS source,
         |    least(cast(floor(($quality) * $KsBuckets) as int), ${KsBuckets - 1}) AS bucket
         |  FROM documents),
         |counts AS (SELECT source, bucket, count(*) AS n FROM b GROUP BY 1, 2),
         |scaffold AS (
         |  SELECT s.source, g.bucket
         |  FROM (SELECT DISTINCT source FROM counts) s
         |  CROSS JOIN (SELECT unnest(range(0, $KsBuckets)) AS bucket) g),
         |cdf AS (
         |  SELECT sc.source, sc.bucket,
         |    cast(sum(coalesce(c.n, 0)) OVER (PARTITION BY sc.source ORDER BY sc.bucket) AS bigint) AS cum,
         |    cast(sum(coalesce(c.n, 0)) OVER (PARTITION BY sc.source) AS bigint) AS ntot
         |  FROM scaffold sc LEFT JOIN counts c
         |    ON sc.source = c.source AND sc.bucket = c.bucket)
         |SELECT a.source AS src_a, b2.source AS src_b,
         |  max(abs(a.cum * 10000 // a.ntot - b2.cum * 10000 // b2.ntot)) AS ks_pm,
         |  any_value(a.ntot) AS n_a, any_value(b2.ntot) AS n_b
         |FROM cdf a JOIN cdf b2 ON a.bucket = b2.bucket AND a.source < b2.source
         |GROUP BY 1, 2""".stripMargin
    }
  )

  private val ZipfK = 1000

  /** Zipf rank-frequency fit: the log-log least-squares slope over the
    * corpus's top-1000 words (Zipf's law predicts ≈ −1 for natural
    * language; a flat slope flags templated/generated text, a cliff
    * flags boilerplate domination — a corpus-level quality signature).
    * The rank order is a TOTAL order over the vocabulary, which is
    * exactly what must not be a window at 100 TB — so the top-k cut
    * rides [[TopK.topkPerGroup]]'s bounded histogram selection (one
    * degenerate group), and only the surviving 1000 rows see ranks.
    * The regression is then five sums over a CONSTANT-size frame;
    * slope/R² use the standard closed forms assembled in one
    * fixed-order expression per engine.
    */
  private val zipfQ = Q(
    "corpus_zipf",
    (s, d) => {
      val counts = Tables
        .documents(s, d)
        .select(explode(words(col("text"))).as("w"))
        .groupBy("w")
        .agg(count(lit(1)).as("c"))
        .withColumn("g", lit("all"))
      val top = TopK.topkPerGroup(counts, "g", "c", "w", ZipfK)
      top
        .select(
          log(col("rk").cast("double")).as("x"),
          log(col("c").cast("double")).as("y")
        )
        .agg(
          count(lit(1)).cast("long").as("n_top"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy")
        )
        .select(
          col("n_top"),
          // `+ 0.0` normalizes IEEE −0.0 (a vanishing negative slope):
          // Spark's BigDecimal round drops the sign, DuckDB's keeps it —
          // the sf1 sweep caught the repr mismatch on a flat corpus.
          (round(
            (col("n_top") * col("sxy") - col("sx") * col("sy")) /
              (col("n_top") * col("sxx") - col("sx") * col("sx")),
            4
          ) + lit(0.0)).as("zipf_slope"),
          round(
            ((col("n_top") * col("sxy") - col("sx") * col("sy")) *
              (col("n_top") * col("sxy") - col("sx") * col("sy"))) /
              ((col("n_top") * col("sxx") - col("sx") * col("sx")) *
                (col("n_top") * col("syy") - col("sy") * col("sy"))),
            4
          ).as("r2")
        )
    },
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      s"""WITH toks AS (SELECT unnest(string_split($norm, ' ')) AS w FROM documents),
         |wc AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
         |top AS (
         |  SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rk
         |  FROM wc ORDER BY c DESC, w ASC LIMIT $ZipfK),
         |xy AS (SELECT ln(cast(rk AS double)) AS x, ln(cast(c AS double)) AS y FROM top),
         |agg AS (
         |  SELECT cast(count(*) AS bigint) AS n_top,
         |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         |    sum(x * x) AS sxx, sum(y * y) AS syy
         |  FROM xy)
         |SELECT n_top,
         |  round((n_top * sxy - sx * sy) / (n_top * sxx - sx * sx), 4) + 0.0 AS zipf_slope,
         |  round(((n_top * sxy - sx * sy) * (n_top * sxy - sx * sy)) /
         |        ((n_top * sxx - sx * sx) * (n_top * syy - sy * sy)), 4) AS r2
         |FROM agg""".stripMargin
    }
  )

  private val HeapsBuckets = 10

  /** Heaps-law fit: vocabulary growth V(T) ≈ K·T^β over the corpus
    * (Heaps 1978; β ≈ 0.4-0.6 for natural language — a flat or
    * saturating curve flags templated text, runaway growth flags
    * noise/IDs). The naive construction orders the corpus and counts
    * distinct words per prefix — a total order plus per-prefix
    * distincts. Instead: documents land in 10 deterministic hash
    * buckets ("prefix" = buckets 0..k), each word contributes ONE row
    * (its minimum bucket — a map-side-combined min aggregate over the
    * vocabulary), so V(k) is a 10-row cumulative sum over the
    * first-bucket census and T(k) one over per-bucket token counts.
    * The log-log regression then runs over ten (T, V) points — the
    * corpus contributes two bounded aggregations, nothing more.
    */
  private val heapsQ = Q(
    "corpus_heaps",
    (s, d) => {
      val toks = Tables
        .documents(s, d)
        .select(
          (conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("long") % HeapsBuckets)
            .cast("int")
            .as("bk"),
          explode(words(col("text"))).as("w")
        )
      val firstBucket = toks.groupBy("w").agg(min(col("bk")).as("fb"))
      val vByBucket = firstBucket.groupBy(col("fb").as("bk")).agg(count(lit(1)).as("v"))
      val tByBucket = toks.groupBy("bk").agg(count(lit(1)).as("t"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
        .orderBy("bk")
      val points = tByBucket
        .join(vByBucket, Seq("bk"), "left")
        .withColumn("v", coalesce(col("v"), lit(0L)))
        .withColumn("cv", sum(col("v")).over(w))
        .withColumn("ct", sum(col("t")).over(w))
        .select(log(col("ct").cast("double")).as("x"), log(col("cv").cast("double")).as("y"))
      points
        .agg(
          count(lit(1)).cast("long").as("n_points"),
          sum(col("x")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx")
        )
        .select(
          col("n_points"),
          // `+ 0.0` kills IEEE −0.0 (see zipf_slope — sf1 sweep finding).
          (round(
            (col("n_points") * col("sxy") - col("sx") * col("sy")) /
              (col("n_points") * col("sxx") - col("sx") * col("sx")),
            4
          ) + lit(0.0)).as("heaps_beta"),
          round(
            exp(
              (col("sy") - ((col("n_points") * col("sxy") - col("sx") * col("sy")) /
                (col("n_points") * col("sxx") - col("sx") * col("sx"))) * col("sx")) / col("n_points")
            ),
            4
          ).as("heaps_k")
        )
    },
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      s"""WITH toks AS (
         |  SELECT cast(('0x' || substr(md5(cast(doc_id AS varchar)), 1, 2))::bigint % $HeapsBuckets AS int) AS bk,
         |    unnest(string_split($norm, ' ')) AS w
         |  FROM documents),
         |fb AS (SELECT w, min(bk) AS fb FROM toks GROUP BY w),
         |vb AS (SELECT fb AS bk, count(*) AS v FROM fb GROUP BY 1),
         |tb AS (SELECT bk, count(*) AS t FROM toks GROUP BY 1),
         |pts AS (
         |  SELECT ln(cast(sum(t) OVER (ORDER BY tb.bk) AS double)) AS x,
         |    ln(cast(sum(coalesce(v, 0)) OVER (ORDER BY tb.bk) AS double)) AS y
         |  FROM tb LEFT JOIN vb ON tb.bk = vb.bk),
         |agg AS (
         |  SELECT cast(count(*) AS bigint) AS n_points, sum(x) AS sx, sum(y) AS sy,
         |    sum(x * y) AS sxy, sum(x * x) AS sxx
         |  FROM pts)
         |SELECT n_points,
         |  round((n_points * sxy - sx * sy) / (n_points * sxx - sx * sx), 4) + 0.0 AS heaps_beta,
         |  round(exp((sy - ((n_points * sxy - sx * sy) / (n_points * sxx - sx * sx)) * sx) / n_points), 4) AS heaps_k
         |FROM agg""".stripMargin
    }
  )

  /** Good-Turing count-of-counts (Good 1953; Gale & Sampson 1995's
    * simple GT): the frequency-of-frequencies table n_r over the corpus
    * vocabulary and the adjusted counts r* = (r+1)·n_{r+1}/n_r for the
    * low-count head — the smoothing every open-vocabulary LM needs for
    * unseen-mass estimation (the r=1 row's share of tokens IS the
    * missing-mass estimate). One vocabulary count aggregation, then a
    * count-of-counts over it (bounded by distinct count VALUES), a
    * self-join on r+1, integer permyriad output.
    */
  private val gtQ = Q(
    "corpus_good_turing",
    (s, d) => {
      val counts = Tables
        .documents(s, d)
        .select(explode(words(col("text"))).as("w"))
        .groupBy("w")
        .agg(count(lit(1)).as("c"))
      val nr = counts.groupBy(col("c").as("r")).agg(count(lit(1)).as("n_r"))
      // The 10 SMALLEST counts present (not a fixed r ≤ 10 — a heavily
      // repetitive corpus may have no low-count words at all). nr is
      // bounded by distinct count VALUES (≪ vocabulary), so the
      // sort-limit runs on an aggregated frame, never the corpus.
      nr.join(
        nr.select((col("r") - 1).as("r"), col("n_r").as("n_r1")),
        Seq("r"),
        "left"
      ).orderBy("r")
        .limit(10)
        .select(
          col("r"),
          col("n_r"),
          expr("(r + 1) * coalesce(n_r1, 0L) * 10000 div n_r").as("r_star_pm")
        )
    },
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      s"""WITH toks AS (SELECT unnest(string_split($norm, ' ')) AS w FROM documents),
         |wc AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
         |nr AS (SELECT c AS r, count(*) AS n_r FROM wc GROUP BY 1)
         |SELECT a.r, a.n_r,
         |  (a.r + 1) * coalesce(b.n_r, 0) * 10000 // a.n_r AS r_star_pm
         |FROM nr a LEFT JOIN nr b ON b.r = a.r + 1
         |ORDER BY a.r LIMIT 10""".stripMargin
    }
  )

  /** Token burstiness (Church & Gale 1995 Poisson mixtures; Katz 1996):
    * the variance-to-mean ratio of a token's per-document counts over
    * the WHOLE corpus (zeros included). A Poisson token — one whose
    * occurrences are independent of topic — has VMR = 1; content words
    * are over-dispersed (a doc that mentions them mentions them many
    * times), so VMR ≫ 1 separates topical vocabulary from function
    * words and, at corpus scale, flags template/boilerplate tokens
    * whose dispersion is implausibly flat. All integer: with t = Σc,
    * s2 = Σc², N docs, VMR = (N·s2 − t²)/(N·t) emitted in permyriad.
    * The moment arithmetic runs in 128-bit integers (decimal(38,0) in
    * Spark `div`, HUGEINT in the oracle): t² alone exceeds int64 past
    * t ≈ 3.04e9, which a common function word crosses at ~0.1 TB, and
    * N·s2 reaches ~1e24 at 100 TB — both fit 38 digits with ~1e14×
    * headroom. The numerator is ≥ 0 by Cauchy-Schwarz (n ≥ n_docs and
    * s2·n_docs ≥ t²), so truncate-toward-zero (Spark decimal div) and
    * floor (DuckDB hugeint //) agree.
    *
    * Scale shape: one (doc, token)-keyed count (the docs_entropy /
    * docs_tfidf precedent), one token-keyed moment aggregate
    * (map-side-combined sums), a 1-row broadcast for N — output
    * bounded by vocabulary above the count floor (≤ corpus/minTotal
    * rows by construction). No windows, no corpus re-shuffle.
    */
  def burstiness(docs: org.apache.spark.sql.DataFrame, minTotal: Long): org.apache.spark.sql.DataFrame = {
    val perTok = docs
      .select(col("doc_id"), explode(words(col("text"))).as("w"))
      .groupBy("doc_id", "w")
      .agg(count(lit(1)).as("c"))
      .groupBy("w")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("c")).as("t"),
        sum(col("c") * col("c")).as("s2")
      )
      .filter(col("t") >= minTotal)
    val nTotal = docs.agg(count(lit(1)).as("n"))
    perTok
      .withColumn("j", (col("t") - col("t") + 1).cast("int"))
      .join(
        broadcast(nTotal.select((col("n") - col("n") + 1).cast("int").as("j"), col("n"))),
        Seq("j")
      )
      .select(
        col("w").as("token"),
        col("n_docs"),
        col("t").as("total"),
        expr(
          "cast((10000 * (cast(n as decimal(38,0)) * s2 - cast(t as decimal(38,0)) * t))" +
            " div (cast(t as decimal(38,0)) * n) as bigint)"
        ).as("vmr_pm"),
        expr("(10000 * n_docs) div n").as("doc_rate_pm")
      )
  }

  private val BurstMinTotal = 100L

  private val burstQ = Q(
    "docs_token_burstiness",
    (s, d) => burstiness(Tables.documents(s, d), BurstMinTotal),
    Some {
      val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
      s"""WITH tc AS (
         |  SELECT doc_id, token, count(*) AS c
         |  FROM (SELECT doc_id, unnest(string_split($norm, ' ')) AS token FROM documents)
         |  GROUP BY 1, 2),
         |pt AS (
         |  SELECT token, count(*) AS n_docs,
         |    cast(sum(c) as bigint) AS t, cast(sum(c * c) as bigint) AS s2
         |  FROM tc GROUP BY token HAVING cast(sum(c) as bigint) >= $BurstMinTotal),
         |nn AS (SELECT count(*) AS n FROM documents)
         |SELECT token, n_docs, t AS total,
         |  cast((10000 * (cast(n AS hugeint) * s2 - cast(t AS hugeint) * t))
         |       // (cast(t AS hugeint) * n) AS bigint) AS vmr_pm,
         |  (10000 * n_docs) // n AS doc_rate_pm
         |FROM pt, nn""".stripMargin
    }
  )

  /** Jensen-Shannon divergence of each source's unigram distribution
    * from the corpus distribution (Lin 1991) — the lexical complement
    * of `docs_ks_drift`'s quality axis: KS sees score drift, JSD sees
    * VOCABULARY drift (a new crawl slice full of boilerplate legalese
    * moves JSD long before its quality scores move). Bounded in
    * [0, ln 2], symmetric, finite even for disjoint vocabularies —
    * why it's preferred over raw KL for corpus documentation.
    *
    * JSD(P‖Q) = ½·Σ p·ln(2p/(p+q)) + ½·Σ q·ln(2q/(p+q)) with P the
    * source distribution and Q the corpus. Terms ABSENT from the
    * source (p=0) contribute ½·q·ln 2 in closed form, so the plan only
    * expands (source × present-term) — never source × vocabulary:
    * jsd = Σ_present[...] + ½·ln 2·(1 − Σ_present q).
    *
    * Scale shape: one (source, term) aggregate and one term aggregate
    * (vocab-bounded keys, map-side combine), one vocab-keyed equi-join
    * between them, per-source totals broadcast, corpus total on the
    * 1-row computed-key broadcast. Per-term contributions are quantized
    * to integer micro-nats BEFORE the per-source sum (order-independent
    * — the ppl_holdout discipline); ln arguments are ratios of exact
    * counts with double-first multiplies (the DSIR overflow guard).
    */
  def jsDivergenceOf(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(
        coalesce(col("source"), lit(" ")).as("source"),
        explode(words(col("text"))).as("w")
      )
      val cs = tok.groupBy("source", "w").agg(count(lit(1)).as("cs"))
      val cw = tok.groupBy("w").agg(count(lit(1)).as("cw"))
      val perSource = cs.groupBy("source").agg(sum("cs").as("cstot"))
      val corpus = cw.agg(sum("cw").as("ctot"))
      val joined = cs
        .join(cw, Seq("w"))
        .join(broadcast(perSource), Seq("source"))
        .withColumn("j", (col("cs") - col("cs") + 1).cast("int"))
        .join(
          broadcast(corpus.select((col("ctot") - col("ctot") + 1).cast("int").as("j"), col("ctot"))),
          Seq("j")
        )
      // ln args as ratios of double-first products: a = cs·ctot,
      // b = cw·cstot (both exact counts; the double product is IEEE-
      // identical across engines).
      val contrib = joined.withColumn(
        "jt_mu",
        round(
          (col("cs").cast("double") / col("cstot").cast("double") *
            log(
              lit(2.0) * col("cs").cast("double") * col("ctot").cast("double") /
                (col("cs").cast("double") * col("ctot").cast("double") +
                  col("cw").cast("double") * col("cstot").cast("double"))
            ) +
            col("cw").cast("double") / col("ctot").cast("double") *
              log(
                lit(2.0) * col("cw").cast("double") * col("cstot").cast("double") /
                  (col("cs").cast("double") * col("ctot").cast("double") +
                    col("cw").cast("double") * col("cstot").cast("double"))
              )) / 2.0 * 1e6
        ).cast("long")
      )
      contrib
        .groupBy("source")
        .agg(
          first(col("cstot")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          first(col("ctot")).as("ctot"),
          sum("jt_mu").as("present_mu"),
          sum("cw").as("qpresent")
        )
        .select(
          col("source"),
          col("n_tokens"),
          col("n_types"),
          (col("present_mu") +
            round(
              (lit(1.0) - col("qpresent").cast("double") / col("ctot").cast("double")) *
                math.log(2.0) / 2.0 * 1e6
            ).cast("long")).as("jsd_mu")
        )
  }

  private val jsdQ = Q(
    "docs_js_divergence",
    (s, d) => jsDivergenceOf(Tables.documents(s, d)),
    Some {
      val ws = "string_split(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), ' ')"
      s"""WITH tok AS (
         |  SELECT coalesce(source, ' ') AS source, unnest($ws) AS w FROM documents),
         |cs AS (SELECT source, w, count(*) AS cs FROM tok GROUP BY 1, 2),
         |cw AS (SELECT w, count(*) AS cw FROM tok GROUP BY 1),
         |ps AS (SELECT source, sum(cs) AS cstot FROM cs GROUP BY 1),
         |tot AS (SELECT sum(cw) AS ctot FROM cw),
         |contrib AS (
         |  SELECT cs.source,
         |    CAST(round((
         |      CAST(cs.cs AS DOUBLE) / cstot *
         |        ln(2.0 * CAST(cs.cs AS DOUBLE) * ctot /
         |           (CAST(cs.cs AS DOUBLE) * ctot + CAST(cw.cw AS DOUBLE) * cstot)) +
         |      CAST(cw.cw AS DOUBLE) / ctot *
         |        ln(2.0 * CAST(cw.cw AS DOUBLE) * cstot /
         |           (CAST(cs.cs AS DOUBLE) * ctot + CAST(cw.cw AS DOUBLE) * cstot))
         |    ) / 2.0 * 1e6) AS BIGINT) AS jt_mu,
         |    cs.cs, cw.cw, ps.cstot, tot.ctot
         |  FROM cs JOIN cw USING (w) JOIN ps USING (source), tot)
         |SELECT source, CAST(any_value(cstot) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(jt_mu) + round(
         |    (1.0 - CAST(sum(cw) AS DOUBLE) / any_value(ctot)) * ln(2.0) / 2.0 * 1e6
         |  ) AS BIGINT) AS jsd_mu
         |FROM contrib GROUP BY 1""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(entropyQ, ksQ, zipfQ, heapsQ, gtQ, burstQ, jsdQ)
}
