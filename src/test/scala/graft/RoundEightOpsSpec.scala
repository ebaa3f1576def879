package graft

import graft.operators.{LineDedup, PrioritySampling, RandomProjection, SketchOverlap, SmoothedLm, WinnowingQueries}
import org.apache.spark.sql.functions._

/** Semantic pins for the round-8 additions the oracle certifies only as
  * end-to-end hashes: the winnowing guarantee and tie-break, the KN
  * probability against a hand-computed model, KMV union mergeability on
  * a subset (exact, collision-independent), segment-strip
  * reconstruction bytes, and the JL sign-matrix contract.
  */
class RoundEightOpsSpec extends SparkSuite {

  private def md5hex(s: String): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString

  test("winnowing guarantee: an 11+ char shared substring yields a shared fingerprint") {
    import spark.implicits._
    // Shared run "qqqqqqqqqqqqqqq" (15 chars ≥ w+W−1 = 11) embedded in
    // otherwise-disjoint texts must contribute ≥1 common fingerprint.
    val docs = Seq(
      (1L, "abcdefgh qqqqqqqqqqqqqqq stuvwxyz"),
      (2L, "zyxmnopr qqqqqqqqqqqqqqq 12345678")
    ).toDF("doc_id", "text")
    val sets = WinnowingQueries
      .fingerprintSets(docs)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .toMap
    assert(sets(1L).intersect(sets(2L)).nonEmpty)
  }

  test("winnowing rightmost tie-break: constant text selects one position per window") {
    import spark.implicits._
    // 15 identical chars → 8 constant window hashes; every winnowing
    // window's min ties across all 4 slots, the RIGHTMOST wins, so the
    // selected positions are exactly {4,5,6,7,8} → n_fp = m − W + 1.
    val docs = Seq((1L, "qqqqqqqqqqqqqqq")).toDF("doc_id", "text")
    val r = WinnowingQueries.winnowOf(docs).collect().head
    assert(r.getAs[Long]("n_windows") == 8L)
    assert(r.getAs[Long]("n_fp") == 5L)
  }

  test("winnowing: short text falls back to one whole-sequence fingerprint") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 10 chars → 3 windows < W
    val r = WinnowingQueries.winnowOf(docs).collect().head
    assert(r.getAs[Long]("n_windows") == 3L)
    assert(r.getAs[Long]("n_fp") == 1L)
  }

  test("KN score matches the hand-computed interpolated model") {
    import spark.implicits._
    // Corpus: doc1 = "a b a b", doc2 = "a b c".
    // Bigrams: doc1 → (a b),(b a),(a b); doc2 → (a b),(b c).
    // bc: (a b)=3, (b a)=1, (b c)=1; B = 3 distinct.
    // w1=a: ctx=3, n1f=1 · w1=b: ctx=2, n1f=2.
    // n1b: b←1 context {a}; a←1 {b}; c←1 {b}.
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    def pkn(cb: Double, ctx: Double, n1f: Double, n1b: Double, b: Double): Double =
      (cb - 0.75) / ctx + ((0.75 * n1f) / ctx) * (n1b / b)
    val pAB = pkn(3, 3, 1, 1, 3) // P(b|a)
    val pBA = pkn(1, 2, 2, 1, 3) // P(a|b)
    val pBC = pkn(1, 2, 2, 1, 3) // P(c|b)
    val exp1 = BigDecimal((math.log(pAB) + math.log(pBA) + math.log(pAB)) / 3)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val exp2 = BigDecimal((math.log(pAB) + math.log(pBC)) / 2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
    val out = SmoothedLm
      .knScoreOf(docs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("kn_score"))))
      .toMap
    assert(out(1L)._1 == 3L && math.abs(out(1L)._2 - exp1.toDouble) < 1e-9)
    assert(out(2L)._1 == 2L && math.abs(out(2L)._2 - exp2.toDouble) < 1e-9)
  }

  test("KMV overlap: a subset source's union registers equal the superset's") {
    import spark.implicits._
    // B ⊂ A ⇒ the union's distinct set IS A's, so est_union == est_a and
    // est_intersect == est_b EXACTLY — independent of shard collisions.
    val a = (1 to 120).map(i => ("A", s"text number $i"))
    val b = (1 to 40).map(i => ("B", s"text number $i"))
    val out = SketchOverlap
      .overlapOf((a ++ b).toDF("source", "text"))
      .collect()
      .head
    assert(out.getAs[String]("src_a") == "A" && out.getAs[String]("src_b") == "B")
    assert(out.getAs[Long]("est_union") == out.getAs[Long]("est_a"))
    assert(out.getAs[Long]("est_intersect") == out.getAs[Long]("est_b"))
  }

  test("line-dedup strip removes the corpus-common segment and rebuilds bytes exactly") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ") // one full shared segment
    val docs = (1L to 5L).map(i => (i, s"$boiler unique$i words$i")) :+
      (9L, "lonely text entirely its own")
    val out = LineDedup
      .stripOf(docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    // Docs 1-5: segment 0 (boiler) shared by 5 docs → stripped; segment 1
    // ("uniqueI wordsI") survives.
    val r1 = out(1L)
    assert(r1.getAs[Long]("n_segments") == 2L)
    assert(r1.getAs[Long]("n_removed") == 1L)
    assert(r1.getAs[String]("clean_md5") == md5hex("unique1 words1"))
    // Doc 9 is untouched.
    val r9 = out(9L)
    assert(r9.getAs[Long]("n_removed") == 0L)
    assert(r9.getAs[String]("clean_md5") == md5hex("lonely text entirely its own"))
  }

  test("entropy: repeated token → 0, uniform tokens → ln n with norm 1") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a a a", "en", "s1"),
      (2L, "a b c d", "en", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("ent").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("docs_entropy")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap
    assert(out(1L).getAs[Long]("n_types") == 1L)
    assert(out(1L).getAs[Double]("entropy") == 0.0)
    assert(out(1L).getAs[Double]("entropy_norm") == 0.0)
    assert(out(2L).getAs[Long]("ttr_pm") == 10000L)
    assert(math.abs(out(2L).getAs[Double]("entropy") - math.log(4)) < 1e-3)
    assert(out(2L).getAs[Double]("entropy_norm") == 1.0)
  }

  test("KS drift: identical sources score 0, disjoint quality extremes score 10000") {
    import spark.implicits._
    val long = (1 to 120).map(i => s"w$i").mkString(" ") // quality ≈ 1 → top bucket
    val rows =
      (1 to 10).map(i => (i.toLong, "tiny", "en", "lowA")) ++ // 1 word → bucket 0
        (11 to 20).map(i => (i.toLong, "tiny", "en", "lowB")) ++
        (21 to 30).map(i => (i.toLong, long, "en", "high"))
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    rows.toDF("doc_id", "text", "lang", "source").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("docs_ks_drift")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("ks_pm"))
      .toMap
    assert(out(("lowA", "lowB")) == 0L)
    assert(out(("high", "lowA")) == 10000L)
    assert(out(("high", "lowB")) == 10000L)
  }

  test("blocking eval counts candidates without pair enumeration and matches with the veto chain") {
    import spark.implicits._
    // Source a: two records; source b: a true duplicate of r1 (same title
    // key, matching fields) and a same-title-key NON-match (year far off
    // fails nothing — year conflict vetoes; use a title that shares the
    // key but a conflicting year).
    val recs = Seq(
      ("a.1", "a", "Silent Spring", "carson rachel", 1962, ""),
      ("a.2", "a", "Another Book Entirely", "someone else", 1999, ""),
      ("b.1", "b", "Silent Spring /", "carson rachel", 1962, ""),
      ("b.2", "b", "Silent Spring /", "carson rachel", 1975, "")
    ).toDF("id", "source_id", "title", "author", "year", "isbn")
    val keyed = graft.operators.Dedup.withKeys(recs)
    val out = graft.operators.BlockingEval
      .evalOf(keyed)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val t = out("t")
    // Title blocking: key "silent spring" holds a.1 (source a) + b.1, b.2
    // (source b) → 1·2 = 2 cross-source candidates; only (a.1, b.1)
    // passes (b.2's year conflicts). Total cross pairs = 2·2 = 4.
    assert(t.getAs[Long]("n_candidates") == 2L)
    assert(t.getAs[Long]("n_matches") == 1L)
    assert(t.getAs[Long]("precision_pm") == 5000L)
    assert(t.getAs[Long]("reduction_pm") == 5000L)
    assert(!out.contains("i")) // no usable ISBN keys in this fixture
  }

  test("Fellegi-Sunter weights separate discriminating from uninformative fields") {
    import spark.implicits._
    // Same shape as the blocking fixture: (a.1, b.1) matches, (a.1, b.2)
    // fails on year. Title and author agree on BOTH pairs (m = u →
    // weight 0, uninformative); year agrees only on the match (u = 0 →
    // weight undefined/null); pages/isbn never agree (weight null).
    val recs = Seq(
      ("a.1", "a", "Silent Spring", "carson rachel", 1962, ""),
      ("a.2", "a", "Another Book Entirely", "someone else", 1999, ""),
      ("b.1", "b", "Silent Spring /", "carson rachel", 1962, ""),
      ("b.2", "b", "Silent Spring /", "carson rachel", 1975, "")
    ).toDF("id", "source_id", "title", "author", "year", "isbn")
    val out = graft.operators.BlockingEval
      .fsWeightsOf(graft.operators.Dedup.withKeys(recs))
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    assert(out("title").getAs[Long]("n_match") == 1L)
    assert(out("title").getAs[Long]("n_nonmatch") == 1L)
    assert(out("title").getAs[Long]("m_pm") == 10000L)
    assert(out("title").getAs[Long]("u_pm") == 10000L)
    assert(out("title").getAs[Double]("weight") == 0.0)
    assert(out("year").getAs[Long]("m_pm") == 10000L)
    assert(out("year").getAs[Long]("u_pm") == 0L)
    assert(out("year").isNullAt(out("year").fieldIndex("weight")))
    assert(out("pages").getAs[Long]("agree_match") == 0L)
  }

  test("Zipf slope matches the closed-form fit on a hand-built frequency ladder") {
    import spark.implicits._
    val text = (Seq.fill(8)("aa") ++ Seq.fill(4)("bb") ++ Seq.fill(2)("cc") ++ Seq("dd"))
      .mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("zipf").toString
    Seq((1L, text, "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("corpus_zipf")(spark, dir).collect().head
    val x = Seq(1.0, 2.0, 3.0, 4.0).map(math.log)
    val y = Seq(8.0, 4.0, 2.0, 1.0).map(math.log)
    val n = 4.0
    val (sx, sy) = (x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (x.map(a => a * a).sum, y.map(a => a * a).sum)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val r2 = math.pow(n * sxy - sx * sy, 2) / ((n * sxx - sx * sx) * (n * syy - sy * sy))
    assert(r.getAs[Long]("n_top") == 4L)
    assert(math.abs(r.getAs[Double]("zipf_slope") - slope) < 1e-4)
    assert(math.abs(r.getAs[Double]("r2") - r2) < 1e-4)
  }

  test("Heaps fit: an all-unique-vocabulary corpus gives beta = 1, K = 1 exactly") {
    import spark.implicits._
    // Every token is globally unique ⇒ V(T) = T at every checkpoint ⇒
    // the log-log fit is the identity: slope 1, intercept 0.
    val docs = (1L to 50L).map(i => (i, (1 to 20).map(j => s"u${i}x$j").mkString(" "), "en", "s"))
    val dir = java.nio.file.Files.createTempDirectory("heaps").toString
    docs.toDF("doc_id", "text", "lang", "source").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("corpus_heaps")(spark, dir).collect().head
    assert(r.getAs[Long]("n_points") == 10L)
    assert(r.getAs[Double]("heaps_beta") == 1.0)
    assert(r.getAs[Double]("heaps_k") == 1.0)
  }

  test("Good-Turing adjusted counts match the hand table") {
    import spark.implicits._
    // counts: {a,b,c}=1, {d,e}=2, {f}=3 ⇒ n_1=3, n_2=2, n_3=1;
    // r*₁ = 2·n₂/n₁ = 4/3, r*₂ = 3·n₃/n₂ = 3/2, r*₃ = 4·0/1 = 0.
    val dir = java.nio.file.Files.createTempDirectory("gt").toString
    Seq((1L, "a b c d d e e f f f", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry
      .queries("corpus_good_turing")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n_r"), r.getAs[Long]("r_star_pm"))))
      .toMap
    assert(out(1L) == ((3L, 13333L)))
    assert(out(2L) == ((2L, 15000L)))
    assert(out(3L) == ((1L, 0L)))
  }

  test("classifier AUC equals the brute-force bucketed Mann-Whitney statistic") {
    val sf = "/root/testdata/sf0.001"
    val bucketed = graft.operators.Classifier
      .scoreOf(Tables.documents(spark, sf))
      .select(least(expr("p_mu div 15625"), lit(63L)).as("b"), col("y"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number]("y").longValue()))
    // Brute-force over all (positive, negative) pairs at bucket
    // granularity: full credit when the positive's bucket is higher,
    // half on ties — the definition the operator's cumulative form
    // must reproduce exactly.
    val pos = bucketed.filter(_._2 == 1L).map(_._1)
    val neg = bucketed.filter(_._2 == 0L).map(_._1)
    val numer2 = (for (p <- pos; n <- neg) yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    val expected = numer2 * 10000L / (2L * pos.length * neg.length)
    val r = SparkEntry.queries("docs_classifier_auc")(spark, sf).collect().head
    assert(r.getAs[Long]("n_pos") == pos.length.toLong)
    assert(r.getAs[Long]("n_neg") == neg.length.toLong)
    assert(r.getAs[Long]("auc_pm") == expected)
  }

  test("windowed HLL: identical days merge to an identical all-time estimate") {
    import spark.implicits._
    // Two days with the SAME 2000 users: the per-day register sets are
    // identical, so the ##all row (elementwise-max merge) must estimate
    // EXACTLY what each day does — mergeability as an equality, not a
    // tolerance. The estimate itself must land near the true 2000.
    val rows = for {
      day <- Seq("2024-01-01", "2024-01-02")
      u <- 1L to 2000L
    } yield (java.sql.Timestamp.valueOf(s"$day 12:00:00"), u, "a", 1.0, Map.empty[String, String])
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    rows
      .toDF("ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry
      .queries("events_distinct_users_hll")(spark, dir)
      .collect()
      .map(r => r.getString(1) -> r.getAs[Long]("est_distinct"))
      .toMap
    assert(out.keySet == Set("2024-01-01", "2024-01-02", "##all"))
    assert(out("2024-01-01") == out("##all"))
    assert(out("2024-01-02") == out("##all"))
    assert(math.abs(out("##all") - 2000L) < 500L)
  }

  test("random projection: signs are ±1 and a unit vector has distortion exactly 1") {
    // Sign matrix contract (the SQL literal and the plan share it).
    val signs = for (j <- 0 until 16; i <- 0 until 64) yield RandomProjection.sign(j, i)
    assert(signs.forall(s => s == 1.0 || s == -1.0))
    assert(signs.contains(1.0) && signs.contains(-1.0))
    import spark.implicits._
    val oneHot = Array.tabulate(64)(i => if (i == 7) 1.0f else 0.0f)
    val emb = Seq((1L, oneHot)).toDF("vec_id", "embedding")
    val q = SparkEntry.queries("embed_random_projection")
    val dir = java.nio.file.Files.createTempDirectory("rp").toString
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = q(spark, dir).collect().head
    // proj_j = ±10000 for every j ⇒ Σv² = 16·10⁸ ⇒ distortion = 1.0.
    assert(r.getAs[Double]("distortion") == 1.0)
    assert(r.getAs[String]("proj").split(",").forall(v => math.abs(v.toLong) == 10000L))
  }

  test("priority sampling: bounded bit-length cut equals the naive per-group rank") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // 600 items across 3 groups (one smaller than k, so τ is null there
    // and est_w degenerates to w), weights spanning the full bp range.
    val df = (0 until 600)
      .map(i => (s"g${i % 3}", i.toLong, ((i * 37) % 10000 + 1).toLong))
      .toDF("grp", "id", "w")
      .filter(col("grp") =!= "g2" || col("id") < 30) // g2 has only 10 items < k
    val k = 50
    val got = PrioritySampling
      .prioritySample(df, "grp", "id", "w", k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5)))
      .toSet
    // Naive reference: exact priority, full per-group sort.
    val withP = df.withColumn(
      "p",
      expr("(w * 281474976710656L) div (cast(conv(substring(md5(cast(id as string)), 1, 12), 16, 10) as long) + 1)")
    )
    val rk = org.apache.spark.sql.functions
      .row_number()
      .over(Window.partitionBy("grp").orderBy(col("p").desc, col("id").asc))
    val ranked = withP.withColumn("rk", rk.cast("long")).persist()
    val tau = ranked
      .filter(col("rk") > k)
      .groupBy("grp")
      .agg(org.apache.spark.sql.functions.max("p").as("tau"))
    val want = ranked
      .filter(col("rk") <= k)
      .join(tau, Seq("grp"), "left")
      .select(
        col("grp"),
        col("id"),
        col("rk"),
        greatest(col("w"), coalesce(col("tau"), col("w"))).as("est_w")
      )
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // The small group is fully selected with degenerate estimator ŵ = w.
    val g2 = PrioritySampling
      .prioritySample(df, "grp", "id", "w", k)
      .filter(col("grp") === "g2")
      .collect()
    assert(g2.length == 10)
    assert(g2.forall(r => r.getLong(5) == r.getLong(2))) // est_w == w
  }

  test("all-pairs join: prefix filter finds exactly the brute-force Jaccard >= 4/5 pairs") {
    import spark.implicits._
    // Clone family {1,2,3} (J = 1 and 9/10), a borderline pair {4,5}
    // just under θ, and an unrelated doc — the filter chain must admit
    // no false positives and, per the Bayardo lossless-prefix theorem,
    // miss no true pair.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (4L, "alpha beta gamma delta epsilon mu nu xi omicron pi"),
      (5L, "alpha beta gamma delta epsilon mu nu xi rho sigma"),
      (6L, "completely different words here entirely unrelated tokens now")
    ).toDF("doc_id", "text")
    val got = operators.AllPairsJoin
      .allPairs(docs)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(4)))
      .toMap
    // Brute force over all 15 pairs with the same word sets.
    val sets = docs
      .select(col("doc_id"), array_distinct(graft.functions.TextFunctions.words(col("text"))).as("ws"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val want = (for {
      (a, wa) <- sets; (b, wb) <- sets if a < b
      inter = (wa & wb).size; uni = (wa | wb).size
      if inter * 5 >= uni * 4
    } yield ((a, b), 1000L * inter / uni)).toMap
    assert(got == want)
    assert(want.contains((1L, 2L)) && want.contains((1L, 3L))) // real positives exist
    assert(!got.contains((4L, 5L))) // J = 8/12 < 4/5 stays out
  }

  test("AMS F2: a single-token corpus estimates exactly, and the estimate is repartition-invariant") {
    import spark.implicits._
    // One token repeated n times: every register is ±n, so the mean of
    // Z² is exactly n² = F₂ and err_pm = 0 whatever the sign hashes.
    val dir = java.nio.file.Files.createTempDirectory("ams").toString
    Seq((1L, "x x x x x x x", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("corpus_f2_ams")(spark, dir).collect().head
    assert(r.getAs[Long]("exact_f2") == 49L) // f("x") = 7 ⇒ F₂ = 49
    assert(r.getAs[Long]("est_f2") == 49L)
    assert(r.getAs[Long]("err_pm") == 0L)
    // Integer registers make the estimate deterministic across runs.
    val again = SparkEntry.queries("corpus_f2_ams")(spark, dir).collect().head
    assert(again.getAs[Long]("est_f2") == 49L)
  }

  test("RRF fusion: two mid ranks beat one top rank, integer contributions exact") {
    import spark.implicits._
    // Candidate 100 appears at ranks 2 and 3 (both lists); candidate
    // 200 only at rank 1. 10⁶ div 62 + 10⁶ div 63 = 16129 + 15873 =
    // 32002 > 16393 = 10⁶ div 61 — the consensus candidate must fuse
    // first, with exact integer scores.
    val pooled = Seq(
      (1L, 200L, 1), (1L, 100L, 2), // list A
      (1L, 100L, 3), (1L, 300L, 1) // list B
    ).toDF("query_id", "neighbor_id", "rank")
    val got = operators.HybridFusion
      .fuse(pooled, 3)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._4)
    assert(got.toSeq == Seq(
      (100L, 32002L, 2L, 1L), // 16129 + 15873, in both lists
      (200L, 16393L, 1L, 2L), // rank-1 singleton, id tie-break before 300
      (300L, 16393L, 1L, 3L)
    ))
  }

  test("burstiness: concentrated token VMR = 1.5, uniform token VMR = 0, hand-exact") {
    import spark.implicits._
    // N = 4 docs. 'a' occurs twice in one doc: t=2, s2=4 ⇒
    // VMR = (4·4 − 4)/(4·2) = 1.5 → 15000 pm. 'b' occurs exactly once
    // in every doc: variance 0 ⇒ 0 pm.
    val docs = Seq(
      (1L, "a a b"), (2L, "b"), (3L, "b"), (4L, "b")
    ).toDF("doc_id", "text")
    val got = operators.InfoTheory
      .burstiness(docs, 1L)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got("a") == ((1L, 2L, 15000L, 2500L)))
    assert(got("b") == ((4L, 4L, 0L, 10000L)))
  }

  test("triangle counts: K4 minus an edge, both-direction dupes, and a chain") {
    import spark.implicits._
    // {1,2,3,4} with (3,4) missing → triangles (1,2,3), (1,2,4);
    // reversed duplicate edges must not double-count; 10-11-12 is a
    // triangle-free chain and must be absent from the output.
    val edges = Seq(
      (1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L), (4L, 2L),
      (10L, 11L), (11L, 12L)
    ).toDF("doc_a", "doc_b")
    val got = operators.TriangleQueries
      .triangleCounts(edges)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }
}
