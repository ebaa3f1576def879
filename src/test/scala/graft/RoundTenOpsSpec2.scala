package graft

import org.apache.spark.sql.functions._

/** Round-10 second batch: degree assortativity, daily-series ACF,
  * Jensen-Shannon source divergence, Kish ESS of importance weights.
  */
class RoundTenOpsSpec2 extends SparkSuite {

  test("assortativity: path graph is perfectly disassortative, regular graph undefined") {
    import spark.implicits._
    // Path 1-2-3: degrees 1,2,1 — every edge pairs a leaf with the hub.
    val path = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val r = operators.GraphMetrics.assortativityOf(path).collect()(0)
    assert(r.getAs[Long]("n_edges") == 2L)
    assert(r.getAs[Long]("sum_deg") == 6L)
    assert(r.getAs[Long]("assortativity_pm") == -10000L)
    // Triangle: all degrees equal — zero degree variance, r undefined.
    val k3 = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    val r3 = operators.GraphMetrics.assortativityOf(k3).collect()(0)
    assert(r3.isNullAt(r3.fieldIndex("assortativity_pm")))
  }

  test("acf: alternating daily series gives the hand-computed lag-1/lag-2 values") {
    import spark.implicits._
    val day = 86400000000L
    // one click on days 0, 2, 4 → dense series c = [1,0,1,0,1], n=5.
    val ev = Seq(0L, 2L, 4L).zipWithIndex
      .map { case (d, i) => (i.toLong, d * day + 1000000L, 1L, "click", 1.0) }
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"), col("user_id"), col("event_type"), col("value"))
    val rows = operators.TrendQueries
      .acfOf(ev)
      .collect()
      .map(r => r.getAs[Long]("lag") -> r)
      .toMap
    // n=5, S=3, Q=3; lag1: num = −24, den = 30 → −8000; lag2: num = 17 → 5667.
    assert(rows(1L).getAs[Long]("n_days") == 5L)
    assert(rows(1L).getAs[Long]("n_pairs") == 4L)
    assert(rows(1L).getAs[Long]("acf_qm") == -8000L)
    assert(rows(2L).getAs[Long]("acf_qm") == 5667L)
    assert(rows(4L).getAs[Long]("n_pairs") == 1L)
    assert(!rows.contains(5L)) // lag beyond the 5-day span yields no pairs
  }

  test("acf: constant series has zero variance → null acf") {
    import spark.implicits._
    val day = 86400000000L
    val ev = (0L to 3L)
      .map(d => (d, d * day + 5L, 1L, "buy", 1.0))
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"), col("user_id"), col("event_type"), col("value"))
    val rows = operators.TrendQueries.acfOf(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.isNullAt(r.fieldIndex("acf_qm"))))
  }

  test("JS divergence: symmetric two-source corpus gives equal hand-computed jsd") {
    import spark.implicits._
    val docs = Seq((1L, "x x", "A"), (2L, "y y", "B")).toDF("doc_id", "text", "source")
    val rows = operators.InfoTheory
      .jsDivergenceOf(docs)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    // Per source: present term p=1, q=1/2 → ½[ln(4/3) + ½·ln(2/3)];
    // absent mass ½ → + ½·ln2·½.
    val present = math.round((1.0 * math.log(2.0 * 2 * 4 / (2.0 * 4 + 2.0 * 2)) +
      0.5 * math.log(2.0 * 2 * 2 / (2.0 * 4 + 2.0 * 2))) / 2.0 * 1e6)
    val absent = math.round((1.0 - 2.0 / 4.0) * math.log(2.0) / 2.0 * 1e6)
    for (s <- Seq("A", "B")) {
      val r = rows(s)
      assert(r.getAs[Long]("n_tokens") == 2L)
      assert(r.getAs[Long]("n_types") == 1L)
      assert(r.getAs[Long]("jsd_mu") == present + absent, s"source $s")
    }
    // identical source = corpus → jsd 0
    val one = operators.InfoTheory
      .jsDivergenceOf(Seq((1L, "a b c", "only")).toDF("doc_id", "text", "source"))
      .collect()(0)
    assert(one.getAs[Long]("jsd_mu") == 0L)
  }

  test("ESS: registered query is bounded by n and positive on sf0.001") {
    val r = SparkEntry.queries("docs_ess_weights")(spark, "/root/testdata/sf0.001").collect()(0)
    val n = r.getAs[Long]("n_docs")
    assert(n > 0)
    assert(r.getAs[Long]("ess_c") > 0 && r.getAs[Long]("ess_c") <= n * 100)
    assert(r.getAs[Long]("ess_ratio_qm") > 0 && r.getAs[Long]("ess_ratio_qm") <= 10000L)
  }

  private def evFrame(rows: Seq[(Long, Long, Long, String, Double)]) = {
    import spark.implicits._
    rows
      .toDF("event_id", "us", "user_id", "event_type", "value")
      .select(
        col("event_id"),
        timestamp_micros(col("us")).as("ts"),
        col("user_id"),
        col("event_type"),
        col("value"),
        col("us")
      )
  }

  test("stationary distribution replays the integer power-method recurrence exactly") {
    // user 1 sequence v,v,v,c,v → steps v→v ×2, v→c ×1, c→v ×1; both
    // states have outgoing edges so nothing is restricted away. True
    // stationary is (3/4, 1/4); the spec replays the IDENTICAL floor-
    // division recurrence rather than trusting hand arithmetic.
    val ev = evFrame(
      Seq("view", "view", "view", "click", "view").zipWithIndex.map { case (t, i) =>
        (i.toLong, i.toLong * 1000000L + 1L, 1L, t, 1.0)
      }
    )
    val got = operators.TransitionQueries
      .stationaryOf(ev)
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("pi_mu"), r.getAs[Long]("pi_pm")))
      .toMap
    var v = 1000000L; var c = 1000000L
    for (_ <- 1 to 8) {
      val nv = (v * 2) / 3 + c
      val nc = v / 3
      v = nv; c = nc
    }
    val tot = v + c
    assert(got("view") == ((v, v * 10000 / tot)))
    assert(got("click") == ((c, c * 10000 / tot)))
    assert(math.abs(got("view")._2 - 7500L) <= 2, got("view"))
    // dangling restriction: "a a a a b" — b never transitions out, so
    // the chain closes over {a} alone with all the mass.
    val ev2 = evFrame(
      Seq("a", "a", "a", "a", "b").zipWithIndex.map { case (t, i) =>
        (i.toLong, i.toLong * 1000000L + 1L, 1L, t, 1.0)
      }
    )
    val got2 = operators.TransitionQueries.stationaryOf(ev2).collect()
    assert(got2.length == 1 && got2(0).getString(0) == "a")
    assert(got2(0).getAs[Long]("pi_pm") == 10000L)
  }

  test("last-touch attribution credits carry-across-days and direct purchases") {
    val day = 86400000000L
    val ev = evFrame(
      Seq(
        (1L, 1000000L, 1L, "view", 1.0),
        (2L, 2000000L, 1L, "purchase", 10.0), // → view
        (3L, 3000000L, 1L, "purchase", 5.0), // prior purchase skipped → view
        (4L, 500000L, 2L, "purchase", 2.0), // no prior → direct
        (5L, 1000L, 3L, "click", 1.0), // day 0
        (6L, 2 * day + 1000L, 3L, "purchase", 1.0) // day 2 → click via carry
      )
    )
    val got = operators.JoinQueries
      .attributionOf(ev)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_purchases"), r.getAs[Long]("value_c"), r.getAs[Long]("share_pm"))))
      .toMap
    assert(got("view") == ((2L, 1500L, 1500L * 10000 / 1800)))
    assert(got("direct") == ((1L, 200L, 200L * 10000 / 1800)))
    assert(got("click") == ((1L, 100L, 100L * 10000 / 1800)))
  }

  test("WordPiece MaxMatch segments by longest vocabulary prefix") {
    import spark.implicits._
    // corpus: "ab"×5 + "abc"×1 → mined vocab = singles {a,b,c} + "ab"
    // (pc 6 ≥ MinCount); "abc"/"bc" stay below MinCount. Greedy on
    // "abc": longest match at 0 is "ab", then "c".
    val docs = Seq((1L, "ab ab ab ab ab abc")).toDF("doc_id", "text")
    val got = operators.WordPiece
      .encodeOf(docs)
      .collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("wp_pieces"), r.getAs[String]("seg"))))
      .toMap
    assert(got("ab") == ((1L, "ab")))
    assert(got("abc") == ((2L, "ab c")))
  }

  test("k-anonymity flags cells under K distinct users and rolls up per type") {
    val ev = evFrame(
      // type "a": one day-0 band-0 cell, 3 events / 1 user → risky.
      Seq((1L, 1000L, 7L, "a", 1.0), (2L, 2000L, 7L, "a", 2.0), (3L, 3000L, 7L, "a", 3.0)) ++
        // type "b": one cell with 5 distinct users → safe at K=5.
        (1L to 5L).map(u => (10L + u, 4000L + u, u, "b", 10.0))
    )
    val got = operators.PrivacyQueries
      .kAnonymityOf(ev)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    val a = got("a")
    assert(a.getAs[Long]("n_cells") == 1L && a.getAs[Long]("risky_cells") == 1L)
    assert(a.getAs[Long]("risky_events") == 3L && a.getAs[Long]("risky_share_pm") == 10000L)
    assert(a.getAs[Long]("min_cell_users") == 1L)
    val b = got("b")
    assert(b.getAs[Long]("risky_cells") == 0L && b.getAs[Long]("risky_share_pm") == 0L)
    assert(b.getAs[Long]("min_cell_users") == 5L)
  }

  test("IVF-PQ recall eval produces per-query permille rows on sf0.001") {
    val rows = SparkEntry.queries("ann_recall_ivfpq")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val rp = r.getAs[Long]("recall_permille")
      assert(rp >= 0 && rp <= 1000, r)
      assert(r.getAs[Long]("k") == 5L)
    }
  }

  test("LSH banding planner: expected recall is monotone in rows-per-band") {
    val rows = SparkEntry
      .queries("dedup_lsh_plan")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[Long]("rows_per_band") -> r.getAs[Long]("exp_recall_mu"))
      .sortBy(_._1)
    assert(rows.length == 6)
    // fixed hash budget: more rows per band = stricter bands = recall
    // can only drop (equality allowed — exact duplicates detect at 1.0
    // under every split).
    rows.sliding(2).foreach { case Array((r1, e1), (r2, e2)) =>
      assert(e1 >= e2, s"recall must not rise from r=$r1 ($e1) to r=$r2 ($e2)")
    }
    // the 12-band/1-row split detects an s ≥ 0.8 pair w.p. ≥ 1−0.2^12.
    assert(rows.head._2 >= 990000L, rows.head)
  }

  test("tokenizer comparison joins both rules over one vocabulary") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab ab ab ab abc")).toDF("doc_id", "text")
    val rows = operators.WordPiece
      .compareOf(docs)
      .collect()
      .map(r => r.getString(0) -> r)
      .toMap
    assert(rows.keySet == Set("unigram_viterbi", "wordpiece_greedy"))
    // both rules see the same 2 distinct words ("ab" ×5, "abc" ×1), and
    // on this corpus both segment identically (ab → [ab], abc → [ab, c])
    for (r <- rows.values) {
      assert(r.getAs[Long]("n_words") == 2L)
      assert(r.getAs[Long]("w_words") == 6L)
      assert(r.getAs[Long]("w_pieces") == 5L * 1 + 1L * 2)
      assert(r.getAs[Long]("agree_words") == 2L)
      assert(r.getAs[Long]("mean_pieces_c") == (7L * 100) / 6)
    }
  }

  test("mu-law expansion matches JDK javax.sound's independent G.711 decoder") {
    import javax.sound.sampled._
    val codes = (0 until 256).map(_.toByte).toArray
    val ulawFmt = new AudioFormat(AudioFormat.Encoding.ULAW, 8000f, 8, 1, 1, 8000f, false)
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(codes), ulawFmt, codes.length.toLong)
    val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
    val buf = pcm.readAllBytes()
    assert(buf.length == 512)
    for (i <- 0 until 256) {
      val jdk = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
      assert(jdk == operators.Multimodal.mulawExpand(i), s"code $i")
    }
  }

  test("mu-law sample stats match the JVM expansion on sf0.001") {
    val rows = SparkEntry
      .queries("multimodal_mulaw_samples")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.take(5).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = (id % 60 + 8).toInt
      val samples = (0 until n).map(k => operators.Multimodal.mulawExpand(((id * 13 + k * 7) % 256).toInt))
      assert(r.getAs[Long]("n_samples") == n.toLong)
      assert(r.getAs[Long]("mean_abs_c") == samples.map(s => math.abs(s).toLong).sum * 100 / n)
      assert(r.getAs[Long]("sum_sq") == samples.map(s => s.toLong * s).sum)
    }
  }

  test("embedding variance profile is exact on a hand matrix") {
    import spark.implicits._
    // two 64-dim vectors: dim 0 carries (1.0, 3.0) → mean 2.0, var 1.0;
    // every other dim is constant 0.5 → var 0.
    def vec(d0: Float) = (Array(d0) ++ Array.fill(63)(0.5f)).toSeq
    val embs = Seq((1L, vec(1.0f)), (2L, vec(3.0f))).toDF("vec_id", "embedding")
    val rows = operators.PcaPower
      .varianceProfileOf(embs)
      .collect()
      .map(r => r.getAs[Long]("dim") -> r)
      .toMap
    assert(rows(0L).getAs[Long]("mean_mq") == 2000L) // milli-units
    assert(rows(0L).getAs[Long]("var_mq2") == 1000000L) // (1000 mq)^2
    assert(rows(5L).getAs[Long]("var_mq2") == 0L)
    assert(rows.size == 64)
  }

  test("bot score separates a hammering bot from a diverse human") {
    val day = 86400000000L
    val bot = (0L until 200L).map(k => (k, k * 1000000L, 1L, "click", 1.0))
    val human = Seq(
      (500L, 1000L, 2L, "view", 1.0),
      (501L, day + 1000L, 2L, "click", 1.0),
      (502L, 2 * day + 1000L, 2L, "purchase", 5.0)
    )
    val got = operators.AnomalyQueries
      .botScoreOf(evFrame((bot ++ human).toSeq).drop("us"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r)
      .toMap
    val b = got(1L); val h = got(2L)
    assert(b.getAs[Long]("concentration_pm") == 10000L)
    assert(b.getAs[Long]("rate_c") == 20000L) // 200 events / 1 day
    // 20000 div 10 + 10000 div 2 + 10000 div 5 = 2000+5000+2000 = 9000
    assert(b.getAs[Long]("bot_score_pm") == 9000L)
    assert(h.getAs[Long]("n_types") == 3L && h.getAs[Long]("rate_c") == 100L)
    assert(h.getAs[Long]("bot_score_pm") < 4500L, h)
  }

  test("PQ distortion is zero when every vector sits on a seed centroid") {
    import spark.implicits._
    // 64 vectors, each equal to one of the 16 seed vectors (vec_id < 16
    // seed the codebooks) → Lloyd converges immediately and every
    // vector reconstructs exactly: distortion 0 in all 8 subspaces.
    def vec(c: Int) = Array.tabulate(64)(d => (c * 64 + d).toFloat / 100f).toSeq
    val embs = (0 until 64).map(i => (i.toLong, vec(i % 16))).toDF("vec_id", "embedding")
    val rows = operators.PqTrain.distortionOf(embs).collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_vecs") == 64L)
      assert(r.getAs[Long]("sum_err_mu") == 0L, r)
    }
  }

  test("ngram novelty separates unique text from assembled phrases") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta", "A"), // grams: a-b-g, b-g-d — both unique → 10000
      (2L, "the quick brown fox", "A"),
      (3L, "the quick brown wolf", "B") // shares "the quick brown" with doc 2
    ).toDF("doc_id", "text", "source")
    val got = operators.NoveltyQueries
      .ngramNoveltyOf(docs)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_grams"), r.getAs[Long]("novelty_pm"))))
      .toMap
    assert(got(1L) == ((2L, 10000L)))
    assert(got(2L) == ((2L, 5000L))) // "the quick brown" shared, "quick brown fox" unique
    assert(got(3L) == ((2L, 5000L)))
  }

  test("template-prefix mining groups shared 8-token headers across sources") {
    import spark.implicits._
    val header = "terms of service apply to all content here"
    val docs = Seq(
      (1L, s"$header body one", "A"),
      (2L, s"$header body two entirely different", "B"),
      (3L, "unrelated text with no family", "A")
    ).toDF("doc_id", "text", "source")
    val rows = operators.NoveltyQueries.templatePrefixOf(docs).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[String]("prefix") == "terms of service apply to all content here".split(" ").take(8).mkString(" "))
    assert(r.getAs[Long]("n_docs") == 2L && r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("share_pm") == 2L * 10000 / 3)
  }

  test("RFM quintile scores: inverted recency, tie-flat frequency, monetary ladder") {
    val day = 86400000000L
    // five users, one purchase each: days 0..4, values $1..$5
    val ev = evFrame(
      (0 until 5).map(i => (i.toLong, i * day + 5L, 10L + i, "purchase", (i + 1).toDouble))
    )
    val got = operators.SequenceQueries
      .rfmOf(ev.drop("us"))
      .collect()
      .map(r => r.getAs[Long]("user_id") -> r)
      .toMap
    // user 14 bought most recently ($5): R=5, F=1 (all tie at 1), M=5.
    assert(got(14L).getAs[Long]("rfm") == 515L, got(14L))
    // user 10 bought first ($1): R=1, F=1, M=1.
    assert(got(10L).getAs[Long]("rfm") == 111L, got(10L))
    assert(got(12L).getAs[Long]("r_score") == 3L)
    assert(got.values.forall(_.getAs[Long]("f_score") == 1L))
  }

  test("nprobe recall curve is per-query monotone (probing more cells never hurts)") {
    val rows = SparkEntry
      .queries("ann_recall_nprobe")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nprobe")) -> r.getAs[Long]("recall_permille"))
      .toMap
    val queries = rows.keys.map(_._1).toSeq.distinct
    assert(queries.nonEmpty)
    // candidates(nprobe) is a superset chain and truth shares the score
    // metric, so per-query recall can only rise with more probes.
    queries.foreach { q =>
      assert(rows((q, 1L)) <= rows((q, 2L)) && rows((q, 2L)) <= rows((q, 4L)), s"query $q")
    }
  }

  test("assortativity and acf registered queries run end-to-end on sf0.001") {
    assert(SparkEntry.queries("graph_assortativity")(spark, "/root/testdata/sf0.001").collect().nonEmpty)
    assert(SparkEntry.queries("events_acf")(spark, "/root/testdata/sf0.001").collect().nonEmpty)
    assert(SparkEntry.queries("docs_js_divergence")(spark, "/root/testdata/sf0.001").collect().nonEmpty)
    assert(SparkEntry.queries("events_stationary")(spark, "/root/testdata/sf0.001").collect().nonEmpty)
    assert(SparkEntry.queries("events_attribution")(spark, "/root/testdata/sf0.001").collect().nonEmpty)
  }
}
