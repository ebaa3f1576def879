package graft

import org.apache.spark.sql.functions._

/** Round-10 additions: the unigram-LM EM trainer. */
class RoundTenOpsSpec extends SparkSuite {

  private def mu(x: Double): Long =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  test("unigram EM re-estimates counts from Viterbi paths and reaches a fixpoint") {
    import spark.implicits._
    // Corpus "ab"×6 + "c": seed vocab = {a, b, c, ab} (RoundNineOpsSpec
    // proves the mining). Hard-EM iteration 1 segments "ab" as the ONE
    // piece "ab" and "c" as "c", so used counts are ab=6, c=1; the
    // immortal singles a/b keep count 1. tp = 9, and because
    // ln p(ab) = ln(6/9) beats ln p(a)+ln p(b) = 2·ln(1/9) by miles,
    // iterations 2 and 3 re-derive the SAME segmentation — the trainer
    // must land on the fixpoint vocabulary.
    val docs = Seq((1L, "ab ab ab ab ab ab c")).toDF("doc_id", "text")
    val out = operators.UnigramLm
      .trainOf(docs)
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("pc"), r.getAs[Long]("lp_mu")))
      .toMap
    assert(out.keySet == Set("a", "b", "c", "ab"), out)
    assert(out("ab") == ((6L, mu(math.log(6.0 / 9)))), out("ab"))
    assert(out("c") == ((1L, mu(math.log(1.0 / 9)))))
    assert(out("a") == ((1L, mu(math.log(1.0 / 9)))))
    assert(out("b") == ((1L, mu(math.log(1.0 / 9)))))
  }

  test("de-skewed sessionize stitches sessions across midnights, chains included") {
    import spark.implicits._
    val day = 86400000000L
    val m = 60000000L
    // user 1: cross-midnight merge, then a fresh same-day session, then
    // a session chaining day1→day2, then a fresh day3 session.
    val u1 = Seq(
      day - 10 * m, // d0                        session 1
      day + 5 * m, // d1, gap 15m  → merges      session 1
      day + 50 * m, // d1, gap 45m → new         session 2
      2 * day - 1 * m, // d1, gap big → new      session 3
      2 * day + 10 * m, // d2, gap 11m → merges  session 3
      3 * day + 10 * m // d3, gap 24h → new      session 4
    ).map((1L, _))
    // user 2: ONE session spanning two midnights — every gap is 25m, so
    // day1 contributes a single local session that merges backward AND
    // forwards (a zero-new-sessions day, the chain case).
    val u2 = (0L to ((3 * day + 120 * m - (day - 60 * m)) / (25 * m)))
      .map(k => (2L, day - 60 * m + k * 25 * m))
    val all = (u1 ++ u2).zipWithIndex.map { case ((u, us), i) =>
      (i.toLong, us, u, "click", 1.5)
    }
    val dir = java.nio.file.Files.createTempDirectory("sess10").toString
    all
      .toDF("event_id", "usv", "user_id", "event_type", "value")
      .select(
        col("event_id"),
        timestamp_micros(col("usv")).as("ts"),
        col("user_id"),
        col("event_type"),
        col("value")
      )
      .write
      .mode("overwrite")
      .parquet(s"$dir/events.parquet")
    val out = SparkEntry
      .queries("events_sessionize")(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_idx")) -> r.getAs[Long]("n_events"))
      .toMap
    val u1Sessions = out.keys.filter(_._1 == 1L).map(_._2).toSeq.sorted
    assert(u1Sessions == Seq(1L, 2L, 3L, 4L), out)
    assert(out((1L, 1L)) == 2L)
    assert(out((1L, 3L)) == 2L)
    // user 2 collapses to ONE session holding every event.
    val u2Sessions = out.keys.filter(_._1 == 2L).toSeq
    assert(u2Sessions == Seq((2L, 1L)), out)
    assert(out((2L, 1L)) == u2.size.toLong)
  }

  test("PQ training recovers planted per-subspace clusters exactly") {
    import spark.implicits._
    // 80 vectors: vector i sits at value (i%16)·0.1 + 0.001·(i div 16)
    // on EVERY dim, so each subspace has 16 planted clusters of 5
    // members centered on the 16 seed vectors (vec_id < 16 ARE the
    // centers). Two Lloyd rounds must keep the planted assignment and
    // report the exact integer statistics: n = 5 members, s_mu =
    // 5·100000·c + 1000·(0+1+2+3+4) per (sub, code=c, dim).
    val embs = (0 until 80)
      .map { i =>
        (i.toLong, Array.fill(64)(((i % 16) * 0.1 + 0.001 * (i / 16)).toFloat))
      }
      .toDF("vec_id", "embedding")
    val out = operators.PqTrain
      .trainOf(embs)
      .collect()
      .map(r =>
        (r.getAs[Long]("sub"), r.getAs[Long]("code"), r.getAs[Long]("dim")) ->
          (r.getAs[Long]("n"), r.getAs[Long]("s_mu"))
      )
      .toMap
    assert(out.size == 8 * 16 * 8, out.size)
    for (m <- 0L until 8L; c <- 0L until 16L; d <- 1L to 8L) {
      val (n, s) = out((m, c, d))
      assert(n == 5L, s"($m,$c,$d)")
      assert(s == 500000L * c + 10000L, s"($m,$c,$d) -> $s")
    }
  }

  test("modularity matches the hand-computed two-triangle graph") {
    import spark.implicits._
    // Two triangles bridged by one edge; the partition = the triangles.
    // m=7, intra=6, deg_A=deg_B=7 => Q = (4*7*6 - 98)/(4*49) = 70/196.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L))
      .toDF("doc_a", "doc_b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("doc_id", "cluster_id")
    val r = operators.GraphMetrics.modularityOf(edges, labels).collect().head
    assert(r.getAs[Long]("n_edges") == 7L)
    assert(r.getAs[Long]("n_intra") == 6L)
    assert(r.getAs[Long]("n_clusters") == 2L)
    assert(r.getAs[Long]("modularity_pm") == 3571L) // 700000 div 196
  }

  test("held-out perplexity trains on the train split only and charges OOV mass") {
    import spark.implicits._
    // Train: "a a b" + "a b" (cu: a=3, b=2; NT=5, V=2 => denom 8).
    // Test doc 17: "a c" => p(a)=4/8, p(c)=1/8 (pure OOV mass).
    val dir = java.nio.file.Files.createTempDirectory("ppl10").toString
    Seq(
      (1L, "a a b", "en", "s"),
      (2L, "a b", "en", "s"),
      (17L, "a c", "en", "s")
    ).toDF("doc_id", "text", "lang", "source")
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("docs_ppl_holdout")(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("doc_id") == 17L)
    assert(r.getAs[Long]("n_tokens") == 2L)
    assert(r.getAs[Long]("n_oov") == 1L)
    val tA = math.round(math.log(4.0 / 8) * 1e6) // -693147
    val tC = math.round(math.log(1.0 / 8) * 1e6) // -2079442
    assert(r.getAs[Long]("avg_lp_mu") == (tA + tC) / 2)
  }

  test("native winnow-anchor kernel equals the composed HOF specification") {
    // Set equality over the real corpus (positions AND gram content),
    // plus the short-text degenerate window (< stride hashes) case.
    import spark.implicits._
    val corpus = operators.LlmQueries.corpus(spark, "/root/testdata/sf0.001")
    def setOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos"), r.getString(2))).toSet
    val native = setOf(operators.CurationQueries.anchorsOf(corpus))
    val composed = setOf(operators.CurationQueries.anchorsOfComposed(corpus))
    assert(native.nonEmpty)
    assert(native == composed)
    // Short text: G=40 fits once, so ONE degenerate window of 8 hashes
    // or fewer — both forms must pick the same rightmost-min anchor.
    val short = Seq((1L, "x" * 45)).toDF("doc_id", "text")
    assert(
      setOf(operators.CurationQueries.anchorsOf(short)) ==
        setOf(operators.CurationQueries.anchorsOfComposed(short))
    )
  }

  test("strided-span digest census equals the exact-string census") {
    // Round-14: stridedSpansOf groups/joins the duplicate-gram census on
    // unhex(md5(g)) instead of the 40-char gram itself (narrower
    // shuffles). Equality of the FINAL span output against a variant
    // built on the exact string census pins the key substitution; the
    // DuckDB oracle (exact strings) certifies it independently per sweep.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val corpus = operators.LlmQueries.corpus(spark, "/root/testdata/sf0.001")
    def spansWithKey(useDigest: Boolean): Set[(Long, Long, Long, Long, Long)] = {
      val g = 40
      val raw = operators.CurationQueries.anchorsOf(corpus)
      val anchors =
        if (useDigest) raw.select(col("doc_id"), col("pos"), unhex(md5(col("g"))).as("g"))
        else raw
      val dup = anchors.groupBy("g").agg(count(lit(1)).as("c")).filter(col("c") > 1).select("g")
      val occ = anchors.join(dup, Seq("g")).select(col("doc_id"), col("pos"), (col("pos") + (g - 1)).as("e"))
      val byPos = Window.partitionBy("doc_id").orderBy("pos")
      val prevMax = max(col("e")).over(byPos.rowsBetween(Window.unboundedPreceding, -1))
      occ
        .withColumn("ni", when(prevMax.isNull || col("pos") > prevMax + 1, 1L).otherwise(0L))
        .withColumn("island", sum(col("ni")).over(byPos.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy("doc_id", "island")
        .agg(min(col("pos")).as("s0"), max(col("e")).as("e0"), count(lit(1)).as("na"))
        .select(
          col("doc_id"),
          col("s0").cast("long"),
          col("e0").cast("long"),
          (col("e0") - col("s0") + 1).cast("long"),
          col("na").cast("long")
        )
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
    }
    val withDigest = spansWithKey(useDigest = true)
    val withString = spansWithKey(useDigest = false)
    assert(withDigest.nonEmpty)
    assert(withDigest == withString)
    // And the production operator (which rides the digest) agrees too.
    val prod = operators.CurationQueries
      .stridedSpansOf(corpus)
      .collect()
      .map(r =>
        (
          r.getAs[Long]("doc_id"),
          r.getAs[Long]("span_start"),
          r.getAs[Long]("span_end"),
          r.getAs[Long]("span_len"),
          r.getAs[Long]("n_anchors")
        )
      )
      .toSet
    graft.Lineage.releaseHeld()
    assert(prod == withString)
  }

  test("silhouette is exactly 10000 pm for two coincident-member classes") {
    import spark.implicits._
    // Every class-0 vector sits exactly at 0.1, every class-1 vector at
    // 0.9: d1 = 0, d2 > 0 for all rows, so s = 1 - sqrt(0/d2) = 1.
    val embs = (0 until 20)
      .map(i => (i.toLong, i % 2, Array.fill(64)(if (i % 2 == 0) 0.1f else 0.9f)))
      .toDF("vec_id", "label", "embedding")
    val out = operators.CentroidClassify
      .silhouetteOf(embs)
      .collect()
      .map(r => r.getAs[Long]("cluster") -> (r.getAs[Long]("n"), r.getAs[Long]("mean_sil_pm")))
      .toMap
    assert(out == Map(0L -> ((10L, 10000L)), 1L -> ((10L, 10000L))), out)
  }

  test("anisotropy reports perfect alignment for a rank-one corpus") {
    import spark.implicits._
    // All vectors identical (0.5 per dim): mean = the vector, cosine to
    // the mean = 1 exactly; nrm2 = 64 * 500^2 => norm_mu = 4000.
    val embs = (0 until 12)
      .map(i => (i.toLong, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val r = operators.PcaPower.anisotropyOf(embs).collect().head
    assert(r.getAs[Long]("n") == 12L)
    assert(r.getAs[Long]("mean_norm_mu") == 4000L)
    assert(r.getAs[Long]("mean_cos_pm") == 10000L)
    assert(r.getAs[Long]("mean_abs_cos_pm") == 10000L)
  }

  test("unigram EM counts repeated piece uses within one word") {
    import spark.implicits._
    // "abab"×4 + "ab"×6 + "c": every multi-char piece except "ab"
    // occurs only 4 < MinCount times, so the seed vocab is
    // {a, b, c, ab} and "abab" can ONLY segment as ab+ab — two USES
    // of the same piece in one path. c(ab) = 2·4 + 6 = 14 must
    // survive the pick explode; a backtrack that deduplicated picks
    // per word would report 10. Fixpoint check: tp = 17 after
    // iteration 1 (ab=14 + immortal a/b/c at 1 each).
    val docs = Seq((1L, Seq.fill(4)("abab").mkString(" ") + " " +
      Seq.fill(6)("ab").mkString(" ") + " c")).toDF("doc_id", "text")
    val out = operators.UnigramLm
      .trainOf(docs)
      .collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("pc"), r.getAs[Long]("lp_mu")))
      .toMap
    assert(out.keySet == Set("a", "b", "c", "ab"), out)
    assert(out("ab") == ((14L, mu(math.log(14.0 / 17)))), out("ab"))
    assert(out("c") == ((1L, mu(math.log(1.0 / 17)))))
  }
}
