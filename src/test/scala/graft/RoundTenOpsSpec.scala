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
