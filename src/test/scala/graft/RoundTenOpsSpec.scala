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
