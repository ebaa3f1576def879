package graft

import graft.functions.TextFunctions._
import graft.plans.MinHashSigExpr
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.functions._

/** The native MinHash kernel must be bit-identical to the composed-builtin
  * pipeline it replaces on the hot path (the composed form is the
  * cross-engine specification the DuckDB oracle checks).
  */
class MinHashSigSpec extends SparkSuite {

  private def nativeSig(k: Int = 12, n: Int = 3) =
    GraftColumn.of(MinHashSigExpr(GraftColumn.exprOf(col("text")), k, n))

  private def composedSig(k: Int = 12, n: Int = 3) =
    signatureFromHashes(shingleHashes(shingles(col("text"), n)), k)

  test("native == composed on edge-case fixtures") {
    import spark.implicits._
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "one two three",
      "one two", // fewer words than the shingle size
      "single",
      "", // empty text
      "   leading and   trailing   whitespace\t\n mixed ",
      "UPPER Case MiXeD",
      "unicode éèü words 你好 here repeated words here",
      "a b c d e f g h i j k l m n o p"
    ).toDF("text")
    val rows = docs
      .select(nativeSig().as("nat"), composedSig().as("comp"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch: $r")
    }
  }

  test("native == composed over the sf0.001 documents table") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = docs
      .select(nativeSig().as("nat"), composedSig().as("comp"))
      .filter(not(col("nat") === col("comp")))
      .count()
    assert(bad == 0)
  }

  test("non-default k and shingle size agree too") {
    import spark.implicits._
    val docs = Seq("alpha beta gamma delta epsilon zeta").toDF("text")
    val r = docs
      .select(nativeSig(k = 5, n = 2).as("nat"), composedSig(k = 5, n = 2).as("comp"))
      .collect()(0)
    assert(r.getSeq[Long](0) == r.getSeq[Long](1))
  }
}
