package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

/** BPE training-loop behavior (the step query's oracle certifies one
  * merge; these pin the loop and the greedy-left fold edge cases).
  */
class BpeSpec extends SparkSuite {

  import spark.implicits._

  private def vocab(rows: (String, Long)*) =
    rows
      .toDF("w", "f")
      .withColumn(
        "syms",
        transform(sequence(lit(1), length(col("w"))), i => col("w").substr(i, lit(1)))
      )

  test("train learns merges in corpus-frequency order with deterministic ties") {
    val merges = Bpe.train(vocab("the" -> 10L, "then" -> 5L, "they" -> 3L, "he" -> 8L), 3)
    // (h,e) appears 26×, then (t,he) 18×, then (the,n) 5×
    assert(merges == Seq("h" -> "e", "t" -> "he", "the" -> "n"))
  }

  test("greedy-left self-pair merge collapses runs pairwise from the left") {
    val df = vocab("aaaa" -> 1L, "aaa" -> 1L, "baab" -> 1L)
      .select(col("w"), Bpe.mergePair(col("syms"), lit("a"), lit("a")).as("m"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
    assert(df("aaaa") == Seq("aa", "aa"))
    assert(df("aaa") == Seq("aa", "a"))
    assert(df("baab") == Seq("b", "aa", "b"))
  }

  test("merged symbols participate in later merges (multi-char pairs)") {
    val df = vocab("abab" -> 1L)
      .select(Bpe.mergePair(Bpe.mergePair(col("syms"), lit("a"), lit("b")), lit("ab"), lit("ab")))
      .collect()(0)
      .getSeq[String](0)
    assert(df == Seq("abab"))
  }

  test("train stops when no pairs remain") {
    // single two-char word: one merge exhausts every pair
    val merges = Bpe.train(vocab("ab" -> 4L), 10)
    assert(merges == Seq("a" -> "b"))
  }

  test("encodeWord applies the shipped merges in priority order") {
    val out = Seq("the", "then", "window", "x")
      .toDF("w")
      .select(col("w"), Bpe.encodeWord(col("w")).as("toks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
    // (t,h) then (th,e) chain into one symbol — multi-char merges fire.
    assert(out("the") == Seq("the"))
    assert(out("then") == Seq("the", "n"))
    // (i,n) fires first, then (in,d) on the merged symbol.
    assert(out("window") == Seq("w", "ind", "o", "w"))
    assert(out("x") == Seq("x"))
  }

  test("train → encodeWord closes the loop: learned merges drive encoding") {
    // Train on a tiny corpus, then encode with the LEARNED merge list —
    // the production path (train offline, ship the artifact, encode at
    // scale). First merge (h,e) must collapse everywhere it applies.
    val merges = Bpe.train(vocab("the" -> 10L, "then" -> 5L, "they" -> 3L, "he" -> 8L), 3)
    val out = Seq("he", "the", "hex", "then")
      .toDF("w")
      .select(col("w"), Bpe.encodeWord(col("w"), merges).as("toks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
    // learned: (h,e), (t,he), (the,n)
    assert(out("he") == Seq("he"))
    assert(out("the") == Seq("the"))
    assert(out("hex") == Seq("he", "x"))
    assert(out("then") == Seq("then"))
  }

  test("encodeWord tokens concatenate back to the word (lossless)") {
    val bad = Seq("stream", "anthracite", "queue", "sorting", "a")
      .toDF("w")
      .select(col("w"), array_join(Bpe.encodeWord(col("w")), "").as("glued"))
      .collect()
      .filter(r => r.getString(0) != r.getString(1))
    assert(bad.isEmpty, bad.mkString(","))
  }
}
