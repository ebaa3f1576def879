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

  test("byte symbols are the GPT-2 bytes_to_unicode bijection") {
    // spot-check the three regions of the law: printable identity,
    // latin-1 identity, and the 256+n remap of excluded bytes
    assert(Bpe.ByteSyms('a'.toInt) == "a" && Bpe.ByteSyms('!'.toInt) == "!")
    assert(Bpe.ByteSyms(0xa9) == "©" && Bpe.ByteSyms(0xff) == "ÿ")
    assert(Bpe.ByteSyms(0) == "Ā") // first excluded byte → U+0100
    assert(Bpe.ByteSyms(' '.toInt) == "Ġ") // space → Ġ (the GPT-2 classic)
    assert(Bpe.ByteSyms.distinct.size == 256) // bijective
    // column expression agrees with the JVM mirror on multibyte text
    val rows = Seq("héllo", "日本語", "naïve", "x")
      .toDF("w")
      .select(col("w"), Bpe.byteSymbols(col("w")).as("syms"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == Bpe.byteSymsOf(r.getString(0)), r.getString(0))
    }
  }

  test("byte-level encode is lossless on arbitrary UTF-8 (property)") {
    val rnd = new scala.util.Random(42)
    val words = (0 until 200).map { _ =>
      val n = 1 + rnd.nextInt(12)
      (0 until n).map { _ =>
        // mix ASCII, latin-1, CJK, and astral codepoints
        rnd.nextInt(4) match {
          case 0 => ('a' + rnd.nextInt(26)).toChar.toString
          case 1 => (0xa1 + rnd.nextInt(0x5e)).toChar.toString
          case 2 => (0x4e00 + rnd.nextInt(1000)).toChar.toString
          case _ => new String(Character.toChars(0x1f300 + rnd.nextInt(100)))
        }
      }.mkString
    }.distinct
    val rows = words
      .toDF("w")
      .select(col("w"), Bpe.encodeByteWord(col("w")).as("toks"))
      .collect()
    rows.foreach { r =>
      val w = r.getString(0)
      val toks = r.getSeq[String](1)
      assert(Bpe.detokenize(toks) == w, s"lossy: $w -> $toks")
    }
  }

  test("byte-level merges cross UTF-8 multibyte boundaries") {
    val rows = Seq("héllo", "ähnlich", "öre")
      .toDF("w")
      .select(col("w"), Bpe.encodeByteWord(col("w")).as("toks"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
    // é = 0xC3 0xA9 → syms Ã © → merged to one token by the Ã+© rule
    assert(rows("héllo").contains("Ã©"), rows("héllo"))
    assert(rows("ähnlich").contains("Ã¤"), rows("ähnlich"))
    assert(rows("öre").contains("Ã¶"), rows("öre"))
  }

  test("byte-level train learns byte merges over a multibyte vocab") {
    val docs = Seq.tabulate(20)(i => (i.toLong, "héé héé zz")).toDF("doc_id", "text")
    val v = docs
      .select(explode(graft.functions.TextFunctions.words(col("text"))).as("w"))
      .filter(octet_length(encode(col("w"), "UTF-8")) >= 2)
      .groupBy("w")
      .agg(count(lit(1)).as("f"))
      .withColumn("syms", Bpe.byteSymbols(col("w")))
    val merges = Bpe.train(v, 2)
    // héé = 68 C3A9 C3A9: (Ã,©) counts 2/word → first merge. Step 2 is
    // a 40-40 tie between (h,Ã©) and (Ã©,Ã©); byte-wise string order
    // (h=0x68 < Ã=0xC3, identical in Spark and DuckDB) breaks it to h.
    assert(merges.head == ("Ã" -> "©"), merges)
    assert(merges(1) == ("h" -> "Ã©"), merges)
  }
}
