package graft

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

/** Property-style specs for the text/vector primitives. */
class TextVectorSpec extends SparkSuite {

  private def eval1(c: org.apache.spark.sql.Column, input: String): Any = {
    import spark.implicits._
    Seq(input).toDF("x").select(c.as("r")).collect()(0).get(0)
  }

  test("shingles: n-grams for long texts, whole text when short") {
    val sh = eval1(shingles(col("x"), 3), "a b c d").asInstanceOf[scala.collection.Seq[String]]
    assert(sh == Seq("a b c", "b c d"))
    val short = eval1(shingles(col("x"), 3), "a b").asInstanceOf[scala.collection.Seq[String]]
    assert(short == Seq("a b"))
  }

  test("minhash signature is invariant to duplicated shingle content") {
    // appending a copy of an existing shingle never changes any minimum
    val s1 = eval1(minhashSignature(col("x"), 8), "a b c d e f").asInstanceOf[scala.collection.Seq[Long]]
    val s2 = eval1(minhashSignature(col("x"), 8), "a b c d e f a b c").asInstanceOf[scala.collection.Seq[Long]]
    // s2's shingle set is a superset; each min can only stay or decrease
    s1.zip(s2).foreach { case (m1, m2) => assert(m2 <= m1) }
  }

  test("identical texts collide on every LSH band") {
    import spark.implicits._
    val df = Seq(("a", "same words here in doc"), ("b", "same words here in doc"))
      .toDF("id", "text")
    val bands = df.select(
      col("id"),
      lshBands(minhashSignature(col("text"), 12), 4, 3).as("bands")
    )
    val rows = bands.collect().map(r => r.getSeq[String](1))
    assert(rows(0) == rows(1))
  }

  test("simhash of identical texts equal; bit length correct") {
    val h1 = eval1(simhash(col("x"), 32), "spark engine rows").toString
    val h2 = eval1(simhash(col("x"), 32), "spark engine rows").toString
    assert(h1 == h2 && h1.length == 32 && h1.forall(c => c == '0' || c == '1'))
  }

  test("cosine similarity: identical vectors score 1, orthogonal 0") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)))
      .toDF("a", "b", "c")
    val r = df
      .select(
        round(cosine(col("a"), col("b")), 9).as("same"),
        round(cosine(col("a"), col("c")), 9).as("orth")
      )
      .collect()(0)
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 0.0)
  }

  test("languageId picks the stopword-richest language") {
    assert(eval1(languageId(col("x")), "the cat and the dog of it") == "en")
    assert(eval1(languageId(col("x")), "el que de la y en los") == "es")
    assert(eval1(languageId(col("x")), "zzz qqq www") == "und")
  }

  test("docs_langid_paragraphs flags mixed documents and rolls up majorities") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val s = spark
    val dir = "/tmp/graft_langpara_spec_" + System.nanoTime()
    val schema = StructType(
      Seq(StructField("doc_id", LongType), StructField("text", StringType))
    )
    val rows = Seq(
      // 2 English lines + 1 Spanish: majority en at 666 permille -> mixed.
      Row(0L, "the cat and the dog\nel que de la y en los\nthe end of it"),
      // 3 English lines: majority 1000 permille, not mixed.
      Row(1L, "the cat and the dog\nthe end of it\nand so the story goes"),
      // Empty: und / 0 paragraphs / not mixed.
      Row(2L, "")
    )
    s.createDataFrame(s.sparkContext.parallelize(rows), schema)
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    try {
      val m = SparkEntry
        .queries("docs_langid_paragraphs")(s, dir)
        .collect()
        .map(r => r.getLong(0) -> r)
        .toMap
      val d0 = m(0L)
      assert(d0.getAs[String]("majority_lang") == "en")
      assert(d0.getAs[Long]("majority_permille") == 666L)
      assert(d0.getAs[Long]("n_langs") == 2L)
      assert(d0.getAs[Boolean]("is_mixed"))
      val d1 = m(1L)
      assert(d1.getAs[String]("majority_lang") == "en")
      assert(d1.getAs[Long]("majority_permille") == 1000L)
      assert(!d1.getAs[Boolean]("is_mixed"))
      val d2 = m(2L)
      assert(d2.getAs[String]("majority_lang") == "und")
      assert(d2.getAs[Long]("n_paras") == 0L)
      assert(!d2.getAs[Boolean]("is_mixed"))
    } finally {
      def go(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(go)); f.delete(): Unit
      }
      go(new java.io.File(dir))
    }
  }

  test("embed_semdedup drops every injected exact duplicate, keeps one representative") {
    val rows = SparkEntry
      .queries("embed_semdedup")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Boolean]("kept"))
      .toMap
    // Injected exact copies (+200000) always have their lower-id original
    // in the same cell at cosine 1 — none may survive.
    val copies = rows.keys.filter(_ >= 200000)
    assert(copies.nonEmpty)
    copies.foreach(id => assert(!rows(id), s"exact copy $id was kept"))
    // Their originals are kept unless an even-lower cell-mate duplicates
    // them; at least one member of each exact pair must survive.
    copies.foreach { id =>
      assert(rows.contains(id - 200000), s"original of $id missing from output")
    }
  }
}
