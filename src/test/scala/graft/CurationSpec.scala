package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the curation operators (exact values are
  * certified by the DuckDB oracle; these pin the properties a hash
  * compare can't express).
  */
class CurationSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("docs_duplicate_spans: planted exact copies surface as whole-doc spans") {
    val spans = SparkEntry
      .queries("docs_duplicate_spans")(spark, sf)
      .collect()
      .map(r =>
        (
          r.getAs[Long]("doc_id"),
          r.getAs[Long]("span_start"),
          r.getAs[Long]("span_end"),
          r.getAs[Long]("span_len")
        )
      )
    assert(spans.nonEmpty)
    // Spans are well-formed and at least gram-sized.
    spans.foreach { case (doc, s0, e0, l) =>
      assert(s0 >= 1 && e0 >= s0 && l == e0 - s0 + 1, s"malformed span on $doc")
      assert(l >= 40, s"span shorter than gram on $doc")
    }
    // Per-doc spans never overlap or touch (islands are maximal).
    spans.groupBy(_._1).foreach { case (doc, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(s2 > e1 + 1, s"doc $doc has mergeable spans")
        case _ => ()
      }
    }
    // A planted exact copy (doc_id+100000) duplicates its source text, so
    // both carry one span covering the entire document. (The 200000-series
    // near-copies share only their source-prefix — not asserted here.)
    val lens = operators.LlmQueries
      .corpus(spark, sf)
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("len"))
      .toMap
    val copied =
      lens.keys.filter(id => id >= 100000 && id < 200000).filter(id => lens(id) >= 40)
    assert(copied.nonEmpty)
    val byDoc = spans.groupBy(_._1)
    copied.foreach { id =>
      val ss = byDoc.getOrElse(id, Array.empty)
      assert(
        ss.exists(s => s._2 == 1 && s._3 == lens(id)),
        s"exact copy $id lacks a whole-doc span (len ${lens(id)}, got ${ss.toSeq})"
      )
    }
  }

  test("docs_gopher_rules: pass is the conjunction of the per-rule flags") {
    val rows = SparkEntry.queries("docs_gopher_rules")(spark, sf).collect()
    assert(rows.nonEmpty)
    val flags = Seq(
      "word_count_ok",
      "mean_word_len_ok",
      "symbol_ratio_ok",
      "bullet_ok",
      "ellipsis_ok",
      "alpha_ok",
      "stopwords_ok"
    )
    rows.foreach { r =>
      val expect = flags.forall(f => r.getAs[Boolean](f))
      assert(r.getAs[Boolean]("pass") == expect, s"doc ${r.getAs[Long]("doc_id")}")
    }
    // The word-count rule actually discriminates on this corpus.
    assert(rows.exists(_.getAs[Boolean]("word_count_ok")))
    assert(rows.exists(r => !r.getAs[Boolean]("word_count_ok")))
  }

  test("docs_ppl_buckets: per-language 30/70 cuts, every doc bucketed once") {
    val rows = SparkEntry.queries("docs_ppl_buckets")(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == nDocs)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (lang, rs) =>
      val n = rs.length.toLong
      val byBucket = rs.groupBy(_.getAs[String]("bucket")).view.mapValues(_.length.toLong).toMap
      val head = byBucket.getOrElse("head", 0L)
      val mid = byBucket.getOrElse("middle", 0L)
      assert(head == (3 * n) / 10, s"$lang head=$head n=$n")
      assert(head + mid == (7 * n) / 10, s"$lang head+mid=${head + mid} n=$n")
    }
  }

  test("pplBucketsOf keeps NULL-lang documents (sentinel join key, not a dropped group)") {
    // The histogram rewrite joins on the language key; a raw equi-join
    // would silently drop null-lang rows the old window form kept
    // (round-8 review). Null lang must come back bucketed, with its own
    // 30/70 cuts, and the lang column still null in the output.
    import org.apache.spark.sql.functions.{col, when}
    val docs = Tables
      .documents(spark, sf)
      .select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, null).otherwise(col("lang")).as("lang"),
        col("text")
      )
    val out = operators.CurationQueries.pplBucketsOf(docs).collect()
    assert(out.length == docs.count())
    val nullRows = out.filter(_.isNullAt(1))
    assert(nullRows.nonEmpty)
    val n = nullRows.length.toLong
    val head = nullRows.count(_.getAs[String]("bucket") == "head").toLong
    assert(head == (3 * n) / 10, s"null-lang head=$head n=$n")
  }

  test("docs_filter_chain: counts are monotone non-increasing across stages") {
    val rows = SparkEntry
      .queries("docs_filter_chain")(spark, sf)
      .orderBy("stage_idx")
      .collect()
      .map(r => (r.getAs[Long]("stage_idx"), r.getAs[String]("stage"), r.getAs[Long]("n_docs")))
    assert(rows.map(_._2).toSeq ==
      Seq("input", "word_count", "mean_word_len", "stopwords", "exact_unique"))
    val counts = rows.map(_._3)
    counts.sliding(2).foreach {
      case Array(a, b) => assert(b <= a, s"stage count grew: $a -> $b")
      case _           => ()
    }
    assert(counts.head == operators.LlmQueries.corpus(spark, sf).count())
    assert(counts.last > 0)
  }

  test("docs_gopher_repetition: hand-built documents pin each metric") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val s = spark
    // Stand-in documents frame with the same (doc_id, text) contract;
    // run the metric expressions through the registered query by writing
    // a scratch parquet dir shaped like the documents table.
    val dir = "/tmp/graft_rep_spec_" + System.nanoTime()
    val schema = StructType(
      Seq(StructField("doc_id", LongType), StructField("text", StringType))
    )
    val rows = Seq(
      // 0: four lines, two identical pairs -> dup_line 500 permille.
      Row(0L, "aaa\nbbb\naaa\nbbb"),
      // 1: 'spam ham' repeated 5x -> the top 2-gram ('spam ham' or the
      //    wraparound 'ham spam') dominates; 5-grams repeat too.
      Row(1L, "spam ham spam ham spam ham spam ham spam ham"),
      // 2: clean prose, all lines and grams unique.
      Row(2L, "one two three four five six seven\neight nine ten eleven"),
      // 3: empty.
      Row(3L, "")
    )
    s.createDataFrame(s.sparkContext.parallelize(rows), schema)
      .write
      .mode("overwrite")
      .parquet(dir + "/documents.parquet")
    try {
      val m = SparkEntry
        .queries("docs_gopher_repetition")(s, dir)
        .collect()
        .map(r => r.getLong(0) -> r)
        .toMap
      val d0 = m(0L)
      assert(d0.getAs[Long]("dup_line_permille") == 500L)
      assert(d0.getAs[Long]("dup_line_char_permille") == 500L)
      val d1 = m(1L)
      // 10 words, 9 two-grams: 5x 'spam ham' (len 8) + 4x 'ham spam';
      // top covers 40 of 44 chars -> 909 permille. Duplicated 5-grams:
      // 3x len-22 + 3x len-21 = 129 of 44 -> overlap-counted 2931.
      assert(d1.getAs[Long]("top2gram_char_permille") == 909L)
      assert(d1.getAs[Long]("dup5gram_char_permille") == 2931L)
      assert(!d1.getAs[Boolean]("pass"))
      val d2 = m(2L)
      assert(d2.getAs[Long]("dup_line_permille") == 0L)
      // Longest unique 2-gram 'seven eight' (11 of 55 chars) sits exactly
      // ON the 200-permille threshold -- and <= passes it.
      assert(d2.getAs[Long]("top2gram_char_permille") == 200L)
      assert(d2.getAs[Boolean]("pass"))
      val d3 = m(3L)
      assert(d3.getAs[Long]("dup_line_permille") == 0L)
      assert(d3.getAs[Boolean]("pass"))
    } finally {
      def go(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(go)); f.delete(): Unit
      }
      go(new java.io.File(dir))
    }
  }
}
