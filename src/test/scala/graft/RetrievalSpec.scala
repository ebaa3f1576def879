package graft

import org.apache.spark.sql.functions._

/** Ranking-shape invariants for the retrieval operators (the DuckDB
  * oracle certifies exact values; these pin the semantic properties the
  * hash compare can't express).
  */
class RetrievalSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("docs_tfidf emits at most 5 contiguous ranks per doc, score non-increasing") {
    val rows = SparkEntry
      .queries("docs_tfidf")(spark, sf)
      .orderBy(col("doc_id"), col("rank"))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_mu"), r.getAs[Long]("rank")))
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      assert(rs.length <= 5, s"doc $doc has ${rs.length} rows")
      assert(rs.map(_._3).toSeq == (1L to rs.length).toSeq, s"doc $doc ranks not contiguous")
      val scores = rs.sortBy(_._3).map(_._2).toSeq
      assert(scores == scores.sorted.reverse, s"doc $doc scores increase with rank")
    }
  }

  test("docs_bm25_search returns top-10 per query with non-increasing scores") {
    val rows = SparkEntry
      .queries("docs_bm25_search")(spark, sf)
      .collect()
      .map(r => (r.getAs[Int]("query_id"), r.getAs[Long]("score_mu"), r.getAs[Long]("rank")))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == Set(1, 2, 3))
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= 10, s"query $q has ${rs.length} rows")
      assert(rs.map(_._3).toSeq.sorted == (1L to rs.length).toSeq)
      val scores = rs.sortBy(_._3).map(_._2).toSeq
      assert(scores == scores.sorted.reverse, s"query $q scores increase with rank")
    }
  }

  test("docs_dsir_weight covers every document exactly once, conserving tokens") {
    val out = SparkEntry.queries("docs_dsir_weight")(spark, sf)
    val docs = Tables.documents(spark, sf)
    assert(out.count() == docs.count())
    assert(out.select(countDistinct(col("doc_id"))).head.getLong(0) == docs.count())
    val totalOut = out.select(sum(col("n_tokens"))).head.getLong(0)
    val totalIn = docs
      .select(
        explode(
          filter(
            graft.functions.TextFunctions.words(coalesce(col("text"), lit(""))),
            w => length(w) > 0
          )
        )
      )
      .count()
    assert(totalOut == totalIn, s"token mass $totalOut != $totalIn")
  }

  test("bm25 favors the doc that repeats a rare query term, all else equal") {
    import spark.implicits._
    // Two equal-length docs; 'needle' appears twice in doc 1, once in
    // doc 2 — the saturating tf term must still rank doc 1 first.
    val docs = Seq(
      (1L, "needle needle pad pad pad pad"),
      (2L, "needle pad pad pad pad pad"),
      (3L, "pad pad pad pad pad pad")
    ).toDF("doc_id", "text")
    val toks = graft.functions.TextFunctions.words(col("text"))
    val tf = docs
      .select(col("doc_id"), size(toks).cast("long").as("dl"), explode(toks).as("term"))
      .filter(col("term") === "needle")
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tf"))
      .toMap
    assert(tf == Map(1L -> 2L, 2L -> 1L)) // posting shape feeding the score
  }
}
