package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pseudo-relevance-feedback query expansion (RM3; Lavrenko & Croft
  * 2001 relevance models, Abdul-Jaleel 2004's RM3 mixture) — the
  * second classic stage of a retrieval stack after [[Rerank]]: mine
  * expansion terms from the BM25 top-k ("feedback") documents, weight
  * them by feedback-document relevance mass, and run a SECOND weighted
  * BM25 pass with original + expansion terms. Vocabulary-mismatch
  * queries (the corpus says "merge" where the query says "join") only
  * recover through expansion — no reranking of the first-pass
  * shortlist can retrieve a document with zero query terms.
  *
  * Scale shapes:
  *  - expansion-term mining touches ONLY the k_fb=10 feedback docs per
  *    query: term candidates are their exploded tokens (≤ k_fb·dl
  *    rows per query — bounded by construction, so the per-query
  *    top-5 window ranks a BOUNDED set, the ANN-window precedent, not
  *    a corpus frame);
  *  - the second pass joins the weighted term dimension (≤ 8 terms per
  *    query, broadcast-sized but DATA-dependent — an equi-join on
  *    term, never an isin literal) against the vocab-keyed corpus
  *    posting aggregate (the docs_tfidf shape: map-side combined,
  *    keys bounded by vocabulary);
  *  - the final top-10 rides the TopK bounded histogram — a common
  *    expansion term's posting list is corpus-scale, exactly the
  *    docs_bm25_search window hazard.
  *
  * Engine determinism: term weights are integer (tf·score_mu div dl
  * sums), normalized by integer division against the per-query max;
  * second-pass scores reuse the BM25 integer micro-unit quantization
  * term-by-term, so every ranking key is an exact int64.
  */
object QueryExpansion {

  private val KFb = 10
  private val NExp = 5
  private val MinLen = 3

  /** Weighted query terms after expansion: original terms at weight
    * 1e6, expansion terms at their normalized feedback mass (≤ 5e5).
    */
  private[graft] def expandedTerms(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val qterms =
      Retrieval.SearchQueries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query_id", "term")
    val short = Retrieval.bm25Of(docs).filter(col("rank") <= KFb)
    // Feedback-doc tokens with per-doc length riding along.
    val fbTok = short
      .join(
        docs.select(col("doc_id"), Retrieval.tokens.as("ws")),
        "doc_id"
      )
      .select(
        col("query_id"),
        col("doc_id"),
        col("score_mu"),
        greatest(size(col("ws")), lit(1)).cast("long").as("dl"),
        explode(col("ws")).as("term")
      )
    val cand = fbTok
      .filter(length(col("term")) >= MinLen)
      .groupBy("query_id", "doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("score_mu").as("sm"), max("dl").as("dl"))
      .select(
        col("query_id"),
        col("term"),
        expr("(tf * sm) div dl").as("wpart")
      )
      .groupBy("query_id", "term")
      .agg(sum("wpart").as("w"))
      // Expansion terms must be NEW terms.
      .join(qterms.withColumn("orig", lit(1)), Seq("query_id", "term"), "left_anti")
    val wmax = cand.groupBy("query_id").agg(max("w").as("wmax"))
    // Bounded per-query window: candidates are the ≤ k_fb feedback
    // docs' vocabulary, never the corpus.
    val byW = Window.partitionBy("query_id").orderBy(col("w").desc, col("term").asc)
    val exp = cand
      .withColumn("erank", row_number().over(byW))
      .filter(col("erank") <= NExp)
      .join(wmax, "query_id")
      .select(
        col("query_id"),
        col("term"),
        expr("(w * 500000) div wmax").as("weight_mu"),
        col("erank").cast("long").as("erank")
      )
    exp
  }

  /** Expansion terms as a registered artifact. */
  private val expansionQ = Q(
    "docs_query_expansion",
    (s, d) => expandedTerms(Tables.documents(s, d)),
    expansionOracle
  )

  /** Weighted second-pass BM25 with original + expansion terms. */
  def rm3SearchOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val qterms =
      Retrieval.SearchQueries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query_id", "term")
    val wq = qterms
      .withColumn("weight_mu", lit(1000000L))
      .unionByName(expandedTerms(docs).select("query_id", "term", "weight_mu"))
    val base = docs.select(col("doc_id"), Retrieval.tokens.as("ws"))
    val dl = base.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("sumdl"))
    // Corpus postings keyed on term (vocab-bounded), then pruned by the
    // weighted-term dimension via equi-join — the terms are
    // data-dependent, so no static isin pushdown is possible.
    val tfAll = base
      .select(
        col("doc_id"),
        greatest(size(col("ws")), lit(0)).cast("long").as("dl"),
        explode(col("ws")).as("term")
      )
      .join(wq.select("term").distinct(), Seq("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val idf = tfAll
      .groupBy("term")
      .agg(count(lit(1)).as("df"))
      .withColumn("j", (col("df") - col("df") + 1).cast("int"))
      .join(
        broadcast(
          stats.select((col("n") - col("n") + 1).cast("int").as("j"), col("n"), col("sumdl"))
        ),
        Seq("j")
      )
      .select(
        col("term"),
        col("n"),
        col("sumdl"),
        round(
          log((col("n").cast("double") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) * 1e6
        ).cast("long").as("idf_mu")
      )
    val termScore = tfAll
      .join(idf, "term")
      .join(wq, Seq("term"))
      .select(
        col("query_id"),
        col("doc_id"),
        expr(
          "(weight_mu * " +
            "cast(round(idf_mu * ((tf * 2.2) / " +
            "(tf + 1.2 * (0.25 + 0.75 * cast(dl * n as double) / cast(sumdl as double))))) as bigint)" +
            ") div 1000000"
        ).as("t_mu")
      )
    val scored = termScore.groupBy("query_id", "doc_id").agg(sum("t_mu").as("score_mu"))
    TopK
      .topkPerGroup(scored, "query_id", "score_mu", "doc_id", 10)
      .withColumn("rank", col("rk").cast("long"))
      .drop("rk")
  }

  private val rm3Q = Q(
    "docs_bm25_rm3",
    (s, d) => rm3SearchOf(Tables.documents(s, d)),
    rm3Oracle
  )

  /** Shared oracle CTE chain ending at `exp(query_id, term, weight_mu,
    * erank)` — the expansion miner over the rt2_-prefixed BM25 CTEs.
    */
  private def expansionCtes: String =
    s"""${Retrieval.bm25CtesSql("rt2_")},
       |fb AS (
       |  SELECT query_id, doc_id, score_mu FROM rt2_ranked WHERE rank <= $KFb),
       |fbtok AS (
       |  SELECT f.query_id, f.doc_id, f.score_mu, b.dl, b.term
       |  FROM fb f
       |  JOIN (SELECT doc_id, greatest(len(ws), 1) AS dl, unnest(ws) AS term
       |        FROM rt2_base) b ON b.doc_id = f.doc_id),
       |cand AS (
       |  SELECT query_id, term, CAST(sum(wpart) AS BIGINT) AS w
       |  FROM (
       |    SELECT query_id, doc_id, term,
       |      (count(*) * any_value(score_mu)) // any_value(dl) AS wpart
       |    FROM fbtok WHERE length(term) >= $MinLen
       |    GROUP BY query_id, doc_id, term) _p
       |  GROUP BY 1, 2),
       |cand2 AS (
       |  SELECT c.* FROM cand c
       |  ANTI JOIN rt2_q q ON q.query_id = c.query_id AND q.term = c.term),
       |wmax AS (SELECT query_id, max(w) AS wmax FROM cand2 GROUP BY 1),
       |exp AS (
       |  SELECT r.query_id, r.term,
       |    (r.w * 500000) // m.wmax AS weight_mu,
       |    CAST(r.erank AS BIGINT) AS erank
       |  FROM (
       |    SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY w DESC, term) AS erank
       |    FROM cand2) r
       |  JOIN wmax m ON m.query_id = r.query_id
       |  WHERE r.erank <= $NExp)""".stripMargin

  private lazy val expansionOracle: Option[String] = Some(
    s"""WITH $expansionCtes
       |SELECT CAST(query_id AS int) AS query_id, term,
       |  CAST(weight_mu AS BIGINT) AS weight_mu, erank
       |FROM exp""".stripMargin
  )

  private lazy val rm3Oracle: Option[String] = Some(
    s"""WITH $expansionCtes,
       |wq AS (
       |  SELECT query_id, term, CAST(1000000 AS BIGINT) AS weight_mu FROM rt2_q
       |  UNION ALL
       |  SELECT query_id, term, weight_mu FROM exp),
       |tfall AS (
       |  SELECT doc_id, term, count(*) AS tf, any_value(dl) AS dl
       |  FROM (SELECT doc_id, len(ws) AS dl, unnest(ws) AS term FROM rt2_base) _t
       |  WHERE term IN (SELECT DISTINCT term FROM wq)
       |  GROUP BY 1, 2),
       |idf2 AS (
       |  SELECT term,
       |    CAST(round(ln((CAST(s.n AS double) - df + 0.5) / (df + 0.5) + 1.0) * 1e6) AS BIGINT) AS idf_mu
       |  FROM (SELECT term, count(*) AS df FROM tfall GROUP BY 1) _d, rt2_stats s),
       |ts2 AS (
       |  SELECT wq.query_id, tf.doc_id,
       |    (wq.weight_mu *
       |      CAST(round(idf2.idf_mu * ((tf.tf * 2.2) /
       |        (tf.tf + 1.2 * (0.25 + 0.75 *
       |          CAST(tf.dl * s.n AS double) / CAST(s.sumdl AS double))))) AS BIGINT)
       |    ) // 1000000 AS t_mu
       |  FROM tfall tf
       |  JOIN idf2 ON idf2.term = tf.term
       |  JOIN wq ON wq.term = tf.term, rt2_stats s),
       |sc2 AS (SELECT query_id, doc_id, CAST(sum(t_mu) AS BIGINT) AS score_mu FROM ts2 GROUP BY 1, 2)
       |SELECT CAST(query_id AS int) AS query_id, doc_id, score_mu,
       |  CAST(rank AS BIGINT) AS rank
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score_mu DESC, doc_id) AS rank
       |  FROM sc2) _r
       |WHERE rank <= 10""".stripMargin
  )

  val all: Seq[Q] = Seq(expansionQ, rm3Q)
}
