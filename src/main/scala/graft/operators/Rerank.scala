package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-encoder-style retrieval reranking (round 9): the two-stage
  * architecture every production search/retrieval stack uses — a cheap
  * recall-oriented first stage (BM25, `docs_bm25_search`) shortlists
  * candidates, then a richer precision-oriented scorer reranks ONLY the
  * shortlist. Here the rerank score combines, in integer micro-units:
  *
  *   - the BM25 score itself (the first-stage signal);
  *   - query-term COVERAGE (how many of the query's terms the document
  *     contains — BM25 happily ranks one-term-spam above three-term
  *     coverage when that term is rare);
  *   - POSITION of the earliest query-term match (title/lead matches
  *     beat page-bottom matches — the classic learning-to-rank feature);
  *   - the TRAINED quality classifier's document prior
  *     ([[Classifier.scoreOf]] p_mu — the [[Retrieval]]+[[Classifier]]
  *     composition: a curation pipeline reranks retrieval output by the
  *     same model it filters with).
  *
  * `docs_rerank_eval` is the recall certification (the ann_recall_eval
  * discipline): planted relevance = documents containing ALL the
  * query's terms; the row reports recall@5 of the raw BM25 order vs the
  * rerank order side by side, so the eval IS part of the certified
  * surface and a regression that makes reranking worse than its input
  * shows up as a hash mismatch.
  *
  * Scale shape: feature extraction touches ONLY shortlist rows — the
  * (query, doc, term) frame is |queries|·k·|terms| (30·3 here), joined
  * to the corpus token arrays by doc_id equi-join and to the broadcast
  * query dimension; the rerank rank window partitions per query over ≤k
  * rows (bounded by construction — the first stage already cut to k, so
  * this is NOT the corpus-scale posting-list window `docs_bm25_search`
  * had to avoid). The classifier prior joins on doc_id, pruned to the
  * shortlist by the join itself. The eval's planted-relevance scan is
  * map-only (array_intersect against a 9-term literal) + one bounded
  * aggregate.
  */
object Rerank {

  private val ShortK = 10
  private val EvalK = 5

  /** Coverage boost per matched query term — dominant by design: a
    * document matching all terms outranks any one-term score.
    */
  private val CovBoostMu = 3000000L

  /** Early-match boost: PosCap − PosSlope · first_pos, floored at 0. */
  private val PosCapMu = 100000L
  private val PosSlopeMu = 1000L

  private def qtermsDf(s: SparkSession): DataFrame = {
    import s.implicits._
    Retrieval.SearchQueries.flatMap { case (q, ts) => ts.map(q -> _) }.toDF("query_id", "term")
  }

  private def baseWs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Retrieval.tokens.as("ws"))

  private def rrScore =
    col("score_mu") +
      lit(CovBoostMu) * coalesce(col("n_matched"), lit(0L)) +
      greatest(lit(0L), lit(PosCapMu) - lit(PosSlopeMu) * coalesce(col("first_pos"), lit(100L))) +
      expr("coalesce(p_mu, 0L) div 4")

  /** Shortlist + features + rerank score/rank per (query, doc). */
  def rerankOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val short = Retrieval
      .bm25Of(docs)
      .withColumnRenamed("rank", "bm25_rank")
    val cov = short
      .select("query_id", "doc_id")
      .join(baseWs(docs), "doc_id")
      .join(broadcast(qtermsDf(s)), "query_id")
      // array_position: 1-based first occurrence, 0 when absent — the
      // identical contract in both engines (DuckDB list_position).
      .withColumn("ap", array_position(col("ws"), col("term")))
      .groupBy("query_id", "doc_id")
      .agg(
        sum(when(col("ap") > 0, 1L).otherwise(0L)).as("n_matched"),
        min(when(col("ap") > 0, col("ap") - 1)).as("first_pos")
      )
    val qual = Classifier.scoreOf(docs).select(col("doc_id"), col("p_mu"))
    val w = Window.partitionBy("query_id").orderBy(col("rr_mu").desc, col("doc_id").asc)
    short
      .join(cov, Seq("query_id", "doc_id"), "left")
      .join(qual, Seq("doc_id"), "left")
      .withColumn("rr_mu", rrScore)
      .withColumn("rr_rank", row_number().over(w).cast("long"))
      .select(
        col("query_id"),
        col("doc_id"),
        col("score_mu"),
        col("bm25_rank"),
        col("n_matched"),
        col("first_pos"),
        col("p_mu"),
        col("rr_mu"),
        col("rr_rank")
      )
  }

  /** The EXACT full scorer over every BM25 candidate — the expensive
    * "cross-encoder" the two-stage pipeline approximates. Coverage and
    * first-position features are computed for ALL candidates from the
    * posting sliver (positions of query terms only — map-side filter
    * before any shuffle, the tf-computation cost class), then joined to
    * the un-cut BM25 scores.
    */
  private def fullScoreOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    val allTerms = Retrieval.SearchQueries.flatMap(_._2).distinct
    val posn = docs
      .select(col("doc_id"), posexplode(Retrieval.tokens).as(Seq("tpos", "term")))
      .filter(col("term").isin(allTerms: _*))
      .groupBy("doc_id", "term")
      .agg(min(col("tpos")).cast("long").as("fp"))
    val covAll = posn
      .join(broadcast(qtermsDf(s)), "term")
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_matched"), min("fp").as("first_pos"))
    val qual = Classifier.scoreOf(docs).select(col("doc_id"), col("p_mu"))
    Retrieval
      .bm25ScoredOf(docs)
      .join(covAll, Seq("query_id", "doc_id"), "left")
      .join(qual, Seq("doc_id"), "left")
      .withColumn("rr_mu", rrScore)
      .select("query_id", "doc_id", "rr_mu")
  }

  /** Telescoping recall eval (the ann_recall_eval discipline, per
    * Matveeva et al. 2006 nested rankers): ground truth per query = the
    * exact full-score top-5 over ALL candidates (TopK bounded-histogram
    * cut — never a corpus window); the row reports how much of it (a)
    * the raw BM25 top-5 and (b) the shortlist-10 + rerank top-5
    * recover. hits_rerank ≥ hits_bm25 holds STRUCTURALLY (rerank applies
    * the exact scorer to a superset of BM25's top-5, so any truth doc
    * the shortlist retains survives reranking), so a hash-certified row
    * here locks in "reranking never hurts, and helps when BM25
    * misorders the shortlist".
    */
  def rerankEvalOf(docs: DataFrame): DataFrame = {
    val truth = TopK
      .topkPerGroup(fullScoreOf(docs), "query_id", "rr_mu", "doc_id", EvalK)
      .select("query_id", "doc_id")
    val rr = rerankOf(docs)
    truth
      .join(rr, Seq("query_id", "doc_id"), "left")
      .groupBy("query_id")
      .agg(
        count(lit(1)).as("n_truth"),
        sum(when(col("bm25_rank") <= EvalK, 1L).otherwise(0L)).as("hits_bm25"),
        sum(when(col("rr_rank") <= EvalK, 1L).otherwise(0L)).as("hits_rerank")
      )
      .select(
        col("query_id"),
        col("n_truth"),
        col("hits_bm25"),
        col("hits_rerank"),
        expr("hits_bm25 * 10000 div n_truth").as("recall_bm25_pm"),
        expr("hits_rerank * 10000 div n_truth").as("recall_rerank_pm")
      )
  }

  /** Rerank oracle CTEs appended to the classifier-training WITH block
    * (all names rt_-prefixed; `lf` is the classifier's final scored
    * CTE). Ends with rt_rr2(…, rr_rank).
    */
  private def rerankCtesSql: String =
    s""",
       |${Retrieval.bm25CtesSql("rt_")},
       |rt_qual AS MATERIALIZED (
       |  SELECT doc_id,
       |    CAST(round(1000000.0 / (1.0 + exp(-(lmu / 1000000.0)))) AS BIGINT) AS p_mu
       |  FROM lf),
       |rt_short AS (
       |  SELECT query_id, doc_id, score_mu, rank FROM rt_ranked WHERE rank <= $ShortK),
       |rt_cov AS (
       |  SELECT s.query_id, s.doc_id,
       |    cast(sum(CASE WHEN list_position(b.ws, q.term) > 0 THEN 1 ELSE 0 END) AS bigint) AS n_matched,
       |    cast(min(CASE WHEN list_position(b.ws, q.term) > 0
       |             THEN list_position(b.ws, q.term) - 1 END) AS bigint) AS first_pos
       |  FROM rt_short s
       |  JOIN rt_base b ON b.doc_id = s.doc_id
       |  JOIN rt_q q ON q.query_id = s.query_id
       |  GROUP BY 1, 2),
       |rt_rr AS (
       |  SELECT s.query_id, s.doc_id, s.score_mu, cast(s.rank AS bigint) AS bm25_rank,
       |    c.n_matched, c.first_pos, u.p_mu,
       |    s.score_mu + $CovBoostMu * coalesce(c.n_matched, 0)
       |      + greatest(0, $PosCapMu - $PosSlopeMu * coalesce(c.first_pos, 100))
       |      + coalesce(u.p_mu, 0) // 4 AS rr_mu
       |  FROM rt_short s
       |  LEFT JOIN rt_cov c ON c.query_id = s.query_id AND c.doc_id = s.doc_id
       |  LEFT JOIN rt_qual u ON u.doc_id = s.doc_id),
       |rt_rr2 AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY rr_mu DESC, doc_id) AS rr_rank
       |  FROM rt_rr)""".stripMargin

  private val rerankQ = Q(
    "docs_rerank",
    (s, d) => rerankOf(Tables.documents(s, d)),
    Some(
      Classifier.oracleSql(
        s"""$rerankCtesSql
           |SELECT cast(query_id AS int) AS query_id, doc_id,
           |  cast(score_mu AS bigint) AS score_mu, bm25_rank, n_matched, first_pos, p_mu,
           |  cast(rr_mu AS bigint) AS rr_mu, cast(rr_rank AS bigint) AS rr_rank
           |FROM rt_rr2""".stripMargin
      )
    )
  )

  private val rerankEvalQ = Q(
    "docs_rerank_eval",
    (s, d) => rerankEvalOf(Tables.documents(s, d)),
    Some(
      Classifier.oracleSql(
        s"""$rerankCtesSql,
           |rt_covall AS (
           |  SELECT q.query_id, b.doc_id,
           |    cast(sum(CASE WHEN list_position(b.ws, q.term) > 0 THEN 1 ELSE 0 END) AS bigint) AS n_matched,
           |    cast(min(CASE WHEN list_position(b.ws, q.term) > 0
           |             THEN list_position(b.ws, q.term) - 1 END) AS bigint) AS first_pos
           |  FROM rt_base b CROSS JOIN rt_q q
           |  GROUP BY 1, 2),
           |rt_full AS (
           |  SELECT s.query_id, s.doc_id,
           |    s.score_mu + $CovBoostMu * coalesce(c.n_matched, 0)
           |      + greatest(0, $PosCapMu - $PosSlopeMu * coalesce(c.first_pos, 100))
           |      + coalesce(u.p_mu, 0) // 4 AS rr_mu
           |  FROM rt_sc s
           |  LEFT JOIN rt_covall c ON c.query_id = s.query_id AND c.doc_id = s.doc_id
           |  LEFT JOIN rt_qual u ON u.doc_id = s.doc_id),
           |rt_truth AS (
           |  SELECT query_id, doc_id FROM (
           |    SELECT query_id, doc_id,
           |      row_number() OVER (PARTITION BY query_id ORDER BY rr_mu DESC, doc_id) AS trk
           |    FROM rt_full) _t
           |  WHERE trk <= $EvalK)
           |SELECT cast(t.query_id AS int) AS query_id,
           |  cast(count(*) AS bigint) AS n_truth,
           |  cast(sum(CASE WHEN r.bm25_rank <= $EvalK THEN 1 ELSE 0 END) AS bigint) AS hits_bm25,
           |  cast(sum(CASE WHEN r.rr_rank <= $EvalK THEN 1 ELSE 0 END) AS bigint) AS hits_rerank,
           |  cast(sum(CASE WHEN r.bm25_rank <= $EvalK THEN 1 ELSE 0 END) * 10000 // count(*) AS bigint) AS recall_bm25_pm,
           |  cast(sum(CASE WHEN r.rr_rank <= $EvalK THEN 1 ELSE 0 END) * 10000 // count(*) AS bigint) AS recall_rerank_pm
           |FROM rt_truth t
           |LEFT JOIN rt_rr2 r ON r.query_id = t.query_id AND r.doc_id = t.doc_id
           |GROUP BY 1""".stripMargin
      )
    )
  )

  val all: Seq[Q] = Seq(rerankQ, rerankEvalQ)
}
