package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus novelty / boilerplate mining — two curation reads between
  * exact dedup (identical docs) and near-dup (mostly-identical docs):
  *
  *  - `docs_ngram_novelty`: per document, the share of its distinct
  *    word 3-grams appearing in NO other document — the diversity
  *    signal mixture designers read next to quality scores (all-novel
  *    = unique content or noise; near-zero novelty = assembled from
  *    corpus phrases), and the inverse face of `docs_contamination`'s
  *    shared-fingerprint axis.
  *  - `docs_template_prefix`: boilerplate HEADER mining — documents
  *    grouped by their first-8-token prefix; a prefix family spanning
  *    many docs (and often many sources) is a template (license
  *    blocks, scraper chrome) that per-doc near-dup misses when the
  *    bodies differ.
  *
  * Scale shapes: novelty is the docs_tfidf chassis — a (doc, gram)
  * explode, a gram-keyed df aggregate (map-side combine), one
  * gram-keyed equi-join back, one per-doc rollup. Template mining is
  * ONE bounded aggregate on the prefix key plus the 1-row computed-key
  * broadcast for shares. No windows anywhere.
  */
object NoveltyQueries {

  def ngramNoveltyOf(docs: DataFrame): DataFrame = {
    val grams = docs
      .select(
        col("doc_id"),
        explode(array_distinct(graft.functions.TextFunctions.shingles(col("text")))).as("g")
      )
    val df = grams.groupBy("g").agg(count(lit(1)).as("df"))
    grams
      .join(df, Seq("g"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel")
      )
      .select(
        col("doc_id"),
        col("n_grams"),
        col("n_novel"),
        expr("(n_novel * 10000) div n_grams").as("novelty_pm")
      )
  }

  private val noveltyQ = Q(
    "docs_ngram_novelty",
    (s, d) => ngramNoveltyOf(Tables.documents(s, d)),
    Some {
      val norm = LlmQueries.normSql("text")
      s"""WITH n AS (SELECT doc_id, $norm AS norm FROM documents),
         |w AS (SELECT doc_id, norm, string_split(norm, ' ') AS ws FROM n),
         |sh AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) >= 3
         |      THEN list_transform(range(1, len(ws) - 1), i -> array_to_string(ws[i:i+2], ' '))
         |      ELSE [norm] END AS shingles
         |  FROM w),
         |grams AS (
         |  SELECT doc_id, unnest(list_distinct(shingles)) AS g FROM sh),
         |df AS (SELECT g, count(*) AS df FROM grams GROUP BY 1)
         |SELECT grams.doc_id,
         |  CAST(count(*) AS BIGINT) AS n_grams,
         |  CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST((sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) * 10000) // count(*) AS BIGINT) AS novelty_pm
         |FROM grams JOIN df USING (g)
         |GROUP BY 1""".stripMargin
    }
  )

  private val PrefixTokens = 8

  def templatePrefixOf(docs: DataFrame): DataFrame = {
    val withPrefix = docs.select(
      col("doc_id"),
      coalesce(col("source"), lit(" ")).as("source"),
      concat_ws(
        " ",
        slice(graft.functions.TextFunctions.words(col("text")), 1, PrefixTokens)
      ).as("prefix")
    )
    val fams = withPrefix
      .groupBy("prefix")
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("source")).as("n_sources"),
        min("doc_id").as("min_doc_id")
      )
      .filter(col("n_docs") >= 2)
    val tot = docs.agg(count(lit(1)).as("tot"))
    fams
      .withColumn("j", (col("n_docs") - col("n_docs") + 1).cast("int"))
      .join(
        broadcast(tot.select((col("tot") - col("tot") + 1).cast("int").as("j"), col("tot"))),
        Seq("j")
      )
      .select(
        col("prefix"),
        col("n_docs"),
        col("n_sources"),
        col("min_doc_id"),
        expr("(n_docs * 10000) div tot").as("share_pm")
      )
  }

  private val templateQ = Q(
    "docs_template_prefix",
    (s, d) => templatePrefixOf(Tables.documents(s, d)),
    Some {
      val norm = LlmQueries.normSql("text")
      s"""WITH n AS (
         |  SELECT doc_id, coalesce(source, ' ') AS source,
         |    array_to_string(string_split($norm, ' ')[1:$PrefixTokens], ' ') AS prefix
         |  FROM documents),
         |fams AS (
         |  SELECT prefix, count(*) AS n_docs, count(DISTINCT source) AS n_sources,
         |    min(doc_id) AS min_doc_id
         |  FROM n GROUP BY 1 HAVING count(*) >= 2),
         |t AS (SELECT count(*) AS tot FROM documents)
         |SELECT prefix, CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_sources AS BIGINT) AS n_sources,
         |  CAST(min_doc_id AS BIGINT) AS min_doc_id,
         |  CAST((n_docs * 10000) // tot AS BIGINT) AS share_pm
         |FROM fams, t""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(noveltyQ, templateQ)
}
