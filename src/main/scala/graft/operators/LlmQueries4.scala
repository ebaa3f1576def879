package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Repetition scoring and benchmark-contamination detection — two staple
  * filters in LLM training-data pipelines.
  */
object LlmQueries4 {

  /** The exact-join contamination oracle, shared with
    * `docs_bloom_decontaminate`: the bloom variant's contract is
    * "results equal the plain contamination join", so both queries must
    * certify against ONE oracle definition.
    */
  private[operators] val ContaminationOracleSql: String = {
    val norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    val fp = graft.functions.TextFunctions.fingerprintHashesSql(norm)
    s"""WITH h AS (SELECT doc_id, unnest(list_distinct($fp)) AS h FROM documents),
       |bench AS (SELECT DISTINCT h FROM h WHERE doc_id < 10),
       |hits AS (
       |  SELECT doc_id, count(*) AS shared_windows
       |  FROM h JOIN bench USING (h)
       |  WHERE doc_id >= 10
       |  GROUP BY doc_id
       |)
       |SELECT d.doc_id,
       |  coalesce(hits.shared_windows, 0) AS shared_windows,
       |  coalesce(hits.shared_windows, 0) > 0 AS contaminated
       |FROM documents d LEFT JOIN hits ON d.doc_id = hits.doc_id
       |WHERE d.doc_id >= 10""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q(
      // Within-document repetition: fraction of duplicated word 3-grams.
      // High values indicate boilerplate/spam; a standard quality filter.
      "docs_repetition",
      (s, d) => {
        // coalesce: Spark's array_distinct keeps a null element where
        // DuckDB's list_distinct drops it — null text must not diverge.
        val sh = shingles(coalesce(col("text"), lit("")), 3)
        Tables
          .documents(s, d)
          .select(
            col("doc_id"),
            size(sh).as("n_grams"),
            round(
              lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh),
              4
            ).as("repetition_ratio")
          )
      },
      Some {
        val norm = "lower(trim(regexp_replace(coalesce(text, ''), '\\s+', ' ', 'g')))"
        val sh =
          s"(CASE WHEN len(string_split($norm, ' ')) >= 3 " +
            s"THEN list_transform(range(1, len(string_split($norm, ' ')) - 1), i -> array_to_string((string_split($norm, ' '))[i:i+2], ' ')) " +
            s"ELSE [$norm] END)"
        s"""WITH t AS (SELECT doc_id, $sh AS sh FROM documents)
           |SELECT doc_id, len(sh) AS n_grams,
           |  round(1.0 - cast(len(list_distinct(sh)) as double) / len(sh), 4) AS repetition_ratio
           |FROM t""".stripMargin
      }
    ),
    Q(
      // Benchmark contamination: does a training document share any
      // 8-char fingerprint window with the held-out set (doc_id < 10
      // stands in for the benchmark)? Both sides explode to (doc, hash)
      // and meet in an equi-join on the hash — the benchmark side is tiny
      // and broadcasts; no document ever compares against another whole
      // document.
      "docs_contamination",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val hashes = docs.select(
          col("doc_id"),
          explode(array_distinct(fingerprintHashes(col("text"), 8))).as("h")
        )
        val benchmark = hashes
          .filter(col("doc_id") < 10)
          .select(col("h"))
          .distinct()
        val hits = hashes
          .filter(col("doc_id") >= 10)
          .join(broadcast(benchmark), Seq("h"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("shared_windows"))
        docs
          .filter(col("doc_id") >= 10)
          .select("doc_id")
          .join(hits, Seq("doc_id"), "left")
          .select(
            col("doc_id"),
            coalesce(col("shared_windows"), lit(0L)).as("shared_windows"),
            (coalesce(col("shared_windows"), lit(0L)) > 0).as("contaminated")
          )
      },
      Some(LlmQueries4.ContaminationOracleSql)
    )
  )
}
