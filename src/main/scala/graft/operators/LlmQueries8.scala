package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the "concatenate then split every N tokens" step
  * that turns a cleaned corpus into fixed-length pretraining sequences.
  *
  * Documents are deterministically sharded by (lang, md5 bucket), ordered
  * by doc_id within a shard, and assigned to sequence bins by cumulative
  * token offset: seq_id = floor(tokens_before / 2048). This is the
  * standard concatenation-packing used by LLM data pipelines (every token
  * lands in exactly one sequence; a document may straddle two bins) and —
  * unlike stateful first-fit bin packing — it is a pure window cumsum, so
  * it stays one shuffle at any scale.
  *
  * Scale shape: the window partitions on (lang, bucket); the bucket count
  * (4 here, md5-derived so the DuckDB oracle computes the identical
  * shard) is the parallelism knob — at 100 TB raise it so each shard's
  * cumsum fits one task, which keeps partitions balanced regardless of
  * language skew. The aggregate reuses the same (lang, bucket) exchange
  * prefix.
  */
object LlmQueries8 {

  private val SeqLen = 2048

  val all: Seq[Q] = Seq(
    Q(
      "docs_pack_sequences",
      (s, d) => {
        val nTokens = size(split(coalesce(col("text"), lit("")), " ")).cast("bigint")
        val bucket = expr(
          "cast((instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 32, 1)) - 1) % 4 as bigint)"
        )
        val w = Window
          .partitionBy(col("lang"), col("bucket"))
          .orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables
          .documents(s, d)
          .select(col("doc_id"), col("lang"), nTokens.as("n_tokens"), bucket.as("bucket"))
          .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
          .withColumn("seq_id", floor(col("cum_before") / SeqLen))
          .groupBy(col("lang"), col("bucket"), col("seq_id"))
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("seq_tokens"),
            min(col("doc_id")).as("first_doc"),
            max(col("doc_id")).as("last_doc")
          )
      },
      Some {
        s"""WITH t AS (SELECT doc_id, lang,
           |  cast(len(string_split(coalesce(text, ''), ' ')) as bigint) AS n_tokens,
           |  cast((instr('0123456789abcdef', substr(md5(cast(doc_id as varchar)), 32, 1)) - 1) % 4 as bigint) AS bucket
           |  FROM documents),
           |c AS (SELECT *, coalesce(sum(n_tokens) OVER (
           |    PARTITION BY lang, bucket ORDER BY doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before FROM t),
           |x AS (SELECT *, cast(floor(cum_before / $SeqLen.0) as bigint) AS seq_id FROM c)
           |SELECT lang, bucket, seq_id,
           |  count(*) AS n_docs,
           |  cast(sum(n_tokens) as bigint) AS seq_tokens,
           |  min(doc_id) AS first_doc,
           |  max(doc_id) AS last_doc
           |FROM x GROUP BY 1, 2, 3""".stripMargin
      },
      bench = true
    )
  )
}
