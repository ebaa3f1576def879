package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Ingest hygiene audit — the character-level scan a crawl pipeline
  * runs before any tokenizer sees the bytes: U+FFFD replacement
  * characters (the fingerprint of a mis-declared charset — the decoder
  * already destroyed the original bytes), C0 control characters
  * (binary shrapnel inside "text"), and zero-width characters
  * (U+200B–U+200D, U+FEFF — invisible to humans, poison to exact-dedup
  * hashes and token counts). Strictly MAP-ONLY: per-row regexp counts
  * via length-difference, one scan at 100 TB, pipelines with the
  * filter that consumes the flags.
  *
  * Cross-engine note: the character classes are spelled `\\uXXXX` for
  * the JVM regex and `\\x{XXXX}` for RE2 — same code points, verified
  * same counts.
  */
object IngestAudit {

  private def t = coalesce(col("text"), lit(""))

  private def countOf(pattern: String) =
    length(t) - length(regexp_replace(t, pattern, ""))

  private val auditQ = Q(
    "docs_utf8_audit",
    (s, d) =>
      Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          length(t).cast("long").as("n_chars"),
          countOf("\\uFFFD").cast("long").as("n_replacement"),
          countOf("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]").cast("long").as("n_control"),
          countOf("[\\x{200B}-\\x{200D}\\x{FEFF}]").cast("long").as("n_zero_width")
        )
        .withColumn(
          "clean",
          col("n_replacement") === 0 && col("n_control") === 0 && col("n_zero_width") === 0
        ),
    Some(
      """SELECT doc_id,
        |  CAST(length(t) AS BIGINT) AS n_chars,
        |  CAST(length(t) - length(regexp_replace(t, '[\x{FFFD}]', '', 'g')) AS BIGINT) AS n_replacement,
        |  CAST(length(t) - length(regexp_replace(t, '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]', '', 'g')) AS BIGINT) AS n_control,
        |  CAST(length(t) - length(regexp_replace(t, '[\x{200B}-\x{200D}\x{FEFF}]', '', 'g')) AS BIGINT) AS n_zero_width,
        |  length(t) - length(regexp_replace(t, '[\x{FFFD}]', '', 'g')) = 0
        |    AND length(t) - length(regexp_replace(t, '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]', '', 'g')) = 0
        |    AND length(t) - length(regexp_replace(t, '[\x{200B}-\x{200D}\x{FEFF}]', '', 'g')) = 0 AS clean
        |FROM (SELECT doc_id, coalesce(text, '') AS t FROM documents) _b""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(auditQ)
}
