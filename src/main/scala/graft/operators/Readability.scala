package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions.words
import org.apache.spark.sql.functions._

/** Readability scoring (Flesch 1948 Reading Ease; Kincaid 1975 grade
  * level) — the classic text-quality covariates corpus-curation
  * pipelines log alongside the Gopher rules: machine-generated keyword
  * stuffing scores unreadably dense, OCR shrapnel scores absurdly low
  * grade, and both formulas need only three integer counts per
  * document (words, sentences, syllables — the standard vowel-group
  * approximation, floored at 1 per word).
  *
  * Scale shape: strictly MAP-ONLY — every output column derives from
  * per-row arrays; the 100 TB plan is one scan, zero shuffles,
  * pipelined with whatever filter consumes the scores.
  *
  * Engine determinism: the three counts are exact integers; each score
  * is ONE fixed-shape double expression over them (both engines
  * evaluate the identical parse tree on exact-integer operands —
  * correctly-rounded IEEE ops), quantized to integer 1e-4 units with
  * half-away rounding on both sides.
  */
object Readability {

  private def t = coalesce(col("text"), lit(""))

  /** Non-empty lowercased words (the Retrieval tokenization). */
  private def ws = filter(words(t), w => length(w) > 0)

  /** Vowel-group syllable count, min 1 per word. */
  private def syl = aggregate(
    ws,
    lit(0L),
    (acc, w) =>
      acc + greatest(size(regexp_extract_all(w, lit("[aeiouy]+"), lit(0))), lit(1)).cast("long")
  )

  /** Non-blank sentence count (split on terminal punctuation runs),
    * min 1 so the ratios stay defined for fragment documents.
    */
  private def sents =
    greatest(size(filter(split(t, "[.!?]+"), s => length(trim(s)) > 0)), lit(1)).cast("long")

  private val readabilityQ = Q(
    "docs_readability",
    (s, d) => {
      val nW = size(ws).cast("long")
      Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          nW.as("n_words"),
          sents.as("n_sentences"),
          syl.as("n_syllables")
        )
        .withColumn(
          "fk_grade_qm",
          when(
            col("n_words") > 0,
            round(
              (lit(0.39) * (col("n_words").cast("double") / col("n_sentences").cast("double")) +
                lit(11.8) * (col("n_syllables").cast("double") / col("n_words").cast("double")) -
                lit(15.59)) * 1e4
            ).cast("long")
          )
        )
        .withColumn(
          "fre_qm",
          when(
            col("n_words") > 0,
            round(
              (lit(206.835) -
                lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double")) -
                lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double"))) * 1e4
            ).cast("long")
          )
        )
    },
    Some {
      s"""WITH base AS (
         |  SELECT doc_id, coalesce(text, '') AS t, ${Retrieval.NormSql} AS ws
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    CAST(len(ws) AS BIGINT) AS n_words,
         |    CAST(greatest(len(list_filter(string_split_regex(t, '[.!?]+'),
         |      s -> length(trim(s)) > 0)), 1) AS BIGINT) AS n_sentences,
         |    CAST(coalesce(list_sum(list_transform(ws,
         |      w -> greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1))), 0) AS BIGINT) AS n_syllables
         |  FROM base)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         |  CASE WHEN n_words > 0 THEN CAST(round(
         |    (0.39 * (CAST(n_words AS double) / CAST(n_sentences AS double)) +
         |     11.8 * (CAST(n_syllables AS double) / CAST(n_words AS double)) -
         |     15.59) * 10000) AS BIGINT) END AS fk_grade_qm,
         |  CASE WHEN n_words > 0 THEN CAST(round(
         |    (206.835 -
         |     1.015 * (CAST(n_words AS double) / CAST(n_sentences AS double)) -
         |     84.6 * (CAST(n_syllables AS double) / CAST(n_words AS double))) * 10000) AS BIGINT) END AS fre_qm
         |FROM m""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(readabilityQ)
}
