package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions.tokenCount
import org.apache.spark.sql.functions._

/** Per-language tokenizer fertility statistics — the standard
  * multilingual-tokenizer evaluation table (fertility = tokens per
  * whitespace word, compression = characters per token; Rust et al.
  * 2021 "How Good is Your Tokenizer?"). High-fertility languages
  * signal a vocabulary that under-serves them, feeding directly into
  * the UniMax/temperature mixture decisions.
  *
  * Shape at 100 TB: per-document token/word counts are map-only over
  * the scan; the rollup is a bounded-key aggregate (languages) with
  * map-side combine. Ratios are exact integer micro-units so the
  * cross-engine hash cannot drift on float division.
  */
object MixtureQueries3 {

  val all: Seq[Q] = Seq(
    Q(
      "docs_tokenizer_fertility",
      (s, d) => {
        val t = col("text")
        val perDoc = Tables
          .documents(s, d)
          .select(
            col("lang"),
            size(split(trim(t), "\\s+")).cast("long").as("words"),
            tokenCount(t).cast("long").as("toks"),
            length(t).cast("long").as("chars")
          )
        def idiv(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
          ((a - pmod(a, b)) / b).cast("long")
        perDoc
          .groupBy(col("lang"))
          .agg(
            count(lit(1)).as("docs"),
            sum(col("words")).as("words"),
            sum(col("toks")).as("tokens"),
            sum(col("chars")).as("chars")
          )
          .select(
            col("lang"),
            col("docs"),
            col("words"),
            col("tokens"),
            idiv(col("tokens") * 1000000L, col("words")).as("fertility_micro"),
            idiv(col("chars") * 1000000L, col("tokens")).as("chars_per_token_micro")
          )
      },
      Some(
        """WITH p AS (
          |  SELECT lang,
          |    len(regexp_split_to_array(trim(text), '\s+')) AS words,
          |    len(regexp_extract_all(text, '\w+|[^\w\s]')) AS toks,
          |    length(text) AS chars
          |  FROM documents),
          |g AS (
          |  SELECT lang, count(*) AS docs, cast(sum(words) as bigint) AS words,
          |    cast(sum(toks) as bigint) AS tokens, cast(sum(chars) as bigint) AS chars
          |  FROM p GROUP BY lang)
          |SELECT lang, docs, words, tokens,
          |  cast(tokens * 1000000 // words as bigint) AS fertility_micro,
          |  cast(chars * 1000000 // tokens as bigint) AS chars_per_token_micro
          |FROM g ORDER BY lang""".stripMargin
      )
    )
  )
}
