package graft.operators

import graft.{Q, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Quality-proportional Poisson sampling — the per-DOCUMENT weighting
  * the per-language mixture samplers (temperature/UniMax) cannot
  * express: each document keeps with probability ∝ its quality score
  * (target 30% of the corpus), so filtering and sampling collapse into
  * one soft pass (the RefinedWeb/FineWeb practice of preferring
  * down-weighting to hard thresholds).
  *
  * Determinism: the quality score is the docs_quality expression
  * quantized to basis points (exact — it is already rounded to 4
  * decimals), the corpus normalizer is an integer sum carried on a
  * 1-row broadcast (non-foldable constant-key join, the
  * docs_sample_temperature trick — no cartesian), and the keep gate is
  * a 256-bucket md5 threshold computed with integer division only.
  * Scale shape: one tiny stats aggregate + map-only gating; the corpus
  * never shuffles. (At extreme corpus sizes normalize `sq` to a mean
  * before the product to keep the numerator in long range; mirrored
  * as-is here on both engines.)
  */
object QualitySampling {

  private val sampleQuality = Q(
    "docs_sample_quality",
    (s, d) => {
      val t = col("text")
      val ws = words(t)
      val punct = length(regexp_replace(t, "[^\\p{P}]", ""))
      val quality = round(
        least(size(ws).cast("double") / 100, lit(1.0)) *
          (lit(1.0) - punct.cast("double") / length(t)),
        4
      )
      val bucket = expr(
        "(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 31, 1)) - 1) * 16 + " +
          "(instr('0123456789abcdef', substr(md5(cast(doc_id as string)), 32, 1)) - 1)"
      ).cast("int")
      val perDoc = Tables
        .documents(s, d)
        .select(
          col("doc_id"),
          round(quality * 10000).cast("long").as("q_bp"),
          bucket.as("sample_bucket")
        )
      val tot = perDoc.agg(sum(col("q_bp")).as("sq"), count(lit(1)).as("n"))
      perDoc
        .withColumn("j", (col("q_bp") - col("q_bp") + 1).cast("int"))
        .join(
          broadcast(tot.select((col("n") - col("n") + 1).cast("int").as("j"), col("sq"), col("n"))),
          Seq("j")
        )
        .select(
          col("doc_id"),
          col("q_bp"),
          col("sample_bucket"),
          least(lit(256L), expr("(256 * 30 * q_bp * n) div (100 * sq)")).as("keep_threshold")
        )
        .filter(col("sample_bucket") < col("keep_threshold"))
    },
    Some {
      val ws = s"string_split(${LlmQueries.normSql("text")}, ' ')"
      val quality =
        s"""round(least(cast(len($ws) as double) / 100, 1.0) *
           |        (1.0 - cast(length(regexp_replace(text, '[^\\p{P}]', '', 'g')) as double) / length(text)), 4)""".stripMargin
      s"""WITH q AS (
         |  SELECT doc_id,
         |    cast(round($quality * 10000) as bigint) AS q_bp,
         |    cast((strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), 31, 1)) - 1) * 16 +
         |         (strpos('0123456789abcdef', substr(md5(cast(doc_id as varchar)), 32, 1)) - 1) as int) AS sample_bucket
         |  FROM documents),
         |t AS (SELECT sum(q_bp) AS sq, count(*) AS n FROM q)
         |SELECT doc_id, q_bp, sample_bucket,
         |  cast(least(256, (256 * 30 * q_bp * n) // (100 * sq)) as bigint) AS keep_threshold
         |FROM q, t
         |WHERE sample_bucket < least(256, (256 * 30 * q_bp * n) // (100 * sq))""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(sampleQuality)
}
