package graft.operators

import graft.{Q, Tables}
import graft.streaming.SketchStream
import org.apache.spark.sql.functions._

/** Batch-equivalence of the streaming twins as HARD oracle rows.
  *
  * The streaming operators ([[graft.streaming.SketchStream]],
  * [[graft.streaming.DedupStream]]) are spec-certified by two-micro-batch
  * replays; these queries surface the same replay to the DuckDB
  * correctness gate: the corpus is split into two deterministic
  * micro-batches, each batch flows through the EXACT per-batch logic the
  * stream runs (the sketch register updates, the foreachBatch incremental
  * assignment against a static index), the per-batch results are merged
  * by the stream's merge law — and the oracle computes the ONE-SHOT
  * batch answer. A hash match is the mergeability/batch-equivalence
  * contract itself, certified per round rather than asserted in a spec
  * the driver cannot see.
  *
  * Scale shape: identical to the batch twins — bounded register
  * aggregates (≤ depth×width / sources×shards keys) and the
  * index-reusing incremental join; splitting into batches adds one
  * union, nothing else.
  */
object StreamReplayQueries {

  val all: Seq[Q] = Seq(
    Q(
      // Two CMS register tables merged by elementwise ADDITION (the
      // Complete-mode aggregation law) == the one-shot sketch.
      "stream_cms_replay",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "text")
        val b1 = docs.filter(col("doc_id") % 2 === 0)
        val b2 = docs.filter(col("doc_id") % 2 === 1)
        SketchStream
          .cmsCells(b1)
          .unionByName(SketchStream.cmsCells(b2))
          .groupBy("r", "bucket")
          .agg(sum(col("n")).as("n"))
          .select(
            col("r").cast("long").as("r"),
            col("bucket").cast("long").as("bucket"),
            col("n").cast("long").as("n")
          )
      },
      Some {
        val width = 1024
        val depth = 4
        s"""WITH tk AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tokens FROM documents),
           |ex AS (SELECT doc_id, tokens, unnest(range(0, greatest(len(tokens) - 3, 0) + 1)) AS i FROM tk),
           |corpus AS (SELECT doc_id, array_to_string(tokens[i+1 : i+3], ' ') AS gram FROM ex)
           |SELECT cast(r as bigint) AS r,
           |  cast(('0x' || substr(md5(cast(r as varchar) || ':' || gram), 1, 12))::bigint % $width as bigint) AS bucket,
           |  count(*) AS n
           |FROM corpus, (SELECT unnest(range(0, $depth)) AS r)
           |GROUP BY 1, 2""".stripMargin
      }
    ),
    Q(
      // Two KMV register tables merged by elementwise MIN == the
      // one-shot registers (monotone state, no watermark needed).
      "stream_kmv_replay",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "source", "text")
        val b1 = docs.filter(col("doc_id") % 2 === 0)
        val b2 = docs.filter(col("doc_id") % 2 === 1)
        SketchStream
          .kmvRegisters(b1)
          .unionByName(SketchStream.kmvRegisters(b2))
          .groupBy("source", "shard")
          .agg(min(col("minh")).as("minh"))
      },
      Some(
        s"""WITH h AS (
           |  SELECT source,
           |    ('0x' || substr(md5(coalesce(text, '')), 1, 12))::bigint AS h
           |  FROM documents)
           |SELECT source, h % 256 AS shard, min(h) AS minh
           |FROM h GROUP BY 1, 2""".stripMargin
      )
    ),
    Q(
      // HLL registers merged by elementwise MAX across two micro-batches
      // == the one-shot register table (same monotone-state law as KMV).
      "stream_hll_replay",
      (s, d) => {
        val docs = Tables.documents(s, d).select("doc_id", "source", "text")
        val b1 = docs.filter(col("doc_id") % 2 === 0).select("source", "text")
        val b2 = docs.filter(col("doc_id") % 2 === 1).select("source", "text")
        SketchQueries
          .hllRegisters(b1)
          .unionByName(SketchQueries.hllRegisters(b2))
          .groupBy("source", "reg")
          .agg(max(col("m")).as("m"))
      },
      Some(
        s"""WITH h AS (
           |  SELECT source,
           |    ('0x' || substr(md5(coalesce(text, '')), 1, 12))::bigint AS h
           |  FROM documents),
           |r AS (SELECT source, h // 1099511627776 AS reg, h % 1099511627776 AS rest FROM h)
           |SELECT source, reg,
           |  max(CASE WHEN rest = 0 THEN 41 ELSE 41 - length(bin(rest)) END) AS m
           |FROM r GROUP BY 1, 2""".stripMargin
      )
    ),
    Q(
      // The DedupStream foreachBatch contract: per-micro-batch
      // incremental assignment against a STATIC prebuilt corpus index,
      // results unioned across batches == the one-shot batch assignment
      // (batch-internal pairs excluded by contract on both paths).
      "stream_neardup_replay",
      (s, d) => {
        val batch = LlmQueries8.incrementalBatchFixture(s, d)
        val index =
          LlmQueries8.neardupIndexOf(LlmQueries8.incrementalCorpusFixture(s, d))
        val b1 = batch.filter(col("doc_id") % 2 === 0)
        val b2 = batch.filter(col("doc_id") % 2 === 1)
        LlmQueries8
          .neardupIncrementalIndexed(b1, index)
          .unionByName(LlmQueries8.neardupIncrementalIndexed(b2, index))
      },
      Some(LlmQueries8.NeardupIncrementalOracleSql)
    )
  )
}
