package graft.streaming

import graft.operators.SketchQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming maintenance of the sketch family — sketches are the
  * aggregation structures MADE for streams: their state is a fixed
  * register table, so a running streaming aggregation carries exactly
  * depth×width (CMS) or sources×shards (KMV) rows of state per shuffle
  * partition, never corpus-proportional state and never a watermark
  * (registers are monotone — counts only grow, minima only shrink — so
  * late data is always mergeable).
  *
  * Batch twins: `docs_ngram_cms` / `corpus_distinct_kmv`
  * (operators/SketchQueries.scala). The stream and the batch compute the
  * identical register tables over the same data — asserted in
  * SketchStreamSpec by replaying a corpus in two batches.
  */
object SketchStream {

  /** Running count-min sketch over a stream of (doc_id, text) documents:
    * the same 4×1024 cell table docs_ngram_cms builds, maintained
    * incrementally. Bounded state: ≤4096 aggregation keys.
    */
  def cmsCells(docsStream: DataFrame): DataFrame =
    docsStream
      .select(explode(SketchQueries.gramsOf(col("text"))).as("gram"))
      .select(
        explode(
          array((0 until SketchQueries.CmsDepth).map { r =>
            struct(
              lit(r).as("r"),
              SketchQueries.cmsBucket(lit(r), col("gram")).as("bucket")
            )
          }: _*)
        ).as("cell")
      )
      .groupBy(col("cell.r").as("r"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Running KMV registers over a stream of (source, text) documents:
    * the per-(source, shard) minimum hash — the same stage-1 registers
    * corpus_distinct_kmv reads its estimator from. Bounded state:
    * sources × 256 keys; the estimator itself is a cheap batch read over
    * this tiny table whenever a cardinality snapshot is wanted.
    */
  def kmvRegisters(docsStream: DataFrame): DataFrame = {
    val h = SketchQueries.hash48(coalesce(col("text"), lit("")))
    docsStream
      .select(col("source"), h.as("h"), (h % SketchQueries.KmvShards).as("shard"))
      .groupBy("source", "shard")
      .agg(min(col("h")).as("minh"))
  }
}
