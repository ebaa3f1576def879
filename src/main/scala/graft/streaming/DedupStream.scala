package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

/** Streaming incremental deduplication.
  *
  * The reference dedups newly-updated records in a polling loop
  * (`DedupHandler.php:380` via `dedupRecord` per record); the Spark-native
  * form is a Structured Streaming pipeline where each micro-batch of
  * arriving records is matched against the static clustered corpus with
  * exactly the batch semantics of [[Dedup.dedupIncremental]] — blocking-key
  * equi-joins with the skew cap, the full matchRecords veto predicate, and
  * earliest-cluster-wins assignment.
  *
  * `foreachBatch` is the right integration point (not a stream-stream
  * join): the corpus is a slowly-changing static side, each micro-batch is
  * bounded, and the per-batch plan is IDENTICAL to the batch operator — so
  * correctness is certified by the `dedup_incremental` oracle and the
  * streaming layer adds only delivery. At scale this runs continuously
  * with the corpus refreshed between restarts (or via Delta-style static
  * reloads), and each micro-batch shuffles batch+corpus candidates only —
  * no recluster of history.
  */
object DedupStream {

  /** Wire a streaming batch source into incremental dedup; `sink` receives
    * each micro-batch's (id, dedup_id) assignment rows. `trigger`
    * defaults to the production drain mode (AvailableNow: process the
    * backlog, then stop); long-lived deployments — and the specs, which
    * enqueue data AFTER `start()` and would race an AvailableNow query's
    * terminate-on-empty — pass a continuous micro-batch trigger instead.
    */
  def incremental(
      newRecords: DataFrame,
      clusteredCorpus: DataFrame,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    newRecords.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(Dedup.dedupIncremental(batch, clusteredCorpus), batchId)
      }
}

/** Streaming incremental NEAR-DUP assignment for documents — the
  * LSH-family twin of [[DedupStream]]: each micro-batch of arriving
  * documents is matched against the static clustered corpus with exactly
  * the batch semantics of
  * [[graft.operators.LlmQueries8.neardupIncremental]] (band equi-join
  * with the heavy-bucket cap, Jaccard verify, earliest-cluster-wins).
  * Same foreachBatch rationale: the corpus is a slowly-changing static
  * side, so the per-batch plan is IDENTICAL to the batch operator and
  * the streaming layer adds only delivery.
  */
object NeardupStream {

  /** `sink` receives each micro-batch's (doc_id, cluster_id, is_new)
    * assignment rows; `trigger` as in [[DedupStream.incremental]] —
    * AvailableNow drain by default, continuous micro-batch for
    * long-lived runs and specs.
    */
  def incremental(
      newDocs: DataFrame,
      clusteredCorpus: DataFrame,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] = {
    // Corpus-side index (capped band table + word sets) built and
    // persisted ONCE — inside foreachBatch it would recompute the
    // corpus MinHash signatures and stack a fresh persist per
    // micro-batch, leaking cache over the stream's lifetime.
    val index = graft.operators.LlmQueries8.neardupIndexOf(clusteredCorpus)
    newDocs.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sink(
          graft.operators.LlmQueries8.neardupIncrementalIndexed(batch, index),
          batchId
        )
      }
  }
}
