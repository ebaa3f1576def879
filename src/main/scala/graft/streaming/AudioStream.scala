package graft.streaming

import graft.operators.AudioFingerprint
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming incremental AUDIO near-dup assignment — the audio twin of
  * [[VideoStream]]: each micro-batch of arriving clips fingerprints
  * ONCE (sample extraction + windowed DFT + landmarks inside the
  * batch plan) and matches against a static prebuilt corpus landmark
  * index with exactly the batch semantics of
  * [[AudioFingerprint.nearDupIncrementalOf]] (landmark equi-join with
  * the corpus-side heavy cap, length-scaled offset-histogram verify,
  * earliest-corpus-id-wins). The index is built once
  * ([[AudioFingerprint.neardupIndexOf]]) — rebuilding per micro-batch
  * would re-fingerprint the whole corpus each batch.
  */
object AudioStream {

  /** `newClips` columns: (media_id long, payload binary). `sink`
    * receives each micro-batch's (media_id, matched_media, is_new)
    * rows; `trigger` as in [[DedupStream.incremental]].
    */
  def incremental(
      newClips: DataFrame,
      index: AudioFingerprint.AudioNeardupIndex,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    newClips.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val lm = AudioFingerprint.landmarkTable(AudioFingerprint.windowTable(batch))
        sink(AudioFingerprint.nearDupIncrementalIndexed(lm, index), batchId)
      }
}
