package graft.streaming

import graft.operators.{DeflateMedia, VideoShots}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming incremental VIDEO near-dup assignment — the media twin of
  * [[NeardupStream]]: each micro-batch of arriving clips decodes ONCE
  * (shot segmentation inside the batch plan) and matches against a
  * static prebuilt corpus index with exactly the batch semantics of
  * [[VideoShots.nearDupIncrementalOf]] (fingerprint band equi-join
  * with the corpus-side heavy cap, aligned Hamming verify,
  * earliest-corpus-id-wins). Same foreachBatch rationale: the corpus
  * is a slowly-changing static side whose shot table and capped band
  * table are built once ([[VideoShots.neardupIndexOf]]) — rebuilding
  * per micro-batch would re-decode the whole corpus each batch.
  */
object VideoStream {

  /** `newClips` columns: (media_id long, payload binary). `sink`
    * receives each micro-batch's (media_id, matched_media, is_new)
    * rows; `trigger` as in [[DedupStream.incremental]].
    */
  def incremental(
      newClips: DataFrame,
      index: VideoShots.VideoNeardupIndex,
      sink: (DataFrame, Long) => Unit,
      trigger: Trigger = Trigger.AvailableNow()
  ): DataStreamWriter[Row] =
    newClips.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import batch.sparkSession.implicits._
        val shots = VideoShots.shotTable(batch.as[DeflateMedia.MediaRow]).toDF()
        sink(VideoShots.nearDupIncrementalIndexed(shots, index), batchId)
      }
}
