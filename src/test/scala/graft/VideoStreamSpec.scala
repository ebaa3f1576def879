package graft

import scala.collection.mutable

import graft.operators.VideoShots
import graft.streaming.VideoStream
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Top-level row for the MemoryStream encoder. */
case class VideoStreamClip(media_id: Long, payload: Array[Byte])

/** Streaming incremental video near-dup: micro-batches of arriving
  * clips (decoded inside each batch plan) must reproduce the batch
  * incremental assignment the `dedup_video_neardup_incremental`
  * oracle certifies.
  */
class VideoStreamSpec extends SparkSuite {

  test("streaming micro-batches reproduce the batch video assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val sf = "/root/testdata/sf0.001"
    val corpusShots = VideoShots.shotTable(VideoShots.corpusClipTable(spark, sf)).toDF()
    val batchClips = VideoShots.batchClipTable(spark, sf)

    val expected = VideoShots
      .nearDupIncrementalOf(VideoShots.shotTable(batchClips).toDF(), corpusShots)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap

    val index = VideoShots.neardupIndexOf(corpusShots)
    val all = batchClips.collect().map(m => VideoStreamClip(m.media_id, m.payload))
    val (first, second) = all.splitAt(all.length / 2)
    val input = MemoryStream[VideoStreamClip]
    val got = mutable.Map[Long, (Long, Boolean)]()
    val q = VideoStream
      .incremental(
        input.toDF(),
        index,
        (out, _) =>
          out.collect().foreach(r => got.synchronized {
            got(r.getLong(0)) = (r.getLong(1), r.getBoolean(2))
          }),
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L)
      )
      .start()
    try {
      input.addData(first.toIndexedSeq)
      q.processAllAvailable()
      input.addData(second.toIndexedSeq)
      q.processAllAvailable()
    } finally q.stop()

    assert(got.size == expected.size)
    assert(got.toMap == expected)
    // both outcomes exercised: adopted identities and novel clips
    assert(expected.values.exists(!_._2) && expected.values.exists(_._2))
    index.unpersist()
    graft.Lineage.releaseHeld()
  }
}
