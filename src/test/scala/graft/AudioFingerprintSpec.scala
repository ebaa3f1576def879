package graft

import graft.operators.AudioFingerprint
import org.apache.spark.sql.functions._

/** Audio landmark fingerprinting: cross-codec identity, hop-shift
  * alignment, and the planted-recall contract.
  */
class AudioFingerprintSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  private def windowsFor(ids: Long*): Map[Long, Seq[(Long, Long, Long, Long)]] = {
    val w = AudioFingerprint
      .windowTable(AudioFingerprint.clipTable(spark, sf))
      .filter(col("media_id").isin(ids: _*))
      .collect()
      .map(r =>
        r.getAs[Long]("media_id") ->
          ((r.getAs[Long]("t"), r.getAs[Long]("peak_bin"), r.getAs[Long]("peak_e"),
            r.getAs[Long]("total_e"))))
    w.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sortBy(_._1).toSeq }
  }

  test("re-companded copy (G.711 wire) fingerprints identically to the PCM16 original") {
    // samples sit on the µ-law lattice, so compress∘expand is the
    // identity and the µ-law WAV decodes to the SAME window spectra —
    // cross-codec content identity, exact.
    for (id <- Seq(3L, 13L, 23L)) {
      val m = windowsFor(id, id + 20000000L)
      assert(m(id) == m(id + 20000000L), s"clip $id: companded windows must match")
    }
  }

  test("hop-shifted copy reproduces the original's windows 1..W-1") {
    for (id <- Seq(1L, 11L, 21L)) {
      val m = windowsFor(id, id + 10000000L)
      val base = m(id)
      val shifted = m(id + 10000000L)
      assert(shifted.size == base.size - 1)
      // window t of the shifted clip is window t+1 of the base
      assert(shifted.map { case (t, pb, pe, te) => (pb, pe, te) } ==
        base.tail.map { case (t, pb, pe, te) => (pb, pe, te) })
    }
  }

  test("incremental assignment: plants adopt corpus identity, novel starts its own") {
    val out = AudioFingerprint
      .nearDupIncrementalOf(
        AudioFingerprint.landmarkTable(
          AudioFingerprint.windowTable(AudioFingerprint.batchClipTable(spark, sf))),
        AudioFingerprint.landmarkTable(
          AudioFingerprint.windowTable(AudioFingerprint.corpusClipTable(spark, sf)))
      )
      .collect()
    try {
      val plants = out.filter(_.getAs[Long]("media_id") < 30000000L)
      val novel = out.filter(_.getAs[Long]("media_id") >= 30000000L)
      assert(plants.nonEmpty && novel.nonEmpty)
      // every shifted/companded plant matches SOME corpus clip, and the
      // dominant assignment is the true source (earliest-wins allows
      // an identical-fingerprint twin with a smaller id)
      assert(plants.forall(!_.getAs[Boolean]("is_new")))
      val toSource = plants.count { r =>
        val m = r.getAs[Long]("media_id")
        r.getAs[Long]("matched_media") == m % 10000000L
      }
      assert(toSource * 10 >= plants.length * 8, s"$toSource of ${plants.length} matched source")
      // novel-content clips mostly start their own identity
      assert(novel.count(_.getAs[Boolean]("is_new")) * 10 >= novel.length * 7)
    } finally graft.Lineage.releaseHeld()
  }

  test("streaming micro-batches reproduce the batch audio assignment") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpusLm = AudioFingerprint.landmarkTable(
      AudioFingerprint.windowTable(AudioFingerprint.corpusClipTable(spark, sf)))
    val batchClips = AudioFingerprint.batchClipTable(spark, sf)
    val expected = AudioFingerprint
      .nearDupIncrementalOf(
        AudioFingerprint.landmarkTable(AudioFingerprint.windowTable(batchClips)),
        corpusLm
      )
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    val index = AudioFingerprint.neardupIndexOf(corpusLm)
    val all = batchClips
      .collect()
      .map(r => AudioStreamClip(r.getAs[Long]("media_id"), r.getAs[Array[Byte]]("payload")))
    val (first, second) = all.splitAt(all.length / 2)
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[AudioStreamClip]
    val got = scala.collection.mutable.Map[Long, (Long, Boolean)]()
    val q = graft.streaming.AudioStream
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
    assert(got.size == expected.size && got.toMap == expected)
    assert(expected.values.exists(!_._2) && expected.values.exists(_._2))
    index.unpersist()
    graft.Lineage.releaseHeld()
  }

  test("planted copies are recovered at their true offsets") {
    val pairs = AudioFingerprint
      .nearDupOf(AudioFingerprint.landmarkTable(
        AudioFingerprint.windowTable(AudioFingerprint.clipTable(spark, sf))))
      .collect()
      .map(r => (r.getAs[Long]("media_a"), r.getAs[Long]("media_b"), r.getAs[Long]("dt")))
      .toSet
    try {
      val docs = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
      val shiftPlants = docs.filter(_ % 5 == 1)
      val compandPlants = docs.filter(_ % 5 == 3)
      // hop-shifted: dt = 1 (base window t matches shifted window t-1)
      shiftPlants.foreach { id =>
        assert(pairs.contains((id, id + 10000000L, 1L)), s"shifted plant $id not recovered")
      }
      // re-companded: dt = 0, every landmark aligned
      compandPlants.foreach { id =>
        assert(pairs.contains((id, id + 20000000L, 0L)), s"companded plant $id not recovered")
      }
      assert(shiftPlants.nonEmpty && compandPlants.nonEmpty)
    } finally graft.Lineage.releaseHeld()
  }
}

/** Top-level row for the MemoryStream encoder. */
case class AudioStreamClip(media_id: Long, payload: Array[Byte])
