package graft

import graft.operators.{JpegCodec, VideoShots}
import org.apache.spark.sql.functions._

/** Video shot segmentation + clip near-dup: decode-level laws the
  * oracle cannot see (byte-distinct in-shot frames, quarantine) plus
  * the planted-recall contract of the re-timed duplicates.
  */
class VideoShotsSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("in-shot frames are byte-distinct but pixel-identical (DRI alternation)") {
    // The fixture's whole point: an md5-of-bytes dedup would split every
    // shot; only decoded-content hashing finds the structure.
    val a = JpegCodec.encodeJpeg(17L * 8, 8, 8, 0)
    val b = JpegCodec.encodeJpeg(17L * 8, 8, 8, 2)
    assert(!java.util.Arrays.equals(a, b), "DRI variant must change the byte stream")
    def pixels(f: Array[Byte]): Seq[(Int, Int, Int, Int, Int)] = {
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Int, Int, Int)]
      assert(JpegCodec.decodeCore(f) { (x, y, r, g, bl) => buf += ((x, y, r, g, bl)) }.isDefined)
      buf.toSeq
    }
    assert(pixels(a) == pixels(b))
  }

  test("decodeShots: frame totals, contiguous bounds, law-consistent segmentation") {
    for (id <- Seq(0L, 1L, 5L, 17L, 100L, 444L)) {
      val shots = VideoShots.decodeShots(id, VideoShots.encodeShotAvi(id, retimed = false))
      assert(shots.isDefined, s"clip $id must decode")
      val rows = shots.get
      val lawTotal =
        (0 until VideoShots.lawShots(id)).map(j => VideoShots.lawLen(id, j, retimed = false)).sum
      assert(rows.map(_.n_frames).sum == lawTotal, s"clip $id frame total")
      // bounds are contiguous from 0
      val sorted = rows.sortBy(_.shot_idx)
      assert(sorted.head.start_frame == 0)
      sorted.sliding(2).foreach {
        case Seq(x, y) => assert(y.start_frame == x.start_frame + x.n_frames)
        case _ => ()
      }
      // detected shots = fixture shots merged only where adjacent
      // hashes are Hamming-close: so 1 <= detected <= law shots
      assert(rows.length >= 1 && rows.length <= VideoShots.lawShots(id))
      assert(rows.forall(_.n_shots == rows.length.toLong))
    }
  }

  test("re-timed duplicate has a different frame count but the identical shot-hash sequence") {
    // id % 7 == 2 are the planted clips; pick ones whose re-timing
    // actually changes the frame total.
    var checked = 0
    for (id <- Seq(2L, 9L, 16L, 23L, 37L)) {
      val base = VideoShots.decodeShots(id, VideoShots.encodeShotAvi(id, retimed = false)).get
      val dup = VideoShots.decodeShots(id, VideoShots.encodeShotAvi(id, retimed = true)).get
      assert(base.map(r => (r.shot_idx, r.shot_hash)) == dup.map(r => (r.shot_idx, r.shot_hash)))
      if (base.map(_.n_frames).sum != dup.map(_.n_frames).sum) checked += 1
    }
    assert(checked > 0, "at least one plant must differ in total frames")
  }

  test("truncated and foreign-codec clips quarantine, not crash") {
    // every 53rd base clip is truncated
    assert(VideoShots.decodeShots(53L, VideoShots.encodeShotAvi(53L, retimed = false)).isEmpty)
    // arbitrary garbage
    assert(VideoShots.decodeShots(1L, Array[Byte](1, 2, 3)).isEmpty)
  }

  test("segment overlap finds the trimmed partial copies the full-clip fingerprint refuses") {
    val shots = VideoShots.shotTable(VideoShots.clipTable(spark, sf)).toDF().persist()
    try {
      val docs = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
      val trims = docs.filter(id => id % 9 == 5 && id % 3 != 0).toSet
      // full-clip near-dup must NOT pair trimmed with base (unequal
      // shot counts) ...
      val nd = VideoShots.nearDupOf(shots).collect()
      assert(!nd.exists(r => r.getAs[Long]("media_b") - r.getAs[Long]("media_a") == 20000000L))
      // ... while shot-overlap must find every trimmed plant sharing
      // ALL of its shot hashes with its source (minus capped hashes).
      val ov = VideoShots.shotOverlapOf(shots).collect()
      val found = ov
        .filter(r => r.getAs[Long]("media_b") - r.getAs[Long]("media_a") == 20000000L)
        .map(_.getAs[Long]("media_a"))
        .toSet
      val missed = trims -- found
      assert(
        missed.size <= trims.size / 10,
        s"trimmed plants missed beyond the cap allowance: ${missed.take(10).mkString(",")}"
      )
    } finally {
      shots.unpersist()
      graft.Lineage.releaseHeld()
    }
  }

  test("incremental assignment: re-timed batch adopts corpus identity, novel starts its own") {
    val out = VideoShots
      .nearDupIncrementalOf(
        VideoShots.shotTable(VideoShots.batchClipTable(spark, sf)).toDF(),
        VideoShots.shotTable(VideoShots.corpusClipTable(spark, sf)).toDF()
      )
      .collect()
    try {
      val retimed = out.filter(_.getAs[Long]("media_id") < 20000000L)
      val novel = out.filter(_.getAs[Long]("media_id") >= 30000000L)
      assert(retimed.nonEmpty && novel.nonEmpty)
      // every re-timed clip whose SOURCE survived quarantine matches
      // some corpus clip (its source, or an earlier
      // identical-fingerprint clip — the earliest-wins contract); a
      // copy of a truncation-quarantined base has nothing to match
      assert(
        retimed
          .filter { r =>
            val src = r.getAs[Long]("media_id") - 10000000L
            src % 53 != 0 || src == 0
          }
          .forall(!_.getAs[Boolean]("is_new"))
      )
      // novel clips overwhelmingly start their own identity (an
      // accidental fingerprint twin in the corpus is allowed)
      assert(novel.count(_.getAs[Boolean]("is_new")) >= novel.length * 9 / 10)
    } finally graft.Lineage.releaseHeld()
  }

  test("planted re-timed copies are recovered by the banded near-dup join") {
    val shots = VideoShots.shotTable(VideoShots.clipTable(spark, sf)).toDF().persist()
    try {
      val pairs = VideoShots.nearDupOf(shots).collect()
      // plants: id % 7 == 2 whose base clip is not truncation-quarantined
      val docs = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
      val expected = docs.filter(id => id % 7 == 2 && !(id % 53 == 0 && id > 0)).toSet
      val recovered = pairs
        .filter(r => r.getAs[Long]("media_b") - r.getAs[Long]("media_a") == 10000000L)
        .map(_.getAs[Long]("media_a"))
        .toSet
      // A plant can legitimately be dropped ONLY by the heavy-bucket cap
      // (degenerate shared fingerprints); everything else must pair at
      // Hamming 0.
      val missed = expected -- recovered
      assert(
        missed.isEmpty || missed.size <= expected.size / 20,
        s"missed plants beyond the cap allowance: ${missed.take(10).mkString(",")}"
      )
      assert(
        pairs
          .filter(r => r.getAs[Long]("media_b") - r.getAs[Long]("media_a") == 10000000L)
          .forall(_.getAs[Long]("total_hamming") == 0L)
      )
    } finally {
      shots.unpersist()
      graft.Lineage.releaseHeld()
    }
  }
}
