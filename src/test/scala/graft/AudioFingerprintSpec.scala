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
