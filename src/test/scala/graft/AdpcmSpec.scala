package graft

import graft.operators.AdpcmCodec

/** IMA ADPCM codec certification: byte-level decode equals the law
  * replay, the predictor tracks smooth signals within the adaptive
  * step, and corrupt payloads are quarantined.
  */
class AdpcmSpec extends SparkSuite {

  /** The oracle's law replay in Scala: encoder quantization + decoder
    * reconstruction over the closed-form source.
    */
  private def lawReplay(id: Long, n: Int): (Long, Long) = {
    var pred = AdpcmCodec.srcSample(id, 0)
    var idx = 0
    var sa = math.abs(pred).toLong
    var sq = pred.toLong * pred
    for (k <- 1 until n) {
      val (_, p, i) = AdpcmCodec.encodeStep(pred, idx, AdpcmCodec.srcSample(id, k))
      pred = p; idx = i
      sa += math.abs(pred); sq += pred.toLong * pred
    }
    (sa, sq)
  }

  test("byte-level decode equals the state-machine law replay") {
    for (id <- Seq(0L, 1L, 17L, 123L, 4999L)) {
      val n = (id % 48 + 9).toInt
      val st = AdpcmCodec.decodeAdpcm(id, AdpcmCodec.encodeAdpcm(id, n)).get
      val (sa, sq) = lawReplay(id, n)
      assert(st.n_samples == n.toLong)
      assert(st.sample_rate == 8000L)
      assert(st.mean_abs_c == sa * 100 / n, s"id=$id")
      assert(st.sum_sq == sq, s"id=$id")
    }
  }

  test("the adaptive predictor tracks a smooth ramp within the step size") {
    // ramp +10/sample: once the step table adapts (first few samples),
    // reconstruction error stays below a small bound.
    var pred = 0
    var idx = 0
    for (k <- 1 until 200) {
      val target = k * 10
      val (_, p, i) = AdpcmCodec.encodeStep(pred, idx, target)
      pred = p; idx = i
      if (k > 10) assert(math.abs(pred - target) <= 100, s"k=$k pred=$pred")
    }
  }

  test("corrupt ADPCM payloads are quarantined") {
    val ok = AdpcmCodec.encodeAdpcm(7L, 40)
    assert(AdpcmCodec.decodeAdpcm(7L, ok).isDefined)
    assert(AdpcmCodec.decodeAdpcm(7L, ok.take(30)).isEmpty)
    assert(AdpcmCodec.decodeAdpcm(7L, "RIFFxxxxWAVE nonsense".getBytes).isEmpty)
    // PCM16 format tag rejected by the fmt gate
    val pcm = new Array[Byte](ok.length); ok.copyToArray(pcm)
    pcm(20) = 1 // wFormatTag 0x11 → 0x01
    assert(AdpcmCodec.decodeAdpcm(7L, pcm).isEmpty)
  }

  test("a zero-sample fact chunk is quarantined, not a division crash") {
    // RIFF(12) + fmt(8+20) + fact header(8) puts the declared sample
    // count at offset 48; zeroing it must map to None, not
    // ArithmeticException inside the task.
    val z = AdpcmCodec.encodeAdpcm(7L, 40).clone()
    z(48) = 0; z(49) = 0; z(50) = 0; z(51) = 0
    assert(AdpcmCodec.decodeAdpcm(7L, z).isEmpty)
  }

  test("the registered query runs end-to-end on sf0.001") {
    val rows = SparkEntry.queries("multimodal_adpcm_samples")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
  }
}
