package graft

/** Round-11 operator certification beyond the DuckDB oracle gate. */
class RoundElevenOpsSpec extends SparkSuite {

  test("A-law expansion matches JDK javax.sound's independent G.711 decoder") {
    import javax.sound.sampled._
    val codes = (0 until 256).map(_.toByte).toArray
    val alawFmt = new AudioFormat(AudioFormat.Encoding.ALAW, 8000f, 8, 1, 1, 8000f, false)
    val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val in = new AudioInputStream(new java.io.ByteArrayInputStream(codes), alawFmt, codes.length.toLong)
    val pcm = AudioSystem.getAudioInputStream(pcmFmt, in)
    val buf = pcm.readAllBytes()
    assert(buf.length == 512)
    for (i <- 0 until 256) {
      val jdk = ((buf(2 * i) & 0xff) | (buf(2 * i + 1) << 8)).toShort.toInt
      assert(jdk == operators.Multimodal.alawExpand(i), s"code $i")
    }
  }

  test("A-law sample stats match the JVM expansion on sf0.001") {
    val rows = SparkEntry
      .queries("multimodal_alaw_samples")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    rows.take(5).foreach { r =>
      val id = r.getAs[Long]("media_id")
      val n = (id % 60 + 8).toInt
      val samples = (0 until n).map(k => operators.Multimodal.alawExpand(((id * 11 + k * 5) % 256).toInt))
      assert(r.getAs[Long]("n_samples") == n.toLong)
      assert(r.getAs[Long]("mean_abs_c") == samples.map(s => math.abs(s).toLong).sum * 100 / n)
      assert(r.getAs[Long]("sum_sq") == samples.map(s => s.toLong * s).sum)
    }
  }
}
