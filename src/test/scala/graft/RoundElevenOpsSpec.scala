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

  test("Stupid Backoff fires all three levels with hand-computed scores") {
    import spark.implicits._
    // train: docs 1, 2 (ids % 10 != 0); eval: doc 20.
    // Eval positions: (a,b,c) attested trigram; (d,b,x) backs off to the
    // attested "b x" bigram; the other three bottom out at the unigram
    // floor with c(w3) of 1, 1, 2.
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "b x y"),
      (20L, "a b c x d b x")
    ).toDF("doc_id", "text")
    val rows = operators.StupidBackoff.scoresOf(docs).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_id") == 20L)
    assert(r.getAs[Long]("n_trigrams") == 5L)
    assert(r.getAs[Long]("n_tri_hit") == 1L)
    assert(r.getAs[Long]("n_bi_back") == 1L)
    assert(r.getAs[Long]("n_uni_back") == 3L)
    val nPlusV = 7.0 + 6.0 // 7 train tokens, 6 distinct words
    def q(x: Double): Long = math.round(1e6 * math.log(x))
    val expected = Seq(
      q(1.0 / 1.0), // (a,b,c): c123=1, c12=1
      q((0.4 * 1.0) / 2.0), // (d,b,x): c("b x")=1, c(b)=2
      q((0.16 * (1 + 1)) / nPlusV), // (b,c,x): c(x)=1
      q((0.16 * (1 + 1)) / nPlusV), // (c,x,d): c(d)=1
      q((0.16 * (2 + 1)) / nPlusV) // (x,d,b): c(b)=2
    ).sum
    assert(r.getAs[Long]("mean_score_mu") == expected / 5, s"sum=$expected")
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
