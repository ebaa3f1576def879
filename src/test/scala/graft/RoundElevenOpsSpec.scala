package graft

/** Round-11 operator certification beyond the DuckDB oracle gate. */
class RoundElevenOpsSpec extends SparkSuite {

  test("recall is per-query monotone in the rerank budget") {
    // a larger rerank budget reranks a SUPERSET of candidates under the
    // truth's own metric, so per-query recall can only rise
    val rows = SparkEntry
      .queries("ann_recall_rerank")(spark, "/root/testdata/sf0.001")
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (q, rs) =>
      val byR = rs.map(r => r.getAs[Long]("rerank_n") -> r.getAs[Long]("recall_permille")).toMap
      assert(byR(5L) <= byR(10L) && byR(10L) <= byR(20L), s"query $q: $byR")
    }
  }

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

  test("MP4 box walk reads v0/v1 mvhd, largesize mdat, and quarantines truncation") {
    import graft.operators.Mp4Meta
    // id 7: audio track + v1 mvhd (7%7=0); id 11: largesize mdat; id 2: video-only
    for (id <- Seq(2L, 7L, 11L, 14L, 22L)) {
      val st = Mp4Meta.decodeMp4(id, Mp4Meta.encodeMp4(id)).get
      assert(st.brand == "isom")
      assert(st.timescale == Mp4Meta.lawTimescale(id))
      assert(st.duration_ms == Mp4Meta.lawDuration(id) * 1000 / Mp4Meta.lawTimescale(id))
      assert(st.n_tracks == (if (Mp4Meta.lawHasAudio(id)) 2L else 1L))
      assert(st.video_codec == "avc1" && st.width == Mp4Meta.lawWidth(id) && st.height == Mp4Meta.lawHeight(id))
      if (Mp4Meta.lawHasAudio(id)) {
        assert(st.audio_codec == "mp4a" && st.channels == Mp4Meta.lawChannels(id))
        assert(st.sample_rate == Mp4Meta.lawRate(id))
      } else assert(st.audio_codec == "" && st.channels == 0L && st.sample_rate == 0L)
      assert(st.mdat_bytes == Mp4Meta.lawMdat(id))
    }
    // truncation (the id % 53 fixture) and garbage quarantine
    assert(Mp4Meta.decodeMp4(53L, Mp4Meta.encodeMp4(53L)).isEmpty)
    assert(Mp4Meta.decodeMp4(0L, "not an mp4 at all".getBytes).isEmpty)
    val ok = Mp4Meta.encodeMp4(5L)
    assert(Mp4Meta.decodeMp4(5L, ok.take(40)).isEmpty) // cut inside ftyp/free
    // a corrupted box size must not loop or throw
    val bad = ok.clone(); bad(0) = 0x7f
    Mp4Meta.decodeMp4(5L, bad)
  }

  test("the mp4 registered query runs end-to-end on sf0.001") {
    val rows = SparkEntry.queries("multimodal_mp4_meta")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_tracks") >= 1))
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
