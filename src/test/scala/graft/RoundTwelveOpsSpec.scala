package graft

/** Round-12 operator certification beyond the DuckDB oracle gate. */
class RoundTwelveOpsSpec extends SparkSuite {

  test("MP4 sample tables: frames, duration, bytes, keyframes from stts/stsz/stss/stco") {
    import graft.operators.Mp4Meta
    // id 2: compact stsz + single-run stts; id 5: per-sample stsz +
    // two-run stts; id 13/26: minf-BEFORE-hdlr mdia child order (the
    // advice finding — handler must resolve without hdlr-first luck);
    // id 7: v1 mvhd alongside the tables; id 11: largesize mdat.
    for (id <- Seq(2L, 5L, 7L, 11L, 13L, 26L, 39L)) {
      val t = Mp4Meta.decodeMp4Tracks(id, Mp4Meta.encodeMp4(id)).get
      assert(t.n_frames == Mp4Meta.lawFrames(id), s"id $id frames")
      assert(t.n_keyframes == Mp4Meta.lawKeyframes(id), s"id $id keyframes")
      assert(t.keyframe_permille == Mp4Meta.lawKeyframes(id) * 1000 / Mp4Meta.lawFrames(id))
      assert(
        t.track_duration_ms == Mp4Meta.lawDurUnits(id) * 1000 / Mp4Meta.lawTimescale(id),
        s"id $id duration"
      )
      assert(t.total_sample_bytes == Mp4Meta.lawSampleBytes(id), s"id $id bytes")
      assert(t.mean_frame_bytes == Mp4Meta.lawSampleBytes(id) / Mp4Meta.lawFrames(id))
      assert(
        t.bitrate_bps ==
          Mp4Meta.lawSampleBytes(id) * 8 * Mp4Meta.lawTimescale(id) / Mp4Meta.lawDurUnits(id)
      )
      assert(t.n_chunks == Mp4Meta.lawChunks(id), s"id $id chunks")
    }
    // truncated fixture quarantines at the track level too
    assert(Mp4Meta.decodeMp4Tracks(53L, Mp4Meta.encodeMp4(53L)).isEmpty)
  }

  test("MJPEG: AVI frame decode aggregates exactly the per-frame JPEG decodes") {
    import graft.operators.{JpegCodec, Mjpeg}
    for (id <- Seq(0L, 2L, 3L, 7L, 11L, 26L)) {
      val st = Mjpeg.decodeAvi(id, Mjpeg.encodeAvi(id)).get
      val nf = Mjpeg.lawFrames(id).toInt
      assert(st.n_frames == nf.toLong && st.w == 8L && st.h == 8L)
      assert(st.n_pixels == 64L * nf)
      // channel means must equal the certified single-frame JPEG
      // decoder's raw channel sums aggregated over the same fixture ids
      var rr = 0L; var gg = 0L; var bb = 0L
      for (f <- 0 until nf) {
        JpegCodec.decodeCore(JpegCodec.encodeJpeg(Mjpeg.frameFixtureId(id, f), 8, 8)) {
          (_, _, r, g, b) => rr += r; gg += g; bb += b
        }
      }
      assert(st.mean_r_c == rr * 100 / (64L * nf), s"id $id r")
      assert(st.mean_g_c == gg * 100 / (64L * nf), s"id $id g")
      assert(st.mean_b_c == bb * 100 / (64L * nf), s"id $id b")
    }
  }

  test("MJPEG quarantine: truncation, foreign codec fourcc, and garbage") {
    import graft.operators.Mjpeg
    assert(Mjpeg.decodeAvi(53L, Mjpeg.encodeAvi(53L)).isEmpty) // truncated fixture
    assert(Mjpeg.decodeAvi(1L, "RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Mjpeg.decodeAvi(1L, Array[Byte](1, 2, 3)).isEmpty)
    // flip the declared handler to a codec we do not decode: the row
    // must quarantine (route), not mis-decode
    val avi = Mjpeg.encodeAvi(2L)
    val s = new String(avi, "ISO-8859-1")
    val hIdx = s.indexOf("vids") + 4
    val forged = avi.clone()
    "H264".getBytes("US-ASCII").copyToArray(forged, hIdx)
    assert(Mjpeg.decodeAvi(2L, forged).isEmpty)
  }

  test("MJPEG frames are genuine JPEGs: ImageIO reads them within tolerance") {
    import graft.operators.{JpegCodec, Mjpeg}
    // Every frame must be a well-formed JPEG a FOREIGN decoder reads at
    // the right dims. Per-pixel parity is asserted only on clamp-free
    // frames: the fixture coefficient field is synthetic and can push
    // YCbCr far out of gamut, where decoder clamping pipelines
    // legitimately diverge (JpegCodecSpec pins parity on controlled
    // fixtures); away from the clamp rails the decoders must agree to
    // IDCT+color rounding (≤3).
    // Interior-pixel detector: replay the analytic sample law and keep
    // pixels whose PRE-clamp YCbCr samples and RGB all sit in [8, 247].
    def interiorMask(fid: Long): Array[Boolean] = {
      val samp = Array.ofDim[Int](3, 64)
      val ok = Array.fill(64)(true)
      for (c <- 0 until 3) {
        val dqNat = new Array[Int](64)
        for (k <- 0 until 64) {
          val q = if (c == 0) JpegCodec.QLumZig(k) else JpegCodec.QChrZig(k)
          dqNat(JpegCodec.Zig(k)) = JpegCodec.coefQ(fid, c, 0, k) * q
        }
        for (y <- 0 until 8; x <- 0 until 8) {
          var acc = 0L
          for (n <- 0 until 64)
            acc += dqNat(n).toLong * JpegCodec.BM(n & 7)(x) * JpegCodec.BM(n >> 3)(y)
          val v = (((acc + (1L << 27) + (1L << 45)) >> 28) - 131072 + 128).toInt
          if (v < 8 || v > 247) ok(y * 8 + x) = false
          samp(c)(y * 8 + x) = math.max(0, math.min(255, v))
        }
      }
      for (i <- 0 until 64) {
        val yv = samp(0)(i); val cb = samp(1)(i); val cr = samp(2)(i)
        val r = yv + ((91881 * (cr - 128) + 32768) >> 16)
        val g = yv - ((22554 * (cb - 128) + 46802 * (cr - 128) + 32768) >> 16)
        val b = yv + ((116130 * (cb - 128) + 32768) >> 16)
        if (Seq(r, g, b).exists(v => v < 8 || v > 247)) ok(i) = false
      }
      ok
    }
    var strictPixels = 0
    for (id <- Seq(0L, 2L, 3L, 5L, 7L, 9L, 11L, 13L, 17L, 19L, 21L, 23L, 29L, 31L);
         f <- 0 until Mjpeg.lawFrames(id).toInt) {
      val fid = Mjpeg.frameFixtureId(id, f)
      val jpg = JpegCodec.encodeJpeg(fid, 8, 8)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8, s"id=$id f=$f unreadable")
      val (w, h, px) = JpegCodec.decodePixels(jpg).get
      assert(w == 8 && h == 8)
      val ok = interiorMask(fid)
      for (y <- 0 until 8; x <- 0 until 8; if ok(y * 8 + x); sh <- Seq(16, 8, 0)) {
        val d = math.abs(((img.getRGB(x, y) >> sh) & 0xff) - ((px(y * 8 + x) >> sh) & 0xff))
        assert(d <= 3, s"id=$id f=$f ($x,$y) delta $d")
        strictPixels += 1
      }
    }
    assert(strictPixels >= 64, s"only $strictPixels interior samples — pixel parity near-vacuous")
  }

  test("incremental ANN: base index streams from storage with zero exchange; base ∪ delta ≡ one-shot") {
    import graft.operators.{IvfPq, PqTrain}
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_incr_spec").toString
    val df = IvfPq.ivfpqIncrementalOf(spark, "/root/testdata/sf0.001", dir)
    val got = df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(got.nonEmpty && got.exists(_._2 == "delta") && got.exists(_._2 == "base"))
    // two-batch ≡ one-shot: encoding is a pure function of the stored
    // models, so the union must equal a single encode of everything
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").select("vec_id", "embedding")
    val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 9)
    val cents = IvfPq.trainedCentsOf(base)
    val oneShot = IvfPq
      .incrementalIndexOf(emb, cents, PqTrain.trainOf(base))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(got.map(r => (r._1, r._3, r._4)).toSet == oneShot)
    // the stored-base branch of the union must carry NO exchange: the
    // index appends, it never reshuffles history (BucketingSpec's law)
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    val union = plan.collectFirst { case u: org.apache.spark.sql.execution.UnionExec => u }
    assert(union.isDefined, "expected a UnionExec of base scan + delta encode")
    val baseBranch = union.get.children.head
    assert(
      baseBranch.collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("incr_index_base")) =>
          s
      }.isDefined,
      s"base branch is not the stored index scan:\n$baseBranch"
    )
    assert(
      baseBranch.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.isEmpty,
      "stored base index must stream through exchange-free"
    )
  }

  test("residual PQ strictly reduces distortion in every subspace (sf0.001)") {
    val rows = SparkEntry
      .queries("embed_pq_residual")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      assert(
        r.getAs[Long]("res_mean_err_mu") <= r.getAs[Long]("raw_mean_err_mu"),
        s"sub ${r.getAs[Long]("sub")}: residual worse than raw"
      )
    }
  }

  test("image resize: byte-walked cell means match a JVM replay of the law") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry
      .queries("multimodal_image_resize")(spark, "/root/testdata/sf0.001")
      .filter(col("media_id").isin(2L, 5L, 11L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(rows.size == 3 * 16)
    def law(id: Long, x: Long, y: Long): Long =
      Math.floorMod(id + (3 + id % 11) * x + (7 + id % 7) * y, 256) +
        Math.floorMod(2 * id + (5 + id % 13) * x + (1 + id % 5) * y, 256) +
        Math.floorMod(3 * id + (1 + id % 9) * x + (11 + id % 3) * y, 256)
    for (id <- Seq(2L, 5L, 11L); cy <- 0L until 4L; cx <- 0L until 4L) {
      val w = id % 17 + 16; val h = id % 13 + 12
      val (x0, x1) = (cx * w / 4, (cx + 1) * w / 4)
      val (y0, y1) = (cy * h / 4, (cy + 1) * h / 4)
      val sum = (for (y <- y0 until y1; x <- x0 until x1) yield law(id, x, y)).sum
      val npx = (x1 - x0) * (y1 - y0)
      assert(rows((id, cy, cx)) == ((npx, sum * 100 / (3 * npx))), s"id=$id cell($cy,$cx)")
    }
  }

  test("BoxGridExpr kernel equals the composed per-byte fold specification") {
    import graft.operators.ImageFeatures
    val media = ImageFeatures.imageTable(spark, "/root/testdata/sf0.001")
    for ((gw, gh) <- Seq((4, 4), (9, 8))) {
      val native = ImageFeatures
        .cellSums(media, gw, gh)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      val composed = ImageFeatures
        .cellSumsComposed(media, gw, gh)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
        .toMap
      assert(native.nonEmpty && native == composed, s"grid ${gw}x$gh")
    }
    // malformed payloads quarantine to zero cells, not task failures
    assert(
      graft.plans.BoxGridExpr.cellSums("not a bmp at all".getBytes, 4, 4).numElements() == 0
    )
    assert(graft.plans.BoxGridExpr.cellSums(Array[Byte](1, 2), 4, 4).numElements() == 0)
  }

  test("image near-dup: planted brightness copies are found with low Hamming") {
    import org.apache.spark.sql.functions._
    val pairs = SparkEntry
      .queries("dedup_image_neardup")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = pairs.filter(p => p._2 - p._1 == 10000000L)
    val nPlantedImages = SparkEntry
      .queries("multimodal_image_dhash")(spark, "/root/testdata/sf0.001")
      .filter(col("media_id") >= 10000000L)
      .count()
    assert(nPlantedImages > 0)
    // banding recall: most planted copies must surface as candidate
    // pairs and verify under the Hamming budget
    assert(
      planted.length * 10 >= nPlantedImages * 6,
      s"planted recall too low: ${planted.length} of $nPlantedImages"
    )
    // and the planted pairs are MUCH closer than the acceptance budget
    // on average (brightness shifts mostly cancel in gradient bits)
    val meanPlanted = planted.map(_._3).sum.toDouble / planted.length
    assert(meanPlanted <= 6.0, s"planted mean hamming $meanPlanted")
  }

  test("image incremental assignment inherits the pairwise banding recall (r13)") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry
      .queries("dedup_image_neardup_incremental")(spark, "/root/testdata/sf0.001")
      .collect()
    try {
      val dups = out.filter(_.getAs[Long]("media_id") < 20000000L)
      val novel = out.filter(_.getAs[Long]("media_id") >= 30000000L)
      assert(dups.nonEmpty && novel.nonEmpty)
      // brightness-shifted copies: matched at (at least) the pairwise
      // query's ~60% banding-recall characteristic — a shifted copy is
      // found iff at least one 16-bit band survives the bit flips
      val matchedDups = dups.count(!_.getAs[Boolean]("is_new"))
      assert(
        matchedDups * 10 >= dups.length * 6,
        s"incremental dup recall too low: $matchedDups of ${dups.length}"
      )
      // of the matched, the dominant assignment is the true source
      val toSource = dups.count(r =>
        r.getAs[Long]("matched_media") == r.getAs[Long]("media_id") - 10000000L)
      assert(toSource * 2 >= matchedDups, s"$toSource of $matchedDups matched their source")
      // novel-content images mostly start their own identity (the
      // sparse 64-bit hash space allows accidental fingerprint twins)
      assert(novel.count(_.getAs[Boolean]("is_new")) * 2 >= novel.length)
    } finally graft.Lineage.releaseHeld()
  }

  test("audio spectrum: a pure tone peaks at its own bin") {
    import spark.implicits._
    // hand-built canonical-44 WAV around 32 samples of a bin-5 cosine
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    for (toneBin <- Seq(3, 5, 11)) {
      val samples = (0 until 32).map(k =>
        math.round(10000.0 * math.cos(2 * math.Pi * toneBin * k / 32)).toInt
      )
      val wav = "RIFF".getBytes ++ le32(36 + 64) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
        le16(2) ++ le16(16) ++ "data".getBytes ++ le32(64) ++
        samples.flatMap(s => le16(s & 0xffff)).toArray
      val row = graft.operators.AudioFeatures
        .spectrumOf(Seq((1L, wav)).toDF("media_id", "payload"))
        .collect()
        .head
      assert(row.getAs[Long]("peak_bin") == toneBin.toLong, s"tone $toneBin")
      // a pure tone concentrates essentially all AC energy in its bin
      assert(row.getAs[Long]("peak_permille") >= 990L, s"tone $toneBin spread")
    }
  }

  test("MP4 meta decode is order-independent in the mdia children") {
    import graft.operators.Mp4Meta
    // id 13 (and 39, which also has audio) order minf before hdlr; the
    // stsd classification must still land video/audio fields correctly.
    for (id <- Seq(13L, 39L)) {
      val st = Mp4Meta.decodeMp4(id, Mp4Meta.encodeMp4(id)).get
      assert(st.video_codec == "avc1" && st.width == Mp4Meta.lawWidth(id))
      assert(Mp4Meta.lawHasAudio(id))
      assert(st.audio_codec == "mp4a" && st.sample_rate == Mp4Meta.lawRate(id))
    }
  }
}
