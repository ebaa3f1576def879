package graft

import graft.operators.JpegCodec

import java.awt.image.BufferedImage

/** Three-way certification of the hand-written baseline JPEG codec
  * (the ADPCM/GIF discipline adapted to JPEG's spec-permitted IDCT
  * tolerance):
  *  1. decode(encode) equals an independent Scala replay of the exact
  *     integer laws (coefficient field → dequant → 14-bit basis IDCT →
  *     color convert) — certifies the Huffman/bitstream chain exactly;
  *  2. javax.imageio reads OUR stream to the same pixels within a
  *     per-sample tolerance (its IDCT/color laws differ legally);
  *  3. OUR decoder reads an ImageIO-ENCODED grayscale photo (a real
  *     FDCT-produced stream with foreign quant/Huffman tables) within
  *     per-sample tolerance of ImageIO's own decode.
  */
class JpegCodecSpec extends SparkSuite {

  /** Independent replay of the decoder's integer laws from the public
    * coefficient field — no bitstream involved.
    */
  private def analyticPixels(id: Long, w: Int, h: Int): Array[Int] = {
    val wb = w / 8
    val hb = h / 8
    val px = new Array[Int](w * h)
    val samp = Array.ofDim[Int](3, 64)
    for (by <- 0 until hb; bx <- 0 until wb) {
      val b = by * wb + bx
      for (c <- 0 until 3) {
        val dqNat = new Array[Int](64)
        for (k <- 0 until 64) {
          val q = if (c == 0) JpegCodec.QLumZig(k) else JpegCodec.QChrZig(k)
          dqNat(JpegCodec.Zig(k)) = JpegCodec.coefQ(id, c, b, k) * q
        }
        for (y <- 0 until 8; x <- 0 until 8) {
          var acc = 0L
          for (n <- 0 until 64)
            acc += dqNat(n).toLong * JpegCodec.BM(n & 7)(x) * JpegCodec.BM(n >> 3)(y)
          val v = (((acc + (1L << 27) + (1L << 45)) >> 28) - 131072 + 128).toInt
          samp(c)(y * 8 + x) = math.max(0, math.min(255, v))
        }
      }
      for (dy <- 0 until 8; dx <- 0 until 8) {
        val yv = samp(0)(dy * 8 + dx)
        val cb = samp(1)(dy * 8 + dx)
        val cr = samp(2)(dy * 8 + dx)
        def cl(v: Int) = math.max(0, math.min(255, v))
        val r = cl(yv + ((91881 * (cr - 128) + 32768 + (1 << 24)) >> 16) - 256)
        val g = cl(yv - (((22554 * (cb - 128) + 46802 * (cr - 128) + 32768 + (1 << 25)) >> 16) - 512))
        val bb = cl(yv + ((116130 * (cb - 128) + 32768 + (1 << 25)) >> 16) - 512)
        px((by * 8 + dy) * w + (bx * 8 + dx)) = (r << 16) | (g << 8) | bb
      }
    }
    px
  }

  test("decode(encode) equals the exact integer-law replay, per pixel") {
    for ((id, w, h) <- Seq((0L, 8, 8), (7L, 16, 16), (12L, 24, 8), (4999L, 24, 16))) {
      val jpg = JpegCodec.encodeJpeg(id, w, h)
      val (dw, dh, got) = JpegCodec.decodePixels(jpg).get
      assert((dw, dh) == ((w, h)))
      val want = analyticPixels(id, w, h)
      assert(got.sameElements(want), s"id=$id pixel mismatch")
      // and the registered stats law over the same pixels
      val st = JpegCodec.decodeJpeg(id, jpg).get
      val n = w.toLong * h
      val sr = want.map(p => (p >> 16) & 0xff).foldLeft(0L)(_ + _)
      assert(st.mean_r_c == sr * 100 / n)
    }
  }

  test("javax.imageio reads our encoder's stream within per-sample tolerance") {
    for ((id, w, h) <- Seq((3L, 16, 16), (42L, 24, 16))) {
      val jpg = JpegCodec.encodeJpeg(id, w, h)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      val ours = analyticPixels(id, w, h)
      var maxD = 0
      var sumD = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val a = img.getRGB(x, y)
        val o = ours(y * w + x)
        for (sh <- Seq(16, 8, 0)) {
          val d = math.abs(((a >> sh) & 0xff) - ((o >> sh) & 0xff))
          maxD = math.max(maxD, d)
          sumD += d
        }
      }
      assert(maxD <= 3, s"id=$id max per-sample delta $maxD vs ImageIO")
      assert(sumD.toDouble / (w * h * 3) <= 1.0, s"id=$id mean delta too high")
    }
  }

  test("our decoder reads an ImageIO-ENCODED grayscale photo within tolerance of ImageIO's decode") {
    val (w, h) = (40, 24)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, ((x * 7 + y * 5) % 200 + (x * y) % 56) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val jpg = bos.toByteArray
    val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val got = JpegCodec.decodePixels(jpg)
    assert(got.isDefined, "decoder rejected an ImageIO-written baseline grayscale JPEG")
    val (dw, dh, px) = got.get
    assert((dw, dh) == ((w, h)))
    var maxD = 0
    for (y <- 0 until h; x <- 0 until w) {
      // NB: getRGB on TYPE_BYTE_GRAY applies linear-gray→sRGB gamma;
      // the raster sample is the decoder's actual Y output.
      val a = ref.getRaster.getSample(x, y, 0)
      val o = px(y * w + x) & 0xff
      maxD = math.max(maxD, math.abs(a - o))
    }
    assert(maxD <= 2, s"max per-sample gray delta $maxD vs ImageIO's own decode")
  }

  test("restart markers (DRI + RSTn) decode identically and ImageIO agrees") {
    // NB on fixture choice: the coefficient field is synthetic, and ids
    // whose blocks go far out of sample gamut (ideal IDCT outputs of
    // ±2000) hit libjpeg-lineage decoders' range-limit ALIASING, where
    // clamping semantics legally diverge — the exact-integer oracle is
    // unaffected, but ImageIO comparisons need an in-gamut id (3 here;
    // id 11 is a known aliasing fixture).
    val (id, w, h) = (3L, 32, 16) // 8 MCUs, restart every 2 → 3 RST markers
    val jpg = JpegCodec.encodeJpeg(id, w, h, restartInterval = 2)
    assert(jpg.count(_ == 0xdd.toByte) >= 1) // DRI present
    val (dw, dh, got) = JpegCodec.decodePixels(jpg).get
    assert((dw, dh) == ((w, h)))
    assert(got.sameElements(analyticPixels(id, w, h)), "RST path diverged from the integer-law replay")
    // conformance: an independent decoder must read the restart stream
    // to EXACTLY the pixels of the plain encoding of the same image
    // (per-sample absolute comparison would re-enter the gamut-aliasing
    // territory above; stream-vs-stream identity is gamut-free)
    val ioRst = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpg))
    val ioPlain =
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(JpegCodec.encodeJpeg(id, w, h)))
    assert(ioRst != null && ioRst.getWidth == w && ioRst.getHeight == h, "ImageIO rejected our restart stream")
    for (y <- 0 until h; x <- 0 until w)
      assert(ioRst.getRGB(x, y) == ioPlain.getRGB(x, y), s"ImageIO restart/plain divergence at ($x,$y)")
    // and our decoder agrees stream-vs-stream as well
    val (_, _, gotPlain) = JpegCodec.decodePixels(JpegCodec.encodeJpeg(id, w, h)).get
    assert(got.sameElements(gotPlain))
  }

  test("malformed JPEG payloads are quarantined") {
    val jpg = JpegCodec.encodeJpeg(5L, 16, 8)
    assert(JpegCodec.decodeJpeg(5L, "not a jpeg".getBytes).isEmpty)
    assert(JpegCodec.decodeJpeg(5L, jpg.take(2)).isEmpty)
    assert(JpegCodec.decodeJpeg(5L, jpg.take(30)).isEmpty) // inside DQT
    assert(JpegCodec.decodeJpeg(5L, jpg.take(jpg.length - 10)).isEmpty) // truncated entropy data
    // progressive SOF2 is out of profile
    val prog = jpg.clone()
    val sof = {
      var i = 2
      while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    prog(sof + 1) = 0xc2.toByte
    assert(JpegCodec.decodeJpeg(5L, prog).isEmpty)
    // a mid-entropy bit flip must quarantine or decode — never throw
    val flipped = jpg.clone()
    flipped(jpg.length - 12) = (flipped(jpg.length - 12) ^ 0x55).toByte
    JpegCodec.decodeJpeg(5L, flipped)
    assert(JpegCodec.decodeJpeg(5L, jpg).isDefined)
  }

  test("the registered query runs end-to-end on sf0.001") {
    val rows = SparkEntry.queries("multimodal_jpeg_pixels")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("n_pixels") > 0))
  }
}
