package graft

import graft.operators.GifCodec

import java.awt.image.{BufferedImage, IndexColorModel}

/** Three-way certification of the hand-written GIF LZW codec: the
  * decoder and encoder against each other (analytic sums), the encoder
  * against JDK ImageIO's independent strict LZW reader, and the
  * decoder against JDK ImageIO's independent LZW writer — on images
  * large enough to cycle the dictionary past 4096 (CLEAR resets) and
  * through every code width 9..12.
  */
class GifCodecSpec extends SparkSuite {

  private def analyticSums(id: Long, w: Int, h: Int): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val i = GifCodec.pixIdx(id, x, y)
      sr += GifCodec.palR(i); sg += GifCodec.palG(i); sb += GifCodec.palB(i)
    }
    (sr, sg, sb)
  }

  test("decode(encode) matches the analytic sums on dictionary-cycling images") {
    // 300×200 = 60k indices — the dictionary passes 4096 several times,
    // so widths 9→12 and CLEAR resets all execute.
    for ((id, w, h) <- Seq((7L, 300, 200), (123L, 257, 9), (5L, 3, 2))) {
      val gif = GifCodec.encodeGif(id, w, h)
      val got = GifCodec.decodeGif(id, gif).get
      val (sr, sg, sb) = analyticSums(id, w, h)
      val n = w.toLong * h
      assert((got.w, got.h, got.n_pixels) == ((w.toLong, h.toLong, n)))
      assert(got.mean_r_c == sr * 100 / n, s"id=$id R")
      assert(got.mean_g_c == sg * 100 / n, s"id=$id G")
      assert(got.mean_b_c == sb * 100 / n, s"id=$id B")
    }
  }

  test("JDK ImageIO reads our encoder's LZW stream to the same pixels") {
    val (id, w, h) = (42L, 300, 200)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(GifCodec.encodeGif(id, w, h)))
    assert(img.getWidth == w && img.getHeight == h)
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
    }
    assert((sr, sg, sb) == analyticSums(id, w, h))
  }

  test("our decoder reads a JDK ImageIO-written GIF to ImageIO's own pixels") {
    val (id, w, h) = (9L, 300, 200)
    // indexed image over our palette, written by ImageIO's own encoder
    val r = new Array[Byte](256); val g = new Array[Byte](256); val b = new Array[Byte](256)
    for (i <- 0 until 256) {
      r(i) = GifCodec.palR(i).toByte; g(i) = GifCodec.palG(i).toByte; b(i) = GifCodec.palB(i).toByte
    }
    val cm = new IndexColorModel(8, 256, r, g, b)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, GifCodec.pixIdx(id, x, y))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val got = GifCodec.decodeGif(id, bos.toByteArray)
    // ImageIO may emit GIF89a with extensions — the decoder's chunk walk
    // must skip them. If ImageIO chose a different palette ordering the
    // decode is rightly None; assert only when the stream kept our GCT.
    got match {
      case Some(st) =>
        val (sr, sg, sb) = analyticSums(id, w, h)
        val n = w.toLong * h
        assert(st.mean_r_c == sr * 100 / n)
        assert(st.mean_g_c == sg * 100 / n)
        assert(st.mean_b_c == sb * 100 / n)
      case None =>
        fail("decoder rejected an ImageIO-written GIF stream")
    }
  }

  test("corrupt GIF payloads are quarantined") {
    val gif = GifCodec.encodeGif(3L, 40, 30)
    val flipped = gif.clone(); flipped(gif.length / 2) = (flipped(gif.length / 2) ^ 0x7f).toByte
    // a mid-stream bit flip either derails the LZW chain (None) or still
    // decodes the right pixel COUNT with different sums — it must never
    // throw. Truncation and bad signatures are always rejected.
    GifCodec.decodeGif(3L, flipped)
    assert(GifCodec.decodeGif(3L, gif.take(60)).isEmpty)
    assert(GifCodec.decodeGif(3L, "not a gif".getBytes).isEmpty)
    assert(GifCodec.decodeGif(3L, gif).isDefined)
  }

  test("a GIF truncated inside the image descriptor is quarantined") {
    // Insert an extension block after the GCT so the total length clears
    // the header gate, then truncate a few bytes into the descriptor —
    // the descriptor fields themselves must be bounds-checked.
    val gif = GifCodec.encodeGif(3L, 40, 30)
    val ext = Array[Byte](0x21, 0xfe.toByte, 3, 'a', 'b', 'c', 0)
    val cut = 13 + 768
    val spliced = gif.take(cut) ++ ext ++ gif.slice(cut, cut + 4) // descriptor cut off after 4 bytes
    assert(GifCodec.decodeGif(3L, spliced).isEmpty)
    // and with the descriptor removed entirely (stream ends at the extension)
    assert(GifCodec.decodeGif(3L, gif.take(cut) ++ ext).isEmpty)
  }

  test("the registered query runs end-to-end on sf0.001") {
    val rows = SparkEntry.queries("multimodal_gif_pixels")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
  }
}
