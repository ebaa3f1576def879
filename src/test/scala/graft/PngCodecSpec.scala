package graft

import graft.operators.DeflateMedia

import java.util.zip.Inflater

/** Two-sided certification of the DEFLATE codec tier: the decoder must
  * agree with JDK ImageIO on the same PNG byte streams (independent
  * implementation), survive spec-legal IDAT re-chunking, and quarantine
  * corrupt payloads instead of failing the partition.
  */
class PngCodecSpec extends SparkSuite {

  private def imageIoSums(png: Array[Byte]): (Long, Long, Long, Int, Int) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    var sr = 0L; var sg = 0L; var sb = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
    }
    (sr, sg, sb, img.getWidth, img.getHeight)
  }

  test("PNG decoder matches JDK ImageIO on images exercising all five filters") {
    val inf = new Inflater
    for (id <- Seq(0L, 1L, 7L, 123L, 99999L)) {
      val png = DeflateMedia.encodePng(id, 40, 33) // 33 rows → y%5 covers 0..4
      val got = DeflateMedia.decodePng(inf, id, png).get
      val (sr, sg, sb, w, h) = imageIoSums(png)
      assert((got.w, got.h) == ((w.toLong, h.toLong)))
      assert(got.filter_mask == 31L, s"id=$id mask=${got.filter_mask}")
      val n = w.toLong * h
      assert(got.mean_r_c == sr * 100 / n, s"id=$id R")
      assert(got.mean_g_c == sg * 100 / n, s"id=$id G")
      assert(got.mean_b_c == sb * 100 / n, s"id=$id B")
    }
  }

  test("multi-IDAT re-chunking decodes identically to the single-IDAT stream") {
    val inf = new Inflater
    val one = DeflateMedia.decodePng(inf, 42L, DeflateMedia.encodePng(42L, 17, 11)).get
    val many = DeflateMedia.decodePng(inf, 42L, DeflateMedia.encodePng(42L, 17, 11, idatSplit = 7)).get
    assert(one == many)
  }

  test("corrupt payloads are quarantined (CRC flip, truncation, bad signature)") {
    val inf = new Inflater
    val png = DeflateMedia.encodePng(5L, 9, 6)
    val flipped = png.clone(); flipped(png.length / 2) = (flipped(png.length / 2) ^ 0x55).toByte
    assert(DeflateMedia.decodePng(inf, 5L, flipped).isEmpty)
    assert(DeflateMedia.decodePng(inf, 5L, png.take(png.length - 20)).isEmpty)
    assert(DeflateMedia.decodePng(inf, 5L, "not a png at all, nope".getBytes).isEmpty)
    // and the good payload still decodes on the SAME reused Inflater
    assert(DeflateMedia.decodePng(inf, 5L, png).isDefined)
  }

  test("gzip ingest stats match direct computation on the text") {
    val texts = Seq(
      "hello world\nsecond line\ttabbed  double-space",
      "", // empty member
      "one",
      "trailing spaces   \n\n",
      "unicode éè café tokens"
    )
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = DeflateMedia.gunzipStats(i.toLong, DeflateMedia.gzipBytes(t)).get
      assert(got.n_bytes == t.getBytes("UTF-8").length.toLong, s"bytes of '$t'")
      assert(got.n_tokens == t.split("[ \t\n\r\f\\x0B]+").count(_.nonEmpty).toLong, s"tokens of '$t'")
      assert(got.n_lines == t.count(_ == '\n').toLong, s"lines of '$t'")
    }
    assert(DeflateMedia.gunzipStats(0L, "garbage".getBytes).isEmpty)
  }

  test("zstd/lz4/snappy ingest match direct computation and quarantine garbage") {
    for (q <- Seq("docs_zstd_ingest", "docs_lz4_ingest", "docs_snappy_ingest")) {
      val rows = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").collect()
      assert(rows.nonEmpty, q)
    }
    for (codec <- Seq("zstd", "lz4", "snappy"))
      assert(graft.operators.CompressedIngest.decodeStats(codec, 0L, "garbage".getBytes).isEmpty, codec)
    // MID-STREAM corruption: a valid frame header with a mangled body.
    // lz4-java/zstd-jni surface this as RuntimeExceptions, not
    // IOException — streamStats must still quarantine, not kill the task.
    for (codec <- Seq("zstd", "lz4", "snappy", "gzip")) {
      val good = graft.operators.CompressedIngest.encodeBytes(codec, "a reasonably long line of text to compress " * 8)
      val bad = good.clone()
      for (i <- good.length / 2 until good.length) bad(i) = (bad(i) ^ 0x5a).toByte
      graft.operators.CompressedIngest.decodeStats(codec, 0L, bad) // Some or None — must not throw
    }
    assert(DeflateMedia.streamStats(0L, new java.io.InputStream {
      override def read(): Int = throw new RuntimeException("codec blew up mid-stream")
    }).isEmpty)
  }

  test("the registered queries run end-to-end on sf0.001") {
    val png = SparkEntry.queries("multimodal_png_pixels")(spark, "/root/testdata/sf0.001")
    val rows = png.collect()
    assert(rows.nonEmpty)
    // every h ≥ 5 row must have seen all five filter types
    rows.foreach { r =>
      val h = r.getAs[Long]("h"); val m = r.getAs[Long]("filter_mask")
      assert(m == (1L << math.min(h, 5L)) - 1, s"h=$h mask=$m")
    }
    val gz = SparkEntry.queries("docs_gzip_ingest")(spark, "/root/testdata/sf0.001")
    assert(gz.collect().nonEmpty)
  }
}
