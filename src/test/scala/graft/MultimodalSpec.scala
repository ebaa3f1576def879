package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

import graft.plans.ImageMetaExpr
import org.apache.spark.sql.GraftColumn
import org.apache.spark.sql.functions._

/** Byte-level image header parsing against REAL encoder output: PNG and
  * JPEG streams produced by the JDK's ImageIO (not the synthesized
  * fixtures the oracle query uses), plus quarantine and marker-walk
  * robustness.
  */
class MultimodalSpec extends SparkSuite {

  import spark.implicits._

  private def parse(bytes: Array[Byte]) =
    Seq(Tuple1(bytes))
      .toDF("payload")
      .select(GraftColumn.of(ImageMetaExpr(GraftColumn.exprOf(col("payload")))).as("m"))
      .select("m.format", "m.width", "m.height", "m.bit_depth", "m.channels", "m.ok")
      .collect()(0)

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("real ImageIO TIFF parses to its true dimensions (both endian cases via JDK writer)") {
    // JDK 9+ ships a TIFF ImageIO plugin; its output is the real-encoder
    // validation the other formats get. Gray vs RGB exercises
    // SamplesPerPixel and BitsPerSample dereferencing.
    val rgb = parse(encode(new BufferedImage(61, 29, BufferedImage.TYPE_INT_RGB), "tiff"))
    assert(rgb.getString(0) == "tiff", rgb.toString)
    assert(rgb.getInt(1) == 61 && rgb.getInt(2) == 29)
    assert(rgb.getInt(3) == 8 && rgb.getInt(4) == 3 && rgb.getBoolean(5))
    val gray = parse(encode(new BufferedImage(7, 9, BufferedImage.TYPE_BYTE_GRAY), "tiff"))
    assert(gray.getString(0) == "tiff")
    assert(gray.getInt(1) == 7 && gray.getInt(2) == 9 && gray.getInt(4) == 1)
  }

  test("truncated TIFF structures fail closed") {
    val tiff = encode(new BufferedImage(10, 10, BufferedImage.TYPE_INT_RGB), "tiff")
    for (bad <- Seq(tiff.take(6), tiff.take(9))) {
      val r = parse(bad)
      assert(!r.getBoolean(5), s"len=${bad.length}")
    }
  }

  test("real ImageIO PNG parses to its true dimensions") {
    val img = new BufferedImage(123, 45, BufferedImage.TYPE_INT_RGB)
    val r = parse(encode(img, "png"))
    assert(r.getString(0) == "png")
    assert(r.getInt(1) == 123 && r.getInt(2) == 45)
    assert(r.getInt(3) == 8 && r.getInt(4) == 3 && r.getBoolean(5))
    val gray = new BufferedImage(7, 9, BufferedImage.TYPE_BYTE_GRAY)
    val g = parse(encode(gray, "png"))
    assert(g.getString(0) == "png" && g.getInt(1) == 7 && g.getInt(2) == 9 && g.getInt(4) == 1)
  }

  test("real ImageIO JPEG parses dims through the APPn marker walk") {
    val img = new BufferedImage(64, 32, BufferedImage.TYPE_INT_RGB)
    val r = parse(encode(img, "jpg"))
    assert(r.getString(0) == "jpeg")
    assert(r.getInt(1) == 64 && r.getInt(2) == 32)
    assert(r.getInt(3) == 8 && r.getInt(4) == 3 && r.getBoolean(5))
  }

  test("JPEG fill bytes (T.81 B.1.1.2) before markers are skipped") {
    // SOI, then an APP0 preceded by two 0xFF fill bytes, then SOF0 also
    // preceded by a fill byte.
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    val bytes = hex(
      "FFD8" + "FFFF" + "FFE000104A46494600010100000100010000" +
        "FF" + "FFC0001108" + "0020" + "0040" + "03011100021101031101" + "FFD9"
    )
    val r = parse(bytes)
    assert(r.getString(0) == "jpeg")
    assert(r.getInt(1) == 64 && r.getInt(2) == 32 && r.getBoolean(5))
  }

  test("corrupt or foreign payloads quarantine as unknown/ok=false") {
    val png = encode(new BufferedImage(10, 10, BufferedImage.TYPE_INT_RGB), "png")
    for (bad <- Seq(png.take(10), "not an image".getBytes, Array[Byte](0xff.toByte, 0xd8.toByte))) {
      val r = parse(bad)
      assert(r.getString(0) == "unknown" && !r.getBoolean(5))
      assert(r.isNullAt(1) && r.isNullAt(2))
    }
  }

  test("real ImageIO GIF and BMP parse to their true dimensions") {
    val gif = parse(encode(new BufferedImage(37, 21, BufferedImage.TYPE_INT_RGB), "gif"))
    assert(gif.getString(0) == "gif")
    assert(gif.getInt(1) == 37 && gif.getInt(2) == 21)
    assert(gif.getInt(4) == 1 && gif.getBoolean(5)) // palette-indexed
    val bmp = parse(encode(new BufferedImage(50, 40, BufferedImage.TYPE_INT_RGB), "bmp"))
    assert(bmp.getString(0) == "bmp")
    assert(bmp.getInt(1) == 50 && bmp.getInt(2) == 40)
    assert(bmp.getInt(3) == 24 && bmp.getInt(4) == 3 && bmp.getBoolean(5))
  }

  test("top-down BMP (negative height) reports absolute dimensions") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val bytes = "BM".getBytes ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(64) ++ le32(-32) ++ le16(1) ++ le16(24)
    val r = parse(bytes)
    assert(r.getString(0) == "bmp")
    assert(r.getInt(1) == 64 && r.getInt(2) == 32 && r.getBoolean(5))
  }

  test("OS/2 BITMAPCOREHEADER and unknown DIB sizes fail closed; known sizes incl. 64 parse") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    // A valid BITMAPCOREHEADER (size 12, 16-bit w/h at 18/20, bpp at 24)
    // would misparse under INFOHEADER offsets — the size gate must reject it.
    val core = "BM".getBytes ++ le32(26) ++ le32(0) ++ le32(26) ++
      le32(12) ++ le16(64) ++ le16(32) ++ le16(1) ++ le16(24) ++ new Array[Byte](8)
    val r = parse(core)
    assert(r.getString(0) == "unknown" && !r.getBoolean(5))
    // OS/2 v2 header (size 64): its first 40 bytes ARE a
    // BITMAPINFOHEADER, so it must parse — the round-7 whitelist
    // failed closed on these valid bitmaps (ADVICE r7).
    val os2v2 = "BM".getBytes ++ le32(78) ++ le32(0) ++ le32(78) ++
      le32(64) ++ le32(64) ++ le32(32) ++ le16(1) ++ le16(24)
    val r2 = parse(os2v2)
    assert(r2.getString(0) == "bmp" && r2.getInt(1) == 64 && r2.getInt(2) == 32 && r2.getBoolean(5))
    // Unknown sizes (99 is no known DIB header) still fail CLOSED — the
    // gate is a whitelist, not `>= 40`.
    val weird = "BM".getBytes ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(99) ++ le32(64) ++ le32(32) ++ le16(1) ++ le16(24)
    val rw = parse(weird)
    assert(rw.getString(0) == "unknown" && !rw.getBoolean(5))
    // V5 header (124) is INFOHEADER-compatible and still parses.
    val v5 = "BM".getBytes ++ le32(138) ++ le32(0) ++ le32(138) ++
      le32(124) ++ le32(64) ++ le32(32) ++ le16(1) ++ le16(24)
    val r3 = parse(v5)
    assert(r3.getString(0) == "bmp" && r3.getInt(1) == 64 && r3.getBoolean(5))
  }

  test("JPEG SOF with zero height (DNL-deferred, T.81) fails closed") {
    def hex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // Same frame as the fill-byte test but Y=0000 in the SOF header.
    val zeroH =
      "FFD8" + "FFE000104A46494600010100000100010000" +
        "FFC0001108" + "0000" + "0040" + "03011100021101031101" + "FFD9"
    val r = parse(hex(zeroH))
    assert(r.getString(0) == "unknown" && !r.getBoolean(5))
  }

  private def parseAudio(bytes: Array[Byte]) =
    Seq(Tuple1(bytes))
      .toDF("payload")
      .select(GraftColumn.of(graft.plans.AudioMetaExpr(GraftColumn.exprOf(col("payload")))).as("m"))
      .select(
        "m.format", "m.channels", "m.sample_rate", "m.bits_per_sample",
        "m.data_bytes", "m.duration_ms", "m.ok"
      )
      .collect()(0)

  test("real javax.sound WAV parses to its true format and duration") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val frames = 16000L // one second at 16 kHz
    val fmt = new AudioFormat(16000f, 16, 2, true, false)
    val pcm = new java.io.ByteArrayInputStream(new Array[Byte]((frames * 4).toInt))
    val out = new ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(pcm, fmt, frames), AudioFileFormat.Type.WAVE, out)
    val r = parseAudio(out.toByteArray)
    assert(r.getString(0) == "wav")
    assert(r.getInt(1) == 2 && r.getInt(2) == 16000 && r.getInt(3) == 16)
    assert(r.getLong(4) == frames * 4)
    assert(r.getLong(5) == 1000L && r.getBoolean(6))
  }

  test("WAV chunk walk honors odd-size padding and rejects non-PCM formats") {
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    def fmtChunk(audioFormat: Int) =
      "fmt ".getBytes ++ le32(16) ++ le16(audioFormat) ++ le16(1) ++ le32(8000) ++
        le32(8000) ++ le16(1) ++ le16(8)
    // An odd-size LIST chunk (3 bytes + 1 pad) sits between fmt and data;
    // without word-alignment handling the walk lands mid-chunk and the
    // data header is never found.
    val odd = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      fmtChunk(1) ++
      "LIST".getBytes ++ le32(3) ++ Array[Byte](1, 2, 3, 0) ++
      "data".getBytes ++ le32(4000)
    val r = parseAudio(odd)
    assert(r.getString(0) == "wav" && r.getBoolean(6))
    assert(r.getLong(4) == 4000L && r.getLong(5) == 500L)
    // MP3-in-RIFF (format code 85) is an extension we don't interpret
    val mp3 = "RIFF".getBytes ++ le32(0) ++ "WAVE".getBytes ++
      fmtChunk(85) ++ "data".getBytes ++ le32(4000)
    val bad = parseAudio(mp3)
    assert(bad.getString(0) == "unknown" && !bad.getBoolean(6))
  }

  test("decodeBatched: batch-shaped codec plumbing matches the column stub") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.{MediaIn, MediaOut}
    val s = spark
    import s.implicits._
    val media = Multimodal
      .mediaTable(spark, "/root/testdata/sf0.001")
      .select("media_id", "payload", "media_type")
      .as[MediaIn]
      .repartition(4)
    // Count codec INVOCATIONS (not rows) through an accumulator: the
    // whole point of the batch shape is one call per ~batchSize rows.
    val calls = spark.sparkContext.longAccumulator("codec_calls")
    val rows = spark.sparkContext.longAccumulator("codec_rows")
    val counted: Seq[MediaIn] => Seq[MediaOut] = { b =>
      calls.add(1); rows.add(b.size.toLong); Multimodal.fakeCodec(b)
    }
    val out = Multimodal.decodeBatched(media, batchSize = 64, codec = counted)
    val got = out
      .collect()
      .map(m => (m.media_id, m.n_bytes, m.content_sig, m.frame_count))
      .toSet
    val n = got.size
    assert(n > 0)
    // One call per full-or-final batch per partition — far fewer calls
    // than rows, and every row passed through a batch exactly once.
    assert(rows.value == n.toLong)
    assert(calls.value <= (n / 64) + 4, s"calls=${calls.value} n=$n")
    assert(calls.value >= 4 || n < 64 * 4)
    // Byte-identical to a driver-side replay of the fake-codec law.
    val want = Multimodal
      .mediaTable(spark, "/root/testdata/sf0.001")
      .select("media_id", "payload", "media_type")
      .as[MediaIn]
      .collect()
      .toSeq
      .map { m =>
        val out = Multimodal.fakeCodec(Seq(m)).head
        (out.media_id, out.n_bytes, out.content_sig, out.frame_count)
      }
      .toSet
    assert(got == want)
  }
}
