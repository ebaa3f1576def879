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
}
