package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real image header decoding from raw bytes — the concrete slice of the
  * multimodal decode path that needs no codec libraries, parsed straight
  * from the public container formats:
  *
  *  - PNG (RFC 2083 / W3C PNG spec): 8-byte signature
  *    `89 50 4E 47 0D 0A 1A 0A`, then the IHDR chunk whose data carries
  *    width (4B big-endian), height (4B BE), bit depth (1B) and color
  *    type (1B). CRCs are not validated — this is header extraction, not
  *    integrity checking.
  *  - JPEG (ITU T.81 / JFIF): `FF D8` SOI, then a marker-segment walk
  *    (each segment `FF <marker> <len16 incl. itself>`) until a start-of-
  *    frame marker (FFC0–FFCF excluding the non-SOF C4/C8/CC), whose
  *    payload carries sample precision (1B), height (2B BE), width
  *    (2B BE) and component count (1B).
  *  - GIF (CompuServe 87a/89a): signature then the logical screen
  *    descriptor — LE width/height + packed color-resolution bits.
  *  - BMP (Windows BITMAPINFOHEADER): `BM`, LE width/height at 18/22,
  *    bits-per-pixel at 28.
  *
  * Anything else (or a truncated/corrupt payload) yields
  * `format='unknown', ok=false` — per-row quarantine, never a task
  * failure. Codegen emits one static call, so the parse stays inside
  * whole-stage codegen and the payload bytes never leave the scan
  * projection.
  */
case class ImageMetaExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ImageMetaExpr.schema
  override def prettyName: String = "graft_image_meta"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a binary argument, got ${child.dataType}"
      )

  override def nullSafeEval(input: Any): Any =
    ImageMetaExpr.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ImageMetaExpr.parse($c)")

  override protected def withNewChildInternal(newChild: Expression): ImageMetaExpr =
    copy(child = newChild)
}

object ImageMetaExpr {

  /** BITMAPINFOHEADER-family DIB sizes whose first 40 bytes share the
    * INFOHEADER field layout (see the BMP branch of parse).
    */
  private[plans] val KnownDibSizes: Set[Int] = Set(40, 52, 56, 64, 108, 124)

  val schema: StructType = StructType(
    Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("bit_depth", IntegerType),
      StructField("channels", IntegerType),
      StructField("ok", BooleanType)
    )
  )

  private val PngSig =
    Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  @inline private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private def fail: InternalRow =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString("unknown"), null, null, null, null, false)
    )

  private def row(fmt: String, w: Int, h: Int, depth: Int, ch: Int): InternalRow =
    new GenericInternalRow(
      Array[Any](UTF8String.fromString(fmt), w, h, depth, ch, true)
    )

  def parse(b: Array[Byte]): InternalRow = {
    if (b.length >= 26 && PngSig.indices.forall(i => b(i) == PngSig(i))) {
      // Bytes 8..15 are the IHDR chunk header (length + "IHDR"); the spec
      // requires IHDR first — verify rather than assume.
      if (b(12) != 'I' || b(13) != 'H' || b(14) != 'D' || b(15) != 'R') return fail
      val w = be32(b, 16)
      val h = be32(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return fail
      val depth = u8(b, 24)
      val channels = u8(b, 25) match {
        case 0 => 1 // grayscale
        case 2 => 3 // truecolor
        case 3 => 1 // palette
        case 4 => 2 // gray + alpha
        case 6 => 4 // truecolor + alpha
        case _ => return fail
      }
      row("png", w.toInt, h.toInt, depth, channels)
    } else if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 1 < b.length) {
        if (u8(b, i) != 0xff) return fail
        // T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        // marker — skip to the first non-FF byte.
        var j = i + 1
        while (j < b.length && u8(b, j) == 0xff) j += 1
        if (j >= b.length) return fail
        val marker = u8(b, j)
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (j + 8 >= b.length) return fail
          // T.81 allows Y=0 in the frame header (real height deferred to a
          // DNL marker); without scanning for DNL the dimensions are
          // unknown, so fail closed like every other format branch.
          val sofW = be16(b, j + 6)
          val sofH = be16(b, j + 4)
          if (sofW <= 0 || sofH <= 0) return fail
          return row("jpeg", sofW, sofH, u8(b, j + 3), u8(b, j + 8))
        }
        // Standalone markers (TEM, RSTn, SOI/EOI) carry no length field.
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i = j + 1
        else {
          if (j + 2 >= b.length) return fail
          i = j + 1 + be16(b, j + 1)
        }
      }
      fail
    } else if (
      b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'
    ) {
      // GIF87a/89a (CompuServe GSDF): logical screen descriptor at 6 —
      // LE width, LE height, then the packed byte whose bits 4-6 carry
      // color resolution − 1 (bits per primary). GIF is palette-indexed:
      // channels = 1, same convention as PNG color type 3.
      val w = le16(b, 6)
      val h = le16(b, 8)
      if (w <= 0 || h <= 0) return fail
      val colorRes = ((u8(b, 10) >> 4) & 7) + 1
      row("gif", w, h, colorRes, 1)
    } else if (b.length >= 30 && b(0) == 'B' && b(1) == 'M') {
      // BMP (Windows BITMAPINFOHEADER): LE width at 18, LE height at 22
      // (negative = top-down rows; dimensions are absolute), bits per
      // pixel at 28. bit_depth reports the header's bpp field; channels
      // follow the pixel layout (≤8 palette, 16/24 RGB, 32 RGBA).
      // The DIB header size at 14 gates the layout: a BITMAPCOREHEADER
      // (OS/2 v1, size 12) has 16-bit fields at different offsets and
      // would parse to garbage here, so only the KNOWN
      // INFOHEADER-compatible sizes pass — 40 (INFOHEADER), 52/56
      // (BITMAPV2/V3), 64 (OS/2 v2, whose first 40 bytes are a
      // BITMAPINFOHEADER; ADVICE r7 — the old whitelist failed closed
      // on these valid bitmaps), 108 (V4), 124 (V5). Unknown sizes
      // still fail CLOSED: a blanket `>= 40` would parse corrupt or
      // crafted headers into garbage metadata (round-8 review).
      val dibSize = le32s(b, 14)
      if (!ImageMetaExpr.KnownDibSizes.contains(dibSize)) return fail
      val w = le32s(b, 18)
      val h = math.abs(le32s(b, 22))
      val bpp = le16(b, 28)
      if (w <= 0 || h == 0) return fail
      val channels = bpp match {
        case 1 | 4 | 8 => 1
        case 16 | 24   => 3
        case 32        => 4
        case _         => return fail
      }
      row("bmp", w, h, bpp, channels)
    } else if (
      b.length >= 8 &&
      ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))
    ) {
      parseTiff(b, littleEndian = b(0) == 'I')
    } else fail
  }

  /** TIFF 6.0 baseline: endian-tagged header, IFD offset at byte 4, then
    * 12-byte IFD entries (tag, type, count, value-or-offset). Width/
    * height from tags 256/257 (SHORT or LONG), bit depth from the first
    * BitsPerSample value (tag 258 — inline when count==1, dereferenced
    * when the value field holds an offset), channels from
    * SamplesPerPixel (tag 277, default 1). Every read is bounds-checked;
    * malformed structures return the not-an-image row, never throw.
    */
  private def parseTiff(b: Array[Byte], littleEndian: Boolean): InternalRow = {
    @inline def r16(i: Int): Int = if (littleEndian) le16(b, i) else be16(b, i)
    @inline def r32(i: Int): Long =
      if (littleEndian) le32s(b, i) & 0xffffffffL else be32(b, i)
    def entryValue(off: Int): Long = {
      // Returns the first value of a SHORT/LONG entry, or -1 if unusable.
      val tpe = r16(off + 2)
      val count = r32(off + 4)
      if (count < 1) return -1
      tpe match {
        case 3 => // SHORT: count<=2 fits inline; otherwise value field is an offset
          if (count <= 2) r16(off + 8)
          else {
            val p = r32(off + 8)
            if (p + 2 > b.length) -1 else r16(p.toInt)
          }
        case 4 =>
          if (count == 1) r32(off + 8)
          else {
            val p = r32(off + 8)
            if (p + 4 > b.length) -1 else r32(p.toInt)
          }
        case _ => -1
      }
    }
    val ifd = r32(4)
    if (ifd < 8 || ifd + 2 > b.length) return fail
    val n = r16(ifd.toInt)
    var (w, h, depth, ch) = (-1L, -1L, 8L, 1L)
    var e = 0
    while (e < n) {
      val off = ifd.toInt + 2 + e * 12
      if (off + 12 > b.length) return fail
      r16(off) match {
        case 256 => w = entryValue(off)
        case 257 => h = entryValue(off)
        case 258 => depth = entryValue(off)
        case 277 => ch = entryValue(off)
        case _   => ()
      }
      e += 1
    }
    // depth/ch need the same Int guard as w/h: a LONG-typed tag value
    // >= 2^31 would wrap negative through toInt and emit an ok=true row
    // with a negative bit depth.
    if (
      w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue ||
      depth <= 0 || ch <= 0 || depth > Int.MaxValue || ch > Int.MaxValue
    ) fail
    else row("tiff", w.toInt, h.toInt, depth.toInt, ch.toInt)
  }

  @inline private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def le32s(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
}
