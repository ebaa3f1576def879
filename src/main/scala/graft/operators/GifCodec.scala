package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** GIF87a LZW pixel decode — the SECOND entropy coder closed with no
  * external library (after [[DeflateMedia]]'s DEFLATE pair): a
  * hand-written variable-width LZW decompressor (9→12-bit codes, CLEAR
  * dictionary resets, LSB-first bit packing, 255-byte sub-blocks) over
  * the binary payload column, palette-mapped to per-channel pixel sums.
  * GIF is lossless and palette-indexed, so — unlike JPEG — an ANALYTIC
  * oracle exists: the fixture's palette and index raster are both
  * closed-form in (id, x, y), and DuckDB recomputes the channel sums
  * without ever touching the compressed bytes. GifCodecSpec additionally
  * certifies the decoder against JDK ImageIO on the same streams and
  * the encoder against ImageIO's own strict LZW parser.
  *
  * Same codec-tier contract as [[DeflateMedia]]: mapPartitions, decoder
  * state reused across rows, corrupt payloads quarantined per row,
  * transient memory O(dictionary) = 4096 entries regardless of image
  * size (the dictionary stores (prefix, firstByte) pairs, NOT expanded
  * strings — expansion walks the prefix chain and only per-channel
  * sums accumulate, so a wide image never materializes its pixel rows).
  */
object GifCodec {

  /** Deterministic 256-entry palette: channel formulas the oracle
    * replays.
    */
  private[graft] def palR(i: Int): Int = (7 * i + 13) % 256
  private[graft] def palG(i: Int): Int = (5 * i + 3) % 256
  private[graft] def palB(i: Int): Int = (11 * i + 1) % 256

  /** Deterministic index raster. */
  private[graft] def pixIdx(id: Long, x: Int, y: Int): Int =
    (((id + 3L * x + 5L * y) % 256L).toInt + 256) % 256

  // -----------------------------------------------------------------
  // Encode (fixture synthesis): GIF87a with a real LZW stream.
  // -----------------------------------------------------------------

  private final class BitPacker {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      cur |= code << nbits
      nbits += width
      while (nbits >= 8) {
        out.write(cur & 0xff)
        cur >>>= 8
        nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) out.write(cur & 0xff)
      out.toByteArray
    }
  }

  /** GIF LZW compress of an index stream, min code size 8 (256-color):
    * CLEAR=256, EOI=257, codes grow 9→12 bits, dictionary reset at
    * 4096. The dictionary is a map from (prefixCode << 8 | nextByte).
    */
  private[graft] def lzwEncode(indices: Array[Byte]): Array[Byte] = {
    val Clear = 256
    val Eoi = 257
    val packer = new BitPacker
    var dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = 258
    var width = 9
    packer.put(Clear, width)
    var prefix = -1
    var i = 0
    while (i < indices.length) {
      val b = indices(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val key = (prefix << 8) | b
        val hit = dict.get(key)
        if (hit != null) prefix = hit.intValue()
        else {
          packer.put(prefix, width)
          dict.put(key, nextCode)
          nextCode += 1
          // GIF width bump: when nextCode exceeds the current width's
          // range the NEXT emitted code uses width+1 (up to 12).
          if (nextCode - 1 == (1 << width) && width < 12) width += 1
          else if (nextCode == 4096) {
            packer.put(Clear, width)
            dict = new java.util.HashMap[Integer, Integer]()
            nextCode = 258
            width = 9
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) packer.put(prefix, width)
    packer.put(Eoi, width)
    packer.finish()
  }

  /** A complete GIF87a byte stream of the deterministic raster. */
  private[graft] def encodeGif(id: Long, w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(w * h / 2 + 1024)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    le16(w); le16(h)
    out.write(0xf7) // global color table, 8 bits/pixel, 256 entries
    out.write(0) // background color index
    out.write(0) // no aspect ratio
    var i = 0
    while (i < 256) { out.write(palR(i)); out.write(palG(i)); out.write(palB(i)); i += 1 }
    out.write(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    out.write(0) // no local color table, not interlaced
    out.write(8) // LZW min code size
    val indices = new Array[Byte](w * h)
    var y = 0
    var o = 0
    while (y < h) {
      var x = 0
      while (x < w) { indices(o) = pixIdx(id, x, y).toByte; o += 1; x += 1 }
      y += 1
    }
    val lzw = lzwEncode(indices)
    lzw.grouped(255).foreach { blk =>
      out.write(blk.length)
      out.write(blk)
    }
    out.write(0) // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  // -----------------------------------------------------------------
  // Decode: chunk walk + LZW decompress + palette-mapped sums.
  // -----------------------------------------------------------------

  final case class GifStats(
      media_id: Long,
      w: Long,
      h: Long,
      n_pixels: Long,
      mean_r_c: Long,
      mean_g_c: Long,
      mean_b_c: Long
  )

  /** Decode one GIF87a payload. Returns None on anything malformed
    * (bad signature, missing tables, truncated sub-blocks, bad codes,
    * wrong pixel count). Transient memory is the 4096-entry dictionary
    * of (prefixCode, firstByte) pairs — pixel bytes stream into the
    * channel sums through the palette and are never stored.
    */
  private[graft] def decodeGif(mediaId: Long, p: Array[Byte]): Option[GifStats] = {
    if (p.length < 13 + 768 + 10 || !new String(p, 0, 6, "US-ASCII").startsWith("GIF8")) return None
    def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    val flags = p(10) & 0xff
    if ((flags & 0x80) == 0 || (flags & 0x07) != 7) return None // need a 256-entry GCT
    val pal = 13
    var pos = pal + 768
    // skip extensions until the image descriptor
    while (pos < p.length && (p(pos) & 0xff) == 0x21) {
      pos += 2
      while (pos < p.length && (p(pos) & 0xff) != 0) pos += (p(pos) & 0xff) + 1
      pos += 1
    }
    if (pos + 10 >= p.length || (p(pos) & 0xff) != 0x2c) return None
    val w = u16(pos + 5); val h = u16(pos + 7)
    val ifl = p(pos + 9) & 0xff
    // No local color table. INTERLACE is fine: it only permutes
    // scanline order, and per-channel sums are order-independent — so
    // ImageIO's interlaced output decodes to identical statistics.
    if (w <= 0 || h <= 0 || (ifl & 0x80) != 0) return None
    pos += 10
    val minCode = p(pos) & 0xff
    if (minCode != 8) return None
    pos += 1
    val Clear = 256; val Eoi = 257
    // dictionary: prefix code and first/last byte per code
    val prefixOf = new Array[Int](4096)
    val byteOf = new Array[Int](4096)
    val firstOf = new Array[Int](4096)
    var nextCode = 258
    var width = 9
    var sr = 0L; var sg = 0L; var sb = 0L
    var emitted = 0L
    val expected = w.toLong * h
    // emit one palette index into the channel sums
    def emit(idx: Int): Unit = { sr += palR(idx); sg += palG(idx); sb += palB(idx); emitted += 1 }
    // expand a code by walking the prefix chain (depth ≤ 4096)
    val stack = new Array[Int](4096)
    def expand(code: Int): Boolean = {
      var c = code
      var sp = 0
      while (c >= 258) {
        if (sp >= stack.length || prefixOf(c) == c) return false
        stack(sp) = byteOf(c); sp += 1
        c = prefixOf(c)
      }
      emit(c)
      while (sp > 0) { sp -= 1; emit(stack(sp)) }
      true
    }
    def firstByte(code: Int): Int = if (code < 256) code else firstOf(code)
    var bitBuf = 0L
    var bitCnt = 0
    var blockLeft = 0
    var prev = -1
    var done = false
    while (!done) {
      // refill bits, crossing sub-block boundaries as needed
      while (bitCnt < width) {
        if (blockLeft == 0) {
          if (pos >= p.length) return None
          blockLeft = p(pos) & 0xff
          pos += 1
          if (blockLeft == 0) return None // ran out before EOI
        }
        if (pos >= p.length) return None
        bitBuf |= (p(pos) & 0xffL) << bitCnt
        bitCnt += 8
        pos += 1
        blockLeft -= 1
      }
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width
      bitCnt -= width
      if (code == Eoi) done = true
      else if (code == Clear) {
        nextCode = 258; width = 9; prev = -1
      } else if (prev < 0) {
        if (code >= 256) return None
        emit(code)
        prev = code
      } else {
        if (code > nextCode || (code == nextCode && nextCode >= 4096)) return None
        // the new entry is prev-string + firstByte(cur-string); in the
        // KwKwK case (code == nextCode) cur-string = prev + first(prev),
        // so its first byte is firstByte(prev) — never read the slot
        // being defined.
        val curFirst = if (code == nextCode) firstByte(prev) else firstByte(code)
        if (code == nextCode) {
          if (!expand(prev)) return None
          emit(curFirst)
        } else if (!expand(code)) return None
        if (nextCode < 4096) {
          prefixOf(nextCode) = prev
          byteOf(nextCode) = curFirst
          firstOf(nextCode) = firstByte(prev)
          nextCode += 1
          if (nextCode == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
      if (emitted > expected) return None
    }
    if (emitted != expected) return None
    Some(
      GifStats(mediaId, w.toLong, h.toLong, expected, sr * 100 / expected, sg * 100 / expected, sb * 100 / expected)
    )
  }

  def gifPixelStats(media: Dataset[DeflateMedia.MediaRow]): Dataset[GifStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m => decodeGif(m.media_id, m.payload)))
  }

  def gifTable(s: SparkSession, d: String): Dataset[DeflateMedia.MediaRow] = {
    import s.implicits._
    Tables
      .documents(s, d)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        DeflateMedia.MediaRow(id, encodeGif(id, (id % 9 + 2).toInt, (id % 7 + 2).toInt))
      })
  }

  private val gifPixelsQ = Q(
    "multimodal_gif_pixels",
    (s, d) => gifPixelStats(gifTable(s, d)).toDF(),
    Some {
      def chanSum(f: String) =
        s"list_sum(flatten(list_transform(range(0, h), y -> " +
          s"list_transform(range(0, w), x -> ($f)))))"
      val idx = "((media_id + 3 * x + 5 * y) % 256)"
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, doc_id % 9 + 2 AS w, doc_id % 7 + 2 AS h
         |  FROM documents),
         |px AS (
         |  SELECT media_id, w, h,
         |    ${chanSum(s"(7 * $idx + 13) % 256")} AS sr,
         |    ${chanSum(s"(5 * $idx + 3) % 256")} AS sg,
         |    ${chanSum(s"(11 * $idx + 1) % 256")} AS sb
         |  FROM m)
         |SELECT media_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
         |  CAST(w * h AS BIGINT) AS n_pixels,
         |  CAST((sr * 100) // (w * h) AS BIGINT) AS mean_r_c,
         |  CAST((sg * 100) // (w * h) AS BIGINT) AS mean_g_c,
         |  CAST((sb * 100) // (w * h) AS BIGINT) AS mean_b_c
         |FROM px""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(gifPixelsQ)
}
