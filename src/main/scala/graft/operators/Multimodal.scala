package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * The Spark-side shape is the real deliverable at 100 TB: payload bytes
  * stay in one parquet binary column (never exploded, never stringified),
  * metadata is a columnar struct Catalyst can prune independently of the
  * payload, and decode/feature-extraction runs per-partition so codec
  * state is reused across rows.
  *
  * IMAGE and AUDIO decode are REAL for the header slice:
  * `multimodal_decode` synthesizes valid PNG and JPEG byte streams and
  * parses width/height/bit-depth/channels back out of the raw bytes with
  * [[graft.plans.ImageMetaExpr]] (PNG IHDR + JPEG SOF marker walk, plus
  * GIF screen descriptors and BMP info headers), and `multimodal_av_meta`
  * walks RIFF/WAVE chunks with [[graft.plans.AudioMetaExpr]] (fmt +
  * data chunk → channels/rate/bits/duration) — all public container
  * formats, no codec library needed, corrupt payloads quarantined per
  * row.
  *
  * PIXEL/SAMPLE-level decode is REAL for the uncompressed containers
  * (round 9): [[bmpPixelStats]] walks 24-bpp BMP pixel rows and
  * [[wavSampleStats]] decodes signed PCM16 samples, both in pure byte
  * arithmetic over the binary column — certified against an ANALYTIC
  * oracle and (for BMP) against JDK ImageIO in RoundNineOpsSpec.
  * Entropy-coded decode is now ALSO real, hand-written in the codec
  * tier: PNG DEFLATE ([[DeflateMedia]]), GIF LZW ([[GifCodec]]),
  * baseline JPEG Huffman+IDCT ([[JpegCodec]]), G.711 µ-law
  * ([[mulawSampleStats]]), IMA ADPCM ([[AdpcmCodec]]) and the
  * gzip/zstd/lz4/snappy text containers ([[CompressedIngest]]), and —
  * since r12 — intra-frame VIDEO: Motion-JPEG in an AVI RIFF container
  * ([[Mjpeg]]), each frame through the certified JPEG path. Only
  * INTER-frame video codecs (H.264 etc.) remain out of scope: they
  * genuinely need a codec library the container doesn't ship; a
  * production deployment drops one into [[decodeBatched]]'s codec slot
  * with the same output schema.
  */
object Multimodal {

  /** Synthesized media table: document text bytes as the opaque payload. */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        col("text").cast("binary").as("payload"),
        element_at(
          array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (col("doc_id") % 3 + 1).cast("int")
        ).as("media_type"),
        struct(
          (col("doc_id") % 640 + 64).cast("int").as("width"),
          (col("doc_id") % 480 + 48).cast("int").as("height"),
          lit(3).cast("int").as("channels")
        ).as("meta")
      )

  final case class MediaIn(media_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaOut(media_id: Long, n_bytes: Int, content_sig: String, frame_count: Int)

  /** A deterministic fake codec body, batch-shaped (bytes, digest, and a
    * synthetic frame count) — the signature an EXTERNAL decode library
    * call drops into via [[decodeBatched]]. The in-repo codecs that need
    * no library are real ([[JpegCodec]], [[Mjpeg]], [[GifCodec]], ...);
    * this fake exists only so the batch plumbing itself is testable.
    */
  def fakeCodec(batch: Seq[MediaIn]): Seq[MediaOut] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    batch.map { m =>
      md.reset()
      val sig = md.digest(m.payload).map("%02x".format(_)).mkString
      val frames =
        if (m.media_type == "video/mp4") m.payload.length % 24 + 1 else 1
      MediaOut(m.media_id, m.payload.length, sig, frames)
    }
  }

  /** REAL per-partition batched decode plumbing (the `mapInPandas`
    * batch shape, JVM-side): the partition iterator is grouped into
    * codec batches of `batchSize`, the codec runs ONCE per batch
    * (decode libraries amortize model/context setup across a batch —
    * per-row invocation is the classic mistake), and results stream
    * out lazily so a partition never materializes in memory. Only the
    * codec body is a deterministic fake (no media libraries in this
    * container); schema, batching, laziness, and partitioning are the
    * production path and MultimodalSpec pins them (stub equivalence +
    * an invocation-count accumulator).
    */
  def decodeBatched(
      ds: org.apache.spark.sql.Dataset[MediaIn],
      batchSize: Int = 64,
      codec: Seq[MediaIn] => Seq[MediaOut] = fakeCodec
  ): org.apache.spark.sql.Dataset[MediaOut] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => codec(b))
    }
  }

  /** Big-endian byte strings from an int column (PNG/JPEG dims). */
  private def be32(c: Column): Column = unhex(lpad(hex(c.cast("int")), 8, "0"))
  private def be16(c: Column): Column = unhex(lpad(hex(c.cast("int")), 4, "0"))

  /** Little-endian byte strings (RIFF/GIF/BMP headers): byte-swap the
    * big-endian hex. Non-negative values only.
    */
  private def le16(c: Column): Column = {
    val h = lpad(hex(c.cast("int")), 4, "0")
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }
  private def le32(c: Column): Column = {
    val h = lpad(hex(c.cast("int")), 8, "0")
    unhex(
      concat(substring(h, 7, 2), substring(h, 5, 2), substring(h, 3, 2), substring(h, 1, 2))
    )
  }

  /** A valid WAV header probe: RIFF/WAVE + fmt (PCM) + an interposed
    * LIST chunk (forces the chunk walk) + the data chunk HEADER — no
    * payload bytes, the streaming-probe reality AudioMetaExpr documents.
    */
  def wavBytes(channels: Column, sampleRate: Column, bits: Column, dataSize: Column): Column = {
    val blockAlign = channels * bits / lit(8)
    val byteRate = sampleRate * blockAlign
    concat(
      lit("RIFF").cast("binary"), le32(lit(36) + dataSize), lit("WAVE").cast("binary"),
      lit("fmt ").cast("binary"), le32(lit(16)),
      le16(lit(1)), le16(channels), le32(sampleRate), le32(byteRate),
      le16(blockAlign), le16(bits),
      lit("LIST").cast("binary"), le32(lit(4)), lit("INFO").cast("binary"),
      lit("data").cast("binary"), le32(dataSize)
    )
  }

  /** GIF89a logical screen descriptor with the given dims and color
    * resolution (bits per primary, 1-8).
    */
  def gifBytes(width: Column, height: Column, colorRes: Column): Column =
    concat(
      lit("GIF89a").cast("binary"),
      le16(width), le16(height),
      // packed: GCT flag set, color resolution − 1 in bits 4-6, GCT size 2
      unhex(lpad(hex(lit(0x80) + ((colorRes - 1) * 16) + lit(2)), 2, "0")),
      unhex(lit("0000")) // background index + aspect ratio
    )

  /** BMP file header + BITMAPINFOHEADER prefix (through bits-per-pixel). */
  def bmpBytes(width: Column, height: Column, bpp: Column): Column =
    concat(
      lit("BM").cast("binary"),
      le32(lit(54)), le32(lit(0)), le32(lit(54)), // file size, reserved, data offset
      le32(lit(40)), le32(width), le32(height), // DIB size, dims
      le16(lit(1)), le16(bpp) // planes, bits per pixel
    )

  /** A minimal-but-valid PNG byte stream: signature + IHDR with the given
    * dims/color type + IEND. (CRCs are arbitrary — ImageMetaExpr parses
    * headers, it does not verify integrity; documented there.)
    */
  def pngBytes(width: Column, height: Column, colorTypeHex: Column): Column =
    concat(
      unhex(lit("89504E470D0A1A0A")), // signature
      unhex(lit("0000000D")), lit("IHDR").cast("binary"),
      be32(width), be32(height),
      unhex(lit("08")), // bit depth 8
      unhex(colorTypeHex),
      unhex(lit("000000")), // compression/filter/interlace
      unhex(lit("DEADBEEF")), // IHDR CRC (unvalidated)
      unhex(lit("0000000049454E44AE426082")) // IEND
    )

  /** A minimal-but-valid JFIF JPEG: SOI + APP0 + SOF0 (precision 8,
    * 3 components) + EOI. The APP0 segment forces the parser to walk
    * lengths rather than assume SOF position.
    */
  def jpegBytes(width: Column, height: Column): Column =
    concat(
      unhex(lit("FFD8")), // SOI
      unhex(lit("FFE000104A46494600010100000100010000")), // APP0, len 16
      unhex(lit("FFC0001108")), // SOF0, len 17, precision 8
      be16(height), be16(width),
      unhex(lit("03011100021101031101")), // 3 components
      unhex(lit("FFD9")) // EOI
    )

  // ---------------------------------------------------------------------
  // REAL pixel/sample decode for the uncompressed containers (round 9)
  // ---------------------------------------------------------------------

  /** Lowercase two-hex-digit byte of a (non-negative) long column. */
  private[operators] def h2(c: Column): Column =
    lower(lpad(hex(pmod(c, lit(256L)).cast("int")), 2, "0"))

  private[operators] def le16h(c: Column): Column =
    concat(h2(c), h2(expr2(c, 256L)))

  private[operators] def le32h(c: Column): Column =
    concat(h2(c), h2(expr2(c, 256L)), h2(expr2(c, 65536L)), h2(expr2(c, 16777216L)))

  /** c div k without the Column API's double division. */
  private[operators] def expr2(c: Column, k: Long): Column = ((c - pmod(c, lit(k))) / k).cast("long")

  /** A COMPLETE 24-bpp uncompressed BMP as a hex string: 54-byte
    * header + bottom-up padded pixel rows. Channel bytes follow the
    * deterministic formula the oracle recomputes analytically:
    * B=(id+3x+7y)%256, G=(2id+5x+y)%256, R=(3id+x+11y)%256.
    */
  private[graft] def bmpFullHex(
      id: Column,
      w: Column,
      h: Column,
      delta: Column = lit(0L)
  ): Column =
    bmpFullHexWith(
      w,
      h,
      (x, y) =>
        Seq(
          id + lit(3L) * x + lit(7L) * y + delta,
          lit(2L) * id + lit(5L) * x + y + delta,
          lit(3L) * id + x + lit(11L) * y + delta
        )
    )

  /** The same complete-BMP builder with a caller-supplied channel law
    * `chan(x, y) = Seq(B, G, R)` (pre-mod values; image coordinates) —
    * [[ImageFeatures]] uses an id-dependent-slope law so perceptual
    * hashes discriminate between images.
    */
  private[graft] def bmpFullHexWith(
      w: Column,
      h: Column,
      chan: (Column, Column) => Seq[Column]
  ): Column = {
    // ((3w+3) div 4)·4 without a named column: subtract the mod.
    val t = w * 3 + 3
    val rowSize = t - pmod(t, lit(4L))
    val imgSize = rowSize * h
    val header = concat(
      lit("424d"), le32h(lit(54L) + imgSize), lit("00000000"), le32h(lit(54L)),
      le32h(lit(40L)), le32h(w), le32h(h), le16h(lit(1L)), le16h(lit(24L)),
      le32h(lit(0L)), le32h(imgSize),
      le32h(lit(2835L)), le32h(lit(2835L)), le32h(lit(0L)), le32h(lit(0L))
    )
    val pixels = array_join(
      transform(
        sequence(lit(0L), h - 1),
        j => {
          val y = h - 1 - j
          concat(
            array_join(
              transform(
                sequence(lit(0L), w - 1),
                x => concat(chan(x, y).map(h2): _*)
              ),
              ""
            ),
            // row padding: "00" × ((4 − 3w mod 4) mod 4)
            lit("000000").substr(lit(1), pmod(lit(4L) - pmod(w * 3, lit(4L)), lit(4L)).cast("int") * 2)
          )
        }
      ),
      ""
    )
    concat(header, pixels)
  }

  /** A COMPLETE canonical-44 PCM WAV (mono, 16-bit, 8 kHz) as a hex
    * string; the stored unsigned word is u_k = (id·31 + k·17) % 65536,
    * i.e. the signed sample is u_k two's-complement-reinterpreted
    * (u − 65536 when u ≥ 32768).
    */
  private[graft] def wavFullHex(id: Column, n: Column): Column = {
    val header = concat(
      lit("52494646"), le32h(lit(36L) + n * 2), lit("57415645"),
      lit("666d7420"), le32h(lit(16L)),
      le16h(lit(1L)), le16h(lit(1L)), le32h(lit(8000L)), le32h(lit(16000L)),
      le16h(lit(2L)), le16h(lit(16L)),
      lit("64617461"), le32h(n * 2)
    )
    val samples = array_join(
      transform(
        sequence(lit(0L), n - 1),
        k => {
          // unsigned 16-bit two's complement of the signed sample
          val u = pmod(id * 31 + k * 17, lit(65536L))
          concat(h2(u), h2(expr2(u, 256L)))
        }
      ),
      ""
    )
    concat(header, samples)
  }

  /** One payload byte at 0-based offset `p` as a bigint — a ONE-byte
    * binary substring + hex + conv, so reading never copies more than a
    * single byte of the payload per evaluation (the r9 version hex'd
    * the WHOLE payload into a 2× string column first).
    */
  private[operators] def byteAtSql(p: String): String =
    s"cast(conv(hex(substring(payload, cast(($p) as int) + 1, 1)), 16, 10) as bigint)"

  /** REAL pixel decode of 24-bpp uncompressed BMP payloads — pure byte
    * arithmetic over the binary column (no media library): parse dims
    * and the pixel-data offset from the headers, walk the bottom-up
    * padded rows, and aggregate per-channel sums. This retires the
    * pixel-level half of the long-standing media-decode stub for the
    * UNCOMPRESSED container (entropy-coded formats still need a codec
    * library and stay stubbed).
    *
    * Memory shape (the r10 hardening): the fold is TWO-LEVEL — an
    * outer fold over the h stored rows and an inner fold over the w
    * pixels of one row, each byte read as a one-byte binary substring
    * — so transient per-row memory is O(w + h) (two sequence arrays),
    * NOT O(w·h): a 12-MP photo folds with ~60 KB of transient state
    * instead of the r9 version's ~300 MB (one long per pixel plus a 2×
    * hex copy of the payload). Map-only; total work stays linear in
    * the payload. The oracle never decodes — it recomputes the channel
    * means ANALYTICALLY from the pixel formula, so a hash match
    * certifies the decoder against independent ground truth (and
    * MultimodalSpec cross-checks against JDK ImageIO). The `media`
    * ScaleProbe mode drives MB-scale payloads and reports the flat
    * per-task memory.
    */
  def bmpPixelStats(media: DataFrame): DataFrame = {
    // Per-channel sum of ONE stored row r (bottom-up order is
    // irrelevant to a sum): bytes off + r·rs + 3x + c, c = B,G,R.
    def rowSum(c: Int): String =
      s"aggregate(sequence(0L, w - 1L), 0L, (a, x) -> a + ${byteAtSql(s"off + r * rs + 3 * x + $c")})"
    media
      .withColumn("hdr", lower(hex(substring(col("payload"), 1, 26))))
      .withColumn("w", expr(hdrLe32Sql(18)))
      .withColumn("h", expr(hdrLe32Sql(22)))
      .withColumn("off", expr(hdrLe32Sql(10)))
      .withColumn("rs", expr("((3 * w + 3) div 4) * 4"))
      .withColumn(
        "sums",
        when(
          col("w") > 0 && col("h") > 0,
          expr(
            s"""aggregate(
               |  sequence(0L, h - 1L),
               |  array(0L, 0L, 0L),
               |  (acc, r) -> array(
               |    acc[0] + ${rowSum(0)},
               |    acc[1] + ${rowSum(1)},
               |    acc[2] + ${rowSum(2)}))""".stripMargin
          )
        ).otherwise(typedLit(Seq(0L, 0L, 0L)))
      )
      .select(
        col("media_id"),
        col("w"),
        col("h"),
        (col("w") * col("h")).as("n_pixels"),
        expr("(sums[2] * 100) div (w * h)").as("mean_r_c"),
        expr("(sums[1] * 100) div (w * h)").as("mean_g_c"),
        expr("(sums[0] * 100) div (w * h)").as("mean_b_c")
      )
  }

  /** LE32 read at 0-based byte offset `p` from the bounded header-hex
    * column `hdr` (the first ≤64 payload bytes — never the full
    * payload).
    */
  private[operators] def hdrLe32Sql(p: Int): String =
    (0 to 3)
      .map(b => s"conv(substring(hdr, ${(p + b) * 2 + 1}, 2), 16, 10) * ${1L << (8 * b)}L")
      .mkString("cast(", " + ", " as long)")

  /** Samples per inner chunk of the WAV fold: bounds the transient
    * sequence array at 32 KB whatever the payload size.
    */
  private val SampleChunk = 4096L

  /** REAL sample decode of canonical-44 PCM16 WAV payloads: parse the
    * sample rate and data size from the headers, decode each signed
    * little-endian sample, aggregate Σ|s| and Σs². Same contract as
    * [[bmpPixelStats]] (analytic oracle; JDK AudioSystem parity in the
    * spec would need javax.sound — byte math is asserted hand-built
    * instead), and the same r10 memory shape: a two-level fold —
    * outer over ⌈n/4096⌉ chunks, inner over one 4096-sample chunk,
    * each byte a one-byte binary substring — caps transient per-row
    * memory at O(chunk) instead of one long per sample plus a 2× hex
    * copy of the payload.
    */
  def wavSampleStats(media: DataFrame): DataFrame = {
    // Signed LE16 sample at index k (lo + 256·hi, two's complement via
    // the hi-byte sign test), each byte read straight off the binary.
    val smp =
      s"(${byteAtSql("44 + 2 * k")} + 256 * ${byteAtSql("45 + 2 * k")} " +
        s"- (CASE WHEN ${byteAtSql("45 + 2 * k")} >= 128 THEN 65536 ELSE 0 END))"
    def chunkSum(term: String): String =
      s"aggregate(sequence(c * ${SampleChunk}L, least(c * ${SampleChunk}L + ${SampleChunk}L, n) - 1L), " +
        s"0L, (a, k) -> a + $term)"
    media
      .withColumn("hdr", lower(hex(substring(col("payload"), 1, 44))))
      .withColumn("rate", expr(hdrLe32Sql(24)))
      .withColumn("n", expr(s"${hdrLe32Sql(40)} div 2"))
      .withColumn(
        "sums",
        when(
          col("n") > 0,
          expr(
            s"""aggregate(
               |  sequence(0L, (n + ${SampleChunk - 1}L) div ${SampleChunk}L - 1L),
               |  array(0L, 0L),
               |  (acc, c) -> array(
               |    acc[0] + ${chunkSum(s"abs($smp)")},
               |    acc[1] + ${chunkSum(s"$smp * $smp")}))""".stripMargin
          )
        ).otherwise(typedLit(Seq(0L, 0L)))
      )
      .select(
        col("media_id"),
        col("rate").as("sample_rate"),
        col("n").as("n_samples"),
        expr("(sums[0] * 100) div n").as("mean_abs_c"),
        col("sums").getItem(1).as("sum_sq")
      )
  }

  /** The full-payload fixtures for the pixel/sample decoders. */
  def bmpTable(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        unhex(
          bmpFullHex(col("doc_id"), col("doc_id") % 8 + 2, col("doc_id") % 6 + 2)
        ).as("payload")
      )

  def wavTable(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        unhex(wavFullHex(col("doc_id"), col("doc_id") % 50 + 10)).as("payload")
      )

  private val bmpPixelsQ = Q(
    "multimodal_bmp_pixels",
    (s, d) => bmpPixelStats(bmpTable(s, d)),
    Some {
      def chanSum(f: String) =
        s"list_sum(flatten(list_transform(range(0, h), y -> " +
          s"list_transform(range(0, w), x -> ($f) % 256))))"
      s"""WITH m AS (
         |  SELECT doc_id AS media_id, doc_id % 8 + 2 AS w, doc_id % 6 + 2 AS h
         |  FROM documents),
         |px AS (
         |  SELECT media_id, w, h,
         |    ${chanSum("3 * media_id + x + 11 * y")} AS sr,
         |    ${chanSum("2 * media_id + 5 * x + y")} AS sg,
         |    ${chanSum("media_id + 3 * x + 7 * y")} AS sb
         |  FROM m)
         |SELECT media_id, CAST(w AS BIGINT) AS w, CAST(h AS BIGINT) AS h,
         |  CAST(w * h AS BIGINT) AS n_pixels,
         |  CAST((sr * 100) // (w * h) AS BIGINT) AS mean_r_c,
         |  CAST((sg * 100) // (w * h) AS BIGINT) AS mean_g_c,
         |  CAST((sb * 100) // (w * h) AS BIGINT) AS mean_b_c
         |FROM px""".stripMargin
    }
  )

  private val wavSamplesQ = Q(
    "multimodal_wav_samples",
    (s, d) => wavSampleStats(wavTable(s, d)),
    Some {
      val u = "((media_id * 31 + k * 17) % 65536)"
      val smp = s"(CASE WHEN $u >= 32768 THEN $u - 65536 ELSE $u END)"
      s"""WITH m AS (SELECT doc_id AS media_id, doc_id % 50 + 10 AS n FROM documents),
         |s AS (
         |  SELECT media_id, n,
         |    list_sum(list_transform(range(0, n), k -> abs($smp))) AS sa,
         |    list_sum(list_transform(range(0, n), k -> $smp * $smp)) AS sq
         |  FROM m)
         |SELECT media_id, CAST(8000 AS BIGINT) AS sample_rate, CAST(n AS BIGINT) AS n_samples,
         |  CAST((sa * 100) // n AS BIGINT) AS mean_abs_c,
         |  CAST(sq AS BIGINT) AS sum_sq
         |FROM s""".stripMargin
    }
  )

  /** A canonical-44 G.711 µ-law WAV (format code 7, mono, 8-bit, 8 kHz)
    * whose code bytes follow u_k = (id·13 + k·7) % 256.
    */
  private[graft] def mulawFullHex(id: Column, n: Column): Column = {
    val header = concat(
      lit("52494646"), le32h(lit(36L) + n), lit("57415645"),
      lit("666d7420"), le32h(lit(16L)),
      le16h(lit(7L)), le16h(lit(1L)), le32h(lit(8000L)), le32h(lit(8000L)),
      le16h(lit(1L)), le16h(lit(8L)),
      lit("64617461"), le32h(n)
    )
    val codes = array_join(
      transform(sequence(lit(0L), n - 1), k => h2(id * 13 + k * 7)),
      ""
    )
    concat(header, codes)
  }

  /** The G.711 µ-law expansion of one code byte `c` as pure integer
    * SQL (ITU-T G.711 Table 2a/2b): u = ~c; t = (((u&15)<<3)+0x84) <<
    * ((u>>4)&7); sample = ±(t − 0x84). Shifts spelled as multiplies by
    * a power-of-two CASE so the expression is engine-portable.
    */
  private[operators] def mulawExpandSql(c: String): String = {
    val u = s"(255 - ($c))" // ~c & 0xff for a byte
    val exp = s"(($u div 16) % 8)"
    val t = s"((((($u % 16) * 8) + 132)) * (CASE $exp WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32 WHEN 6 THEN 64 ELSE 128 END))"
    s"(CASE WHEN $u >= 128 THEN (132 - $t) ELSE ($t - 132) END)"
  }

  /** JVM mirror of [[mulawExpandSql]] for the javax.sound parity spec. */
  private[graft] def mulawExpand(c: Int): Int = {
    val u = (~c) & 0xff
    val t = (((u & 0x0f) << 3) + 0x84) << ((u >> 4) & 7)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** REAL G.711 µ-law sample decode — the first NON-LINEAR audio codec
    * in the registry (PCM16 is a byte reinterpretation; µ-law is a
    * companding law): parse the fmt chunk, REQUIRE format code 7 /
    * 8-bit, expand every code byte through the G.711 law in pure
    * integer arithmetic, aggregate Σ|s| and Σs². Same two-level
    * chunked fold and one-byte-substring reads as [[wavSampleStats]]
    * (O(chunk) transient memory); the oracle replays the expansion
    * law from the closed-form code bytes, and MultimodalMulawSpec
    * certifies the law against JDK javax.sound's own ULAW→PCM
    * converter — an independent implementation of G.711.
    */
  def mulawSampleStats(media: DataFrame): DataFrame = {
    val smp = mulawExpandSql(byteAtSql("44 + k"))
    def chunkSum(term: String): String =
      s"aggregate(sequence(c * ${SampleChunk}L, least(c * ${SampleChunk}L + ${SampleChunk}L, n) - 1L), " +
        s"0L, (a, k) -> a + $term)"
    media
      .withColumn("hdr", lower(hex(substring(col("payload"), 1, 44))))
      .withColumn("fmt", expr(hdrLe16Sql(20)))
      .withColumn("bits", expr(hdrLe16Sql(34)))
      .withColumn("rate", expr(hdrLe32Sql(24)))
      .withColumn("n", expr(hdrLe32Sql(40)))
      .filter(col("fmt") === 7 && col("bits") === 8)
      .withColumn(
        "sums",
        when(
          col("n") > 0,
          expr(
            s"""aggregate(
               |  sequence(0L, (n + ${SampleChunk - 1}L) div ${SampleChunk}L - 1L),
               |  array(0L, 0L),
               |  (acc, c) -> array(
               |    acc[0] + ${chunkSum(s"abs($smp)")},
               |    acc[1] + ${chunkSum(s"$smp * $smp")}))""".stripMargin
          )
        ).otherwise(typedLit(Seq(0L, 0L)))
      )
      .select(
        col("media_id"),
        col("rate").as("sample_rate"),
        col("n").as("n_samples"),
        expr("(sums[0] * 100) div n").as("mean_abs_c"),
        col("sums").getItem(1).as("sum_sq")
      )
  }

  /** LE16 read at 0-based byte offset `p` from the bounded header hex. */
  private[operators] def hdrLe16Sql(p: Int): String =
    (0 to 1)
      .map(b => s"conv(substring(hdr, ${(p + b) * 2 + 1}, 2), 16, 10) * ${1L << (8 * b)}L")
      .mkString("cast(", " + ", " as long)")

  def mulawTable(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        unhex(mulawFullHex(col("doc_id"), col("doc_id") % 60 + 8)).as("payload")
      )

  private val mulawSamplesQ = Q(
    "multimodal_mulaw_samples",
    (s, d) => mulawSampleStats(mulawTable(s, d)),
    Some {
      val c = "((media_id * 13 + k * 7) % 256)"
      val u = s"(255 - $c)"
      val ex = s"(($u // 16) % 8)"
      val t = s"(((($u % 16) * 8) + 132) * (CASE $ex WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 WHEN 3 THEN 8 WHEN 4 THEN 16 WHEN 5 THEN 32 WHEN 6 THEN 64 ELSE 128 END))"
      val smp = s"(CASE WHEN $u >= 128 THEN (132 - $t) ELSE ($t - 132) END)"
      s"""WITH m AS (SELECT doc_id AS media_id, doc_id % 60 + 8 AS n FROM documents),
         |s AS (
         |  SELECT media_id, n,
         |    list_sum(list_transform(range(0, n), k -> abs($smp))) AS sa,
         |    list_sum(list_transform(range(0, n), k -> $smp * $smp)) AS sq
         |  FROM m)
         |SELECT media_id, CAST(8000 AS BIGINT) AS sample_rate, CAST(n AS BIGINT) AS n_samples,
         |  CAST((sa * 100) // n AS BIGINT) AS mean_abs_c,
         |  CAST(sq AS BIGINT) AS sum_sq
         |FROM s""".stripMargin
    }
  )

  /** A canonical-44 G.711 A-law WAV (format code 6, mono, 8-bit, 8 kHz)
    * whose code bytes follow a_k = (id·11 + k·5) % 256.
    */
  private[graft] def alawFullHex(id: Column, n: Column): Column = {
    val header = concat(
      lit("52494646"), le32h(lit(36L) + n), lit("57415645"),
      lit("666d7420"), le32h(lit(16L)),
      le16h(lit(6L)), le16h(lit(1L)), le32h(lit(8000L)), le32h(lit(8000L)),
      le16h(lit(1L)), le16h(lit(8L)),
      lit("64617461"), le32h(n)
    )
    val codes = array_join(
      transform(sequence(lit(0L), n - 1), k => h2(id * 11 + k * 5)),
      ""
    )
    concat(header, codes)
  }

  /** The G.711 A-law expansion of one code byte `c` as pure integer
    * SQL (ITU-T G.711 Table 1a/1b, the classic g711.c law): u = c⊕0x55;
    * t = (u&15)<<4; seg 0 → t+8, seg 1 → t+0x108, seg≥2 →
    * (t+0x108)<<(seg−1); the SIGN bit SET means positive (inverted vs
    * µ-law). Shifts spelled as multiplies so the expression ports.
    */
  private def alawExpandSql(c: String): String = {
    val u = s"(($c) ^ 85)"
    val seg = s"(($u div 16) % 8)"
    val t = s"(($u % 16) * 16)"
    val mag = s"(CASE WHEN $seg = 0 THEN $t + 8 ELSE ($t + 264) * " +
      s"(CASE $seg WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 4 WHEN 4 THEN 8 WHEN 5 THEN 16 WHEN 6 THEN 32 ELSE 64 END) END)"
    s"(CASE WHEN $u >= 128 THEN $mag ELSE -$mag END)"
  }

  /** JVM mirror of [[alawExpandSql]] for the javax.sound parity spec. */
  private[graft] def alawExpand(c: Int): Int = {
    val u = (c ^ 0x55) & 0xff
    val seg = (u >> 4) & 7
    val t = (u & 0x0f) << 4
    val mag = if (seg == 0) t + 8 else (t + 0x108) << (seg - 1)
    if ((u & 0x80) != 0) mag else -mag
  }

  /** REAL G.711 A-law sample decode — the companding COMPLEMENT of
    * µ-law (Europe's half of G.711; a pipeline ingesting telephony
    * audio meets both): parse the fmt chunk, REQUIRE format code 6 /
    * 8-bit, expand every code byte through the A-law law in pure
    * integer arithmetic, aggregate Σ|s| and Σs². Same two-level
    * chunked fold as [[mulawSampleStats]] (O(chunk) transient memory);
    * the oracle replays the law from the closed-form code bytes, and
    * the spec certifies against JDK javax.sound's own ALAW→PCM
    * converter on all 256 codes.
    */
  def alawSampleStats(media: DataFrame): DataFrame = {
    val smp = alawExpandSql(byteAtSql("44 + k"))
    def chunkSum(term: String): String =
      s"aggregate(sequence(c * ${SampleChunk}L, least(c * ${SampleChunk}L + ${SampleChunk}L, n) - 1L), " +
        s"0L, (a, k) -> a + $term)"
    media
      .withColumn("hdr", lower(hex(substring(col("payload"), 1, 44))))
      .withColumn("fmt", expr(hdrLe16Sql(20)))
      .withColumn("bits", expr(hdrLe16Sql(34)))
      .withColumn("rate", expr(hdrLe32Sql(24)))
      .withColumn("n", expr(hdrLe32Sql(40)))
      .filter(col("fmt") === 6 && col("bits") === 8)
      .withColumn(
        "sums",
        when(
          col("n") > 0,
          expr(
            s"""aggregate(
               |  sequence(0L, (n + ${SampleChunk - 1}L) div ${SampleChunk}L - 1L),
               |  array(0L, 0L),
               |  (acc, c) -> array(
               |    acc[0] + ${chunkSum(s"abs($smp)")},
               |    acc[1] + ${chunkSum(s"$smp * $smp")}))""".stripMargin
          )
        ).otherwise(typedLit(Seq(0L, 0L)))
      )
      .select(
        col("media_id"),
        col("rate").as("sample_rate"),
        col("n").as("n_samples"),
        expr("(sums[0] * 100) div n").as("mean_abs_c"),
        col("sums").getItem(1).as("sum_sq")
      )
  }

  def alawTable(s: SparkSession, d: String): DataFrame =
    Tables
      .documents(s, d)
      .select(
        col("doc_id").as("media_id"),
        unhex(alawFullHex(col("doc_id"), col("doc_id") % 60 + 8)).as("payload")
      )

  private val alawSamplesQ = Q(
    "multimodal_alaw_samples",
    (s, d) => alawSampleStats(alawTable(s, d)),
    Some {
      val c = "((media_id * 11 + k * 5) % 256)"
      val u = s"(xor($c, 85))"
      val seg = s"(($u // 16) % 8)"
      val t = s"(($u % 16) * 16)"
      val mag = s"(CASE WHEN $seg = 0 THEN $t + 8 ELSE ($t + 264) * " +
        s"(CASE $seg WHEN 1 THEN 1 WHEN 2 THEN 2 WHEN 3 THEN 4 WHEN 4 THEN 8 WHEN 5 THEN 16 WHEN 6 THEN 32 ELSE 64 END) END)"
      val smp = s"(CASE WHEN $u >= 128 THEN $mag ELSE -$mag END)"
      s"""WITH m AS (SELECT doc_id AS media_id, doc_id % 60 + 8 AS n FROM documents),
         |s AS (
         |  SELECT media_id, n,
         |    list_sum(list_transform(range(0, n), k -> abs($smp))) AS sa,
         |    list_sum(list_transform(range(0, n), k -> $smp * $smp)) AS sq
         |  FROM m)
         |SELECT media_id, CAST(8000 AS BIGINT) AS sample_rate, CAST(n AS BIGINT) AS n_samples,
         |  CAST((sa * 100) // n AS BIGINT) AS mean_abs_c,
         |  CAST(sq AS BIGINT) AS sum_sq
         |FROM s""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(
    bmpPixelsQ,
    wavSamplesQ,
    mulawSamplesQ,
    alawSamplesQ,
    Q(
      // Real byte-level image header decode: even media_ids carry PNG
      // payloads (color type cycling gray/rgb/rgba), odd ones JFIF JPEG;
      // every 53rd payload is truncated to 10 bytes to exercise the
      // per-row quarantine. The oracle knows the dims in closed form —
      // producing them on the Spark side requires actually parsing the
      // synthesized bytes.
      "multimodal_decode",
      (s, d) => {
        import org.apache.spark.sql.GraftColumn
        import graft.plans.ImageMetaExpr
        val width = (col("media_id") % 640 + 64).cast("int")
        val height = (col("media_id") % 480 + 48).cast("int")
        val colorType =
          element_at(array(lit("00"), lit("02"), lit("06")), (col("media_id") % 3 + 1).cast("int"))
        val payload = when(
          col("media_id") % 2 === 0,
          pngBytes(width, height, colorType)
        ).otherwise(jpegBytes(width, height))
        val media = mediaTable(s, d)
          .select(
            col("media_id"),
            when(col("media_id") % 53 === 0, substring(payload, 1, 10))
              .otherwise(payload)
              .as("payload")
          )
        media
          .select(
            col("media_id"),
            GraftColumn.of(ImageMetaExpr(GraftColumn.exprOf(col("payload")))).as("m")
          )
          .select(
            col("media_id"),
            col("m.format").as("format"),
            col("m.width").as("width"),
            col("m.height").as("height"),
            col("m.bit_depth").as("bit_depth"),
            col("m.channels").as("channels"),
            col("m.ok").as("ok")
          )
      },
      Some(
        """SELECT doc_id AS media_id,
          |  CASE WHEN doc_id % 53 = 0 THEN 'unknown'
          |       WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format,
          |  CASE WHEN doc_id % 53 = 0 THEN NULL ELSE cast(doc_id % 640 + 64 as int) END AS width,
          |  CASE WHEN doc_id % 53 = 0 THEN NULL ELSE cast(doc_id % 480 + 48 as int) END AS height,
          |  CASE WHEN doc_id % 53 = 0 THEN NULL ELSE 8 END AS bit_depth,
          |  CASE WHEN doc_id % 53 = 0 THEN NULL
          |       WHEN doc_id % 2 = 1 THEN 3
          |       ELSE ([1, 3, 4])[cast(doc_id % 3 + 1 as int)] END AS channels,
          |  (doc_id % 53 != 0) AS ok
          |FROM documents""".stripMargin
      )
    ),
    Q(
      // Real WAV/GIF/BMP header decode: media_id % 3 cycles the format,
      // with every 53rd payload truncated to 9 bytes for the quarantine
      // path. The WAV side walks RIFF chunks (fmt interposed with a LIST
      // chunk) and derives duration from the data-chunk size and byte
      // rate; the image side reads the GIF logical screen descriptor /
      // BMP info header. Parameters derive from media_id div 3 so they
      // decorrelate from the format selector. Oracle knows every field
      // in closed form — producing them on the Spark side requires
      // actually parsing the synthesized bytes.
      "multimodal_av_meta",
      (s, d) => {
        import org.apache.spark.sql.GraftColumn
        import graft.plans.{AudioMetaExpr, ImageMetaExpr}
        val id = col("media_id")
        val q = (id / 3).cast("long")
        val kind = id % 3
        val ch = (q % 2 + 1).cast("int")
        val rate = element_at(
          array(lit(8000), lit(16000), lit(22050), lit(44100)),
          (q % 4 + 1).cast("int")
        )
        val bits = element_at(array(lit(8), lit(16), lit(24)), (q % 3 + 1).cast("int"))
        val dataSize = ((q % 1000 + 100) * 4).cast("int")
        val gifW = (q % 320 + 16).cast("int")
        val gifH = (q % 200 + 16).cast("int")
        val colorRes = (q % 8 + 1).cast("int")
        val bmpW = (q % 640 + 32).cast("int")
        val bmpH = (q % 400 + 32).cast("int")
        val bpp = element_at(array(lit(8), lit(24), lit(32)), (q % 3 + 1).cast("int"))
        val payload = when(kind === 0, wavBytes(ch, rate, bits, dataSize))
          .when(kind === 1, gifBytes(gifW, gifH, colorRes))
          .otherwise(bmpBytes(bmpW, bmpH, bpp))
        val media = mediaTable(s, d)
          .select(
            col("media_id"),
            when(id % 53 === 0, substring(payload, 1, 9)).otherwise(payload).as("payload")
          )
        val withMeta = media.select(
          col("media_id"),
          GraftColumn.of(ImageMetaExpr(GraftColumn.exprOf(col("payload")))).as("img"),
          GraftColumn.of(AudioMetaExpr(GraftColumn.exprOf(col("payload")))).as("aud")
        )
        val isWav = col("media_id") % 3 === 0
        withMeta.select(
          col("media_id"),
          when(isWav, col("aud.format")).otherwise(col("img.format")).as("format"),
          col("img.width").as("width"),
          col("img.height").as("height"),
          col("img.bit_depth").as("bit_depth"),
          when(isWav, col("aud.channels")).otherwise(col("img.channels")).as("channels"),
          col("aud.sample_rate").as("sample_rate"),
          col("aud.bits_per_sample").as("bits_per_sample"),
          col("aud.data_bytes").as("data_bytes"),
          col("aud.duration_ms").as("duration_ms"),
          when(isWav, col("aud.ok")).otherwise(col("img.ok")).as("ok")
        )
      },
      Some(
        """WITH t AS (SELECT doc_id AS media_id, doc_id // 3 AS q, doc_id % 3 AS kind,
          |  doc_id % 53 = 0 AS trunc
          |  FROM documents),
          |p AS (SELECT *,
          |  cast(q % 2 + 1 as int) AS ch,
          |  ([8000, 16000, 22050, 44100])[cast(q % 4 + 1 as int)] AS rate,
          |  ([8, 16, 24])[cast(q % 3 + 1 as int)] AS bits,
          |  cast((q % 1000 + 100) * 4 as bigint) AS ds,
          |  ([8, 24, 32])[cast(q % 3 + 1 as int)] AS bpp
          |  FROM t)
          |SELECT media_id,
          |  (CASE WHEN trunc THEN 'unknown'
          |        WHEN kind = 0 THEN 'wav' WHEN kind = 1 THEN 'gif' ELSE 'bmp' END) AS format,
          |  (CASE WHEN trunc THEN NULL
          |        WHEN kind = 1 THEN cast(q % 320 + 16 as int)
          |        WHEN kind = 2 THEN cast(q % 640 + 32 as int) END) AS width,
          |  (CASE WHEN trunc THEN NULL
          |        WHEN kind = 1 THEN cast(q % 200 + 16 as int)
          |        WHEN kind = 2 THEN cast(q % 400 + 32 as int) END) AS height,
          |  (CASE WHEN trunc THEN NULL
          |        WHEN kind = 1 THEN cast(q % 8 + 1 as int)
          |        WHEN kind = 2 THEN cast(bpp as int) END) AS bit_depth,
          |  (CASE WHEN trunc THEN NULL
          |        WHEN kind = 0 THEN ch
          |        WHEN kind = 1 THEN 1
          |        ELSE (CASE bpp WHEN 8 THEN 1 WHEN 24 THEN 3 ELSE 4 END) END) AS channels,
          |  (CASE WHEN trunc OR kind != 0 THEN NULL ELSE rate END) AS sample_rate,
          |  (CASE WHEN trunc OR kind != 0 THEN NULL ELSE bits END) AS bits_per_sample,
          |  (CASE WHEN trunc OR kind != 0 THEN NULL ELSE ds END) AS data_bytes,
          |  (CASE WHEN trunc OR kind != 0 THEN NULL
          |        ELSE ds * 1000 // (rate * ch * bits // 8) END) AS duration_ms,
          |  NOT trunc AS ok
          |FROM p""".stripMargin
      )
    ),
    Q(
      "multimodal_meta",
      // The opaque-binary + typed-metadata plumbing row: payload stays a
      // prunable binary column, metadata a prunable struct, the content
      // signature is computed from the bytes. (Until r12 this carried a
      // FAKE video frame_count via decodeStub; real frame counts now come
      // from the container/codec tier — multimodal_mjpeg_pixels.n_frames
      // and multimodal_mp4_tracks.n_frames — and the stub is gone.)
      (s, d) =>
        mediaTable(s, d)
          .select(
            col("media_id"),
            col("media_type"),
            col("meta.width").as("width"),
            col("meta.height").as("height"),
            length(col("payload")).as("n_bytes"),
            md5(col("payload")).as("content_sig")
          ),
      Some(
        """SELECT doc_id AS media_id,
          |  (['image/png', 'audio/wav', 'video/mp4'])[cast(doc_id % 3 + 1 as int)] AS media_type,
          |  cast(doc_id % 640 + 64 as int) AS width,
          |  cast(doc_id % 480 + 48 as int) AS height,
          |  octet_length(encode(text)) AS n_bytes,
          |  md5(text) AS content_sig
          |FROM documents""".stripMargin
      )
    )
  )
}
