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
  * row. Full pixel/sample decode and the video codecs remain STUBBED
  * (`decodeStub` — the container has no media libraries): a production
  * deployment swaps the stub for a `mapPartitions` codec invocation
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

  /** STUB decode: deterministic fake standing in for the real codec.
    * Returns (n_bytes, content digest, sampled frame count). The real
    * implementation is a per-partition codec invocation with this exact
    * output schema.
    */
  def decodeStub(df: DataFrame): DataFrame =
    df.withColumn("n_bytes", length(col("payload")))
      .withColumn("content_sig", md5(col("payload")))
      .withColumn(
        "frame_count",
        when(col("media_type") === "video/mp4", col("n_bytes") % 24 + 1)
          .otherwise(lit(1))
      )

  final case class MediaIn(media_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaOut(media_id: Long, n_bytes: Int, content_sig: String, frame_count: Int)

  /** The deterministic fake codec, batch-shaped: same arithmetic as
    * [[decodeStub]] but computed JVM-side over a payload batch — the
    * signature a real decode library call drops into.
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

  val all: Seq[Q] = Seq(
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
      (s, d) =>
        decodeStub(mediaTable(s, d))
          .select(
            col("media_id"),
            col("media_type"),
            col("meta.width").as("width"),
            col("meta.height").as("height"),
            col("n_bytes"),
            col("content_sig"),
            col("frame_count")
          ),
      Some(
        """WITH m AS (
          |  SELECT doc_id AS media_id,
          |    (['image/png', 'audio/wav', 'video/mp4'])[cast(doc_id % 3 + 1 as int)] AS media_type,
          |    cast(doc_id % 640 + 64 as int) AS width,
          |    cast(doc_id % 480 + 48 as int) AS height,
          |    octet_length(encode(text)) AS n_bytes,
          |    md5(text) AS content_sig
          |  FROM documents)
          |SELECT media_id, media_type, width, height, n_bytes, content_sig,
          |  (CASE WHEN media_type = 'video/mp4' THEN n_bytes % 24 + 1 ELSE 1 END) AS frame_count
          |FROM m""".stripMargin
      )
    )
  )
}
