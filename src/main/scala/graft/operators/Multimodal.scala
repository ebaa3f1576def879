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
  * IMAGE decode is REAL for the header slice: `multimodal_decode`
  * synthesizes valid PNG and JPEG byte streams and parses
  * width/height/bit-depth/channels back out of the raw bytes with
  * [[graft.plans.ImageMetaExpr]] (PNG IHDR + JPEG SOF marker walk —
  * public container formats, no codec library needed), with corrupt
  * payloads quarantined per row. Full pixel decode and the audio/video
  * codecs remain STUBBED (`decodeStub` — the container has no media
  * libraries): a production deployment swaps the stub for a
  * `mapPartitions` codec invocation with the same output schema.
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

  /** Big-endian byte strings from an int column (PNG/JPEG dims). */
  private def be32(c: Column): Column = unhex(lpad(hex(c.cast("int")), 8, "0"))
  private def be16(c: Column): Column = unhex(lpad(hex(c.cast("int")), 4, "0"))

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
