package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * The Spark-side shape is the real deliverable at 100 TB: payload bytes
  * stay in one parquet binary column (never exploded, never stringified),
  * metadata is a columnar struct Catalyst can prune independently of the
  * payload, and decode/feature-extraction runs per-partition so codec
  * state is reused across rows. The actual codec is STUBBED here — the
  * container has no image/audio libraries — with a deterministic fake
  * (`decodeStub`): byte length, content digest, and dimensions derived
  * from the payload. A production deployment swaps `decodeStub` for a
  * `mapPartitions` over a real codec with the same output schema.
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

  val all: Seq[Q] = Seq(
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
