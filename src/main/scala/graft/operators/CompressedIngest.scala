package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Zstandard / LZ4 / Snappy text ingest — the remaining compressed-
  * corpus wire formats after [[DeflateMedia]]'s gzip: modern crawl and
  * training-shard distributions ship .zst (and Spark's own shuffle and
  * parquet pages use lz4/snappy/zstd), so a pipeline must decode all
  * of them as a streaming per-partition pass. The codecs come from
  * Spark's OWN classpath (zstd-jni, lz4-java, snappy-java — no new
  * dependency), the counting core is [[DeflateMedia.streamStats]]
  * (8 KiB streaming, O(buffer) transient memory, corrupt members
  * quarantined per row), and the oracle recomputes the stats from the
  * uncompressed text — a hash match certifies each codec's framing +
  * decode end to end.
  */
object CompressedIngest {

  private def zstdBytes(text: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new com.github.luben.zstd.ZstdOutputStream(bos)
    out.write(text.getBytes("UTF-8")); out.close()
    bos.toByteArray
  }

  private def lz4Bytes(text: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new net.jpountz.lz4.LZ4FrameOutputStream(bos)
    out.write(text.getBytes("UTF-8")); out.close()
    bos.toByteArray
  }

  private def snappyBytes(text: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new org.xerial.snappy.SnappyOutputStream(bos)
    out.write(text.getBytes("UTF-8")); out.close()
    bos.toByteArray
  }

  /** Test/fixture hook: encode one text under the named codec. */
  private[graft] def encodeBytes(codec: String, text: String): Array[Byte] = codec match {
    case "zstd" => zstdBytes(text)
    case "lz4" => lz4Bytes(text)
    case "snappy" => snappyBytes(text)
    case "gzip" => DeflateMedia.gzipBytes(text)
  }

  private[graft] def decodeStats(
      codec: String,
      docId: Long,
      payload: Array[Byte]
  ): Option[DeflateMedia.GzStats] = {
    val raw = new java.io.ByteArrayInputStream(payload)
    DeflateMedia.streamStats(
      docId,
      codec match {
        case "zstd" => new com.github.luben.zstd.ZstdInputStream(raw)
        case "lz4" => new net.jpountz.lz4.LZ4FrameInputStream(raw)
        case "snappy" => new org.xerial.snappy.SnappyInputStream(raw)
      }
    )
  }

  private def table(
      s: SparkSession,
      d: String,
      enc: String => Array[Byte]
  ): Dataset[DeflateMedia.MediaRow] = {
    import s.implicits._
    Tables
      .documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => DeflateMedia.MediaRow(id, enc(t)) })
  }

  private def ingest(codec: String)(media: Dataset[DeflateMedia.MediaRow]) = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m => decodeStats(codec, m.media_id, m.payload)))
  }

  /** Same text-derived oracle as `docs_gzip_ingest`: the compressed
    * bytes never cross the engine boundary.
    */
  private val TextStatsOracle =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(len(list_filter(string_split_regex(text, '[ \t\n\r\f\x0B]'), t -> t <> '')) AS BIGINT) AS n_tokens,
      |  CAST(len(text) - len(replace(text, chr(10), '')) AS BIGINT) AS n_lines
      |FROM documents""".stripMargin

  private def q(name: String, codec: String, enc: String => Array[Byte]): Q =
    Q(name, (s, d) => ingest(codec)(table(s, d, enc)).toDF(), Some(TextStatsOracle))

  val all: Seq[Q] = Seq(
    q("docs_zstd_ingest", "zstd", zstdBytes),
    q("docs_lz4_ingest", "lz4", lz4Bytes),
    q("docs_snappy_ingest", "snappy", snappyBytes)
  )
}
