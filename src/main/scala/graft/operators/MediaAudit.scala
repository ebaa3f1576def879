package graft.operators

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-level media-ingest health audit — the monitoring face of the
  * per-row quarantine discipline every decoder in the multimodal tier
  * follows (corrupt payloads yield None, the corpus survives): per
  * media family, how many payloads arrived, how many decoded, how
  * many quarantined. A 100-TB ingest watches exactly this row per
  * batch; a quarantine-rate jump is the first signal of an upstream
  * format change or corruption.
  *
  * Certification: the oracle states each family's quarantine LAW
  * analytically (the planted truncation rules), so the hash gate
  * proves the decoders quarantine EXACTLY the planted corruption and
  * nothing else at corpus level — over-quarantine (a decoder
  * regression dropping good payloads) and under-quarantine (accepting
  * corrupt ones) both break the count.
  *
  * Scale shape: per family one map-side-combinable count aggregate
  * over (media_id, decoded-flag) union rows; no joins, no windows.
  */
object MediaAudit {

  private def familyOf(name: String, media: DataFrame, decoded: DataFrame): DataFrame =
    media
      .select(col("media_id"), lit(0).as("d"))
      .unionByName(decoded.select(col("media_id"), lit(1).as("d")))
      .agg(
        countDistinct(col("media_id")).as("n_media"),
        countDistinct(when(col("d") === 1, col("media_id"))).as("n_decoded")
      )
      .select(
        lit(name).as("family"),
        col("n_media"),
        col("n_decoded"),
        (col("n_media") - col("n_decoded")).as("n_quarantined")
      )

  def auditOf(s: SparkSession, d: String): DataFrame = {
    val mjpeg = familyOf(
      "mjpeg",
      Mjpeg.aviTable(s, d).toDF().select("media_id"),
      Mjpeg.mjpegPixelStats(Mjpeg.aviTable(s, d)).toDF().select("media_id")
    )
    val shots = familyOf(
      "video_shots",
      VideoShots.clipTable(s, d).toDF().select("media_id"),
      VideoShots.shotTable(VideoShots.clipTable(s, d)).toDF().select("media_id")
    )
    val audio = familyOf(
      "audio",
      AudioFingerprint.clipTable(s, d).select("media_id"),
      AudioFingerprint.windowTable(AudioFingerprint.clipTable(s, d)).select("media_id")
    )
    val image = familyOf(
      "image",
      ImageFeatures.imageTable(s, d).select("media_id"),
      ImageFeatures.dhashOf(ImageFeatures.imageTable(s, d)).select("media_id")
    )
    mjpeg.unionByName(shots).unionByName(audio).unionByName(image)
  }

  private def oracleSql: String =
    s"""WITH d AS (SELECT doc_id FROM documents),
       |mjpeg AS (
       |  SELECT 'mjpeg' AS family,
       |    CAST(count(*) AS BIGINT) AS n_media,
       |    CAST(sum(CASE WHEN doc_id % 53 != 0 OR doc_id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded
       |  FROM d),
       |vs AS (
       |  SELECT 'video_shots' AS family,
       |    CAST(count(*)
       |      + sum(CASE WHEN doc_id % 7 = 2 THEN 1 ELSE 0 END)
       |      + sum(CASE WHEN doc_id % 9 = 5 AND doc_id % 3 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_media,
       |    CAST(sum(CASE WHEN doc_id % 53 != 0 OR doc_id = 0 THEN 1 ELSE 0 END)
       |      + sum(CASE WHEN doc_id % 7 = 2 THEN 1 ELSE 0 END)
       |      + sum(CASE WHEN doc_id % 9 = 5 AND doc_id % 3 != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded
       |  FROM d),
       |au AS (
       |  SELECT 'audio' AS family,
       |    CAST(count(*)
       |      + sum(CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END)
       |      + sum(CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_media,
       |    CAST(count(*)
       |      + sum(CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END)
       |      + sum(CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded
       |  FROM d),
       |im AS (
       |  SELECT 'image' AS family,
       |    CAST(count(*) + sum(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_media,
       |    CAST(count(*) + sum(CASE WHEN doc_id % 7 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_decoded
       |  FROM d),
       |u AS (
       |  SELECT * FROM mjpeg UNION ALL SELECT * FROM vs
       |  UNION ALL SELECT * FROM au UNION ALL SELECT * FROM im)
       |SELECT family, n_media, n_decoded, n_media - n_decoded AS n_quarantined FROM u""".stripMargin

  val all: Seq[Q] = Seq(
    Q("multimodal_quarantine_audit", (s, d) => auditOf(s, d), Some(oracleSql))
  )
}
