package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Motion-JPEG video SAMPLE decode — the r11 verdict's observation made
  * real: with a hand-written baseline JPEG decoder in the codec tier
  * ([[JpegCodec]]), an intra-frame video codec needs ZERO new entropy
  * coders. The container is AVI (RIFF `AVI ` lists, the little-endian
  * chunk-walk discipline of the WAV reader, `AudioMetaExpr`): `hdrl`
  * (avih + strl/strh/strf) declares the stream — fourcc `MJPG`, frame
  * count, dims — and the `movi` list carries one complete JFIF stream
  * per `..dc` chunk, each decoded by the certified JPEG path. Video
  * decode is now stub-free for intra-frame codecs; only INTER-frame
  * codecs (H.264 etc.) remain out of scope — they genuinely need a
  * codec library this container doesn't ship.
  *
  * Quarantine: not-RIFF / not-AVI, a stream handler other than MJPG
  * (the honest "unsupported codec" row, not a wrong answer), a declared
  * frame count disagreeing with the movi chunks, dims changing
  * mid-stream, any frame the JPEG decoder rejects, and the every-53rd
  * truncated fixture all yield None — per-row, the corpus survives.
  *
  * Scale shape: per-row mapPartitions; one frame decodes at a time into
  * channel sums (O(1) transient memory — no frame raster, no frame list
  * is ever materialized). Certification: the oracle replays the per-
  * frame coefficient law of [[JpegCodec.coefQ]] analytically (frame f
  * of file id is JPEG fixture id·4+f), so the hash gate certifies the
  * RIFF walk + per-frame entropy decode end to end; the spec adds
  * frame-vs-[[JpegCodec]] identity and ImageIO tolerance parity.
  */
object Mjpeg {

  final case class MjpegStats(
      media_id: Long,
      n_frames: Long,
      w: Long,
      h: Long,
      n_pixels: Long,
      mean_r_c: Long,
      mean_g_c: Long,
      mean_b_c: Long
  )

  /** Frame-count law and the per-frame JPEG fixture id. */
  private[graft] def lawFrames(id: Long): Long = 1 + id % 4
  private[graft] def frameFixtureId(id: Long, f: Int): Long = id * 4 + f
  private[graft] val FrameW = 8
  private[graft] val FrameH = 8

  // ---------------------------------------------------------------
  // Fixture encoder: a minimal conformant AVI around real JPEG frames.
  // ---------------------------------------------------------------

  private[operators] def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private[operators] def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private[operators] def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** RIFF chunk: id + size + body + word-alignment pad. */
  private[operators] def chunk(id: String, body: Array[Byte]): Array[Byte] = {
    val pad = if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray
    fourcc(id) ++ le32(body.length.toLong) ++ body ++ pad
  }
  private[operators] def list(tpe: String, parts: Array[Byte]*): Array[Byte] =
    chunk("LIST", fourcc(tpe) ++ parts.flatten)

  private[graft] def encodeAvi(id: Long): Array[Byte] = {
    val nf = lawFrames(id).toInt
    val frames = (0 until nf).map(f => JpegCodec.encodeJpeg(frameFixtureId(id, f), FrameW, FrameH))
    buildAvi(id, frames, FrameW, FrameH, truncate = id % 53 == 0 && id > 0)
  }

  /** A minimal conformant MJPG AVI around the given complete JPEG
    * streams — the container builder shared with the shot-structured
    * fixtures ([[VideoShots]]). `truncate` halves the file (the
    * corrupt-payload quarantine fixture).
    */
  private[graft] def buildAvi(
      id: Long,
      frames: Seq[Array[Byte]],
      w: Int,
      h: Int,
      truncate: Boolean
  ): Array[Byte] = {
    val nf = frames.length
    val avih = chunk(
      "avih",
      le32(33333L) ++ le32(0) ++ le32(0) ++ le32(0) ++ // usec/frame, maxbps, padding, flags
        le32(nf.toLong) ++ le32(0) ++ le32(1) ++ le32(0) ++ // totalframes, initial, streams, bufsize
        le32(w.toLong) ++ le32(h.toLong) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0) // reserved
    )
    val strh = chunk(
      "strh",
      fourcc("vids") ++ fourcc("MJPG") ++ le32(0) ++ // type, handler, flags
        le16(0) ++ le16(0) ++ le32(0) ++ // priority, language, initialframes
        le32(1) ++ le32(30) ++ le32(0) ++ le32(nf.toLong) ++ // scale, rate, start, length
        le32(0) ++ le32(0) ++ le32(0) ++ // bufsize, quality, samplesize
        le16(0) ++ le16(0) ++ le16(w) ++ le16(h) // rcFrame
    )
    val strf = chunk(
      "strf",
      le32(40) ++ le32(w.toLong) ++ le32(h.toLong) ++ le16(1) ++ le16(24) ++
        fourcc("MJPG") ++ le32(w.toLong * h * 3) ++
        le32(0) ++ le32(0) ++ le32(0) ++ le32(0)
    )
    val hdrl = list("hdrl", avih, list("strl", strh, strf))
    val movi = list("movi", frames.map(fr => chunk("00dc", fr)): _*)
    // a JUNK chunk the walk must step over (real muxers pad with these)
    val junk = chunk("JUNK", Array.fill(4 + (id % 6).toInt)(0.toByte))
    val body = fourcc("AVI ") ++ hdrl ++ junk ++ movi
    val full = fourcc("RIFF") ++ le32(body.length.toLong) ++ body
    if (truncate) full.take(full.length / 2) else full
  }

  // ---------------------------------------------------------------
  // Decoder.
  // ---------------------------------------------------------------

  final case class MjpegSample(
      media_id: Long,
      n_frames: Long,
      n_sampled: Long,
      w: Long,
      h: Long,
      mean_r_c: Long,
      mean_g_c: Long,
      mean_b_c: Long
  )

  /** Every-Nth-frame sampling — the standard video-curation cost lever:
    * frame chunks are COUNTED from the container walk alone, but only
    * every `every`-th frame pays the JPEG entropy decode (the skipped
    * chunks are stepped over by size, zero codec work). Channel means
    * are over the sampled frames only.
    */
  private[graft] def decodeAviSampled(
      mediaId: Long,
      p: Array[Byte],
      every: Int
  ): Option[MjpegSample] =
    try {
      def u32(o: Int): Long =
        (0 to 3).foldLeft(0L)((a, i) => a | ((p(o + i) & 0xffL) << (8 * i)))
      def cc(o: Int): String = new String(p, o, 4, "US-ASCII")
      if (p.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ") return None
      val riffEnd = 8 + u32(4)
      if (riffEnd > p.length) return None
      var declared = -1L
      var handler = ""
      var nFrames = 0L
      var nSampled = 0L
      var w = -1
      var h = -1
      var sr = 0L; var sg = 0L; var sb = 0L
      var bad = false
      def walk(from: Int, to: Int, depth: Int): Boolean = {
        var pos = from
        while (pos < to && !bad) {
          if (pos + 8 > to) return false
          val id = cc(pos)
          val size = u32(pos + 4)
          val body = pos + 8
          if (body + size > to) return false
          if (id == "LIST") {
            if (size < 4 || depth > 8) return false
            if (!walk(body + 4, body + size.toInt, depth + 1)) return false
          } else if (id == "avih") {
            if (size < 32) return false
            declared = u32(body + 16)
          } else if (id == "strh") {
            if (size < 8) return false
            if (cc(body) == "vids" && handler.isEmpty) handler = cc(body + 4)
          } else if (id.length == 4 && id.substring(2) == "dc") {
            // count every frame; DECODE only the sampled ones
            if (nFrames % every == 0) {
              val frame = java.util.Arrays.copyOfRange(p, body, body + size.toInt)
              JpegCodec.decodeCore(frame) { (_, _, r, g, b) => sr += r; sg += g; sb += b } match {
                case Some((fw, fh)) =>
                  if (w < 0) { w = fw; h = fh }
                  else if (fw != w || fh != h) bad = true
                  nSampled += 1
                case None => bad = true
              }
            }
            nFrames += 1
          }
          pos = body + size.toInt + (size % 2).toInt
        }
        !bad
      }
      if (!walk(12, riffEnd.toInt, 0)) return None
      if (handler != "MJPG") return None
      if (nSampled < 1 || declared != nFrames || w < 1) return None
      val n = w.toLong * h * nSampled
      Some(
        MjpegSample(mediaId, nFrames, nSampled, w.toLong, h.toLong, sr * 100 / n, sg * 100 / n, sb * 100 / n)
      )
    } catch { case scala.util.control.NonFatal(_) => None }

  private[graft] def decodeAvi(mediaId: Long, p: Array[Byte]): Option[MjpegStats] =
    decodeAviSampled(mediaId, p, 1).map { st =>
      MjpegStats(
        mediaId,
        st.n_frames,
        st.w,
        st.h,
        st.w * st.h * st.n_frames,
        st.mean_r_c,
        st.mean_g_c,
        st.mean_b_c
      )
    }

  def aviTable(s: SparkSession, d: String): Dataset[DeflateMedia.MediaRow] = {
    import s.implicits._
    Tables
      .documents(s, d)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map(id => DeflateMedia.MediaRow(id, encodeAvi(id))))
  }

  def mjpegPixelStats(media: Dataset[DeflateMedia.MediaRow]): Dataset[MjpegStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m => decodeAvi(m.media_id, m.payload)))
  }

  // ---------------------------------------------------------------
  // Oracle: the JPEG coefficient law replayed per (file, frame) with
  // fixture id 4·id+f over the single 8×8 block, aggregated per file.
  // Generated from the SAME literal arrays as the JVM decoder.
  // ---------------------------------------------------------------

  /** The per-(file, sampled-frame) pixel CTE chain through `rgb`,
    * shared by the full decode and the every-Nth sampling query
    * (`frFilter` restricts which frames pay the replay).
    */
  private def framePixelCtes(frFilter: String): String = {
    val zzRows = (0 until 64)
      .map(k => s"($k,${JpegCodec.Zig(k) & 7},${JpegCodec.Zig(k) >> 3},${JpegCodec.QLumZig(k)},${JpegCodec.QChrZig(k)})")
      .mkString(",")
    val bmRows =
      (for { u <- 0 until 8; x <- 0 until 8 } yield s"($u,$x,${JpegCodec.BM(u)(x)})").mkString(",")
    s"""WITH m AS (
       |  SELECT doc_id AS id, 1 + doc_id % 4 AS nf FROM documents
       |  WHERE doc_id % 53 != 0 OR doc_id = 0),
       |fr AS (SELECT id, nf, f FROM
       |  (SELECT id, nf, unnest(range(nf)) AS f FROM m) _fr $frFilter),
       |zz(k, u, v, ql, qc) AS (VALUES $zzRows),
       |bm(u, x, val) AS (VALUES $bmRows),
       |coef AS (
       |  SELECT fr.id, fr.nf, fr.f, cs.c, zz.u, zz.v,
       |    (CASE WHEN zz.k = 0 THEN (((fr.id * 4 + fr.f) * 5 + cs.c * 17) % 21) - 10
       |          WHEN ((fr.id * 4 + fr.f) + cs.c + zz.k * 7) % (3 + (fr.id * 4 + fr.f) % 29) = 0
       |            THEN (((fr.id * 4 + fr.f) * 13 + cs.c * 7 + zz.k * 19) % 61) - 30
       |          ELSE 0 END)
       |    * (CASE WHEN cs.c = 0 THEN zz.ql ELSE zz.qc END) AS dq,
       |    zz.k AS k
       |  FROM fr, (SELECT unnest(range(3)) AS c) cs, zz),
       |nz AS (SELECT * FROM coef WHERE dq <> 0 OR k = 0),
       |samp AS (
       |  SELECT nz.id, nz.nf, nz.f, nz.c, bx.x AS px, byy.x AS py,
       |    least(255, greatest(0,
       |      CAST((SUM(nz.dq * bx.val * byy.val) + 134217728 + 35184372088832) // 268435456 AS BIGINT)
       |        - 131072 + 128)) AS s
       |  FROM nz
       |  JOIN bm bx ON bx.u = nz.u
       |  JOIN bm byy ON byy.u = nz.v
       |  GROUP BY 1, 2, 3, 4, 5, 6),
       |pix AS (
       |  SELECT sy.id, sy.nf, sy.s AS yv, scb.s AS cbv, scr.s AS crv
       |  FROM samp sy
       |  JOIN samp scb ON scb.id = sy.id AND scb.f = sy.f AND scb.px = sy.px AND scb.py = sy.py AND scb.c = 1
       |  JOIN samp scr ON scr.id = sy.id AND scr.f = sy.f AND scr.px = sy.px AND scr.py = sy.py AND scr.c = 2
       |  WHERE sy.c = 0),
       |rgb AS (
       |  SELECT id, nf,
       |    least(255, greatest(0, yv + ((91881 * (crv - 128) + 32768 + 16777216) // 65536) - 256)) AS r,
       |    least(255, greatest(0,
       |      yv - (((22554 * (cbv - 128) + 46802 * (crv - 128) + 32768 + 33554432) // 65536) - 512))) AS g,
       |    least(255, greatest(0, yv + ((116130 * (cbv - 128) + 32768 + 33554432) // 65536) - 512)) AS b
       |  FROM pix)""".stripMargin
  }

  private def oracleSql: String =
    s"""${framePixelCtes("")}
       |SELECT id AS media_id, CAST(nf AS BIGINT) AS n_frames,
       |  CAST($FrameW AS BIGINT) AS w, CAST($FrameH AS BIGINT) AS h,
       |  CAST(${FrameW * FrameH} * nf AS BIGINT) AS n_pixels,
       |  CAST((SUM(r) * 100) // (${FrameW * FrameH} * nf) AS BIGINT) AS mean_r_c,
       |  CAST((SUM(g) * 100) // (${FrameW * FrameH} * nf) AS BIGINT) AS mean_g_c,
       |  CAST((SUM(b) * 100) // (${FrameW * FrameH} * nf) AS BIGINT) AS mean_b_c
       |FROM rgb GROUP BY id, nf""".stripMargin

  private val SampleEvery = 2

  private def sampleOracleSql: String =
    s"""${framePixelCtes(s"WHERE f % $SampleEvery = 0")}
       |SELECT id AS media_id, CAST(nf AS BIGINT) AS n_frames,
       |  CAST((nf + ${SampleEvery - 1}) // $SampleEvery AS BIGINT) AS n_sampled,
       |  CAST($FrameW AS BIGINT) AS w, CAST($FrameH AS BIGINT) AS h,
       |  CAST((SUM(r) * 100) // (${FrameW * FrameH} * ((nf + ${SampleEvery - 1}) // $SampleEvery)) AS BIGINT) AS mean_r_c,
       |  CAST((SUM(g) * 100) // (${FrameW * FrameH} * ((nf + ${SampleEvery - 1}) // $SampleEvery)) AS BIGINT) AS mean_g_c,
       |  CAST((SUM(b) * 100) // (${FrameW * FrameH} * ((nf + ${SampleEvery - 1}) // $SampleEvery)) AS BIGINT) AS mean_b_c
       |FROM rgb GROUP BY id, nf""".stripMargin

  private val mjpegQ = Q(
    "multimodal_mjpeg_pixels",
    (s, d) => mjpegPixelStats(aviTable(s, d)).toDF(),
    Some(oracleSql)
  )

  private val frameSampleQ = Q(
    "multimodal_frame_sample",
    (s, d) => {
      import s.implicits._
      aviTable(s, d)
        .mapPartitions(_.flatMap(m => decodeAviSampled(m.media_id, m.payload, SampleEvery)))
        .toDF()
    },
    Some(sampleOracleSql)
  )

  val all: Seq[Q] = Seq(mjpegQ, frameSampleQ)
}
