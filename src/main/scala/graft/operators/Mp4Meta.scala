package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** ISO-BMFF (MP4) container STRUCTURE decode — real byte-level box-tree
  * parsing for the one media class whose SAMPLE decode stays stubbed
  * (inter-frame video codecs genuinely need a codec library): a
  * training-data pipeline still has to read the CONTAINER to route,
  * filter and deduplicate video assets — brand, movie
  * timescale/duration, track inventory, per-track codec fourcc, video
  * dimensions, audio channel/rate, payload size — and all of that is
  * pure box arithmetic (ISO/IEC 14496-12: length-prefixed typed boxes,
  * 64-bit largesize escape, version-dependent full-box layouts).
  *
  * The walk: top-level boxes (ftyp / moov / mdat / free) → moov
  * children (mvhd v0 AND v1 layouts) → trak → mdia → hdlr + minf →
  * stbl → stsd sample entries (visual entries carry width/height at
  * the 14496-12 §12.1 offsets; audio entries channels + 16.16 sample
  * rate). Unknown boxes skip by size — the walk reads any conformant
  * file, not just the fixture shape. Malformed payloads (truncated
  * boxes, overflowing sizes, missing moov) quarantine to None.
  *
  * Scale shape: per-row mapPartitions, O(1) transient state (no box
  * tree is materialized — fields accumulate into one flat row).
  * Certification: the closed-form fixture law means the oracle KNOWS
  * every field analytically, but producing them on the Spark side
  * requires actually parsing the bytes (the `multimodal_decode`
  * discipline); every 53rd payload truncates mid-moov to exercise the
  * per-row quarantine, and the spec walks hand-built edge shapes
  * (largesize mdat, v1 mvhd, unknown boxes).
  */
object Mp4Meta {

  final case class Mp4Stats(
      media_id: Long,
      brand: String,
      timescale: Long,
      duration_ms: Long,
      n_tracks: Long,
      video_codec: String,
      width: Long,
      height: Long,
      audio_codec: String,
      channels: Long,
      sample_rate: Long,
      mdat_bytes: Long
  )

  // ---------------------------------------------------------------
  // Fixture encoder: a minimal conformant box tree from the id law.
  // ---------------------------------------------------------------

  private def be16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ fourcc(tpe) ++ body
  }

  /** Per-video-track sample-table fields (r12): the routing/filtering
    * statistics a video curation pipeline keys on, all derived from the
    * stbl sample tables by pure box arithmetic — frame count and track
    * duration from stts time deltas, payload mass and mean frame size
    * from stsz (BOTH the compact constant-size form and the per-sample
    * table), keyframe density from stss, chunk count from stco, bitrate
    * from bytes × timescale / duration units.
    */
  final case class Mp4Tracks(
      media_id: Long,
      n_frames: Long,
      n_keyframes: Long,
      keyframe_permille: Long,
      track_duration_ms: Long,
      total_sample_bytes: Long,
      mean_frame_bytes: Long,
      bitrate_bps: Long,
      n_chunks: Long
  )

  /** The closed-form field law shared with the oracle. */
  private[graft] def lawTimescale(id: Long): Long = 600 + id % 100
  private[graft] def lawDuration(id: Long): Long = 600 + id % 3000 // in timescale units
  private[graft] def lawWidth(id: Long): Long = 320 + id % 1280
  private[graft] def lawHeight(id: Long): Long = 240 + id % 720
  private[graft] def lawChannels(id: Long): Long = 1 + id % 2
  private[graft] def lawRate(id: Long): Long = Seq(8000L, 16000L, 44100L, 48000L)((id % 4).toInt)
  private[graft] def lawHasAudio(id: Long): Boolean = id % 2 == 1
  private[graft] def lawMdat(id: Long): Long = id % 1024
  // Sample-table laws (video track). Odd ids exercise the two-run stts
  // and the per-sample stsz table; even ids the single-run stts and the
  // compact constant-size stsz form.
  private[graft] def lawFrames(id: Long): Long = 24 + id % 240
  private[graft] def lawDelta(id: Long): Long = 25 + id % 50
  private[graft] def lawFrameSize(id: Long): Long = 200 + id % 800
  private[graft] def lawDurUnits(id: Long): Long = {
    val n = lawFrames(id); val d = lawDelta(id)
    if (id % 2 == 0) n * d else (n / 2) * d + (n - n / 2) * 2 * d
  }
  private[graft] def lawSampleBytes(id: Long): Long = {
    val n = lawFrames(id); val sz = lawFrameSize(id)
    if (id % 2 == 0) n * sz else n * sz + n * (n - 1) / 2
  }
  private[graft] def lawKeyframes(id: Long): Long = (lawFrames(id) + 9) / 10
  private[graft] def lawChunks(id: Long): Long = 1 + id % 3

  private[graft] def encodeMp4(id: Long): Array[Byte] = {
    val ftyp = box("ftyp", fourcc("isom"), be32(512), fourcc("isom"), fourcc("iso2"))
    // v1 mvhd every 7th file exercises the 64-bit-times layout
    val mvhd =
      if (id % 7 == 0)
        box(
          "mvhd",
          Array[Byte](1, 0, 0, 0),
          be32(0), be32(0), be32(0), be32(0), // 64-bit created/modified
          be32(lawTimescale(id)),
          be32(0), be32(lawDuration(id)), // 64-bit duration
          be32(0x00010000L), be16(0x0100), be16(0),
          be32(0), be32(0),
          Array.fill(36)(0.toByte),
          Array.fill(24)(0.toByte),
          be32(2 + (if (lawHasAudio(id)) 1 else 0))
        )
      else
        box(
          "mvhd",
          Array[Byte](0, 0, 0, 0),
          be32(0), be32(0),
          be32(lawTimescale(id)), be32(lawDuration(id)),
          be32(0x00010000L), be16(0x0100), be16(0),
          be32(0), be32(0),
          Array.fill(36)(0.toByte),
          Array.fill(24)(0.toByte),
          be32(2 + (if (lawHasAudio(id)) 1 else 0))
        )
    def sampleEntryVideo: Array[Byte] = {
      val body = Array.fill(6)(0.toByte) ++ be16(1) ++ // reserved + data_ref_index
        be16(0) ++ be16(0) ++ Array.fill(12)(0.toByte) ++
        be16(lawWidth(id).toInt) ++ be16(lawHeight(id).toInt) ++
        be32(0x00480000L) ++ be32(0x00480000L) ++ be32(0) ++ be16(1) ++
        Array.fill(32)(0.toByte) ++ be16(0x0018) ++ be16(0xffff)
      be32(8L + body.length) ++ fourcc("avc1") ++ body
    }
    def sampleEntryAudio: Array[Byte] = {
      val body = Array.fill(6)(0.toByte) ++ be16(1) ++
        Array.fill(8)(0.toByte) ++
        be16(lawChannels(id).toInt) ++ be16(16) ++ be16(0) ++ be16(0) ++
        be32(lawRate(id) << 16)
      be32(8L + body.length) ++ fourcc("mp4a") ++ body
    }
    def sampleTables: Array[Byte] = {
      val n = lawFrames(id).toInt
      val d = lawDelta(id)
      val sz = lawFrameSize(id)
      val stts =
        if (id % 2 == 0)
          box("stts", Array[Byte](0, 0, 0, 0), be32(1), be32(n.toLong), be32(d))
        else
          box(
            "stts",
            Array[Byte](0, 0, 0, 0),
            be32(2),
            be32(n / 2L), be32(d),
            be32(n - n / 2L), be32(2 * d)
          )
      val stsz =
        if (id % 2 == 0)
          // compact form: constant sample_size, no per-sample table
          box("stsz", Array[Byte](0, 0, 0, 0), be32(sz), be32(n.toLong))
        else
          box(
            "stsz",
            Array[Byte](0, 0, 0, 0),
            be32(0),
            be32(n.toLong),
            Array.tabulate(n)(k => be32(sz + k)).flatten.toArray
          )
      val nKey = lawKeyframes(id).toInt
      val stss = box(
        "stss",
        Array[Byte](0, 0, 0, 0),
        be32(nKey.toLong),
        Array.tabulate(nKey)(k => be32(1L + 10L * k)).flatten.toArray
      )
      val nCh = lawChunks(id).toInt
      val stco = box(
        "stco",
        Array[Byte](0, 0, 0, 0),
        be32(nCh.toLong),
        Array.tabulate(nCh)(k => be32(1024L * k)).flatten.toArray
      )
      stts ++ stsz ++ stss ++ stco
    }
    def trak(handler: String, entry: Array[Byte]): Array[Byte] = {
      val hdlr = box(
        "hdlr",
        Array[Byte](0, 0, 0, 0),
        be32(0), fourcc(handler), be32(0), be32(0), be32(0), Array[Byte](0)
      )
      val stsd = box("stsd", Array[Byte](0, 0, 0, 0), be32(1), entry)
      val stbl =
        if (handler == "vide") box("stbl", stsd, sampleTables) else box("stbl", stsd)
      val minf = box("minf", stbl)
      val mdhd = box(
        "mdhd",
        Array[Byte](0, 0, 0, 0),
        be32(0), be32(0), be32(lawTimescale(id)), be32(lawDuration(id)), be16(0x55c4), be16(0)
      )
      // Every 13th file orders minf BEFORE hdlr — ISO-BMFF does not
      // mandate mdia child order, and the walk must not depend on having
      // seen hdlr first (the r11 advice finding): handler resolution
      // pre-scans the mdia subtree.
      val mdia =
        if (id % 13 == 0) box("mdia", mdhd, minf, hdlr)
        else box("mdia", mdhd, hdlr, minf)
      val tkhd = box(
        "tkhd",
        Array[Byte](0, 0, 0, 7),
        be32(0), be32(0), be32(1), be32(0), be32(lawDuration(id)),
        Array.fill(8)(0.toByte), be16(0), be16(0), be16(0x0100), be16(0),
        Array.fill(36)(0.toByte),
        be32(lawWidth(id) << 16), be32(lawHeight(id) << 16)
      )
      box("trak", tkhd, mdia)
    }
    val traks =
      if (lawHasAudio(id)) trak("vide", sampleEntryVideo) ++ trak("soun", sampleEntryAudio)
      else trak("vide", sampleEntryVideo)
    // a `free` box before moov: the walk must skip boxes it doesn't know
    val free = box("free", Array.fill(4 + (id % 5).toInt)(0x20.toByte))
    val moov = box("moov", mvhd, traks)
    val mdatBody = Array.tabulate(lawMdat(id).toInt)(k => ((id * 31 + k) % 256).toByte)
    // every 11th file uses the 64-bit largesize escape on mdat
    val mdat =
      if (id % 11 == 0)
        be32(1) ++ fourcc("mdat") ++ be32(0) ++ be32(16L + mdatBody.length) ++ mdatBody
      else box("mdat", mdatBody)
    val full = ftyp ++ free ++ moov ++ mdat
    if (id % 53 == 0 && id > 0) full.take(full.length / 2) else full
  }

  // ---------------------------------------------------------------
  // Decoder.
  // ---------------------------------------------------------------

  private final class Acc {
    var brand: String = ""
    var timescale = -1L
    var duration = -1L
    var nTracks = 0L
    var videoCodec = ""
    var width = 0L
    var height = 0L
    var audioCodec = ""
    var channels = 0L
    var rate = 0L
    var mdat = -1L
    var curHandler = ""
    // video-track sample-table accumulators (r12)
    var vFrames = 0L
    var vDurUnits = 0L
    var vBytes = 0L
    var vKeyframes = 0L
    var vChunks = 0L
    var vTimescale = -1L
  }

  private def decodeAcc(p: Array[Byte]): Option[Acc] =
    try {
      def u16(o: Int): Int = ((p(o) & 0xff) << 8) | (p(o + 1) & 0xff)
      def u32(o: Int): Long = (0 to 3).foldLeft(0L)((a, i) => (a << 8) | (p(o + i) & 0xff))
      def u64(o: Int): Long = (u32(o) << 32) | u32(o + 4)
      val acc = new Acc

      /** Walk the boxes in [from, to); returns false on malformation. */
      def walk(from: Int, to: Int, depth: Int): Boolean = {
        var pos = from
        while (pos < to) {
          if (pos + 8 > to) return false
          var size = u32(pos)
          val tpe = new String(p, pos + 4, 4, "US-ASCII")
          var hdr = 8
          if (size == 1) {
            if (pos + 16 > to) return false
            size = u64(pos + 8)
            hdr = 16
          } else if (size == 0) size = (to - pos).toLong // box extends to EOF
          if (size < hdr || pos + size > to) return false
          val body = pos + hdr
          val end = pos + size.toInt
          tpe match {
            case "ftyp" =>
              if (body + 4 > end) return false
              acc.brand = new String(p, body, 4, "US-ASCII")
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              if (tpe == "trak") { acc.nTracks += 1; acc.curHandler = "" }
              // ISO-BMFF does not mandate mdia child order (minf may
              // precede hdlr in a conformant file), but stsd/sample-table
              // classification needs the handler — resolve it by a
              // shallow pre-scan of the mdia children before descending.
              if (tpe == "mdia") {
                var o = body
                while (o + 8 <= end && acc.curHandler.isEmpty) {
                  var bsz = u32(o)
                  var bh = 8
                  if (bsz == 1) {
                    if (o + 16 > end) return false
                    bsz = u64(o + 8); bh = 16
                  } else if (bsz == 0) bsz = (end - o).toLong
                  if (bsz < bh || o + bsz > end) return false
                  if (new String(p, o + 4, 4, "US-ASCII") == "hdlr") {
                    if (o + bh + 12 > end) return false
                    acc.curHandler = new String(p, o + bh + 8, 4, "US-ASCII")
                  }
                  o += bsz.toInt
                }
              }
              if (depth > 8 || !walk(body, end, depth + 1)) return false
            case "mvhd" =>
              val v = p(body) & 0xff
              if (v == 1) {
                if (body + 32 > end) return false
                acc.timescale = u32(body + 20)
                acc.duration = u64(body + 24)
              } else {
                if (body + 20 > end) return false
                acc.timescale = u32(body + 12)
                acc.duration = u32(body + 16)
              }
            case "hdlr" =>
              if (body + 12 > end) return false
              acc.curHandler = new String(p, body + 8, 4, "US-ASCII")
            case "stsd" =>
              if (body + 8 > end) return false
              val n = u32(body + 4)
              var o = body + 8
              var i = 0L
              while (i < n) {
                if (o + 8 > end) return false
                val esz = u32(o)
                val cc = new String(p, o + 4, 4, "US-ASCII")
                if (esz < 8 || o + esz > end) return false
                if (acc.curHandler == "vide") {
                  // visual sample entry: width/height at body offsets 24/26
                  if (o + 8 + 28 > end) return false
                  acc.videoCodec = cc
                  acc.width = u16(o + 8 + 24)
                  acc.height = u16(o + 8 + 26)
                } else if (acc.curHandler == "soun") {
                  // audio sample entry: channels at 16, 16.16 rate at 24
                  if (o + 8 + 28 > end) return false
                  acc.audioCodec = cc
                  acc.channels = u16(o + 8 + 16)
                  acc.rate = u32(o + 8 + 24) >> 16
                }
                o += esz.toInt
                i += 1
              }
            case "mdhd" =>
              if (acc.curHandler == "vide") {
                val v = p(body) & 0xff
                if (v == 1) {
                  if (body + 28 > end) return false
                  acc.vTimescale = u32(body + 20)
                } else {
                  if (body + 16 > end) return false
                  acc.vTimescale = u32(body + 12)
                }
              }
            case "stts" if acc.curHandler == "vide" =>
              if (body + 8 > end) return false
              val n = u32(body + 4)
              var o = body + 8
              var i = 0L
              while (i < n) {
                if (o + 8 > end) return false
                val cnt = u32(o)
                acc.vFrames += cnt
                acc.vDurUnits += cnt * u32(o + 4)
                o += 8
                i += 1
              }
            case "stsz" if acc.curHandler == "vide" =>
              if (body + 12 > end) return false
              val const = u32(body + 4)
              val n = u32(body + 8)
              if (const != 0) acc.vBytes += const * n
              else {
                var o = body + 12
                var i = 0L
                while (i < n) {
                  if (o + 4 > end) return false
                  acc.vBytes += u32(o)
                  o += 4
                  i += 1
                }
              }
            case "stss" if acc.curHandler == "vide" =>
              if (body + 8 > end) return false
              acc.vKeyframes += u32(body + 4)
            case "stco" if acc.curHandler == "vide" =>
              if (body + 8 > end) return false
              acc.vChunks += u32(body + 4)
            case "mdat" =>
              acc.mdat = size - hdr
            case _ => () // free/skip/unknown: step over
          }
          pos = end
        }
        true
      }
      if (p.length < 8 || !walk(0, p.length, 0)) return None
      if (acc.brand.isEmpty || acc.timescale <= 0 || acc.nTracks < 1 || acc.mdat < 0) return None
      Some(acc)
    } catch { case scala.util.control.NonFatal(_) => None }

  private[graft] def decodeMp4(mediaId: Long, p: Array[Byte]): Option[Mp4Stats] =
    decodeAcc(p).map { acc =>
      Mp4Stats(
        mediaId,
        acc.brand,
        acc.timescale,
        acc.duration * 1000 / acc.timescale,
        acc.nTracks,
        acc.videoCodec,
        acc.width,
        acc.height,
        acc.audioCodec,
        acc.channels,
        acc.rate,
        acc.mdat
      )
    }

  /** Video sample-table rollup: only files whose video track carries a
    * parseable sample table (stts with ≥1 frame) produce a row — the
    * quarantine discipline extended to the track level.
    */
  private[graft] def decodeMp4Tracks(mediaId: Long, p: Array[Byte]): Option[Mp4Tracks] =
    decodeAcc(p).collect {
      case acc if acc.vFrames > 0 && acc.vDurUnits > 0 && acc.vTimescale > 0 =>
        Mp4Tracks(
          mediaId,
          acc.vFrames,
          acc.vKeyframes,
          acc.vKeyframes * 1000 / acc.vFrames,
          acc.vDurUnits * 1000 / acc.vTimescale,
          acc.vBytes,
          acc.vBytes / acc.vFrames,
          acc.vBytes * 8 * acc.vTimescale / acc.vDurUnits,
          acc.vChunks
        )
    }

  def mp4Table(s: SparkSession, d: String): Dataset[DeflateMedia.MediaRow] = {
    import s.implicits._
    Tables
      .documents(s, d)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map(id => DeflateMedia.MediaRow(id, encodeMp4(id))))
  }

  def mp4MetaStats(media: Dataset[DeflateMedia.MediaRow]): Dataset[Mp4Stats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m => decodeMp4(m.media_id, m.payload)))
  }

  def mp4TrackStats(media: Dataset[DeflateMedia.MediaRow]): Dataset[Mp4Tracks] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m => decodeMp4Tracks(m.media_id, m.payload)))
  }

  private val mp4Q = Q(
    "multimodal_mp4_meta",
    (s, d) => mp4MetaStats(mp4Table(s, d)).toDF(),
    Some(
      """SELECT doc_id AS media_id,
        |  'isom' AS brand,
        |  CAST(600 + doc_id % 100 AS BIGINT) AS timescale,
        |  CAST(((600 + doc_id % 3000) * 1000) // (600 + doc_id % 100) AS BIGINT) AS duration_ms,
        |  CAST(1 + doc_id % 2 AS BIGINT) AS n_tracks,
        |  'avc1' AS video_codec,
        |  CAST(320 + doc_id % 1280 AS BIGINT) AS width,
        |  CAST(240 + doc_id % 720 AS BIGINT) AS height,
        |  CASE WHEN doc_id % 2 = 1 THEN 'mp4a' ELSE '' END AS audio_codec,
        |  CASE WHEN doc_id % 2 = 1 THEN CAST(1 + doc_id % 2 AS BIGINT) ELSE 0 END AS channels,
        |  CASE WHEN doc_id % 2 = 1 THEN CAST(([8000, 16000, 44100, 48000])[CAST(doc_id % 4 AS INT) + 1] AS BIGINT) ELSE 0 END AS sample_rate,
        |  CAST(doc_id % 1024 AS BIGINT) AS mdat_bytes
        |FROM documents
        |WHERE doc_id % 53 != 0 OR doc_id = 0""".stripMargin
    )
  )

  private val mp4TracksQ = Q(
    "multimodal_mp4_tracks",
    (s, d) => mp4TrackStats(mp4Table(s, d)).toDF(),
    Some(
      """WITH law AS (
        |  SELECT doc_id,
        |    CAST(24 + doc_id % 240 AS BIGINT) AS nf,
        |    CAST(25 + doc_id % 50 AS BIGINT) AS dl,
        |    CAST(200 + doc_id % 800 AS BIGINT) AS sz,
        |    CAST(600 + doc_id % 100 AS BIGINT) AS ts
        |  FROM documents
        |  WHERE doc_id % 53 != 0 OR doc_id = 0),
        |law2 AS (
        |  SELECT doc_id, nf, ts,
        |    CASE WHEN doc_id % 2 = 0 THEN nf * dl
        |         ELSE (nf // 2) * dl + (nf - nf // 2) * 2 * dl END AS du,
        |    CASE WHEN doc_id % 2 = 0 THEN nf * sz
        |         ELSE nf * sz + nf * (nf - 1) // 2 END AS tb,
        |    (nf + 9) // 10 AS nk
        |  FROM law)
        |SELECT doc_id AS media_id,
        |  nf AS n_frames,
        |  nk AS n_keyframes,
        |  nk * 1000 // nf AS keyframe_permille,
        |  du * 1000 // ts AS track_duration_ms,
        |  tb AS total_sample_bytes,
        |  tb // nf AS mean_frame_bytes,
        |  tb * 8 * ts // du AS bitrate_bps,
        |  CAST(1 + doc_id % 3 AS BIGINT) AS n_chunks
        |FROM law2""".stripMargin
    )
  )

  val all: Seq[Q] = Seq(mp4Q, mp4TracksQ)
}
