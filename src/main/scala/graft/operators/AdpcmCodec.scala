package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** IMA/DVI ADPCM decode (WAV format tag 0x11) — the registry's first
  * genuinely COMPRESSIVE audio codec (4:1 vs PCM16): each sample is a
  * 4-bit quantized delta driven by the IMA step-size state machine
  * (Cummiskey-Jayant-Flanagan adaptive quantization, the IMA/DVI 1992
  * table form). After PCM16 (byte reinterpretation) and µ-law
  * (memoryless companding), this closes the third audio-decode class:
  * PREDICTIVE state-machine codecs.
  *
  * Certification: the fixture ENCODES deterministic PCM16 source
  * samples (the same closed-form series as the PCM fixture) with the
  * standard IMA quantizer; the oracle NEVER touches the compressed
  * bytes — it replays encoder quantization + decoder reconstruction
  * as ONE unrolled state machine over the closed-form source (encoder
  * and decoder share state by construction), so a hash match proves
  * the byte-level block/nibble parsing AND the reconstruction law.
  * AdpcmSpec additionally pins the reconstruction error bound (the
  * codec is lossy; error ≤ step size at every sample) and corrupt-
  * payload quarantine.
  *
  * Codec-tier contract as [[GifCodec]]: mapPartitions, O(1) decoder
  * state (predictor + index), samples stream into the sums.
  */
object AdpcmCodec {

  /** IMA step-size table (89 entries, IMA ADPCM spec). */
  private[graft] val StepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173, 190, 209, 230,
    253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658, 724, 796, 876, 963,
    1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
    3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794,
    32767
  )

  /** Index adjustment per nibble magnitude (low 3 bits). */
  private[graft] val IndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  private def clampPred(v: Int): Int = math.max(-32768, math.min(32767, v))
  private def clampIdx(v: Int): Int = math.max(0, math.min(88, v))

  /** One decoder step: (predictor, index, nibble) → (predictor',
    * index'). The IMA reconstruction: diff = step/8 + b2·step +
    * b1·step/2 + b0·step/4, sign bit subtracts.
    */
  private[graft] def decodeStep(pred: Int, idx: Int, nibble: Int): (Int, Int) = {
    val step = StepTable(idx)
    var diff = step >> 3
    if ((nibble & 4) != 0) diff += step
    if ((nibble & 2) != 0) diff += step >> 1
    if ((nibble & 1) != 0) diff += step >> 2
    val p = clampPred(if ((nibble & 8) != 0) pred - diff else pred + diff)
    (p, clampIdx(idx + IndexTable(nibble & 7)))
  }

  /** One encoder step: quantize (sample − predictor) to a nibble, then
    * advance the SHARED state with [[decodeStep]] (the encoder embeds
    * the decoder — that is what keeps them in lockstep).
    */
  private[graft] def encodeStep(pred: Int, idx: Int, sample: Int): (Int, Int, Int) = {
    val step = StepTable(idx)
    var delta = sample - pred
    var nibble = 0
    if (delta < 0) { nibble = 8; delta = -delta }
    if (delta >= step) { nibble |= 4; delta -= step }
    if (delta >= (step >> 1)) { nibble |= 2; delta -= step >> 1 }
    if (delta >= (step >> 2)) { nibble |= 1 }
    val (p, i) = decodeStep(pred, idx, nibble)
    (nibble, p, i)
  }

  /** The deterministic PCM16 source series (same law as the PCM WAV
    * fixture): s_k = two's-complement of (id·31 + k·17) mod 2^16.
    */
  private[graft] def srcSample(id: Long, k: Int): Int = {
    val u = (((id * 31 + k * 17) % 65536L) + 65536L).toInt % 65536
    if (u >= 32768) u - 65536 else u
  }

  /** A complete one-block WAV (fmt 0x11, mono, 8 kHz, 4-bit): canonical
    * RIFF + fmt(20 incl. samplesPerBlock) + fact(n) + data. Block =
    * 4-byte header (sample0 int16 LE, index0, 0) + nibble words (low
    * nibble first).
    */
  private[graft] def encodeAdpcm(id: Long, n: Int): Array[Byte] = {
    require(n >= 1)
    val dataNibbles = n - 1
    val dataBytes = (dataNibbles + 7) / 8 * 4 // whole 4-byte words
    val blockAlign = 4 + dataBytes
    val samplesPerBlock = dataBytes * 2 + 1
    val out = new java.io.ByteArrayOutputStream(64 + blockAlign)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Int): Unit = { w16(v); w16(v >> 16) }
    out.write("RIFF".getBytes("US-ASCII")); w32(4 + 28 + 12 + 8 + blockAlign)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(20)
    w16(0x11); w16(1); w32(8000); w32(8000 * blockAlign / samplesPerBlock)
    w16(blockAlign); w16(4); w16(2); w16(samplesPerBlock)
    out.write("fact".getBytes("US-ASCII")); w32(4); w32(n)
    out.write("data".getBytes("US-ASCII")); w32(blockAlign)
    var pred = srcSample(id, 0)
    var idx = 0
    w16(pred); w8(idx); w8(0)
    var k = 1
    var cur = 0
    var half = false
    while (k < n) {
      val (nib, p, i) = encodeStep(pred, idx, srcSample(id, k))
      pred = p; idx = i
      if (!half) { cur = nib; half = true }
      else { w8(cur | (nib << 4)); half = false }
      k += 1
    }
    if (half) w8(cur)
    // pad the block to whole words with zero nibbles (never decoded:
    // the fact chunk bounds the sample count)
    var written = (dataNibbles + 1) / 2
    while (written < dataBytes) { w8(0); written += 1 }
    out.toByteArray
  }

  final case class AdpcmStats(
      media_id: Long,
      sample_rate: Long,
      n_samples: Long,
      mean_abs_c: Long,
      sum_sq: Long
  )

  /** Decode one fmt-0x11 WAV payload (mono, one or more blocks).
    * Returns None for anything malformed.
    */
  private[graft] def decodeAdpcm(mediaId: Long, p: Array[Byte]): Option[AdpcmStats] = {
    def u16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
    if (p.length < 12 || new String(p, 0, 4, "US-ASCII") != "RIFF" ||
        new String(p, 8, 4, "US-ASCII") != "WAVE") return None
    var pos = 12
    var fmtOk = false
    var rate = 0L; var blockAlign = 0; var samplesPerBlock = 0
    var total = -1L
    var dataOff = -1; var dataLen = 0
    while (pos + 8 <= p.length) {
      val tag = new String(p, pos, 4, "US-ASCII")
      val len = u32(pos + 4).toInt
      if (len < 0 || pos + 8 + len > p.length) return None
      tag match {
        case "fmt " =>
          if (len < 20 || u16(pos + 8) != 0x11 || u16(pos + 10) != 1 || u16(pos + 22) != 4) return None
          rate = u32(pos + 12)
          blockAlign = u16(pos + 20)
          samplesPerBlock = u16(pos + 26)
          fmtOk = true
        case "fact" => if (len >= 4) total = u32(pos + 8)
        case "data" => dataOff = pos + 8; dataLen = len
        case _ => ()
      }
      pos += 8 + len + (len & 1)
    }
    if (!fmtOk || dataOff < 0 || total < 1 || blockAlign < 5 || samplesPerBlock < 1) return None
    var sa = 0L; var sq = 0L
    var emitted = 0L
    var block = dataOff
    while (emitted < total) {
      if (block + 4 > dataOff + dataLen) return None
      var pred = u16(block).toShort.toInt
      var idx = p(block + 2) & 0xff
      if (idx > 88) return None
      sa += math.abs(pred); sq += pred.toLong * pred; emitted += 1
      var k = 1
      var o = block + 4
      while (k < samplesPerBlock && emitted < total) {
        if (o >= dataOff + dataLen) return None
        val byte = p(o) & 0xff
        val nib = if (k % 2 == 1) byte & 0x0f else { o += 1; byte >> 4 }
        if (k % 2 == 0 && o > dataOff + dataLen) return None
        val (np, ni) = decodeStep(pred, idx, nib)
        pred = np; idx = ni
        sa += math.abs(pred); sq += pred.toLong * pred
        emitted += 1
        k += 1
      }
      block += blockAlign
    }
    Some(AdpcmStats(mediaId, rate, total, sa * 100 / total, sq))
  }

  def adpcmSampleStats(media: Dataset[DeflateMedia.MediaRow]): Dataset[AdpcmStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(m => decodeAdpcm(m.media_id, m.payload)))
  }

  def adpcmTable(s: SparkSession, d: String): Dataset[DeflateMedia.MediaRow] = {
    import s.implicits._
    Tables
      .documents(s, d)
      .select(col("doc_id"))
      .as[Long]
      .mapPartitions(_.map { id =>
        DeflateMedia.MediaRow(id, encodeAdpcm(id, (id % 48 + 9).toInt))
      })
  }

  /** The oracle's per-step expressions, built by SUBSTITUTION (DuckDB
    * lambdas are pure scalar expressions — no lets/subqueries — so
    * shared terms are spliced textually; the engine re-evaluates cheap
    * integer arithmetic instead of binding names).
    */
  private def oracleSql: String = {
    val steps = StepTable.mkString("[", ", ", "]")
    val idxTab = IndexTable.mkString("[", ", ", "]")
    def srcAt(k: String): String = {
      val u = s"(((media_id * 31 + ($k) * 17) % 65536 + 65536) % 65536)"
      s"(CASE WHEN $u >= 32768 THEN $u - 65536 ELSE $u END)"
    }
    val pred = "acc[1]"
    val idx = "acc[2]"
    val s = srcAt("e[1]")
    val step = s"stp[CAST($idx AS INT) + 1]"
    val sgn = s"(CASE WHEN $s - $pred < 0 THEN 1 ELSE 0 END)"
    val ad = s"abs($s - $pred)"
    val b2 = s"(CASE WHEN $ad >= $step THEN 1 ELSE 0 END)"
    val rem1 = s"($ad - $b2 * $step)"
    val b1 = s"(CASE WHEN $rem1 >= $step // 2 THEN 1 ELSE 0 END)"
    val rem2 = s"($rem1 - $b1 * ($step // 2))"
    val b0 = s"(CASE WHEN $rem2 >= $step // 4 THEN 1 ELSE 0 END)"
    val diff = s"($step // 8 + $b2 * $step + $b1 * ($step // 2) + $b0 * ($step // 4))"
    val rawp = s"($pred + (CASE WHEN $sgn = 1 THEN -$diff ELSE $diff END))"
    val newPred = s"greatest(-32768, least(32767, $rawp))"
    val nmag = s"($b2 * 4 + $b1 * 2 + $b0)"
    val newIdx = s"greatest(0, least(88, $idx + itb[CAST($nmag AS INT) + 1]))"
    val s0 = srcAt("0")
    s"""WITH m AS (SELECT doc_id AS media_id, doc_id % 48 + 9 AS n FROM documents),
       |st AS (SELECT $steps AS stp, $idxTab AS itb),
       |f AS (
       |  SELECT media_id, n,
       |    list_reduce(
       |      list_prepend(
       |        [CAST($s0 AS BIGINT), CAST(0 AS BIGINT),
       |         CAST(abs($s0) AS BIGINT), CAST($s0 AS BIGINT) * $s0],
       |      list_transform(range(1, n), x -> [CAST(x AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)])),
       |      (acc, e) -> [
       |        CAST($newPred AS BIGINT),
       |        CAST($newIdx AS BIGINT),
       |        acc[3] + abs($newPred),
       |        acc[4] + CAST($newPred AS BIGINT) * $newPred]) AS r
       |  FROM m, st)
       |SELECT media_id, CAST(8000 AS BIGINT) AS sample_rate, CAST(n AS BIGINT) AS n_samples,
       |  CAST((r[3] * 100) // n AS BIGINT) AS mean_abs_c, CAST(r[4] AS BIGINT) AS sum_sq
       |FROM f""".stripMargin
  }

  private val adpcmQ = Q(
    "multimodal_adpcm_samples",
    (s, d) => adpcmSampleStats(adpcmTable(s, d)).toDF(),
    Some(oracleSql)
  )

  val all: Seq[Q] = Seq(adpcmQ)
}
