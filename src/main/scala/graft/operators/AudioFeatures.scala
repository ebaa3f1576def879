package graft.operators

import graft.Q
import org.apache.spark.sql.functions._

/** Audio FEATURE EXTRACTION over the decoded-sample tier: a 32-point
  * integer DFT spectral profile per clip (`multimodal_audio_spectrum`)
  * — the routing feature an audio curation pipeline keys on (speech /
  * music / tone / noise live in different spectral shapes) computed
  * with NO floating point in the data path: the 32 cos/sin twiddle
  * factors are quantized to integer micro-units ONCE at plan time and
  * the same literals are baked into the Spark plan AND the DuckDB
  * oracle, so every per-bin energy is an exact int64 both engines
  * agree on bit for bit (no cross-libm trig in the hot path — the
  * lnMu lesson applied to cos).
  *
  * Per clip: signed PCM16 samples come straight off the WAV bytes
  * ([[Multimodal.wavTable]] fixtures; the closed-form sample law lets
  * the oracle replay analytically), the first ≤32 samples feed
  * X(m) = Σ_k s_k · e^{-2πi mk/32} for m = 0..16 (the real-signal
  * half-spectrum), energies are (X_re div 16000)² + (X_im div 16000)²
  * — integer throughout (a double pow would lose exactness past 2⁵³),
  * with the div-16000 prescale bounding re²+im² so the packed argmax ·32 AND the
  * ·1000 permille numerator stay inside int64 at the worst-case sample alignment.
  * The row reports DC energy, the peak non-DC bin (ties → lowest
  * bin), and the peak's share of total AC energy.
  *
  * Scale shape: map-only — 17 bins × ≤32 terms per clip, no shuffle
  * at all before the driver reads results.
  */
object AudioFeatures {

  private val N = 32
  private val Bins = N / 2 // 0..16 inclusive

  /** Quantized twiddles, micro-units — identical literals both engines. */
  private[operators] val CosQ: IndexedSeq[Long] =
    (0 until N).map(j => math.round(math.cos(2 * math.Pi * j / N) * 1e6))
  private[operators] val SinQ: IndexedSeq[Long] =
    (0 until N).map(j => math.round(math.sin(2 * math.Pi * j / N) * 1e6))

  def spectrumOf(media: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val smp =
      s"(${Multimodal.byteAtSql("44 + 2 * k")} + 256 * ${Multimodal.byteAtSql("45 + 2 * k")} " +
        s"- (CASE WHEN ${Multimodal.byteAtSql("45 + 2 * k")} >= 128 THEN 65536 ELSE 0 END))"
    val cqLit = CosQ.mkString("array(", "L, ", "L)")
    val sqLit = SinQ.mkString("array(", "L, ", "L)")
    val re =
      s"aggregate(sequence(0L, nu - 1L), 0L, (a, k) -> a + $smp * element_at($cqLit, cast((m * k) % $N as int) + 1))"
    val im =
      s"aggregate(sequence(0L, nu - 1L), 0L, (a, k) -> a + $smp * element_at($sqLit, cast((m * k) % $N as int) + 1))"
    val perBin = media
      .withColumn("hdr", lower(hex(substring(col("payload"), 1, 44))))
      .withColumn("n", expr(s"${Multimodal.hdrLe32Sql(40)} div 2"))
      .filter(col("n") > 0)
      .withColumn("nu", least(col("n"), lit(N.toLong)))
      .select(
        col("media_id"),
        col("n"),
        col("nu"),
        col("payload"),
        explode(sequence(lit(0L), lit(Bins.toLong))).as("m")
      )
      .withColumn("xre", expr(s"($re) div 16000"))
      .withColumn("xim", expr(s"($im) div 16000"))
      .withColumn("e", expr("xre * xre + xim * xim"))
    perBin
      .groupBy("media_id", "n", "nu")
      .agg(
        sum(when(col("m") === 0, col("e")).otherwise(0L)).as("dc_e"),
        // packed argmax with lowest-bin tie-break over the 16 AC bins:
        // max of e·32 − m keeps the largest energy, smallest m on ties
        max(when(col("m") > 0, col("e") * 32 - col("m")).otherwise(Long.MinValue)).as("pk"),
        sum(when(col("m") > 0, col("e")).otherwise(0L)).as("total_e")
      )
      .select(
        col("media_id"),
        col("n").as("n_samples"),
        col("nu").as("n_used"),
        col("dc_e"),
        pmod(-col("pk"), lit(32L)).as("peak_bin"),
        expr("(pk + pmod(-pk, 32)) div 32").as("peak_e"),
        col("total_e"),
        when(col("total_e") > 0, expr("((pk + pmod(-pk, 32)) div 32 * 1000) div total_e"))
          .otherwise(0L).as("peak_permille")
      )
  }

  private def oracleSql: String = {
    val cqLit = CosQ.mkString("[", ", ", "]")
    val sqLit = SinQ.mkString("[", ", ", "]")
    val u = "((media_id * 31 + k * 17) % 65536)"
    val smp = s"(CASE WHEN $u >= 32768 THEN $u - 65536 ELSE $u END)"
    s"""WITH m AS (SELECT doc_id AS media_id, doc_id % 50 + 10 AS n FROM documents),
       |b AS (SELECT media_id, n, least(n, $N) AS nu, bm.i AS bin
       |  FROM m, (SELECT unnest(range(0, ${Bins + 1})) AS i) bm),
       |xe AS (
       |  SELECT media_id, n, nu, bin,
       |    list_sum(list_transform(range(0, nu), k ->
       |      $smp * ($cqLit)[CAST((bin * k) % $N AS INT) + 1])) AS xre,
       |    list_sum(list_transform(range(0, nu), k ->
       |      $smp * ($sqLit)[CAST((bin * k) % $N AS INT) + 1])) AS xim
       |  FROM b),
       |en AS (
       |  SELECT media_id, n, nu, bin,
       |    (CASE WHEN xre >= 0 THEN xre // 16000 ELSE -((-xre) // 16000) END) *
       |    (CASE WHEN xre >= 0 THEN xre // 16000 ELSE -((-xre) // 16000) END) +
       |    (CASE WHEN xim >= 0 THEN xim // 16000 ELSE -((-xim) // 16000) END) *
       |    (CASE WHEN xim >= 0 THEN xim // 16000 ELSE -((-xim) // 16000) END) AS e
       |  FROM xe),
       |agg AS (
       |  SELECT media_id, n, nu,
       |    sum(CASE WHEN bin = 0 THEN e ELSE 0 END) AS dc_e,
       |    max(CASE WHEN bin > 0 THEN e * 32 - bin ELSE ${Long.MinValue} END) AS pk,
       |    sum(CASE WHEN bin > 0 THEN e ELSE 0 END) AS total_e
       |  FROM en GROUP BY 1, 2, 3)
       |SELECT media_id, CAST(n AS BIGINT) AS n_samples, CAST(nu AS BIGINT) AS n_used,
       |  CAST(dc_e AS BIGINT) AS dc_e,
       |  CAST((-pk % 32 + 32) % 32 AS BIGINT) AS peak_bin,
       |  CAST((pk + ((-pk % 32 + 32) % 32)) // 32 AS BIGINT) AS peak_e,
       |  CAST(total_e AS BIGINT) AS total_e,
       |  CAST(CASE WHEN total_e > 0
       |    THEN ((pk + ((-pk % 32 + 32) % 32)) // 32 * 1000) // total_e ELSE 0 END AS BIGINT) AS peak_permille
       |FROM agg""".stripMargin
  }

  private val spectrumQ = Q(
    "multimodal_audio_spectrum",
    (s, d) => spectrumOf(Multimodal.wavTable(s, d)),
    Some(oracleSql)
  )

  val all: Seq[Q] = Seq(spectrumQ)
}
