package graft.operators

import graft.{Q, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Johnson-Lindenstrauss random projection with database-friendly ±1
  * entries (Achlioptas 2003): embeddings project 64 → 16 dims through a
  * FIXED sign matrix, the cheap first stage before any ANN index when
  * the raw dimensionality (or a concatenation of feature blocks) is too
  * wide to bucket directly. With s(j,·) ∈ {−1,+1}ᵈ,
  * E‖Sx‖² = d_out·‖x‖², so `distortion` = ‖proj‖²/(d_out·‖x‖²) should
  * concentrate near 1 — emitted per row so a pipeline can monitor the
  * JL guarantee instead of assuming it.
  *
  * The sign matrix is generated ONCE at plan-build time from a seeded
  * deterministic hash and embedded as literals in BOTH the Spark plan
  * and the generated oracle SQL — the two engines share the matrix by
  * construction rather than by agreeing on a hash function. Scale
  * shape: map-only (one scan, 16 fused dot products per row, no
  * shuffle); the matrix is 16×64 plan literals, not data.
  */
object RandomProjection {

  private val DIn = 64
  private val DOut = 16

  /** ±1.0 sign for (outDim j, inDim i), from MurmurHash3 of a tagged
    * key — stable across JVMs (string hashing is specified by the Scala
    * library, no runtime seed).
    */
  private[graft] def sign(j: Int, i: Int): Double =
    if ((scala.util.hashing.MurmurHash3.stringHash(s"rp:$j:$i") & 1) == 0) 1.0 else -1.0

  private val signRows: IndexedSeq[IndexedSeq[Double]] =
    (0 until DOut).map(j => (0 until DIn).map(i => sign(j, i)))

  /** Projection coordinate ×10⁴ as an exact long — array/float columns
    * are driver-unsafe in the oracle compare, so the vector crosses the
    * boundary as scaled-integer CSV and the distortion numerator stays
    * in exact integer arithmetic.
    */
  private def projDim(vec: Column, j: Int): Column =
    round(VectorFunctions.dot(vec, typedLit(signRows(j))) * 10000).cast("bigint")

  private val rpQ = Q(
    "embed_random_projection",
    (s, d) => {
      val emb = Tables.embeddings(s, d)
      val ps = array((0 until DOut).map(j => projDim(col("embedding"), j)): _*)
      emb
        .select(col("vec_id"), col("embedding"), ps.as("ps"))
        .select(
          col("vec_id"),
          array_join(transform(col("ps"), _.cast("string")), ",").as("proj"),
          // Distortion of the scaled projections vs d_out·‖x‖²·10⁸: the
          // numerator Σv² is an exact bigint (v ≤ ~10⁶ ⇒ Σv² ≤ ~10¹³).
          round(
            aggregate(col("ps"), lit(0L), (acc, v) => acc + v * v).cast("double") /
              (lit(1.0e8) * lit(DOut) * VectorFunctions.dot(col("embedding"), col("embedding"))),
            4
          ).as("distortion")
        )
    },
    Some {
      def rowLit(j: Int): String = signRows(j).mkString("[", ", ", "]")
      val projCols = (0 until DOut)
        .map(j =>
          s"cast(round(list_dot_product(cast(embedding as double[]), ${rowLit(j)}) * 10000) as bigint)"
        )
        .mkString("[", ",\n    ", "]")
      s"""WITH p AS (SELECT vec_id, embedding, $projCols AS ps FROM embeddings)
         |SELECT vec_id,
         |  array_to_string(ps, ',') AS proj,
         |  round(cast(list_sum(list_transform(ps, v -> v * v)) as double) /
         |        (1.0e8 * $DOut * list_dot_product(cast(embedding as double[]), cast(embedding as double[]))), 4) AS distortion
         |FROM p""".stripMargin
    }
  )

  val all: Seq[Q] = Seq(rpQ)
}
