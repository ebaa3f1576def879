package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns. All arithmetic
  * is carried out in double precision with strictly sequential (left-to-
  * right) accumulation, so results are bit-deterministic across partitions
  * and engines — a requirement for the oracle compare and for reproducible
  * retrieval at scale.
  */
object VectorFunctions {

  /** Dot product via zip_with + sequential aggregate (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v
    )

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * derived from one md5 hex char, uniform over {-7.5 … 7.5}/7.5-ish —
    * only the sign structure matters for sign-LSH. Expressible in ANSI SQL
    * (md5 + hex-char arithmetic), so bucket assignments are reproducible
    * in any engine.
    */
  def planeWeight(plane: Column, dim: Column): Column =
    conv(substring(md5(concat(plane.cast("string"), lit(":"), dim.cast("string"))), 1, 1), 16, 10)
      .cast("double") - 7.5

  /** Sign-LSH bucket: `planes` sign bits of hyperplane projections,
    * concatenated to a bit-string bucket key. Vectors in the same bucket
    * are ANN candidates; the downstream candidate join groups by bucket —
    * a hash shuffle with bounded fanout, the scale path for ANN.
    */
  def signLshBucket(vec: Column, planes: Int): Column =
    array_join(
      transform(
        sequence(lit(0), lit(planes - 1)),
        p => {
          val proj = aggregate(
            zip_with(
              vec,
              sequence(lit(0), size(vec) - 1),
              (x, d) => x.cast("double") * planeWeight(p, d)
            ),
            lit(0.0),
            (acc, v) => acc + v
          )
          when(proj >= 0, lit("1")).otherwise(lit("0"))
        }
      ),
      ""
    )
}
