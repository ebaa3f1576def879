package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Catalyst-native nearest-centroid assignment: argmin of squared L2
  * distance between `vec` and each entry of a `array<struct<cell, cv>>`
  * centroid table, strict `<` so the earliest (lowest, when sorted) cell
  * wins ties; -1 for an empty table.
  *
  * Semantically identical to the composed higher-order-function form
  * ([[graft.operators.KMeans.nearestCellHof]]; asserted equal by
  * KMeansSpec), including skipping null or length-mismatched centroids
  * the way the zip_with form's null distance does. The one residual
  * difference: a null `vec` is SQL NULL here (BinaryExpression null
  * propagation) where the HOF form returns -1. It is one primitive
  * double loop instead of an interpreted aggregate-over-zip_with per
  * centroid — the HOF form measured ~14 ms per 64-dim vector against 16
  * centroids, which would make assignment the bottleneck of every Lloyd
  * pass at corpus scale; this kernel is ~µs. Same
  * native-kernel-plus-composed-oracle split as [[MinHashSigExpr]].
  */
case class NearestCentroidExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_nearest_centroid"

  private def elemIsFloat(dt: DataType): Option[Boolean] = dt match {
    case ArrayType(FloatType, _)  => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _                        => None
  }

  private lazy val vecFloat: Boolean = elemIsFloat(left.dataType).get

  private lazy val centFields: StructType = right.dataType
    .asInstanceOf[ArrayType]
    .elementType
    .asInstanceOf[StructType]

  private lazy val cellIdx: Int = centFields.fieldIndex("cell")
  private lazy val cvIdx: Int = centFields.fieldIndex("cv")
  private lazy val cvFloat: Boolean = elemIsFloat(centFields(cvIdx).dataType).get

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVec = elemIsFloat(left.dataType).isDefined
    val okCents = right.dataType match {
      case ArrayType(st: StructType, _) =>
        st.fieldNames.contains("cell") && st.fieldNames.contains("cv") &&
        st(st.fieldIndex("cell")).dataType == LongType &&
        elemIsFloat(st(st.fieldIndex("cv")).dataType).isDefined
      case _ => false
    }
    if (okVec && okCents) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float|double>, array<struct<cell:bigint, cv:array<float|double>>>), " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})"
      )
  }

  override def nullSafeEval(vec: Any, cents: Any): Any =
    NearestCentroidExpr.compute(
      vec.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData],
      vecFloat,
      cvFloat,
      centFields.length,
      cellIdx,
      cvIdx
    )

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      (v, c) =>
        s"graft.plans.NearestCentroidExpr.compute($v, $c, $vecFloat, $cvFloat, " +
          s"${centFields.length}, $cellIdx, $cvIdx)"
    )

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): NearestCentroidExpr = copy(left = newLeft, right = newRight)
}

object NearestCentroidExpr {

  /** Primitive argmin loop. Distances accumulate left-to-right in double,
    * exactly like the sequential-aggregate HOF form (and the DuckDB
    * oracle's list_sum over small sums), so assignments are
    * bit-deterministic across engines.
    */
  def compute(
      vec: ArrayData,
      cents: ArrayData,
      vecFloat: Boolean,
      cvFloat: Boolean,
      nFields: Int,
      cellIdx: Int,
      cvIdx: Int
  ): Long = {
    val n = vec.numElements()
    var best = -1L
    var bestD = Double.MaxValue
    var c = 0
    val k = cents.numElements()
    while (c < k) {
      // Match the HOF specification on malformed centroids: a null
      // struct/cv, or a cv of a different length, yields a null distance
      // in the zip_with form, and `null < acc.dist` skips that centroid —
      // so skip it here too instead of computing a truncated distance.
      if (!cents.isNullAt(c)) {
        val row = cents.getStruct(c, nFields)
        if (!row.isNullAt(cvIdx)) {
          val cv = row.getArray(cvIdx)
          if (cv.numElements() == n) {
            var d = 0.0
            var i = 0
            while (i < n) {
              val x = if (vecFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
              val y = if (cvFloat) cv.getFloat(i).toDouble else cv.getDouble(i)
              val t = x - y
              d += t * t
              i += 1
            }
            if (d < bestD) {
              bestD = d
              best = row.getLong(cellIdx)
            }
          }
        }
      }
      c += 1
    }
    best
  }
}
