package graft.plans

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PHP `(string)$float` under the default `precision=14` ini setting
  * (zend_gcvt): the EXACT binary double rounded to 14 significant
  * decimal digits (half-even, like printf %.14G), shortest form, no
  * trailing zeros, no exponent for the coordinate magnitudes this
  * serves. Used by the MARC geo fields (Record/Marc.php:2422 builds
  * `ENVELOPE(...)`/`POINT(...)` strings whose digits the reference's own
  * fixtures pin, e.g. `60.233333333333` vs `60.233472222223` — one
  * rounds down, one up, distinguishable only on the exact binary value).
  *
  * Spark's `round()` goes through `BigDecimal.valueOf` (the SHORTEST
  * decimal representation) and half-up, which flips exactly those
  * boundary digits — hence a native expression over
  * `new BigDecimal(double)` (exact) instead of a Column formula.
  */
case class PhpFloatStringExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_php_float_string"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a double argument, got ${child.dataType}"
      )

  override def nullSafeEval(input: Any): Any =
    PhpFloatStringExpr.format(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PhpFloatStringExpr.format($c)")

  override protected def withNewChildInternal(newChild: Expression): PhpFloatStringExpr =
    copy(child = newChild)
}

object PhpFloatStringExpr {

  private val Precision14 = new MathContext(14, RoundingMode.HALF_EVEN)

  def format(d: Double): UTF8String = {
    if (d.isNaN) return UTF8String.fromString("NAN")
    if (d.isInfinite) return UTF8String.fromString(if (d > 0) "INF" else "-INF")
    val rounded = new JBigDecimal(d).round(Precision14)
    val plain = rounded.stripTrailingZeros
    // stripTrailingZeros can leave scientific notation (1E+2); PHP prints
    // plain decimal up to precision, then scientific — coordinates and
    // the envelope math never leave the plain range.
    UTF8String.fromString(plain.toPlainString)
  }
}
