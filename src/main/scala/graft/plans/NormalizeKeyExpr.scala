package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native fused key normalization.
  *
  * Computes the same result as `MetadataFunctions.normalizeKey` (strip
  * ASCII control/space/punctuation ranges, trim, lowercase — reference:
  * MetadataUtils.php:416) in a single character pass with no regex
  * machinery. `doGenCode` emits a direct static call, so the expression
  * stays inside whole-stage codegen; on the dedup hot path this removes
  * one compiled-regex scan per record per key.
  */
case class NormalizeKeyExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_key"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}"
      )

  override def nullSafeEval(input: Any): Any =
    NormalizeKeyExpr.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.plans.NormalizeKeyExpr.normalize($c)"
    )

  override protected def withNewChildInternal(newChild: Expression): NormalizeKeyExpr =
    copy(child = newChild)
}

object NormalizeKeyExpr {

  /** Single-pass strip of `[\x00-\x2f\x3a-\x40\x5b-\x60\x7b-\x7f]` followed
    * by `UTF8String.toLowerCase` — the SAME lowercase call Spark's `Lower`
    * makes, so a plan rewritten by [[FuseNormalizeKey]] can never produce a
    * different result from the unfused `lower(...)` it replaced (a
    * `String.toLowerCase(Locale.ROOT)` here would diverge under e.g. a
    * Turkish default JVM locale).
    */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      val strip = c <= 0x2f ||
        (c >= 0x3a && c <= 0x40) ||
        (c >= 0x5b && c <= 0x60) ||
        (c >= 0x7b && c <= 0x7f)
      if (!strip) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString).toLowerCase
  }

  /** String convenience form (tests, [[TitleKeyExpr]]). */
  def normalize(s: String): String =
    normalize(UTF8String.fromString(s)).toString
}
