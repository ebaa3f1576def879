package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression (reference:
  * MetadataUtils.php:902 `normalizeUnicode` — NFC/NFD/NFKC/NFKD with NFC
  * as the fallback form, empty input passed through).
  *
  * Spark has no built-in normalizer function; a Scala UDF would leave
  * whole-stage codegen and serialize through an encoder per row. Like
  * [[NormalizeKeyExpr]], `doGenCode` emits a direct static call so the
  * expression stays inside the generated code.
  */
case class NormalizeUnicodeExpr(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_unicode"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}"
      )

  override def nullSafeEval(input: Any): Any =
    NormalizeUnicodeExpr.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"""graft.plans.NormalizeUnicodeExpr.normalize($c, "$form")"""
    )

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicodeExpr =
    copy(child = newChild)
}

object NormalizeUnicodeExpr {

  private def formOf(name: String): Normalizer.Form = name match {
    case "NFD"  => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case _      => Normalizer.Form.NFC
  }

  def normalize(s: UTF8String, form: String): UTF8String = {
    val str = s.toString
    if (str.isEmpty) s
    else UTF8String.fromString(Normalizer.normalize(str, formOf(form)))
  }
}
