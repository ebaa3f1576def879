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
case class NormalizeKeyExpr(
    child: Expression,
    folding: Seq[(Char, String)] = Nil
) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_key"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}"
      )

  /** Single-char → replacement map in java form for the codegen call.
    * Built once per expression instance; shipped to executors as a plan
    * reference object (the table is a handful of entries, not data).
    */
  @transient private lazy val foldingMap: java.util.HashMap[Character, String] = {
    val m = new java.util.HashMap[Character, String]()
    folding.foreach { case (k, v) => m.put(k, v) }
    m
  }

  override def nullSafeEval(input: Any): Any =
    if (folding.isEmpty) NormalizeKeyExpr.normalize(input.asInstanceOf[UTF8String])
    else NormalizeKeyExpr.normalizeFolded(input.asInstanceOf[UTF8String], foldingMap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (folding.isEmpty)
      defineCodeGen(ctx, ev, c => s"graft.plans.NormalizeKeyExpr.normalize($c)")
    else {
      val mapRef = ctx.addReferenceObj("graftFoldingMap", foldingMap, "java.util.HashMap")
      defineCodeGen(
        ctx,
        ev,
        c => s"graft.plans.NormalizeKeyExpr.normalizeFolded($c, $mapRef)"
      )
    }

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

  /** Folding-table variant: each character is first looked up in the
    * configured fold map (reference: MetadataUtils.php:423 `strtr($str,
    * $this->foldingTable)` — the no-intl normalizeKey path with the
    * default table at :138, minus any `folding_ignore_characters`), THEN
    * the ASCII strip + lowercase run as in [[normalize]]. Replacement
    * values pass through the same strip (a table mapping to punctuation
    * still strips), matching strtr-before-preg_replace order. Multi-char
    * KEYS are not supported (the reference's default table has none);
    * multi-char VALUES ('ß' → 'Ss') are.
    */
  def normalizeFolded(s: UTF8String, table: java.util.HashMap[Character, String]): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      val mapped = table.get(c)
      if (mapped != null) {
        var j = 0
        while (j < mapped.length) {
          val m = mapped.charAt(j)
          if (!stripChar(m)) sb.append(m)
          j += 1
        }
      } else if (!stripChar(c)) sb.append(c)
      i += 1
    }
    UTF8String.fromString(sb.toString).toLowerCase
  }

  @inline private def stripChar(c: Char): Boolean =
    c <= 0x2f ||
      (c >= 0x3a && c <= 0x40) ||
      (c >= 0x5b && c <= 0x60) ||
      (c >= 0x7b && c <= 0x7f)
}
