package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst-native dedup title key: one imperative pass implementing the
  * reference's word-budget semantics (MetadataUtils.php:369
  * createTitleKey — accumulate words until more than 3 long words or more
  * than 35 chars, including the crossing word, cap 200, then normalize).
  * Same result as `MetadataFunctions.createTitleKey` (the aggregate-fold
  * form, asserted by spec); this avoids per-word struct allocation in the
  * fold and stays inside whole-stage codegen.
  */
case class TitleKeyExpr(
    child: Expression,
    folding: Seq[(Char, String)] = Nil
) extends UnaryExpression {

  @transient private lazy val foldingMap: java.util.HashMap[Character, String] = {
    val m = new java.util.HashMap[Character, String]()
    folding.foreach { case (k, v) => m.put(k, v) }
    m
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_title_key"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}"
      )

  override def nullSafeEval(input: Any): Any =
    if (folding.isEmpty)
      UTF8String.fromString(
        TitleKeyExpr.titleKey(input.asInstanceOf[UTF8String].toString)
      )
    else
      UTF8String.fromString(
        TitleKeyExpr.titleKeyFolded(input.asInstanceOf[UTF8String].toString, foldingMap)
      )

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (folding.isEmpty)
      defineCodeGen(
        ctx,
        ev,
        c =>
          "org.apache.spark.unsafe.types.UTF8String.fromString(" +
            s"graft.plans.TitleKeyExpr.titleKey($c.toString()))"
      )
    else {
      val mapRef = ctx.addReferenceObj("graftFoldingMap", foldingMap, "java.util.HashMap")
      defineCodeGen(
        ctx,
        ev,
        c =>
          "org.apache.spark.unsafe.types.UTF8String.fromString(" +
            s"graft.plans.TitleKeyExpr.titleKeyFolded($c.toString(), $mapRef))"
      )
    }

  override protected def withNewChildInternal(newChild: Expression): TitleKeyExpr =
    copy(child = newChild)
}

object TitleKeyExpr {

  /** Folding-table variant: the word-budget walk runs on the RAW title
    * (like the reference, which builds the key from unnormalized words —
    * MetadataUtils.php:384-400) and the fold applies inside the final
    * normalizeKey (:405 → :423 strtr), so budgets count pre-fold chars.
    */
  def titleKeyFolded(title: String, table: java.util.HashMap[Character, String]): String = {
    val capped = rawKey(title)
    NormalizeKeyExpr
      .normalizeFolded(UTF8String.fromString(capped), table)
      .toString
  }

  def titleKey(title: String): String =
    NormalizeKeyExpr.normalize(rawKey(title))

  /** Word-budget accumulation + 200-char cap, before normalization. */
  private def rawKey(title: String): String = {
    val sb = new java.lang.StringBuilder(math.min(title.length, 64))
    var keyLen = 0
    var longWords = 0
    var i = 0
    var stopped = false
    while (i < title.length && !stopped) {
      val next = title.indexOf(' ', i)
      val end = if (next < 0) title.length else next
      // count code points, not UTF-16 units, to match length()/substring
      // semantics in the fold form (and mb_strlen in the reference)
      val wordLen = title.codePointCount(i, end)
      sb.append(title, i, end)
      keyLen += wordLen
      if (wordLen > 3) longWords += 1
      if (longWords > 3 || keyLen > 35) stopped = true
      i = end + 1
    }
    if (sb.codePointCount(0, sb.length) > 200)
      sb.substring(0, sb.offsetByCodePoints(0, 200))
    else sb.toString
  }
}
