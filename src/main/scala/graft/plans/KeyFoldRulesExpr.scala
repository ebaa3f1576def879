package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's DEFAULT key-folding rules as a native expression.
  *
  * When PHP intl is available the reference normalizes dedup keys with an
  * ICU transliterator built from `MetadataUtils.php:159`
  * `':: NFD; :: lower; :: Latin; :: [^[:letter:] [:number:]] Remove; :: NFKC;'`
  * (`:416` normalizeKey short-circuits to it, `:1234`
  * getKeyFoldingTransliterator). For Latin-script input — the workload
  * the folding rules exist for — the pipeline reduces exactly to:
  * NFD decompose → lowercase → drop every char that is not a Unicode
  * letter or digit (this removes the combining marks NFD split off, plus
  * all punctuation/whitespace) → NFKC recompose. All four stages are in
  * the JDK (`java.text.Normalizer` + `Character` classes), so this
  * expression reproduces the ICU result without ICU for any input whose
  * script is already Latin. The `:: Latin;` stage also ROMANIZES other
  * scripts (Cyrillic→Latin etc.); that requires ICU's transliteration
  * data and is out of scope — non-Latin letters pass through folded only
  * by NFD/NFKC here, documented as the one divergence.
  */
case class KeyFoldRulesExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_key_fold_rules"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${child.dataType}"
      )

  override def nullSafeEval(input: Any): Any =
    KeyFoldRulesExpr.fold(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.KeyFoldRulesExpr.fold($c)")

  override protected def withNewChildInternal(newChild: Expression): KeyFoldRulesExpr =
    copy(child = newChild)
}

object KeyFoldRulesExpr {

  def fold(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.isEmpty) return s
    // NFD splits letters from their combining marks; marks are category
    // Mn/Mc/Me — not letters, not digits — so the Remove stage strips
    // them, which is exactly how the rules fold 'ä' → 'a'.
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      if (Character.isLetter(cp) || Character.isDigit(cp))
        sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFKC))
  }

  /** String convenience form (tests). */
  def fold(s: String): String = fold(UTF8String.fromString(s)).toString
}
