package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Literal, Lower, RegExpReplace, StringTrim}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule fusing the composed key-normalization pattern
  * `lower(trim(regexp_replace(c, KEY_STRIP_RE, '')))` into the native
  * single-pass [[NormalizeKeyExpr]]. Any query written with
  * `MetadataFunctions.normalizeKey` (or the equivalent raw SQL) gets the
  * fused kernel automatically when GraftExtensions is installed — the
  * optimizer, not the query author, picks the efficient form.
  */
object FuseNormalizeKey extends Rule[LogicalPlan] {

  private val KeyStripRe =
    UTF8String.fromString("[\\x00-\\x2f\\x3a-\\x40\\x5b-\\x60\\x7b-\\x7f]")
  private val Empty = UTF8String.fromString("")

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Lower(
            StringTrim(
              RegExpReplace(
                child,
                Literal(re: UTF8String, StringType),
                Literal(rep: UTF8String, StringType),
                pos
              ),
              None
            )
          )
          if re == KeyStripRe && rep == Empty &&
            // only the whole-string form (replace from position 1)
            pos == Literal(1) =>
        NormalizeKeyExpr(child)
    }
}
