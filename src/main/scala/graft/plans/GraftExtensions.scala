package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook registering graft's native expressions as
  * SQL functions (usable from `expr(...)` / `spark.sql(...)`). Installed
  * via `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("graft_normalize_key"),
        new ExpressionInfo(
          classOf[NormalizeKeyExpr].getName,
          "graft_normalize_key"
        ),
        (children: Seq[Expression]) => NormalizeKeyExpr(children.head)
      )
    )
    // Rewrite composed normalizeKey patterns to the fused kernel.
    ext.injectOptimizerRule(_ => FuseNormalizeKey)
  }
}
