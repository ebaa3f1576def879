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
    ext.injectFunction(
      (
        FunctionIdentifier("graft_minhash_sig"),
        new ExpressionInfo(
          classOf[MinHashSigExpr].getName,
          "graft_minhash_sig"
        ),
        (children: Seq[Expression]) => {
          def intArg(e: Expression, what: String): Int = e match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
            case other =>
              throw new IllegalArgumentException(
                s"graft_minhash_sig $what must be an int literal, got $other"
              )
          }
          val k = if (children.length > 1) intArg(children(1), "k") else 12
          val n = if (children.length > 2) intArg(children(2), "shingleN") else 3
          MinHashSigExpr(children.head, k, n)
        }
      )
    )
    // Rewrite composed normalizeKey patterns to the fused kernel.
    ext.injectOptimizerRule(_ => FuseNormalizeKey)
  }
}
