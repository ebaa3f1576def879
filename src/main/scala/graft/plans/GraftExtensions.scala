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
    // Spark's internal bloom-filter sketch pair (used by runtime row
    // filtering), surfaced as SQL functions: build a filter over a
    // (small) key set with graft_bloom_agg, broadcast the resulting
    // binary, and prefilter a huge corpus with graft_might_contain —
    // the no-shuffle membership-test shape (e.g. eval-set
    // decontamination at 100 TB). Bloom has no false negatives, so an
    // exact verify of the survivors reproduces the precise join result.
    ext.injectFunction(
      (
        FunctionIdentifier("graft_bloom_agg"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
          "graft_bloom_agg"
        ),
        (children: Seq[Expression]) => {
          import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
          children.length match {
            case 1 => new BloomFilterAggregate(children.head)
            case 2 => new BloomFilterAggregate(children(0), children(1))
            case 3 => new BloomFilterAggregate(children(0), children(1), children(2))
            case n =>
              throw new IllegalArgumentException(
                s"graft_bloom_agg expects 1-3 arguments (value, [estimatedItems, [numBits]]), got $n"
              )
          }
        }
      )
    )
    ext.injectFunction(
      (
        FunctionIdentifier("graft_might_contain"),
        new ExpressionInfo(
          classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
          "graft_might_contain"
        ),
        (children: Seq[Expression]) => {
          if (children.length != 2)
            throw new IllegalArgumentException(
              s"graft_might_contain expects 2 arguments (bloom, value), got ${children.length}"
            )
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            children(0),
            children(1)
          )
        }
      )
    )
    // Rewrite composed normalizeKey patterns to the fused kernel.
    ext.injectOptimizerRule(_ => FuseNormalizeKey)
  }
}
