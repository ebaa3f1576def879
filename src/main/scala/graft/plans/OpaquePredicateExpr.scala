package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Optimizer barrier around a predicate: evaluates exactly as its child
  * but is a node type NO Catalyst rule pattern-matches, so the child's
  * conjuncts can never be split, pushed, or lifted into join keys.
  *
  * Why this exists: the bucketed dedup self-join ([[graft.operators.Dedup
  * .edgesFromExploded]]) must keep its match predicate OUT of the join
  * condition's equi-key extraction — extracted veto equalities (format /
  * hidden / access) widen the join key beyond the stored
  * (`__block_kind`, `__block_key`) bucketing and re-shuffle both sides.
  * The round-7 wrapper (`CASE WHEN p THEN true ELSE false END`) relied on
  * Catalyst NOT simplifying CASE-in-predicate; rules in the
  * SimplifyConditionalsInPredicate family can legally fold it back on a
  * Spark upgrade and silently reintroduce the corpus-side Exchange
  * (ADVICE r7). An unknown expression node cannot be folded by any
  * current or future rewrite that preserves unknown-node semantics —
  * the barrier is structural, not rule-version-coupled.
  *
  * Codegen delegates straight to the child, so the barrier costs nothing
  * at execution: the generated code is identical to the unwrapped
  * predicate's.
  */
case class OpaquePredicateExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_opaque"

  override def eval(input: InternalRow): Any = child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }

  override protected def withNewChildInternal(newChild: Expression): OpaquePredicateExpr =
    copy(child = newChild)
}
