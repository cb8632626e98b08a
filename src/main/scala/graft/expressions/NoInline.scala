package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity wrapper that pins a projection boundary against optimizer
  * inlining — the engine-level answer to the lambda-CSE trap
  * (SURVEY.md §8.2): Catalyst never common-subexpression-eliminates
  * inside higher-order-function lambdas, yet `PushPredicateThroughNonJoin`
  * and `CollapseProject` happily SUBSTITUTE a projected alias back
  * into consuming expressions. For a filter over shingle lambdas that
  * substitution re-inlines the tokenizer INTO the per-shingle slice —
  * re-splitting the whole text once per shingle, quadratic per doc
  * (measured: the q103 ingest gate dropped 3.9s → 1.2s at sf0.1 when
  * fenced).
  *
  * The wrapper computes nothing: eval and codegen delegate to the
  * child. It reports `deterministic = false` — a white lie with no
  * semantic consequence for a genuinely deterministic child (the
  * value never feeds state, joins, or dedup keys through this
  * library's uses), because both optimizer rules above refuse to
  * cross a non-deterministic projection. Registered as SQL function
  * `no_inline`; reach it with `call_function("no_inline", c)`.
  *
  * Use it ONLY where a measurement shows the optimizer undoing a
  * deliberate materialization — every fence also blocks legitimate
  * predicate pushdown through that projection. */
case class NoInline(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): NoInline =
    copy(child = newChild)
}
