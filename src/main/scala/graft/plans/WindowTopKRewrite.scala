package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (VERDICT r4 item 2): rewrites the window-function
  * encoding of top-k-per-group —
  *
  * {{{ Filter(rn <= k, Window(row_number() over (partition by g order by o) AS rn, child)) }}}
  *
  * — into the native [[TopKPerGroup]] plan node, so every user query
  * written in the standard SQL idiom gets the bounded-heap physical
  * plan (partial/final heaps, one exchange, NO per-group full sort)
  * without calling the bespoke DataFrame API. At 100 TB the window
  * form totally sorts the fact table to keep a handful of rows per
  * key; the heap form moves only per-partition winners.
  *
  * The rank column stays available: the rewritten node re-emits it
  * (same exprId) by sorting each final ≤k-row heap — O(k log k) per
  * group on already-reduced data — so projections above that kept
  * `rn` (like q07's) are untouched and residual predicates on it
  * still evaluate.
  *
  * Fires only when the shape is exactly rewritable: a single
  * ranking window expression — `row_number()`, `rank()` (boundary
  * ties retained, VERDICT r5 item 2) or `dense_rank()` (k smallest
  * distinct keys) — non-empty partition keys (the global case is
  * TakeOrderedAndProject territory), and at least one
  * upper-bound conjunct on the rank with a literal (`rn <= k`,
  * `rn < k`, `k >= rn`, `k > rn`, `rn = 1`). All other conjuncts are
  * kept in a residual Filter above the node. Runs inside the operator
  * optimization fixpoint, after predicate pushdown has collapsed the
  * intermediate Projects, and removes the Window before Spark's own
  * InferWindowGroupLimit (which still sorts) could claim the pattern.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def literalLong(e: Expression): Option[Long] = e match {
    case Literal(v: Byte, _) => Some(v.toLong)
    case Literal(v: Short, _) => Some(v.toLong)
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(v: Long, _) => Some(v)
    case _ => None
  }

  /** The rank reference may sit under a cast inserted by a comparison
    * against a wider literal (`rn <= 3L` → `cast(rn as bigint)`). */
  private def isRankRef(e: Expression, rankId: ExprId): Boolean = e match {
    case a: AttributeReference => a.exprId == rankId
    case c: Cast => isRankRef(c.child, rankId)
    case _ => false
  }

  /** k implied by one conjunct, when it is an upper bound on the rank. */
  private def rankBound(c: Expression, rankId: ExprId): Option[Long] = c match {
    case LessThanOrEqual(r, l) if isRankRef(r, rankId) => literalLong(l)
    case LessThan(r, l) if isRankRef(r, rankId) => literalLong(l).map(_ - 1)
    case GreaterThanOrEqual(l, r) if isRankRef(r, rankId) => literalLong(l)
    case GreaterThan(l, r) if isRankRef(r, rankId) => literalLong(l).map(_ - 1)
    case EqualTo(r, l) if isRankRef(r, rankId) => literalLong(l).filter(_ == 1L)
    case EqualTo(l, r) if isRankRef(r, rankId) => literalLong(l).filter(_ == 1L)
    case _ => None
  }

  /** All three SQL ranking functions rewrite; the node's `rankKind`
    * carries the tie contract (rank keeps boundary ties, dense_rank
    * keeps the k smallest distinct keys). */
  private def kindOf(fn: Expression): Option[RankKind] = fn match {
    case _: RowNumber => Some(RankKind.RowNum)
    case _: Rank => Some(RankKind.RankTies)
    case _: DenseRank => Some(RankKind.Dense)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(fn, _), _)),
          part, order, child, _))
        if part.nonEmpty && order.nonEmpty && kindOf(fn).isDefined =>
      val rankId = alias.exprId
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(c => rankBound(c, rankId))
      val k = if (bounds.isEmpty) 0L else bounds.min
      if (k < 1L || k > Int.MaxValue) f
      else {
        val topk = TopKPerGroup(part, order, k.toInt, child,
          rankFor = Some(alias.toAttribute), rankKind = kindOf(fn).get)
        val residual = conjuncts.filter(c => rankBound(c, rankId).isEmpty)
        if (residual.isEmpty) topk else Filter(residual.reduce(And), topk)
      }
  }
}
