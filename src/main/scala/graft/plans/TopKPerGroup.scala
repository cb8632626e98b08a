package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BaseOrdering, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator extension tier (SURVEY §4.2 ladder step (c)): top-k
  * rows per group as a first-class plan node instead of the
  * window-function encoding.
  *
  * Why a custom operator: `row_number().over(partitionBy(g).orderBy(o))
  * .filter(≤ k)` forces a FULL sort of every group — at 100 TB that is
  * a total shuffle + sort of the fact table to keep a handful of rows
  * per key. This node keeps a bounded heap of k rows per group in two
  * phases: a partial pass over whatever partitioning the child already
  * has (map-side, cuts the data to ≤ k·groups rows per partition),
  * then a final pass clustered on the group keys. The exchange in
  * between moves only per-partition winners, and nothing is ever
  * globally sorted. Requires a TOTAL sort order (include a unique
  * tie-breaker column) for deterministic results — the same contract
  * row_number needs for a stable oracle.
  *
  * Wiring: [[TopKPerGroupStrategy]] is registered through
  * `SparkSessionExtensions.injectPlannerStrategy` (GraftExtensions);
  * [[TopKPerGroup.apply]] is the DataFrame-level API. PlanSpec pins
  * that the physical plan carries the two heap phases, exactly one
  * exchange, and no Window/Sort.
  */
/** `rankFor`: when set (the [[WindowTopKRewrite]] path), the node also
  * emits the 1-based rank under `order` as that attribute — replacing a
  * `row_number()` window column at its original exprId, so projections
  * and residual predicates above the rewrite keep resolving. */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
                        k: Int, child: LogicalPlan,
                        rankFor: Option[Attribute] = None) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output ++ rankFor
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankFor.toSeq)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroup {
  /** DataFrame API: keep the first `k` rows of each group under
    * `orderBys` (column name → ascending?). The order should be total
    * (add a unique tie-breaker) for deterministic output. */
  def apply(df: DataFrame, groupCols: Seq[String],
            orderBys: Seq[(String, Boolean)], k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val so = orderBys.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.GraftPlanBridge.ofRows(df.sparkSession,
      TopKPerGroup(groupCols.map(attr), so, k, analyzed))
  }
}

/** Physical heap pass. `partial = true` runs on the child's existing
  * partitioning (no distribution requirement); the final pass
  * declares `ClusteredDistribution` on the group keys, so
  * EnsureRequirements inserts exactly one hash exchange between the
  * two — the same partial/final shape as hash aggregation. Per-task
  * state is one k-bounded heap per group seen in that task: the
  * partial pass bounds memory by (groups-per-partition × k) rows, and
  * the final pass by (groups-per-reducer × k). */
case class TopKPerGroupExec(groupExprs: Seq[Expression], order: Seq[SortOrder],
                            k: Int, partial: Boolean,
                            rankFor: Option[Attribute], child: SparkPlan)
    extends UnaryExecNode {
  // only the FINAL phase emits the rank: a partial heap's local ranks
  // would be wrong after the merge, and the final sort of ≤k rows per
  // group is where the true order materializes anyway
  override def output: Seq[Attribute] =
    if (partial) child.output else child.output ++ rankFor
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    if (partial) org.apache.spark.sql.catalyst.expressions.AttributeSet.empty
    else org.apache.spark.sql.catalyst.expressions.AttributeSet(rankFor.toSeq)
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  // row-filtering only — partitioning survives both phases. Without
  // this the final node reports Unknown and downstream group-keyed
  // consumers (the rank window in Similarity.rankTopK) pay a second
  // exchange of the kept rows.
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroupFinal"

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val childOutput = child.output
    val kk = k
    val emitRank = !partial && rankFor.isDefined
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord: BaseOrdering = RowOrdering.create(orderE, childOutput)
      // PriorityQueue dequeues its MAXIMUM under `ord`, i.e. the worst
      // row currently kept — so "keep the k first rows in sort order"
      // is: enqueue while under k, else replace the head when the new
      // row sorts strictly before it
      implicit val rowOrdering: Ordering[InternalRow] =
        (x: InternalRow, y: InternalRow) => ord.compare(x, y)
      val heaps = scala.collection.mutable.LinkedHashMap[
        UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]()
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(pq) =>
            if (pq.size < kk) pq.enqueue(row.copy())
            else if (ord.compare(row, pq.head) < 0) {
              pq.dequeue(); pq.enqueue(row.copy())
            }
          case None =>
            val pq = new scala.collection.mutable.PriorityQueue[InternalRow]()
            pq.enqueue(row.copy())
            heaps.put(key.copy(), pq)
        }
      }
      if (!emitRank) heaps.valuesIterator.flatMap(_.iterator)
      else {
        // per group: drain the heap (dequeue order = worst-first under
        // `ord`), reverse to ascending, zip the 1-based rank. k is
        // small by contract, so this sort touches ≤k already-reduced
        // rows per group — never the input.
        val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
        val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
        val proj = UnsafeProjection.create(outTypes)
        heaps.valuesIterator.flatMap { pq =>
          val ascending: Seq[InternalRow] = pq.dequeueAll.reverse
          ascending.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.update(0, i + 1)
            proj(joined(r, rankRow))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans the logical node as partial → (exchange) → final. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child, rankFor) =>
      val part = TopKPerGroupExec(g, o, k, partial = true, None, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, rankFor, part) :: Nil
    case _ => Nil
  }
}
