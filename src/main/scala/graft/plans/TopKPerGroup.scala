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
/** Which SQL ranking function's ≤k contract the node implements.
  * [[RankKind.RowNum]] keeps exactly k rows per group (total order —
  * the caller supplies a tie-breaker). The tie-aware kinds keep MORE
  * than k rows when ties land on the boundary, exactly as their window
  * functions would:
  *  - [[RankKind.RankTies]] (`rank()`): a row is kept iff fewer than k
  *    rows sort strictly before it — boundary ties are all retained;
  *  - [[RankKind.Dense]] (`dense_rank()`): rows of the k smallest
  *    DISTINCT order-key values are kept.
  * State stays bounded by the OUTPUT size, not the input: per task the
  * tie-aware kinds hold at most k distinct order keys per group (plus
  * the boundary key's tied rows — rows the operator must emit anyway),
  * so the partial/final two-phase shape and its scale story carry over
  * unchanged. */
sealed trait RankKind
object RankKind {
  /** row_number(): exactly k rows, total order. */
  case object RowNum extends RankKind
  /** rank(): ties share a rank, next rank skips; boundary ties kept. */
  case object RankTies extends RankKind
  /** dense_rank(): ties share a rank, no gaps; k distinct keys kept. */
  case object Dense extends RankKind
}

/** `rankFor`: when set (the [[WindowTopKRewrite]] path), the node also
  * emits the 1-based rank under `order` as that attribute — replacing a
  * `row_number()`/`rank()`/`dense_rank()` window column at its original
  * exprId, so projections and residual predicates above the rewrite
  * keep resolving. `rankKind` selects which ranking contract both the
  * retention bound and the emitted rank follow. */
case class TopKPerGroup(groupExprs: Seq[Expression], order: Seq[SortOrder],
                        k: Int, child: LogicalPlan,
                        rankFor: Option[Attribute] = None,
                        rankKind: RankKind = RankKind.RowNum) extends UnaryNode {
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
                            rankFor: Option[Attribute], child: SparkPlan,
                            rankKind: RankKind = RankKind.RowNum)
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
    val kind = rankKind
    val emitRank = !partial && rankFor.isDefined
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, childOutput)
      val ord: BaseOrdering = RowOrdering.create(orderE, childOutput)
      kind match {
        case RankKind.RowNum =>
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

        case _ =>
          // Tie-aware kinds: per group, a TreeMap from a representative
          // row of each DISTINCT order-key value (compared under `ord` —
          // tied rows collide on the key) to the buffer of its tied
          // rows. Retention invariants:
          //  - rank(): drop the max key while the rows of strictly
          //    smaller keys already number ≥ k (those rows would rank
          //    > k); ⇒ at most k+… keys where every kept key still has
          //    a rank ≤ k, and #keys ≤ k+0 after eviction (each
          //    non-max key holds ≥ 1 row);
          //  - dense_rank(): keep at most k distinct keys.
          // Boundary-tied rows are all retained — they are OUTPUT, not
          // overhead, so per-task state stays output-bounded.
          val isDense = kind == RankKind.Dense
          val cmp = new java.util.Comparator[InternalRow] {
            override def compare(a: InternalRow, b: InternalRow): Int =
              ord.compare(a, b)
          }
          final class GroupState {
            val keys = new java.util.TreeMap[InternalRow,
              scala.collection.mutable.ArrayBuffer[InternalRow]](cmp)
            var total = 0 // rows currently held (rank() bookkeeping)
            def insert(row: InternalRow): Unit = {
              val last = keys.lastEntry()
              if (last != null) {
                val c = cmp.compare(row, last.getKey)
                if (c > 0) {
                  // beyond the current max key: prunable without insert
                  // when the bound is already saturated
                  if (isDense) { if (keys.size >= kk) return }
                  else if (total >= kk) return
                }
              }
              val existing = keys.get(row)
              if (existing != null) { existing += row.copy(); total += 1 }
              else {
                val r = row.copy()
                keys.put(r, scala.collection.mutable.ArrayBuffer(r))
                total += 1
              }
              evict()
            }
            private def evict(): Unit = {
              var last = keys.lastEntry()
              while (last != null && keys.size > 1 && {
                if (isDense) keys.size > kk
                else total - last.getValue.size >= kk
              }) {
                total -= last.getValue.size
                keys.remove(last.getKey)
                last = keys.lastEntry()
              }
            }
          }
          val groups = scala.collection.mutable.LinkedHashMap[UnsafeRow, GroupState]()
          iter.foreach { row =>
            val key = keyProj(row)
            groups.get(key) match {
              case Some(st) => st.insert(row)
              case None =>
                val st = new GroupState
                st.insert(row)
                groups.put(key.copy(), st)
            }
          }
          if (!emitRank)
            groups.valuesIterator.flatMap { st =>
              import scala.jdk.CollectionConverters._
              st.keys.values().asScala.iterator.flatMap(_.iterator)
            }
          else {
            val joined = new org.apache.spark.sql.catalyst.expressions.JoinedRow
            val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
            val proj = UnsafeProjection.create(outTypes)
            groups.valuesIterator.flatMap { st =>
              import scala.jdk.CollectionConverters._
              var rowsBefore = 0
              var keyIdx = 0
              st.keys.values().asScala.iterator.flatMap { tied =>
                val rank = if (isDense) keyIdx + 1 else rowsBefore + 1
                keyIdx += 1
                rowsBefore += tied.size
                tied.iterator.map { r =>
                  rankRow.update(0, rank)
                  proj(joined(r, rankRow))
                }
              }
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
    case TopKPerGroup(g, o, k, child, rankFor, kind) =>
      val part = TopKPerGroupExec(g, o, k, partial = true, None,
        planLater(child), kind)
      TopKPerGroupExec(g, o, k, partial = false, rankFor, part, kind) :: Nil
    case _ => Nil
  }
}
