package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Static kernel shared by interpreted eval and codegen (a Scala
  * object with no companion class compiles to static forwarders, so
  * generated Java calls it directly). */
object JaccardUtil {
  /** Set Jaccard of two long arrays: copies, sorts, merge-counts —
    * O(n log n), two primitive-array allocations, no boxing, no
    * result-array materialization. Duplicates inside either input
    * are collapsed (set semantics, matching
    * array_intersect/array_union over distinct inputs). */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    merge(xs, ys)
  }

  /** [[jaccard]] for inputs the CALLER already sorted ascending —
    * skips the per-pair O(n log n) sorts, leaving one O(n) merge and
    * two primitive copies. In a similarity join each row's array meets
    * many partners, so sorting once per ROW upstream (array_sort)
    * strictly dominates sorting twice per PAIR here. On q44's shape
    * the end-to-end win is modest (~5%: the join's pair-row
    * materialization — both arrays copied into every joined row — is
    * the larger term, which the posting-list and LSH tiers avoid
    * entirely); the kernel win grows with array length. Undefined on
    * unsorted input. */
  def jaccardPresorted(a: ArrayData, b: ArrayData): Double =
    merge(a.toLongArray(), b.toLongArray())

  private def merge(xs: Array[Long], ys: Array[Long]): Double = {
    var i = 0; var j = 0
    var inter = 0L; var union = 0L
    while (i < xs.length && j < ys.length) {
      val x = xs(i); val y = ys(j)
      union += 1
      if (x == y) {
        inter += 1
        while (i < xs.length && xs(i) == x) i += 1
        while (j < ys.length && ys(j) == y) j += 1
      } else if (x < y) {
        while (i < xs.length && xs(i) == x) i += 1
      } else {
        while (j < ys.length && ys(j) == y) j += 1
      }
    }
    while (i < xs.length) {
      val x = xs(i); union += 1
      while (i < xs.length && xs(i) == x) i += 1
    }
    while (j < ys.length) {
      val y = ys(j); union += 1
      while (j < ys.length && ys(j) == y) j += 1
    }
    if (union == 0L) 0.0 else inter.toDouble / union.toDouble
  }
}

/** Native set-Jaccard over two `array<bigint>` shingle-hash columns.
  * Semantically `size(array_intersect(a,b)) / size(array_union(a,b))`
  * except at the 0/0 corner: two empty inputs yield 0.0 here, where
  * the built-in composition yields NULL — a deliberate divergence
  * (a similarity is always a number; q44 additionally prunes short
  * docs so the corner never ranks). The built-in pair also allocates
  * a hash set AND materializes the intersection/union arrays per pair
  * just to take their sizes; this computes both cardinalities in one
  * sorted merge with two primitive-array copies and nothing else. Used by
  * the n-gram similarity join (q44), where it runs once per candidate
  * pair. Null if either array is null or contains a null element
  * (same convention as [[CosineSimilarity]]); empty∪empty → 0.0.
  *
  * Registered as SQL function `jaccard_sim` via
  * [[graft.extensions.GraftExtensions]].
  */
case class JaccardSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sim"

  private def hasNullElement(a: ArrayData): Boolean = {
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (hasNullElement(x) || hasNullElement(y)) null
    else JaccardUtil.jaccard(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      s"""
      boolean ${ev.isNull}_elem = false;
      for (int $i = 0; $i < $x.numElements(); $i++) {
        if ($x.isNullAt($i)) { ${ev.isNull}_elem = true; break; }
      }
      if (!${ev.isNull}_elem) {
        for (int $i = 0; $i < $y.numElements(); $i++) {
          if ($y.isNullAt($i)) { ${ev.isNull}_elem = true; break; }
        }
      }
      if (${ev.isNull}_elem) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.expressions.JaccardUtil.jaccard($x, $y);
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilarity =
    copy(left = newLeft, right = newRight)
}

/** [[JaccardSimilarity]] whose inputs the caller guarantees are sorted
  * ascending (sort once per row with `array_sort`, not twice per
  * pair) — the similarity-JOIN form of the kernel. Same null
  * convention; undefined result on unsorted input.
  *
  * Registered as SQL function `jaccard_sim_sorted` via
  * [[graft.extensions.GraftExtensions]]. */
case class JaccardSimilaritySorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaccard_sim_sorted expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "jaccard_sim_sorted"

  private def hasNullElement(a: ArrayData): Boolean = {
    var i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (hasNullElement(x) || hasNullElement(y)) null
    else JaccardUtil.jaccardPresorted(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      s"""
      boolean ${ev.isNull}_elem = false;
      for (int $i = 0; $i < $x.numElements(); $i++) {
        if ($x.isNullAt($i)) { ${ev.isNull}_elem = true; break; }
      }
      if (!${ev.isNull}_elem) {
        for (int $i = 0; $i < $y.numElements(); $i++) {
          if ($y.isNullAt($i)) { ${ev.isNull}_elem = true; break; }
        }
      }
      if (${ev.isNull}_elem) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.expressions.JaccardUtil.jaccardPresorted($x, $y);
      }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSimilaritySorted =
    copy(left = newLeft, right = newRight)
}
