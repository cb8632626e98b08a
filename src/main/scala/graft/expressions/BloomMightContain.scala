package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] (the PUBLIC sketch
  * API — `df.stat.bloomFilter` builds one distributed; Spark's own
  * `might_contain` expression is registry-internal). The filter is
  * deserialized ONCE per expression instance from the foldable bloom
  * argument and reused across rows — the per-row work is the sketch's
  * k hash probes.
  *
  * Gate semantics on null: a null probe value returns false (a null
  * gram carries no membership evidence), unlike Spark's internal
  * expression which propagates null — this one feeds boolean gates,
  * not tri-valued SQL logic. Registered as SQL function
  * `bloom_might_contain(bloom_bytes, long_value)`. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType != BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom argument must be BINARY, got ${left.dataType}")
    else if (!left.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bloom argument must be a constant (literal) sketch")
    else if (left.eval(null) == null)
      // catch a null sketch at ANALYSIS time — evaluable since foldable;
      // otherwise every task would throw on its first row
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "bloom argument must not be a null sketch")
    else right.dataType match {
      // integral probes widen at eval (ImplicitCastInputTypes would do
      // this, but its AbstractDataType signature is private[sql])
      case LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"probe argument must be an integral type, got $other")
    }
  }

  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, "bloom_might_contain: bloom sketch is null")
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    right.eval(input) match {
      case null => false
      case l: Long => filter.mightContainLong(l)
      case n: Number => filter.mightContainLong(n.longValue())
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
