package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.generate.SyntheticOrderSource
import graft.pipeline.OrderPipeline
import graft.schema.OrderSchema

/** Property tests for the synthetic source (SURVEY.md §5.2): every
  * generated order passes the reference validation gate, the money
  * invariants hold exactly, enum domains match generator-function.py,
  * and the weighted distributions land near their nominal weights. */
class GeneratorSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val n = 2000
  private lazy val orders = SyntheticOrderSource.orders(spark, n, seed = 42).cache()

  test("every generated order passes the validation gate (P2 invariant)") {
    val invalid = OrderPipeline.withValidation(orders)
      .filter(size(col("validation_errors")) > 0).count()
    assert(invalid == 0)
  }

  test("money invariants: subtotal = Σitems, total = subtotal+shipping+tax, tax rule") {
    val d = DecimalType(14, 2)
    val bad = orders
      .withColumn("calc_sub", aggregate(col("items"), lit(BigDecimal(0)).cast(d),
        (acc, i) => (acc + i.getField("subtotal").cast(DecimalType(12, 2))).cast(d)))
      .withColumn("calc_tax",
        bround((col("calc_sub") + col("shipping_cost").cast(d)) *
          lit(BigDecimal("0.2")).cast(DecimalType(2, 1)), 2).cast(d))
      .withColumn("calc_total",
        (col("calc_sub") + col("shipping_cost").cast(d) + col("calc_tax")).cast(d))
      .filter(
        col("calc_sub").cast(DoubleType) =!= col("subtotal") ||
        col("calc_tax").cast(DoubleType) =!= col("tax_amount") ||
        col("calc_total").cast(DoubleType) =!= col("total_amount"))
      .count()
    assert(bad == 0)
  }

  test("shipping rule domain (G5): free >= 100, else 4.99 major / 7.99 other") {
    val bad = orders.filter(
      !(col("subtotal") >= 100 && col("shipping_cost") === 0.0 ||
        col("subtotal") < 100 &&
          col("customer_city").isin(OrderSchema.majorCities: _*) &&
          col("shipping_cost") === 4.99 ||
        col("subtotal") < 100 &&
          !col("customer_city").isin(OrderSchema.majorCities: _*) &&
          col("shipping_cost") === 7.99)).count()
    assert(bad == 0)
  }

  test("enum domains and id shapes (generator-function.py:31-46)") {
    assert(orders.filter(!col("status").isin(OrderSchema.orderStatuses: _*)).count() == 0)
    assert(orders.filter(!col("payment_method").isin(OrderSchema.paymentMethods: _*)).count() == 0)
    assert(orders.filter(!col("customer_city").isin(OrderSchema.cities: _*)).count() == 0)
    assert(orders.filter(!col("order_id").rlike("^ORD-\\d{8}-[A-Z0-9]{8}$")).count() == 0)
    assert(orders.filter(!col("customer_id").rlike("^CUST-\\d{8}$")).count() == 0)
    assert(orders.filter(
      !col("customer_email").rlike("^customer\\d{8}@(gmail\\.com|yahoo\\.fr)$")).count() == 0)
  }

  test("items: size matches num_items, sampled without replacement") {
    val bad = orders.filter(size(col("items")) =!= col("num_items")).count()
    assert(bad == 0)
    val dup = orders.filter(
      size(array_distinct(transform(col("items"), i => i.getField("product_id"))))
        =!= size(col("items"))).count()
    assert(dup == 0)
  }

  test("weighted distributions near nominal (G1: 0.5/0.3/0.2 num_items, 0.8/0.2 qty)") {
    val ni = orders.groupBy(col("num_items")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1).toDouble / n).toMap
    assert(math.abs(ni(1) - 0.5) < 0.04, s"num_items=1 freq ${ni(1)}")
    assert(math.abs(ni(2) - 0.3) < 0.04, s"num_items=2 freq ${ni(2)}")
    assert(math.abs(ni(3) - 0.2) < 0.04, s"num_items=3 freq ${ni(3)}")
    val items = SyntheticOrderSource.itemsFlat(spark, n, 42)
    val nItems = items.count().toDouble
    val q1 = items.filter(col("quantity") === 1).count() / nItems
    assert(math.abs(q1 - 0.8) < 0.04, s"quantity=1 freq $q1")
    val disc = items.filter(col("discount_percentage") > 0).count() / nItems
    assert(math.abs(disc - 2.0 / 15) < 0.04, s"discounted freq $disc") // 0.2 · 2/3
  }

  test("typed Dataset boundary binds the generated schema") {
    import SparkTestSession.spark.implicits._
    val ds = OrderPipeline.typedRaw(orders.drop("gid"))
    val o = ds.head()
    assert(o.items.nonEmpty && o.items.size == o.num_items)
    assert(o.total_amount > 0 && o.order_id.startsWith("ORD-"))
    // compile-time field access survives a typed transform
    val revenue = ds.map(_.total_amount).as[Double].head()
    assert(revenue == o.total_amount)
  }

  test("corrupt() injects ~2% per fault class and nothing else") {
    val v = OrderPipeline.withValidation(
      SyntheticOrderSource.corrupt(orders, 42))
    val byErr = v.select(explode(col("validation_errors")).as("e"))
      .groupBy("e").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import OrderSchema.Errors._
    Seq(invalidTotal, missingOrderId, noItems).foreach { e =>
      val f = byErr(e).toDouble / n
      assert(f > 0.01 && f < 0.03, s"$e freq $f")
    }
    // subtotal mismatch fires for both the emptied-items and skewed bands
    val fSub = byErr(inconsistentSubtotal).toDouble / n
    assert(fSub > 0.025 && fSub < 0.055, s"$inconsistentSubtotal freq $fSub")
    val valid = v.filter(size(col("validation_errors")) === 0).count().toDouble / n
    assert(valid > 0.89 && valid < 0.95, s"valid freq $valid")
  }
}
