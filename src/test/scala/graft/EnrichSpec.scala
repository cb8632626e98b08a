package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.OrderEnrich
import graft.enrich.OrderEnrich._

/** Unit tests for the enrichment Column functions — the reference's
  * edge semantics (processor.py:18-161): classification boundaries,
  * zero-subtotal guards, the empty-discount struct, the weekend
  * boundary, and the validation gate's tolerance. */
class EnrichSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def item(cat: String, qty: Int, price: Double, dpct: Int,
                   damt: Double, sub: Double) =
    Item("P1", "N", cat, qty, price, dpct, damt, sub)

  test("classifyOrderValue thresholds (processor.py:18-26)") {
    val rows = Seq(1000.0, 999.99, 500.0, 499.99, 100.0, 99.99, 0.0)
      .toDF("t").select(classifyOrderValue($"t")).as[String].collect()
    assert(rows.toSeq == Seq("premium", "high_value", "high_value",
      "medium_value", "medium_value", "low_value", "low_value"))
  }

  test("classifyCustomerSegment: bulk OR high-total → vip (processor.py:29-35)") {
    val rows = Seq((10, 50.0), (9, 1000.0), (9, 999.99), (1, 300.0), (1, 299.99))
      .toDF("q", "t").select(classifyCustomerSegment($"q", $"t")).as[String].collect()
    assert(rows.toSeq == Seq("vip", "vip", "regular", "regular", "occasional"))
  }

  test("deliveryPriority additive score (processor.py:88-102)") {
    val rows = Seq(
      (500.0, "Paris", "shipped"),    // 3+2+2=7 urgent
      (499.0, "Paris", "shipped"),    // 0+2+2=4 normal
      (500.0, "Nice", "pending"),     // 3 normal
      (100.0, "Paris", "pending"),    // 2 standard
      (100.0, "Nice", "cancelled"))   // 0 standard
      .toDF("t", "c", "s")
      .select(deliveryPriority($"t", $"c", $"s")).as[String].collect()
    assert(rows.toSeq == Seq("urgent", "normal", "normal", "standard", "standard"))
  }

  test("profitAnalysis fold: 0.6 cost model, guarded margin (processor.py:38-48)") {
    val df = Seq(OrderItems(Seq(item("Shoes", 1, 100.0, 10, 10.0, 90.0)))).toDF()
    val r = df.select(profitAnalysis($"items").as("p")).select("p.*").head()
    assert(r.getDouble(0) == 60.0)   // estimated_cost
    assert(r.getDouble(1) == 90.0)   // revenue
    assert(r.getDouble(2) == 30.0)   // profit
    assert(r.getDouble(3) == 33.33)  // margin: 30/90*100 = 33.33…
  }

  test("discountPattern: zeroed struct when nothing is discounted (processor.py:70-75)") {
    val none = Seq(OrderItems(Seq(item("Shoes", 1, 100.0, 0, 0.0, 100.0)))).toDF()
    val r0 = none.select(discountPattern($"items").as("d")).select("d.*").head()
    assert(r0 == Row(false, 0, 0.0, 0.0))

    val some = Seq(OrderItems(Seq(
      item("Shoes", 1, 100.0, 5, 5.0, 95.0),
      item("Laptops", 1, 100.0, 10, 10.0, 90.0),
      item("Smartphones", 1, 100.0, 0, 0.0, 100.0)))).toDF()
    val r1 = some.select(discountPattern($"items").as("d")).select("d.*").head()
    assert(r1 == Row(true, 2, 7.5, 15.0)) // avg of {5,10}; savings over ALL items
  }

  test("productMix groups by lowercased category, insertion-ordered (processor.py:51-64)") {
    val df = Seq(OrderItems(Seq(
      item("Shoes", 2, 10.0, 0, 0.0, 20.0),
      item("shoes", 1, 10.0, 0, 0.0, 10.0),
      item("Laptops", 1, 50.0, 0, 0.0, 50.0)))).toDF()
    val m = df.select(productMix($"items").as("m"))
      .select(explode($"m").as(Seq("cat", "v"))).select("cat", "v.*")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(m.toSeq == Seq(("shoes", 2, 3L, 30.0), ("laptops", 1, 1L, 50.0)))
  }

  test("productMixExploded (Option B) equals the map form row-for-row") {
    val orders = graft.generate.SyntheticOrderSource.orders(spark, 300, seed = 13)
    val viaMap = orders
      .select($"order_id", explode(productMix($"items")).as(Seq("category", "m")))
      .select($"order_id", $"category", $"m.count".as("n_lines"),
        $"m.quantity".as("quantity"), $"m.revenue".as("revenue"))
    val viaGroup = OrderEnrich.productMixExploded(orders)
    assert(viaMap.count() == viaGroup.count())
    assert(viaMap.exceptAll(viaGroup).isEmpty)
    assert(viaGroup.exceptAll(viaMap).isEmpty)
  }

  test("productMixMap (wide-order form) equals the narrow map incl. key order") {
    val orders = graft.generate.SyntheticOrderSource.orders(spark, 300, seed = 13)
    // to_json serializes map entries in storage order, so string
    // equality pins both values and Python-dict insertion order
    val joinedForm = OrderEnrich.productMixMap(orders)
      .select($"order_id", to_json($"_product_mix").as("bj"))
    val narrow = orders
      .select($"order_id", to_json(productMix($"items")).as("nj"))
    val joined = joinedForm.join(narrow, Seq("order_id"))
    assert(joined.count() == 300)
    assert(joined.filter($"bj" =!= $"nj").count() == 0)
  }

  test("productMixMap empty-items asymmetry: absent row, recovered by the documented left join") {
    val df = Seq(
      ("O1", Seq(item("Shoes", 1, 10.0, 0, 0.0, 10.0))),
      ("O2", Seq.empty[Item])).toDF("order_id", "items")
    val m = OrderEnrich.productMixMap(df)
    // no posexplode rows for O2 → no map row (the scaladoc's caveat)
    assert(m.count() == 1)
    // the documented recovery: left join + coalesce-to-empty-map
    // reproduces the narrow form exactly, {} included
    val emptyMix = map_from_arrays(
      array().cast("array<string>"),
      array().cast("array<struct<count:int,quantity:bigint,revenue:double>>"))
    val joined = df.join(m, Seq("order_id"), "left")
      .select($"order_id",
        to_json(coalesce($"_product_mix", emptyMix)).as("bj"))
    val narrow = df.select($"order_id", to_json(productMix($"items")).as("nj"))
    val diff = joined.join(narrow, Seq("order_id"))
      .filter($"bj" =!= $"nj").count()
    assert(diff == 0)
  }

  test("validationErrors mirrors processor.py:105-119 incl. 0.01 tolerance") {
    def errs(orderId: String, items: Seq[Item], sub: Double, total: Double): Seq[String] = {
      Seq(ValOrder(orderId, items, sub, total)).toDF()
        .select(validationErrors($"order_id", $"items", $"subtotal", $"total_amount"))
        .as[Seq[String]].head()
    }
    val ok = Seq(item("Shoes", 1, 100.0, 0, 0.0, 100.0))
    assert(errs("O1", ok, 100.0, 120.0).isEmpty)
    assert(errs("O1", ok, 100.0, 0.0) == Seq("Montant total invalide"))
    assert(errs("", ok, 100.0, 120.0) == Seq("ID commande manquant"))
    assert(errs("O1", Seq(), 100.0, 120.0) ==
      Seq("Aucun article", "Sous-total incohérent"))
    // the 0.01 tolerance is a FLOAT comparison, exactly as in the
    // reference: |100.0 − 100.01| is 0.01000000000000512 in binary,
    // which exceeds 0.01 — Python flags it and so do we. A clean
    // sub-tolerance difference (1/128 = 0.0078125, exact in binary)
    // passes.
    assert(errs("O1", ok, 100.01, 120.0) == Seq("Sous-total incohérent"))
    assert(errs("O1", ok, 100.0078125, 120.0).isEmpty)
    assert(errs("O1", ok, 100.02, 120.0) == Seq("Sous-total incohérent"))
  }

  test("weekend boundary: Fri/Sat/Sun (processor.py:158)") {
    val rows = Seq("2026-07-31", "2026-08-01", "2026-08-02", "2026-08-03")
      .toDF("d")
      .select(isWeekend(to_timestamp($"d")), englishDayName(to_timestamp($"d")))
      .as[(Boolean, String)].collect()
    assert(rows.toSeq == Seq((false, "Friday"), (true, "Saturday"),
      (true, "Sunday"), (false, "Monday")))
  }

  test("roundRatio2 is deterministic IEEE half-up on ratios") {
    val rows = Seq((1439.99, 2), (100.0, 3), (15.0, 2))
      .toDF("a", "b").select(roundRatio2($"a" / $"b")).as[Double].collect()
    // 1439.99/2 → 719.9950000000000045 in binary → ·100+0.5 floors to 720.00;
    // the point is not the tie direction but that every engine doing the
    // same IEEE ops gets this exact answer (the DuckDB oracle does).
    assert(rows(0) == 720.0)
    assert(rows(1) == 33.33)
    assert(rows(2) == 7.5)
  }

  test("enrich emits the full 29-field schema (processor.py:130-161)") {
    val df = Seq(RawLite("O1", "2026-08-01T09:30:00+00:00", "C1", "e@x", "Paris",
      Seq(item("Shoes", 1, 100.0, 0, 0.0, 100.0)), 1, 1, 100.0, 0.0, 4.99,
      0.2, 21.0, 125.99, "paypal", "shipped", "2026-08-01T10:00:00+00:00")).toDF()
    val out = OrderEnrich.enrich(df)
    assert(out.columns.length == 29)
    val r = out.select("order_value_class", "customer_segment", "delivery_priority",
      "average_item_value", "discount_rate", "order_hour", "order_day_of_week",
      "is_weekend_order", "processor_version").head()
    assert(r == Row("medium_value", "occasional", "normal",
      100.0, 0.0, 9, "Saturday", true, "2.0"))
  }
}

case class Item(product_id: String, product_name: String, category: String,
                quantity: Int, unit_price: Double, discount_percentage: Int,
                discount_amount: Double, subtotal: Double)
case class OrderItems(items: Seq[Item])
case class ValOrder(order_id: String, items: Seq[Item], subtotal: Double,
                    total_amount: Double)
case class RawLite(order_id: String, order_date: String, customer_id: String,
                   customer_email: String, customer_city: String,
                   items: Seq[Item], num_items: Int, total_quantity: Int,
                   subtotal: Double, total_discount: Double,
                   shipping_cost: Double, tax_rate: Double, tax_amount: Double,
                   total_amount: Double, payment_method: String, status: String,
                   created_at: String)
