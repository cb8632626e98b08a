package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.OrderSchema
import graft.schema.OrderSchema.Errors

/** The reference processor's validate + enrich surface (SURVEY.md §2
  * P1/P2, A2–A4, E1–E13; ecommerce-order-processor.py:18-161) as pure
  * `Column` functions — zero UDFs, so the whole 17→29-field projection
  * stays inside Catalyst and whole-stage codegen, and every item-level
  * "loop" is an intra-row higher-order fold (narrow: no shuffle
  * anywhere in the pipeline).
  *
  * Money discipline (E4 / SURVEY §7.4): the reference rounds every
  * money field with Python's banker's `round(x, 2)` over binary
  * doubles. Here money arithmetic is exact DECIMAL with `bround`
  * (half-even) — on this pipeline's value shapes the two agree (see
  * per-site notes) while being reproducible across engines, which
  * binary-double ties are not. Ratio fields (margins, rates,
  * averages) are rounded with `floor(x·100 + 0.5)/100` in pure IEEE
  * double ops — bit-identical in any engine, unlike decimal-string
  * tie-breaking.
  */
object OrderEnrich {

  private val money = DecimalType(14, 2)
  private def dec(c: Column): Column = c.cast(money)

  /** Half-up 2dp rounding of a non-negative double ratio in pure IEEE
    * arithmetic: floor(x·100 + 0.5)/100. Deterministic across engines
    * because every step is an IEEE-754 double op. */
  def roundRatio2(x: Column): Column = floor(x * 100 + 0.5) / 100

  // ---- E1: classify_order_value (processor.py:18-26) ----------------

  def classifyOrderValue(totalAmount: Column): Column =
    when(totalAmount >= 1000, "premium")
      .when(totalAmount >= 500, "high_value")
      .when(totalAmount >= 100, "medium_value")
      .otherwise("low_value")

  // ---- E2: classify_customer_segment (processor.py:29-35) -----------

  def classifyCustomerSegment(totalQuantity: Column, totalAmount: Column): Column =
    when(totalQuantity >= OrderSchema.bulkOrderQty || totalAmount >= 1000, "vip")
      .when(totalAmount >= 300, "regular")
      .otherwise("occasional")

  // ---- E3: calculate_delivery_priority (processor.py:88-102) --------

  def deliveryPriority(totalAmount: Column, city: Column, status: Column): Column = {
    val score =
      when(totalAmount >= 500, 3).otherwise(0) +
        when(city.isin(OrderSchema.majorCities: _*), 2).otherwise(0) +
        when(status.isin("shipped", "confirmed"), 2).otherwise(0)
    when(score >= 5, "urgent").when(score >= 3, "normal").otherwise("standard")
  }

  // ---- A2: calculate_profit_margin (processor.py:38-48) -------------
  // Intra-row folds in exact DECIMAL. cost item = price(2dp)·0.6·qty
  // has an even third decimal for the .99-priced catalog, and revenue
  // is exact 2dp — so profit/cost never tie at the rounding digit and
  // bround (half-even) equals any engine's decimal rounding here.

  /** Σ over items of a per-item DECIMAL term, as an exact fold. */
  private def sumItems(items: Column, scaleType: DecimalType)(term: Column => Column): Column =
    aggregate(items, lit(BigDecimal(0)).cast(scaleType),
      (acc, i) => (acc + term(i)).cast(scaleType))

  def profitAnalysis(items: Column): Column = {
    val cost3 = DecimalType(18, 3)
    val cost = sumItems(items, cost3)(i =>
      i.getField("unit_price").cast(DecimalType(12, 2)) *
        lit(BigDecimal("0.6")).cast(DecimalType(2, 1)) * i.getField("quantity"))
    val revenue = sumItems(items, DecimalType(18, 2))(i =>
      i.getField("subtotal").cast(DecimalType(12, 2)))
    val profit = (revenue - cost).cast(cost3)
    struct(
      bround(cost, 2).cast(DoubleType).as("estimated_cost"),
      revenue.cast(DoubleType).as("revenue"),
      bround(profit, 2).cast(DoubleType).as("profit"),
      when(revenue > 0,
        roundRatio2(profit.cast(DoubleType) / revenue.cast(DoubleType) * 100))
        .otherwise(0.0).as("margin_percentage"))
  }

  // ---- A4: detect_discount_pattern (processor.py:67-85) -------------

  def discountPattern(items: Column): Column = {
    val disc = filter(items, i => i.getField("discount_percentage") > 0)
    val nDisc = size(disc)
    val sumPct = aggregate(disc, lit(0L),
      (acc, i) => acc + i.getField("discount_percentage"))
    val savings = sumItems(items, money)(i =>
      i.getField("discount_amount").cast(DecimalType(12, 2)))
    val empty = struct(
      lit(false).as("uses_discounts"),
      lit(0).as("num_discounted_items"),
      lit(0.0).as("avg_discount_percentage"),
      lit(0.0).as("total_savings"))
    val present = struct(
      lit(true).as("uses_discounts"),
      nDisc.as("num_discounted_items"),
      roundRatio2(sumPct.cast(DoubleType) / nDisc.cast(DoubleType))
        .as("avg_discount_percentage"),
      savings.cast(DoubleType).as("total_savings"))
    when(nDisc === 0, empty).otherwise(present)
  }

  // ---- A3: analyze_product_mix (processor.py:51-64) ------------------
  // The dynamic-key map, built intra-row: distinct lowered categories
  // (first-occurrence order, like Python dict insertion order) each
  // mapped to {count, quantity, revenue}. Revenue terms are exact 2dp
  // so the reference's final round is a no-op here.

  def productMix(items: Column): Column = {
    def ofCat(c: Column): Column =
      filter(items, i => lower(i.getField("category")) === c)
    map_from_entries(
      transform(array_distinct(transform(items, i => lower(i.getField("category")))),
        c => struct(
          c.as("key"),
          struct(
            size(ofCat(c)).as("count"),
            aggregate(ofCat(c), lit(0L),
              (acc, i) => acc + i.getField("quantity")).as("quantity"),
            sumItems(ofCat(c), money)(i =>
              i.getField("subtotal").cast(DecimalType(12, 2)))
              .cast(DoubleType).as("revenue")).as("value"))))
  }

  /** A3 Option B (SURVEY.md §2.4): the exploded relational form of
    * [[productMix]] — explode items, group by (order_id, lowered
    * category). Same numbers as the map form (EnrichSpec proves the
    * equivalence row-for-row). The map form pays O(categories ×
    * items) HOF re-scans per row; this form pays one shuffle on
    * (order_id, category) with map-side partial aggregation — the
    * right trade whenever the per-order output is consumed exploded,
    * and the scale path once items-per-order grows. */
  def productMixExploded(ordersWithItems: DataFrame): DataFrame =
    ordersWithItems
      .select(col("order_id"), explode(col("items")).as("_it"))
      .groupBy(col("order_id"), lower(col("_it.category")).as("category"))
      .agg(
        count(lit(1)).cast(IntegerType).as("n_lines"),
        sum(col("_it.quantity")).as("quantity"),
        sum(col("_it.subtotal").cast(DecimalType(12, 2)))
          .cast(money).cast(DoubleType).as("revenue"))

  /** A3 wide-order form: the exploded regroup collapsed back to the
    * per-order map, bit-identical to [[productMix]] — including
    * Python-dict insertion order, reproduced by sorting each order's
    * category entries on the category's first item position
    * (posexplode → min(_pos)). collect_list alone is
    * shuffle-order-nondeterministic; the array_sort on the unique
    * first-position key is what makes the map deterministic.
    *
    * NOT the default in [[enrich]], deliberately: measured head-to-head
    * on the materialized pipeline (write-to-parquet, local[32], warm
    * JVM), the narrow HOF form costs ~1µs/row extra at this pipeline's
    * ≤3 items/order (0.4s over 400k rows; 1.4s total vs 2.8s for this
    * form — its three exchanges cost more than they save, and at
    * 100 TB they'd reshuffle the full 29-field rows). The crossover is
    * items-per-order width: the HOF is O(categories × items) per row,
    * so once orders carry hundreds of lines, join this in instead
    * (EnrichSpec pins it equal to the map form, key order included).
    * One asymmetry to handle at the join: an order with EMPTY items
    * emits no posexplode rows, so it is absent here where the map
    * form yields {} — callers must left-join and coalesce to an empty
    * map to keep those rows (validation normally drops them first). */
  def productMixMap(ordersWithItems: DataFrame): DataFrame =
    ordersWithItems
      .select(col("order_id"), posexplode(col("items")).as(Seq("_pos", "_it")))
      .groupBy(col("order_id"), lower(col("_it.category")).as("_cat"))
      .agg(
        min(col("_pos")).as("_first"),
        count(lit(1)).cast(IntegerType).as("_n"),
        sum(col("_it.quantity")).as("_qty"),
        sum(col("_it.subtotal").cast(DecimalType(12, 2)))
          .cast(money).cast(DoubleType).as("_rev"))
      .groupBy(col("order_id"))
      .agg(
        map_from_entries(transform(
          array_sort(collect_list(struct(
            col("_first").as("p"),
            col("_cat").as("k"),
            struct(col("_n").as("count"), col("_qty").as("quantity"),
              col("_rev").as("revenue")).as("v")))),
          e => struct(e.getField("k"), e.getField("v"))))
          .as("_product_mix"))

  // ---- P2: validate_order (processor.py:105-119) ---------------------

  /** Validation error array; empty ⇔ valid. Mirrors the reference's
    * checks and messages, including the 0.01 float tolerance on the
    * item-subtotal consistency invariant. */
  def validationErrors(orderId: Column, items: Column, subtotal: Column,
                       totalAmount: Column): Column = {
    val calcSubtotal = sumItems(
      coalesce(items, array().cast(ArrayType(OrderSchema.itemType))),
      DecimalType(18, 2))(i => i.getField("subtotal").cast(DecimalType(12, 2)))
    def errIf(cond: Column, msg: String): Column =
      when(cond, array(lit(msg))).otherwise(array().cast(ArrayType(StringType)))
    concat(
      errIf(coalesce(totalAmount, lit(0.0)) <= 0, Errors.invalidTotal),
      errIf(orderId.isNull || orderId === "", Errors.missingOrderId),
      errIf(items.isNull || size(items) === 0, Errors.noItems),
      errIf(abs(calcSubtotal.cast(DoubleType) - coalesce(subtotal, lit(0.0))) > 0.01,
        Errors.inconsistentSubtotal))
  }

  // ---- E5–E13 scalar derivations -------------------------------------

  /** E5: ISO-8601 parse (processor.py:128). Spark's to_timestamp
    * accepts both trailing 'Z' and '+00:00' offsets natively. */
  def parseOrderDate(orderDate: Column): Column = to_timestamp(orderDate)

  /** E7: English day name via explicit lookup (locale-independent;
    * processor.py:157's strftime('%A')). */
  def englishDayName(ts: Column): Column =
    element_at(typedLit(Seq("Sunday", "Monday", "Tuesday", "Wednesday",
      "Thursday", "Friday", "Saturday")), dayofweek(ts))

  /** E8: weekend predicate. Python weekday() >= 5 ⇔ Sat/Sun; Spark
    * dayofweek is 1=Sun..7=Sat (processor.py:158). */
  def isWeekend(ts: Column): Column = dayofweek(ts).isin(1, 7)

  /** E13: processing timestamp, Python isoformat microseconds + 'Z'
    * (processor.py:159). */
  def processedAt(): Column =
    date_format(current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")

  val processorVersion = "2.0"

  // ---- P1: the 17 → 29-field enrichment projection -------------------
  // (processor.py:130-161): 15 passthrough fields (drops created_at,
  // renames tax_rate → tax_rate_applied with a null→0 default) plus
  // 14 derived. One select — CollapseProject + codegen make it a
  // single pass, and every derivation above is narrow.

  /** One narrow projection for batch AND streaming — `product_mix`
    * included, via the intra-row [[productMix]] HOF (measured ~1µs/row
    * at this pipeline's ≤3 items/order; see [[productMixMap]] for the
    * wide-order alternative and the numbers). Zero shuffles: the
    * pipeline scales by file-partition parallelism alone. */
  def enrich(valid: DataFrame): DataFrame = {
    val ts = parseOrderDate(col("order_date"))
    valid.select(
      col("order_id"),
      col("order_date"),
      col("customer_id"),
      col("customer_email"),
      col("customer_city"),
      col("status"),
      col("payment_method"),
      col("items"),
      col("num_items"),
      col("total_quantity"),
      col("subtotal"),
      col("total_discount"),
      col("shipping_cost"),
      col("tax_amount"),
      col("total_amount"),
      classifyOrderValue(col("total_amount")).as("order_value_class"),
      classifyCustomerSegment(col("total_quantity"), col("total_amount"))
        .as("customer_segment"),
      deliveryPriority(col("total_amount"), col("customer_city"), col("status"))
        .as("delivery_priority"),
      profitAnalysis(col("items")).as("profit_analysis"),
      discountPattern(col("items")).as("discount_pattern"),
      productMix(col("items")).as("product_mix"),
      // E10 (processor.py:152): validation guarantees items nonempty
      roundRatio2(col("subtotal") / col("num_items")).as("average_item_value"),
      // E9 (processor.py:153-154): guarded percentage
      when(col("subtotal") > 0,
        roundRatio2(col("total_discount") / col("subtotal") * 100))
        .otherwise(0.0).as("discount_rate"),
      coalesce(col("tax_rate"), lit(0.0)).as("tax_rate_applied"),
      hour(ts).as("order_hour"),
      englishDayName(ts).as("order_day_of_week"),
      isWeekend(ts).as("is_weekend_order"),
      processedAt().as("processed_at"),
      lit(processorVersion).as("processor_version"))
  }
}
