package graft.generate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.schema.OrderSchema._

/** Synthetic order source (SURVEY.md §2 S3, G1–G6; generator
  * -function.py:38-107) as pure column expressions over
  * `spark.range(n)` — a narrow, seeded, infinitely scalable source.
  *
  * Unlike the reference's unseeded `random`, every draw here is a
  * deterministic function of (seed, order id, field): the first 8 hex
  * chars of an md5 over that key, read as a uint32. That makes the
  * generator replayable by ANY engine with md5 — the DuckDB oracle
  * replays it in SQL (see [[sql]]) and hash-matches the output, which
  * is how a *generator* gets a correctness gate at all. Weighted
  * choices (G1) compare the uint32 against integer thresholds
  * `floor(p·2³²)`; uniform k-way picks use `(h·k) div 2³²` — all
  * integer arithmetic, no float in the control path.
  *
  * Sampling without replacement (G2) ranks the 6-product catalog by a
  * per-(order, product) hash and keeps the top `num_items` — a random
  * permutation via random sort keys, the distributed form of
  * `random.sample` (generator-function.py:51).
  *
  * Money is exact DECIMAL end to end. The per-unit discount amounts
  * (generator-function.py:57, `round(price*pct/100, 2)` banker's)
  * are precomputed per (product, pct) as literals in the catalog —
  * 18 values fixed at build time — so generated money never depends
  * on any engine's runtime tie-breaking.
  */
object SyntheticOrderSource {

  val DefaultN = 5000
  val DefaultSeed = 42

  /** Generation anchor instant (the reference uses `utcnow`,
    * generator-function.py:88,106; a constant keeps the source
    * replayable). Orders are back-dated 0–7 days minus a random
    * time-of-day offset from here. */
  val AnchorIso = "2026-08-01T12:00:00"
  val AnchorEpoch: Long = java.time.Instant.parse(AnchorIso + "Z").getEpochSecond

  private val M = 4294967296L // 2^32

  /** floor(p·2³²) — weighted-choice threshold in pure integers. */
  def thr(p: Double): Long = (p * M.toDouble).toLong

  /** Portable uint32: 8 hex chars of md5(key) at 1-based offset
    * `1+8·slot` (slot 0–3 — one md5 yields four independent 32-bit
    * draws). Identical in Spark (`conv`) and DuckDB
    * (`CAST('0x…' AS BIGINT)`). Packing four draws per digest keeps
    * the generator's expression tree (and whole-stage-codegen
    * compile time) ~4× smaller than one digest per field. */
  def h32(key: Column, slot: Int = 0): Column =
    conv(substring(md5(key), 1 + 8 * slot, 8), 16, 10).cast(LongType)

  /** Uniform k-way pick: floor(h·k / 2³²) ∈ [0, k). The product stays
    * under 2⁵³ and 2³² is a power of two, so the double division is
    * an exact exponent shift — bit-identical to DuckDB's `//`. */
  def pick(h: Column, k: Long): Column =
    floor(h * k / lit(M.toDouble)).cast(IntegerType)

  private def okey(seed: Int, field: String): Column =
    concat(lit(s"g:$seed:"), col("gid").cast(StringType), lit(":" + field))

  private def ikey(seed: Int, field: String): Column =
    concat(lit(s"g:$seed:"), col("gid").cast(StringType),
      lit(":" + field + ":"), col("product_id"))

  /** Order-level draw layout: digest name → slot per field. */
  val orderDraws: Map[String, (String, Int)] = Map(
    "ni" -> ("o0", 0), "ci" -> ("o0", 1), "dy" -> ("o0", 2), "td" -> ("o0", 3),
    "cu" -> ("o1", 0), "em" -> ("o1", 1), "pm" -> ("o1", 2), "st" -> ("o1", 3),
    "cor" -> ("o2", 0))

  /** Item-level draw layout within the single per-(order, product)
    * digest. */
  val itemDraws: Map[String, Int] =
    Map("rk" -> 0, "qt" -> 1, "hd" -> 2, "dp" -> 3)

  private def odraw(seed: Int, field: String): Column = {
    val (digest, slot) = orderDraws(field)
    h32(okey(seed, digest), slot)
  }

  private def idraw(seed: Int, field: String): Column =
    h32(ikey(seed, "i"), itemDraws(field))

  /** Catalog rows extended with the per-(product, pct) banker's-rounded
    * unit discount amounts (generator-function.py:57), fixed at build
    * time with BigDecimal HALF_EVEN — the single source of truth shared
    * by the Spark generator and the DuckDB oracle's VALUES clause. */
  val catalogWithDa: Seq[(String, String, BigDecimal, String, BigDecimal, BigDecimal)] =
    catalog.map { p =>
      def da(pct: Int): BigDecimal =
        (p.unitPrice * pct / 100).setScale(2, BigDecimal.RoundingMode.HALF_EVEN)
      (p.productId, p.productName, p.unitPrice, p.category, da(5), da(10))
    }

  private def catalogDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    catalogWithDa
      .map(r => (r._1, r._2, r._3.bigDecimal, r._4, r._5.bigDecimal, r._6.bigDecimal))
      .toDF("product_id", "product_name", "unit_price", "category",
        "da5", "da10")
      .select(col("product_id"), col("product_name"),
        col("unit_price").cast(DecimalType(12, 2)).as("unit_price"),
        col("category"),
        col("da5").cast(DecimalType(12, 2)).as("da5"),
        col("da10").cast(DecimalType(12, 2)).as("da10"))
  }

  /** Flat item rows: one row per (order, selected product) with all
    * item-level fields in exact DECIMAL. Columns: gid, rnk,
    * product_id, product_name, category, quantity,
    * discount_percentage, unit_price, da_unit, discount_amount,
    * item_subtotal. */
  def itemsFlat(spark: SparkSession, n: Long = DefaultN,
                seed: Int = DefaultSeed): DataFrame = {
    val g = spark.range(n).select(col("id").as("gid"))
    val withNi = g
      .withColumn("h_ni", odraw(seed, "ni"))
      .withColumn("num_items",
        when(col("h_ni") < thr(0.5), 1)
          .when(col("h_ni") < thr(0.8), 2).otherwise(3))
      .select(col("gid"), col("num_items"))
    val ranked = withNi
      .join(broadcast(catalogDf(spark)))
      .withColumn("h_rank", idraw(seed, "rk"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("gid"))
          .orderBy(col("h_rank"), col("product_id"))))
      .filter(col("rnk") <= col("num_items"))
    ranked
      .withColumn("quantity",
        when(idraw(seed, "qt") < thr(0.8), 1).otherwise(2))
      .withColumn("discount_percentage",
        when(idraw(seed, "hd") < thr(0.2),
          element_at(typedLit(Seq(0, 5, 10)),
            pick(idraw(seed, "dp"), 3) + 1))
          .otherwise(0))
      .withColumn("da_unit",
        when(col("discount_percentage") === 5, col("da5"))
          .when(col("discount_percentage") === 10, col("da10"))
          .otherwise(lit(0).cast(DecimalType(12, 2))))
      .withColumn("discount_amount",
        (col("da_unit") * col("quantity")).cast(DecimalType(12, 2)))
      .withColumn("item_subtotal",
        ((col("unit_price") - col("da_unit")) * col("quantity"))
          .cast(DecimalType(12, 2)))
      .select(col("gid"), col("rnk"), col("product_id"), col("product_name"),
        col("category"), col("quantity"), col("discount_percentage"),
        col("unit_price"), col("da_unit"), col("discount_amount"),
        col("item_subtotal"))
  }

  /** Nested 17-field raw orders (generator-function.py:89-107).
    * The items array is ordered by selection rank. Money lands as
    * DoubleType (JSONL wire parity); the values are exact 2dp. */
  def orders(spark: SparkSession, n: Long = DefaultN,
             seed: Int = DefaultSeed): DataFrame = {
    val items = itemsFlat(spark, n, seed)
    val nested = items
      .groupBy(col("gid"))
      .agg(
        // sort_array on (rnk, struct) keeps the selection order
        transform(
          array_sort(collect_list(struct(col("rnk").as("r"), struct(
            col("product_id"), col("product_name"), col("category"),
            col("quantity"),
            col("unit_price").cast(DoubleType).as("unit_price"),
            col("discount_percentage"),
            col("discount_amount").cast(DoubleType).as("discount_amount"),
            col("item_subtotal").cast(DoubleType).as("subtotal")).as("it")))),
          e => e.getField("it")).as("items"),
        count(lit(1)).cast(IntegerType).as("num_items"),
        sum(col("quantity")).cast(IntegerType).as("total_quantity"),
        sum(col("item_subtotal")).cast(DecimalType(14, 2)).as("subtotal_dec"),
        sum(col("discount_amount")).cast(DecimalType(14, 2)).as("total_discount_dec"))
    val anchor = to_timestamp(lit(AnchorIso))
    nested
      .withColumn("customer_city", element_at(typedLit(cities),
        pick(odraw(seed, "ci"), cities.size) + 1))
      // G5 shipping rule (generator-function.py:70-74)
      .withColumn("shipping_dec",
        when(col("subtotal_dec") >= 100, lit(BigDecimal("0.00")))
          .when(col("customer_city").isin(majorCities: _*), lit(BigDecimal("4.99")))
          .otherwise(lit(BigDecimal("7.99"))).cast(DecimalType(4, 2)))
      // G6 tax rule (generator-function.py:83-85): banker's rounding;
      // (2dp value)·0.2 always has an even third decimal, so this
      // never ties and matches any engine's decimal round.
      .withColumn("tax_dec",
        bround((col("subtotal_dec") + col("shipping_dec")) *
          lit(BigDecimal("0.2")).cast(DecimalType(2, 1)), 2)
          .cast(DecimalType(14, 2)))
      .withColumn("total_dec",
        (col("subtotal_dec") + col("shipping_dec") + col("tax_dec"))
          .cast(DecimalType(14, 2)))
      // G4 uniform back-dating (generator-function.py:88) plus a
      // time-of-day offset; pure epoch-seconds arithmetic so the
      // DuckDB replay (naive-timestamp interval math) is identical.
      .withColumn("order_ts",
        timestamp_seconds(lit(AnchorEpoch)
          - pick(odraw(seed, "dy"), 8).cast(LongType) * 86400L
          - pick(odraw(seed, "td"), 86400).cast(LongType)))
      // E12 id/email fabrication (generator-function.py:38-46)
      .withColumn("cust_digits",
        lpad((odraw(seed, "cu") % 100000000).cast(StringType), 8, "0"))
      .select(
        concat(lit("ORD-"), date_format(anchor, "yyyyMMdd"), lit("-"),
          upper(substring(md5(okey(seed, "oid")), 1, 8))).as("order_id"),
        concat(date_format(col("order_ts"), "yyyy-MM-dd'T'HH:mm:ss"),
          lit("+00:00")).as("order_date"),
        concat(lit("CUST-"), col("cust_digits")).as("customer_id"),
        concat(lit("customer"), col("cust_digits"), lit("@"),
          when(odraw(seed, "em") < thr(0.5), "gmail.com")
            .otherwise("yahoo.fr")).as("customer_email"),
        col("customer_city"),
        col("items"),
        col("num_items"),
        col("total_quantity"),
        col("subtotal_dec").cast(DoubleType).as("subtotal"),
        col("total_discount_dec").cast(DoubleType).as("total_discount"),
        col("shipping_dec").cast(DoubleType).as("shipping_cost"),
        lit(0.2).as("tax_rate"),
        col("tax_dec").cast(DoubleType).as("tax_amount"),
        col("total_dec").cast(DoubleType).as("total_amount"),
        element_at(typedLit(paymentMethods),
          when(odraw(seed, "pm") < thr(0.7), 1)
            .when(odraw(seed, "pm") < thr(0.9), 2).otherwise(3))
          .as("payment_method"),
        element_at(typedLit(orderStatuses),
          when(odraw(seed, "st") < thr(0.15), 1)
            .when(odraw(seed, "st") < thr(0.55), 2)
            .when(odraw(seed, "st") < thr(0.80), 3)
            .when(odraw(seed, "st") < thr(0.95), 4).otherwise(5))
          .as("status"),
        concat(lit(AnchorIso), lit("+00:00")).as("created_at"),
        col("gid"))
  }

  // corruption constants, single-sourced: [[corrupt]] builds its CASE
  // cuts from these AND the corrupt-table cache tag
  // (PipelineQueries.corruptOrdersMaterialized) derives from
  // [[corruptionSpec]], so a rule change here rotates the cache path
  // automatically instead of silently serving stale parquet
  val CorruptCuts: Seq[Double] = Seq(0.02, 0.04, 0.06, 0.08)
  val SubtotalBump: Double = 7.77
  private val corruptDrawSalt = ":o2"

  /** Content token of the corruption rules, for cache keying. */
  def corruptionSpec(seed: Int): String =
    s"$corruptDrawSalt:${CorruptCuts.mkString(":")}:+$SubtotalBump:$seed"

  /** Deterministic fault injection for the validation gate (P2/P3
    * test surface): ~2% each of zero total / blank id / empty items /
    * skewed subtotal, keyed off the same hash family. */
  def corrupt(df: DataFrame, seed: Int = DefaultSeed): DataFrame = {
    val c = h32(concat(lit(s"g:$seed:"), col("gid").cast(StringType),
      lit(corruptDrawSalt)), 0)
    val cut = CorruptCuts.map(thr)
    df
      .withColumn("total_amount",
        when(c < cut(0), lit(0.0)).otherwise(col("total_amount")))
      .withColumn("order_id",
        when(c >= cut(0) && c < cut(1), lit("")).otherwise(col("order_id")))
      .withColumn("items",
        when(c >= cut(1) && c < cut(2),
          array().cast(df.schema("items").dataType)).otherwise(col("items")))
      .withColumn("subtotal",
        when(c >= cut(2) && c < cut(3), col("subtotal") + SubtotalBump)
          .otherwise(col("subtotal")))
  }
}
