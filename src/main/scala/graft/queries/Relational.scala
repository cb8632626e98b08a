package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Relational operator inventory (SURVEY.md §2.3–§2.8): the analytic
  * query layer the reference *implies* via Athena over Glue tables
  * (README.md:24, the drawio diagram) but never implements — grouped
  * aggregation, joins of every flavor, windows, sorts/limits, set
  * operations, rollup/cube, and the reference's own scalar
  * classification logic (E1/E2, ecommerce-order-processor.py:18-35)
  * re-expressed over the star schema.
  *
  * Scale design: dimension tables ride `broadcast()` hints (no
  * shuffle of the fact side), fact tables shuffle at most once on
  * their join key, aggregates are partial+final (map-side combine is
  * automatic in HashAggregateExec), and AQE handles skew at runtime.
  * Money arithmetic goes through exact DECIMAL so results are
  * independent of partition count and summation order — a 100 TB run
  * over 10⁵ partitions produces bit-identical aggregates to the
  * oracle's single-threaded scan.
  */
object Relational {

  // ---- shared helpers -------------------------------------------------

  /** Exact money: binary double → DECIMAL(12,2). Input data is clean
    * 2-dp, so the cast is unambiguous; sums become order-independent. */
  private def dmoney(c: Column): Column = c.cast(DecimalType(12, 2))
  /** Rates (discount/tax, 0.00–0.99) as exact DECIMAL(4,2). */
  private def drate(c: Column): Column = c.cast(DecimalType(4, 2))
  private val one = lit(1).cast(DecimalType(4, 2))
  /** Final presentation: round exact decimal to 2dp, back to double
    * so Spark and DuckDB output schemas agree. */
  private def asMoney(c: Column): Column = round(c, 2).cast(DoubleType)

  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def nat(s: SparkSession, d: String) = Tables.nation(s, d)
  private def reg(s: SparkSession, d: String) = Tables.region(s, d)
  private def sup(s: SparkSession, d: String) = Tables.supplier(s, d)

  // ---- q01: grouped aggregation (TPC-H Q1 shape) ----------------------

  private val q01 = GraftQuery(
    "q01_pricing_summary",
    (s, d) => {
      li(s, d)
        .filter(col("l_shipdate") <= lit("2000-12-01").cast(TimestampType))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asMoney(sum(dmoney(col("l_quantity")))).as("sum_qty"),
          asMoney(sum(dmoney(col("l_extendedprice")))).as("sum_base_price"),
          asMoney(sum(dmoney(col("l_extendedprice")) * (one - drate(col("l_discount")))))
            .as("sum_disc_price"),
          asMoney(sum(dmoney(col("l_extendedprice")) * (one - drate(col("l_discount")))
            * (one + drate(col("l_tax"))))).as("sum_charge"),
          round(sum(dmoney(col("l_quantity"))).cast(DoubleType) / count(lit(1)), 2)
            .as("avg_qty"),
          round(sum(dmoney(col("l_extendedprice"))).cast(DoubleType) / count(lit(1)), 2)
            .as("avg_price"),
          round(sum(drate(col("l_discount"))).cast(DoubleType) / count(lit(1)), 4)
            .as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
      round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 2) AS avg_qty,
      round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 2) AS avg_price,
      round(CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*), 4) AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  // ---- q02: filter + scalar aggregate (TPC-H Q6 shape) ----------------
  // Predicates push to the parquet scan; no shuffle at all (partial
  // aggregation → single final row).

  private val q02 = GraftQuery(
    "q02_revenue_forecast",
    (s, d) => {
      li(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(
          asMoney(sum(dmoney(col("l_extendedprice")) * drate(col("l_discount"))))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
      count(*) AS n_lines
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"""))

  // ---- q03: 3-way join + top-k (TPC-H Q3 shape) -----------------------
  // customer is broadcast (dimension side); orders⋈lineitem is the one
  // fact-fact shuffle, on the join key both sides.

  private val q03 = GraftQuery(
    "q03_shipping_priority",
    (s, d) => {
      val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = ord(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val l = li(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast(TimestampType))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(asMoney(sum(dmoney(col("l_extendedprice")) * (one - drate(col("l_discount")))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderdate, o_orderpriority,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  // ---- q04: semi join with non-equi condition (TPC-H Q4 shape) --------

  private val q04 = GraftQuery(
    "q04_order_priority",
    (s, d) => {
      val o = ord(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1997-01-01").cast(TimestampType))
      val l = li(s, d)
      o.join(l,
          o("o_orderkey") === l("l_orderkey") &&
            l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 30 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, count(*) AS order_count
      FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  // ---- q05: 6-table join (TPC-H Q5 shape) -----------------------------
  // nation/region/supplier broadcast; the orders⋈lineitem shuffle is
  // the only exchange of fact data.

  private val q05 = GraftQuery(
    "q05_nation_revenue",
    (s, d) => {
      val o = ord(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1998-01-01").cast(TimestampType))
      val rAsia = reg(s, d).filter(col("r_name") === "ASIA")
      val n = nat(s, d).join(broadcast(rAsia), col("n_regionkey") === col("r_regionkey"))
      li(s, d)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(cust(s, d),
          col("o_custkey") === col("c_custkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(asMoney(sum(dmoney(col("l_extendedprice")) * (one - drate(col("l_discount")))))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  // ---- q06: anti join -------------------------------------------------

  private val q06 = GraftQuery(
    "q06_customers_without_orders",
    (s, d) => {
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_customers_without_orders"))
    },
    Some("""SELECT count(*) AS n_customers_without_orders
      FROM customer WHERE NOT EXISTS
        (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  // ---- q07: window ranking (top-N per group) --------------------------

  private val q07 = GraftQuery(
    "q07_top_orders_per_customer",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      ord(s, d)
        .withColumn("rn", row_number().over(w).cast(LongType))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY o_custkey
                             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn"""))

  // ---- q08: window running aggregate ----------------------------------
  // One shuffle on l_suppkey; the running DECIMAL sum is exact, so the
  // result is stable regardless of how partitions were assembled.
  // The testdata contains duplicate (l_orderkey, l_linenumber) rows
  // with different prices, so l_extendedprice joins the window sort as
  // the final tie-breaker — without it the intermediate running sum at
  // a tied pair depends on which engine emits which row first (rows
  // identical in ALL columns are then order-insensitive by
  // construction).

  private val q08 = GraftQuery(
    "q08_running_revenue",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      li(s, d)
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"),
          sum(dmoney(col("l_extendedprice"))).over(w).as("running_dec"))
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"),
          col("running_dec").cast(DoubleType).as("running_revenue"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("running_revenue"))
    },
    Some("""SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) OVER (
        PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_revenue
      FROM lineitem
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        running_revenue"""))

  // ---- q09: global sort + limit (top-k) -------------------------------
  // Spark plans this as TakeOrderedAndProject: per-partition top-k then
  // a k-row merge on the driver — no full sort of the fact table.

  private val q09 = GraftQuery(
    "q09_top_k_orders",
    (s, d) =>
      ord(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderdate"))
        .limit(100),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))

  // ---- q10: distinct --------------------------------------------------

  private val q10 = GraftQuery(
    "q10_distinct_segments",
    (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"))
        .select(col("c_mktsegment"), col("o_orderpriority"))
        .distinct()
        .orderBy(col("c_mktsegment"), col("o_orderpriority")),
    Some("""SELECT DISTINCT c_mktsegment, o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
      ORDER BY c_mktsegment, o_orderpriority"""))

  // ---- q11–q13: set operations ----------------------------------------

  private def custkeysOfYear(s: SparkSession, d: String, y: Int): DataFrame =
    ord(s, d).filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey").as("custkey")).distinct()

  private val q11 = GraftQuery(
    "q11_union_custkeys",
    (s, d) => custkeysOfYear(s, d, 1995).union(custkeysOfYear(s, d, 1996))
      .distinct().orderBy(col("custkey")),
    Some("""SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
      UNION SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
      ORDER BY custkey"""))

  private val q12 = GraftQuery(
    "q12_intersect_custkeys",
    (s, d) => custkeysOfYear(s, d, 1995).intersect(custkeysOfYear(s, d, 1996))
      .orderBy(col("custkey")),
    Some("""SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
      INTERSECT SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
      ORDER BY custkey"""))

  private val q13 = GraftQuery(
    "q13_except_custkeys",
    (s, d) => custkeysOfYear(s, d, 1995).except(custkeysOfYear(s, d, 1996))
      .orderBy(col("custkey")),
    Some("""SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
      EXCEPT SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1996
      ORDER BY custkey"""))

  // ---- q14/q15: rollup & cube -----------------------------------------
  // Subtotal rows are labelled '(all)' via COALESCE so NULL-ordering
  // differences between engines can't reorder the result.

  private val q14 = GraftQuery(
    "q14_rollup_acctbal",
    (s, d) =>
      cust(s, d)
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_customers"),
          asMoney(sum(dmoney(col("c_acctbal")))).as("acctbal_sum"))
        .select(coalesce(col("n_name"), lit("(all)")).as("nation"),
          coalesce(col("c_mktsegment"), lit("(all)")).as("segment"),
          col("n_customers"), col("acctbal_sum"))
        .orderBy(col("nation"), col("segment")),
    Some("""SELECT COALESCE(n_name, '(all)') AS nation,
      COALESCE(c_mktsegment, '(all)') AS segment,
      count(*) AS n_customers,
      CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS acctbal_sum
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
      ORDER BY nation, segment"""))

  private val q15 = GraftQuery(
    "q15_cube_lineitem",
    (s, d) =>
      li(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_lines"),
          asMoney(sum(dmoney(col("l_quantity")))).as("qty_sum"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("n_lines"), col("qty_sum"))
        .orderBy(col("returnflag"), col("linestatus")),
    Some("""SELECT COALESCE(l_returnflag, '(all)') AS returnflag,
      COALESCE(l_linestatus, '(all)') AS linestatus,
      count(*) AS n_lines,
      CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS qty_sum
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY returnflag, linestatus"""))

  // ---- q16: reference scalar classification (E1, proc:18-26) ----------
  // The reference's classify_order_value CASE ladder, thresholds scaled
  // ×300 to the star schema's price range. Same 4-bucket structure.

  private val q16 = GraftQuery(
    "q16_order_value_class",
    (s, d) =>
      ord(s, d)
        .withColumn("order_value_class",
          when(col("o_totalprice") >= 300000, "premium")
            .when(col("o_totalprice") >= 150000, "high_value")
            .when(col("o_totalprice") >= 30000, "medium_value")
            .otherwise("low_value"))
        .groupBy(col("order_value_class"))
        .agg(count(lit(1)).as("n_orders"),
          asMoney(sum(dmoney(col("o_totalprice")))).as("revenue"))
        .orderBy(col("order_value_class")),
    Some("""SELECT CASE
        WHEN o_totalprice >= 300000 THEN 'premium'
        WHEN o_totalprice >= 150000 THEN 'high_value'
        WHEN o_totalprice >= 30000 THEN 'medium_value'
        ELSE 'low_value' END AS order_value_class,
      count(*) AS n_orders,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1 ORDER BY order_value_class"""))

  def all: Seq[GraftQuery] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10,
      q11, q12, q13, q14, q15, q16)
}
