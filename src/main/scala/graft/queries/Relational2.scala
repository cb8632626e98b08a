package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Second relational batch: scalar-function surface (SURVEY.md §2.8 —
  * string/date/math/JSON, the reference's E2/E7/E8 semantics),
  * subqueries, conditional aggregation, and the event-stream analytics
  * (hourly tumbling windows, sessionization, as-of join) that the
  * reference's EventBridge flow gestures at (SURVEY.md §2.10).
  *
  * Time arithmetic is done in exact integer microseconds
  * (`unix_micros` ↔ DuckDB `epoch_us`) — never float seconds — so
  * session boundaries and as-of gaps are bit-deterministic.
  */
object Relational2 {

  private def dmoney(c: Column): Column = c.cast(DecimalType(12, 2))
  private def asMoney(c: Column): Column = round(c, 2).cast(DoubleType)

  private def ord(s: SparkSession, d: String) = Tables.orders(s, d)
  private def li(s: SparkSession, d: String) = Tables.lineitem(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def nat(s: SparkSession, d: String) = Tables.nation(s, d)
  private def part(s: SparkSession, d: String) = Tables.part(s, d)
  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  // ---- q17: HAVING (post-aggregation filter) --------------------------
  // Routed through the spark.sql TEXT path over registered catalog
  // views (S6/EP3 — the "Athena layer"): parser → analyzer → catalog
  // resolution, same DuckDB oracle. The BROADCAST hint mirrors the
  // DataFrame form's broadcast(nation).

  private val q17 = GraftQuery(
    "q17_big_nations",
    (s, d) => {
      Tables.registerAllOnce(s, d)
      s.sql("""SELECT /*+ BROADCAST(nation) */ n_name,
          count(*) AS n_customers,
          CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS acctbal_sum
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name HAVING count(*) >= 5 ORDER BY n_name""")
    },
    Some("""SELECT n_name, count(*) AS n_customers,
      CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE) AS acctbal_sum
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name HAVING count(*) >= 5 ORDER BY n_name"""))

  // ---- q18: customer segmentation (E2 parity, proc:29-35) -------------
  // The reference's classify_customer_segment((qty >= BULK) OR
  // (total >= HIGH) → vip; total >= regular-threshold → regular;
  // else occasional), thresholds ×300 for the star schema's range.
  // Two-phase: per-order quantity rollup (one shuffle on l_orderkey),
  // then classification + a broadcast-sized final aggregation.

  private val q18 = GraftQuery(
    "q18_customer_segment",
    (s, d) => {
      val qty = li(s, d).groupBy(col("l_orderkey"))
        .agg(sum(dmoney(col("l_quantity"))).cast(DoubleType).as("order_qty"))
      ord(s, d)
        .join(qty, col("o_orderkey") === col("l_orderkey"))
        .withColumn("customer_segment",
          when(col("order_qty") >= 100 || col("o_totalprice") >= 300000, "vip")
            .when(col("o_totalprice") >= 90000, "regular")
            .otherwise("occasional"))
        .groupBy(col("customer_segment"))
        .agg(count(lit(1)).as("n_orders"),
          asMoney(sum(dmoney(col("o_totalprice")))).as("revenue"))
        .orderBy(col("customer_segment"))
    },
    Some("""SELECT CASE
        WHEN order_qty >= 100 OR o_totalprice >= 300000 THEN 'vip'
        WHEN o_totalprice >= 90000 THEN 'regular'
        ELSE 'occasional' END AS customer_segment,
      count(*) AS n_orders,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
      FROM orders JOIN (
        SELECT l_orderkey,
          CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS order_qty
        FROM lineitem GROUP BY l_orderkey) q ON o_orderkey = l_orderkey
      GROUP BY 1 ORDER BY customer_segment"""))

  // ---- q19: string functions (E11/E12-adjacent surface) ---------------

  private val q19 = GraftQuery(
    "q19_string_funcs",
    (s, d) =>
      part(s, d)
        .filter(col("p_name").like("%e%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 5).as("prefix"),
          length(col("p_name")).as("name_len"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("snake_name"),
          when(col("p_name").like("%red%"), lit(1L)).otherwise(lit(0L)).as("is_red"))
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, upper(p_name) AS uname,
      substring(p_name, 1, 5) AS prefix,
      CAST(length(p_name) AS INT) AS name_len,
      concat_ws('/', p_brand, p_type) AS brand_type,
      regexp_replace(p_name, ' ', '_', 'g') AS snake_name,
      CAST(CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS BIGINT) AS is_red
      FROM part WHERE p_name LIKE '%e%' ORDER BY p_partkey"""))

  // ---- q20: date functions (E6/E7/E8 parity, proc:156-158) ------------
  // order_day_of_week + is_weekend_order re-expressed over o_orderdate.
  // Spark dayofweek is 1=Sunday..7=Saturday; DuckDB isodow is
  // 1=Monday..7=Sunday — the weekend predicate maps accordingly.
  // Day names come from an explicit English lookup (not
  // date_format 'EEEE', whose output follows the JVM default locale
  // and would diverge from DuckDB's dayname() on a non-English host).

  private val englishDayName: Column => Column = d =>
    element_at(typedLit(Seq("Sunday", "Monday", "Tuesday", "Wednesday",
      "Thursday", "Friday", "Saturday")), dayofweek(d))

  private val q20 = GraftQuery(
    "q20_order_date_profile",
    (s, d) =>
      ord(s, d)
        .select(
          year(col("o_orderdate")).cast(IntegerType).as("order_year"),
          englishDayName(col("o_orderdate")).as("order_day_of_week"),
          dayofweek(col("o_orderdate")).isin(1, 7).as("is_weekend_order"),
          dmoney(col("o_totalprice")).as("price_dec"))
        .groupBy(col("order_year"), col("order_day_of_week"), col("is_weekend_order"))
        .agg(count(lit(1)).as("n_orders"),
          asMoney(sum(col("price_dec"))).as("revenue"))
        .orderBy(col("order_year"), col("order_day_of_week")),
    Some("""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
      dayname(o_orderdate) AS order_day_of_week,
      isodow(o_orderdate) IN (6, 7) AS is_weekend_order,
      count(*) AS n_orders,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1, 2, 3 ORDER BY order_year, order_day_of_week"""))

  // ---- q21: math functions --------------------------------------------
  // Non-decimal math (sqrt/ln) is rounded PER ROW to 4dp before the
  // exact DECIMAL sum, so cross-engine libm/summation-order noise
  // cannot reach the aggregate.

  private val q21 = GraftQuery(
    "q21_math_funcs",
    (s, d) =>
      li(s, d)
        .select(
          round(sqrt(col("l_extendedprice")), 4).cast(DecimalType(18, 4)).as("sqrt_price"),
          round(log(col("l_quantity") + 1), 4).cast(DecimalType(18, 4)).as("ln_qty"),
          ceil(col("l_discount") * 100).as("disc_pct_ceil"),
          floor(col("l_tax") * 100).as("tax_pct_floor"),
          abs(col("l_quantity") - 25).cast(DecimalType(12, 2)).as("qty_dev"))
        .agg(
          round(sum(col("sqrt_price")), 2).cast(DoubleType).as("sum_sqrt_price"),
          round(sum(col("ln_qty")), 2).cast(DoubleType).as("sum_ln_qty"),
          sum(col("disc_pct_ceil")).cast(LongType).as("sum_disc_ceil"),
          sum(col("tax_pct_floor")).cast(LongType).as("sum_tax_floor"),
          round(sum(col("qty_dev")), 2).cast(DoubleType).as("sum_qty_dev")),
    Some("""SELECT
      CAST(round(sum(CAST(round(sqrt(l_extendedprice), 4) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_sqrt_price,
      CAST(round(sum(CAST(round(ln(l_quantity + 1), 4) AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_ln_qty,
      CAST(sum(CAST(ceil(l_discount * 100) AS BIGINT)) AS BIGINT) AS sum_disc_ceil,
      CAST(sum(CAST(floor(l_tax * 100) AS BIGINT)) AS BIGINT) AS sum_tax_floor,
      CAST(round(sum(CAST(abs(l_quantity - 25) AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty_dev
      FROM lineitem"""))

  // ---- q22: scalar subquery (orders above global average) -------------
  // The scalar aggregate is broadcast to the scan — no shuffle of the
  // fact table, and the filter stays codegen'd.

  private val q22 = GraftQuery(
    "q22_above_avg_orders",
    (s, d) => {
      // spark.sql text path (S6): the scalar subquery plans as a
      // broadcast-reused subquery result — no fact-table shuffle.
      Tables.registerAllOnce(s, d)
      s.sql("""SELECT count(*) AS n_above_avg,
          CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue_above_avg
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)""")
    },
    Some("""SELECT count(*) AS n_above_avg,
      CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS revenue_above_avg
      FROM orders WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)"""))

  // ---- q23: conditional aggregation (pivot-style) ---------------------

  private val q23 = GraftQuery(
    "q23_status_pivot",
    (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          count(when(col("o_orderstatus") === "F", lit(1))).as("n_f"),
          count(when(col("o_orderstatus") === "O", lit(1))).as("n_o"),
          count(when(col("o_orderstatus") === "P", lit(1))).as("n_p"),
          asMoney(sum(when(col("o_orderstatus") === "F", dmoney(col("o_totalprice")))
            .otherwise(lit(0).cast(DecimalType(12, 2))))).as("revenue_f"))
        .orderBy(col("n_name")),
    Some("""SELECT n_name,
      count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
      count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
      count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
      CAST(round(sum(CASE WHEN o_orderstatus = 'F'
        THEN CAST(o_totalprice AS DECIMAL(12,2))
        ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE) AS revenue_f
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""))

  // ---- q24: JSON extraction (E16 surface over events.props) -----------
  // Schema'd from_json (the reader-side half of the reference's
  // json.loads, processor.py:180) rather than per-path
  // get_json_object: one parse per row regardless of how many fields
  // are plucked, and the parsed struct stays codegen-friendly.

  private val jsonPropsSchema = StructType(Seq(StructField("k", IntegerType)))

  private val q24 = GraftQuery(
    "q24_json_props",
    (s, d) =>
      ev(s, d)
        .select(from_json(col("props"), jsonPropsSchema).getField("k").as("k"),
          dmoney(col("value")).as("value_dec"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_events"),
          asMoney(sum(col("value_dec"))).as("value_sum"))
        .orderBy(col("k")),
    Some("""SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
      count(*) AS n_events,
      CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS value_sum
      FROM events GROUP BY 1 ORDER BY k"""))

  // ---- q25: tumbling-window aggregation over the event stream ---------
  // Batch form of the Structured Streaming hourly window — the
  // streaming twin is graft.streaming.OrderStream.hourlyRevenue
  // (watermark + window over the order stream), exercised under
  // Trigger.AvailableNow in StreamingSpec; the grouped plan is
  // identical.

  private val q25 = GraftQuery(
    "q25_events_hourly",
    (s, d) =>
      ev(s, d)
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          asMoney(sum(dmoney(col("value")))).as("value_sum"))
        .orderBy(col("hour"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
      count(*) AS n_events,
      CAST(round(sum(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS value_sum
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type"""))

  // ---- q26: sessionization (gaps-and-islands) -------------------------
  // 30-minute inactivity gap. Gap arithmetic in integer microseconds;
  // the session index is a running conditional COUNT (not SUM — DuckDB
  // widens integer SUM to HUGEINT, which would break schema parity).
  // One shuffle on user_id; both windows share the same partitioning.

  private val q26 = GraftQuery(
    "q26_sessionize",
    (s, d) => {
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev(s, d)
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(wOrd))
        .withColumn("is_new",
          col("prev_us").isNull ||
            (unix_micros(col("ts")) - col("prev_us")) > 1800000000L)
        .withColumn("session_idx", count(when(col("is_new"), lit(1))).over(wRun))
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"))
        .orderBy(col("user_id"), col("session_idx"))
    },
    Some("""WITH flagged AS (
        SELECT user_id, event_id, ts,
          CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
               THEN 1 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sessions AS (
        SELECT user_id, ts,
          count(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        FROM flagged)
      SELECT user_id, session_idx, count(*) AS n_events,
        min(ts) AS session_start, max(ts) AS session_end
      FROM sessions GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx"""))

  // ---- q27: as-of join ------------------------------------------------
  // For each 'error' event, the most recent 'click' by the same user at
  // or before it — the classic point-in-time lookup Spark lacks as a
  // native operator. Implemented with the union-sort trick: tag both
  // streams, sort clicks-before-errors at equal ts, and carry the last
  // non-null click timestamp forward with one window pass. A single
  // shuffle on user_id; no range-explosion self-join. The DuckDB
  // oracle is its native ASOF JOIN, so the two formulations
  // cross-validate. Matches `>=` semantics (a click at the exact error
  // ts is taken).

  private val q27 = GraftQuery(
    "q27_asof_click_before_error",
    (s, d) => {
      val e = ev(s, d)
        .filter(col("event_type").isin("click", "error"))
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"),
          when(col("event_type") === "click", lit(0)).otherwise(lit(1)),
          col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("click_ts", when(col("event_type") === "click", col("ts")))
        .withColumn("last_click_ts", last(col("click_ts"), ignoreNulls = true).over(w))
        .filter(col("event_type") === "error" && col("last_click_ts").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"),
          col("last_click_ts"),
          (unix_micros(col("ts")) - unix_micros(col("last_click_ts"))).as("gap_us"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT e.event_id, e.user_id, e.ts, c.ts AS last_click_ts,
      epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON e.user_id = c.user_id AND e.ts >= c.ts
      ORDER BY e.event_id"""))

  // ---- q28: grouped string aggregation (ordered concat) ---------------

  private val q28 = GraftQuery(
    "q28_brand_part_list",
    (s, d) => {
      // spark.sql text path (S6); Spark's dialect spells DuckDB's
      // ordered string_agg as array_join(array_sort(collect_list())).
      Tables.registerAllOnce(s, d)
      s.sql("""SELECT p_brand, count(*) AS n_parts,
          array_join(array_sort(collect_list(p_name)), ',') AS part_names
        FROM part WHERE p_size <= 3
        GROUP BY p_brand ORDER BY p_brand""")
    },
    Some("""SELECT p_brand, count(*) AS n_parts,
      string_agg(p_name, ',' ORDER BY p_name) AS part_names
      FROM part WHERE p_size <= 3
      GROUP BY p_brand ORDER BY p_brand"""))

  // ---- q81: full outer join (closing the join matrix) ------------------
  // Heavy buyers vs high-balance customers meet in a FULL OUTER join;
  // the census pins BOTH unmatched sides plus the overlap (all three
  // buckets non-empty on this data), coalesced keys, no NULL
  // ambiguity in the output.

  private val q81 = GraftQuery(
    "q81_full_outer",
    (s, d) => {
      val buyers = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"))
        .filter(col("n_orders") >= 15)
      val rich = Tables.customer(s, d)
        .filter(col("c_acctbal") > 7500)
        .select(col("c_custkey").as("custkey"), col("c_acctbal"))
      buyers.join(rich, Seq("custkey"), "full_outer")
        .select(
          when(col("n_orders").isNotNull && col("c_acctbal").isNotNull, "both")
            .when(col("n_orders").isNotNull, "buyer_only")
            .otherwise("rich_only").as("bucket"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_customers"), sum(col("n_orders")).as("orders"))
        .orderBy(col("bucket"))
    },
    Some("""WITH buyers AS (
        SELECT o_custkey AS custkey, count(*) AS n_orders
        FROM orders GROUP BY o_custkey HAVING count(*) >= 15),
      rich AS (
        SELECT c_custkey AS custkey, c_acctbal
        FROM customer WHERE c_acctbal > 7500)
      SELECT CASE
          WHEN b.custkey IS NOT NULL AND r.custkey IS NOT NULL THEN 'both'
          WHEN b.custkey IS NOT NULL THEN 'buyer_only'
          ELSE 'rich_only' END AS bucket,
        count(*) AS n_customers,
        CAST(sum(COALESCE(b.n_orders, 0)) AS BIGINT) AS orders
      FROM buyers b FULL OUTER JOIN rich r ON b.custkey = r.custkey
      GROUP BY 1 ORDER BY bucket"""))

  // ---- q82: correlated EXISTS / NOT EXISTS through the SQL path --------
  // The subquery shapes q22's scalar form doesn't cover; planned by
  // Spark as semi/anti joins (q04/q06's physical shapes, reached from
  // SQL text).

  private val q82 = GraftQuery(
    "q82_exists_subquery",
    (s, d) => {
      Tables.registerAllOnce(s, d)
      s.sql("""SELECT n_name,
          (SELECT count(*) FROM customer c
            WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000)
            AS n_rich,
          EXISTS (SELECT 1 FROM supplier s
            WHERE s.s_nationkey = n.n_nationkey) AS has_supplier
        FROM nation n
        WHERE EXISTS (SELECT 1 FROM customer c
          WHERE c.c_nationkey = n.n_nationkey)
        ORDER BY n_name""")
    },
    Some("""SELECT n_name,
        (SELECT count(*) FROM customer c
          WHERE c.c_nationkey = n.n_nationkey AND c.c_acctbal > 9000) AS n_rich,
        EXISTS (SELECT 1 FROM supplier s
          WHERE s.s_nationkey = n.n_nationkey) AS has_supplier
      FROM nation n
      WHERE EXISTS (SELECT 1 FROM customer c
        WHERE c.c_nationkey = n.n_nationkey)
      ORDER BY n_name"""))

  // ---- q88: funnel analysis (sequential event-pattern matching) --------
  // view → click (within 1 day of the first view) → purchase (within
  // 1 day of that click), per user. Spark-first shape: ONE groupBy
  // collecting each user's (ts, type) events, then an intra-row
  // state-machine fold over the time-sorted array — a single shuffle
  // where the naive formulation is three aggregate+join rounds (which
  // is exactly what the DuckDB oracle runs, proving the fold against
  // the relational semantics). Per-user event counts are bounded
  // (sessions, not corpora), so the collected array is small; strict
  // `>` on timestamps makes equal-ts order irrelevant and the result
  // deterministic.

  private val q88 = GraftQuery(
    "q88_funnel",
    (s, d) => {
      val evs = ev(s, d).select(col("user_id"), col("ts"), col("event_type"))
      val perUser = evs.groupBy(col("user_id"))
        .agg(array_sort(collect_list(struct(col("ts"), col("event_type"))))
          .as("_evs"))
      val day = expr("INTERVAL 1 DAY")
      val stage = aggregate(col("_evs"),
        struct(lit(0).as("stage"),
          lit(null).cast(TimestampType).as("tv"),
          lit(null).cast(TimestampType).as("tc")),
        (acc, e) => {
          val ts = e.getField("ts")
          val et = e.getField("event_type")
          val st = acc.getField("stage")
          when(st === 0 && et === "view",
            struct(lit(1).as("stage"), ts.as("tv"),
              acc.getField("tc").as("tc")))
            .when(st === 1 && et === "click" &&
              ts > acc.getField("tv") && ts <= acc.getField("tv") + day,
              struct(lit(2).as("stage"), acc.getField("tv").as("tv"),
                ts.as("tc")))
            .when(st === 2 && et === "purchase" &&
              ts > acc.getField("tc") && ts <= acc.getField("tc") + day,
              struct(lit(3).as("stage"), acc.getField("tv").as("tv"),
                acc.getField("tc").as("tc")))
            .otherwise(acc)
        }).getField("stage")
      val staged = perUser.select(stage.as("_stage"))
      staged.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("_stage") >= 1, 1L).otherwise(0L)).as("reached_view"),
        sum(when(col("_stage") >= 2, 1L).otherwise(0L)).as("reached_click"),
        sum(when(col("_stage") >= 3, 1L).otherwise(0L)).as("reached_purchase"))
        .select(col("n_users"), col("reached_view"), col("reached_click"),
          col("reached_purchase"),
          (floor(col("reached_click").cast(DoubleType) /
            col("reached_view").cast(DoubleType) * 1e6 + 0.5) / 1e6)
            .as("view_to_click"),
          (floor(col("reached_purchase").cast(DoubleType) /
            col("reached_click").cast(DoubleType) * 1e6 + 0.5) / 1e6)
            .as("click_to_purchase"))
    },
    Some("""WITH ev AS (SELECT user_id, ts, event_type FROM events),
      a1 AS (SELECT user_id,
          min(ts) FILTER (WHERE event_type = 'view') AS tv
        FROM ev GROUP BY user_id),
      a2 AS (SELECT ev.user_id,
          min(ts) FILTER (WHERE event_type = 'click'
            AND ts > tv AND ts <= tv + INTERVAL 1 DAY) AS tc
        FROM ev JOIN a1 USING (user_id) GROUP BY ev.user_id),
      a3 AS (SELECT ev.user_id,
          min(ts) FILTER (WHERE event_type = 'purchase'
            AND ts > tc AND ts <= tc + INTERVAL 1 DAY) AS tp
        FROM ev JOIN a2 USING (user_id) GROUP BY ev.user_id)
      SELECT count(*) AS n_users,
        count(tv) AS reached_view,
        count(tc) AS reached_click,
        count(tp) AS reached_purchase,
        floor(CAST(count(tc) AS DOUBLE) / count(tv) * 1e6 + 0.5) / 1e6
          AS view_to_click,
        floor(CAST(count(tp) AS DOUBLE) / count(tc) * 1e6 + 0.5) / 1e6
          AS click_to_purchase
      FROM a1 JOIN a2 USING (user_id) JOIN a3 USING (user_id)"""))

  // ---- q89: cohort retention --------------------------------------------
  // Users cohorted by the week of their first event; retention is the
  // distinct-user count per (cohort week, weeks-since-cohort). Two
  // aggregations and one join back on user_id — the join reuses the
  // first aggregation's hash partitioning, so the whole query costs
  // two exchanges. Week arithmetic stays on Monday-truncated dates,
  // where days/7 is exact in any engine.

  private val q89 = GraftQuery(
    "q89_cohort_retention",
    (s, d) => {
      val evs = ev(s, d).select(col("user_id"), col("ts"))
      val cohorts = evs.groupBy(col("user_id"))
        .agg(date_trunc("week", min(col("ts"))).cast(DateType).as("cohort_week"))
      evs
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast(DateType).as("activity_week"))
        .distinct()
        .join(cohorts, Seq("user_id"))
        .select(col("cohort_week"),
          (datediff(col("activity_week"), col("cohort_week")) / 7)
            .cast(IntegerType).as("week_index"))
        .groupBy(col("cohort_week"), col("week_index"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy(col("cohort_week"), col("week_index"))
    },
    Some("""WITH c AS (
        SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
        FROM events GROUP BY user_id),
      act AS (
        SELECT DISTINCT user_id,
          CAST(date_trunc('week', ts) AS DATE) AS activity_week
        FROM events)
      SELECT cohort_week,
        CAST(date_diff('day', cohort_week, activity_week) // 7 AS INT)
          AS week_index,
        count(*) AS n_active
      FROM act JOIN c USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_week, week_index"""))

  // ---- q148: bucketed interval join -----------------------------------
  // Point-in-range without the nested loop (events inside one-hour
  // incident windows — every 97th event opens one): ScaleOps
  // .intervalJoin cuts time into 1-hour cells, expands each window to
  // its covering cells, and runs an EQUI-join on the cell id with the
  // exact half-open range predicate as a post-filter — Spark's native
  // plan for a bare range join is BroadcastNestedLoopJoin, O(points ×
  // intervals). The oracle is DuckDB's direct range join, so the
  // bucketization's exactness (cell coverage, the [start, end)
  // boundary, no duplicate pairs) is what the hash gates; money-style
  // DECIMAL summation keeps the double aggregate order-independent.

  private val q148 = GraftQuery(
    "q148_interval_join",
    (s, d) => {
      val events = ev(s, d)
      val windows = events.filter(col("event_id") % 97 === 0)
        .select(col("event_id").as("incident_id"),
          col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      graft.operators.ScaleOps.intervalJoin(
          events.select(col("event_id"), col("ts"), col("value")),
          windows, "ts", "w_start", "w_end", bucketWidth = 3600L)
        .groupBy(col("incident_id"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value").cast(DecimalType(38, 10))), 4)
            .cast(DoubleType).as("value_sum"))
        .orderBy(col("incident_id"))
    },
    Some("""WITH w AS (SELECT event_id AS incident_id, ts AS w_start,
        ts + INTERVAL 1 HOUR AS w_end
      FROM events WHERE event_id % 97 = 0)
      SELECT incident_id, CAST(count(*) AS BIGINT) AS n_events,
        CAST(round(sum(CAST(value AS DECIMAL(38,10))), 4) AS DOUBLE)
          AS value_sum
      FROM w JOIN events e ON e.ts >= w.w_start AND e.ts < w.w_end
      GROUP BY incident_id ORDER BY incident_id"""))

  // ---- q163: skew-proof salted join ------------------------------------
  // ScaleOps.saltedJoin driven end-to-end: lineitem (fact) against the
  // part dimension with the key spread over 8 salts — the manual lever
  // for a hot key that would OOM a task before AQE can split it. The
  // oracle is the PLAIN join (salting must be invisible in the
  // result): per-brand counts and DECIMAL revenue — a lost or
  // double-counted row under the salt spread flips both.

  private val q163 = GraftQuery(
    "q163_salted_join",
    (s, d) => {
      val fact = li(s, d).select(col("l_partkey").as("partkey"),
        col("l_orderkey"), col("l_extendedprice"))
      val dim = part(s, d).select(col("p_partkey").as("partkey"),
        col("p_brand"))
      graft.operators.ScaleOps.saltedJoin(fact, dim, "partkey",
          saltSrc = col("l_orderkey"), numSalts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          asMoney(sum(dmoney(col("l_extendedprice")))).as("revenue"))
        .orderBy(col("p_brand"))
    },
    Some("""SELECT p_brand,
        count(*) AS n_items,
        CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
          AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand"""))

  // ---- q164: event-rate anomaly monitor --------------------------------
  // Ops-side monitoring over the events stream: hourly census per
  // event type, each hour compared against its trailing-4-hour total
  // (integer cross-multiplication — no float rate anywhere): hour h is
  // anomalous when cnt·4 > 2·trailing4 with a full lookback window.
  // The census collapses events to (type × hour) rows — calendar-
  // bounded at any corpus scale, so the per-type ordered window is
  // executor-resident by construction.

  private val q164 = GraftQuery(
    "q164_event_anomaly",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hourly = ev(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
        .rowsBetween(-4, -1)
      hourly
        .select(col("event_type"), col("hour"), col("cnt"),
          sum(col("cnt")).over(w).as("_t4"),
          count(lit(1)).over(w).as("_n4"))
        .filter(col("_n4") === 4L)
        .select(col("event_type"), col("hour"), col("cnt"),
          col("_t4").as("trailing4"),
          (col("cnt") * 4L > col("_t4") * 2L).as("anomalous"))
        .filter(col("anomalous"))
        .orderBy(col("event_type"), col("hour"))
    },
    Some("""WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
          count(*) AS cnt
        FROM events GROUP BY event_type, date_trunc('hour', ts)),
      wd AS (
        SELECT event_type, hour, cnt,
          sum(cnt) OVER (PARTITION BY event_type ORDER BY hour
            ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS t4,
          count(*) OVER (PARTITION BY event_type ORDER BY hour
            ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS n4
        FROM hourly)
      SELECT event_type, hour, CAST(cnt AS BIGINT) AS cnt,
        CAST(t4 AS BIGINT) AS trailing4,
        cnt * 4 > t4 * 2 AS anomalous
      FROM wd WHERE n4 = 4 AND cnt * 4 > t4 * 2
      ORDER BY event_type, hour"""))

  /** The symmetrized customer↔part purchase graph as a materialized
    * edge table, shared by q153 and q166 (the docPairs/exactPairs
    * deployment shape): the lineitem⨝orders→distinct derivation runs
    * once per JVM and dir; both PageRank variants then feed their
    * checkpointed loops from 2-column parquet and pass
    * `assumeDistinct` (cp is deduped and the c:/p: prefixes make the
    * union branches disjoint). */
  private val edgesDirByInput = new graft.sources.JvmMemo[String]
  private def purchaseEdgesMaterialized(s: SparkSession,
                                        d: String): DataFrame =
    s.read.parquet(
      LlmOps.materializedTempDir(edgesDirByInput, d, "graft_edges_") { out =>
        val cp = li(s, d)
          .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("src"),
            concat(lit("p:"), col("l_partkey")).as("dst"))
          .distinct()
        cp.union(cp.select(col("dst").as("src"), col("src").as("dst")))
          .write.mode("overwrite").parquet(out)
      })

  // ---- q153: PageRank centrality over the purchase graph -------------
  // Who-buys-what as a symmetric bipartite graph (customer↔part via
  // lineitem), 3 damped integer iterations, top-25 board. The oracle
  // unrolls every round — base mass, degree division, in-mass sums,
  // the damped update — in the same non-negative int64/HUGEINT
  // arithmetic, so a drifted join, a lost dangling-mass policy or a
  // float anywhere flips the hash. Symmetrizing the edge set is the
  // dangling-node policy (see Graph.pageRank's scaladoc).

  private val q153 = GraftQuery(
    "q153_pagerank",
    (s, d) =>
      graft.operators.Graph.pageRank(purchaseEdgesMaterialized(s, d),
          "src", "dst", iters = 3, assumeDistinct = true)
        .orderBy(col("score").desc, col("node")).limit(25),
    Some("""WITH cp AS (SELECT DISTINCT 'c:' || o_custkey AS src,
          'p:' || l_partkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS (SELECT src, dst FROM cp UNION SELECT dst, src FROM cp),
      n AS (SELECT DISTINCT src AS node FROM e),
      c AS (SELECT count(*) AS nn FROM n),
      deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
      r0 AS (SELECT node, 1000000000000 // c.nn AS base,
          1000000000000 // c.nn AS r FROM n, c),
      i1 AS (SELECT e.dst AS node, sum(r0.r // deg.d) AS m
        FROM r0 JOIN deg ON deg.src = r0.node JOIN e ON e.src = r0.node
        GROUP BY e.dst),
      r1 AS (SELECT r0.node, r0.base,
          (15 * r0.base) // 100 + (85 * coalesce(i1.m, 0)) // 100 AS r
        FROM r0 LEFT JOIN i1 ON i1.node = r0.node),
      i2 AS (SELECT e.dst AS node, sum(r1.r // deg.d) AS m
        FROM r1 JOIN deg ON deg.src = r1.node JOIN e ON e.src = r1.node
        GROUP BY e.dst),
      r2 AS (SELECT r1.node, r1.base,
          (15 * r1.base) // 100 + (85 * coalesce(i2.m, 0)) // 100 AS r
        FROM r1 LEFT JOIN i2 ON i2.node = r1.node),
      i3 AS (SELECT e.dst AS node, sum(r2.r // deg.d) AS m
        FROM r2 JOIN deg ON deg.src = r2.node JOIN e ON e.src = r2.node
        GROUP BY e.dst),
      r3 AS (SELECT r2.node, r2.base,
          (15 * r2.base) // 100 + (85 * coalesce(i3.m, 0)) // 100 AS r
        FROM r2 LEFT JOIN i3 ON i3.node = r2.node)
      SELECT node, CAST(r AS BIGINT) AS score FROM r3
      ORDER BY score DESC, node LIMIT 25"""))

  // ---- q166: personalized PageRank (segment-seeded) -------------------
  // q153's purchase graph ranked AS SEEN FROM nation 7's customers:
  // teleport mass lands only on that segment's customer nodes, and the
  // board keeps the top product ('p:') nodes — "what this segment's
  // graph neighborhood buys", the recommendation variant. The oracle
  // unrolls the same three damped rounds with the seed-conditional
  // base mass (in-graph seeds only — absent seeds shrink no share).

  private val q166 = GraftQuery(
    "q166_personalized_pagerank",
    (s, d) => {
      val seeds = cust(s, d).filter(col("c_nationkey") === 7)
        .select(concat(lit("c:"), col("c_custkey")).as("node"))
      graft.operators.Graph.personalizedPageRank(
          purchaseEdgesMaterialized(s, d), "src", "dst",
          seeds, "node", iters = 3, assumeDistinct = true)
        .filter(col("node").startsWith("p:"))
        .orderBy(col("score").desc, col("node")).limit(25)
    },
    Some("""WITH cp AS (SELECT DISTINCT 'c:' || o_custkey AS src,
          'p:' || l_partkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      e AS (SELECT src, dst FROM cp UNION SELECT dst, src FROM cp),
      n AS (SELECT DISTINCT src AS node FROM e),
      sd AS (SELECT DISTINCT 'c:' || c_custkey AS node FROM customer
        WHERE c_nationkey = 7),
      sg AS (SELECT n.node FROM n JOIN sd USING (node)),
      c AS (SELECT count(*) AS ns FROM sg),
      deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
      r0 AS (SELECT n.node,
          CASE WHEN sg.node IS NOT NULL
            THEN 1000000000000 // c.ns ELSE 0 END AS base,
          CASE WHEN sg.node IS NOT NULL
            THEN 1000000000000 // c.ns ELSE 0 END AS r
        FROM n LEFT JOIN sg ON sg.node = n.node, c),
      i1 AS (SELECT e.dst AS node, sum(r0.r // deg.d) AS m
        FROM r0 JOIN deg ON deg.src = r0.node JOIN e ON e.src = r0.node
        GROUP BY e.dst),
      r1 AS (SELECT r0.node, r0.base,
          (15 * r0.base) // 100 + (85 * coalesce(i1.m, 0)) // 100 AS r
        FROM r0 LEFT JOIN i1 ON i1.node = r0.node),
      i2 AS (SELECT e.dst AS node, sum(r1.r // deg.d) AS m
        FROM r1 JOIN deg ON deg.src = r1.node JOIN e ON e.src = r1.node
        GROUP BY e.dst),
      r2 AS (SELECT r1.node, r1.base,
          (15 * r1.base) // 100 + (85 * coalesce(i2.m, 0)) // 100 AS r
        FROM r1 LEFT JOIN i2 ON i2.node = r1.node),
      i3 AS (SELECT e.dst AS node, sum(r2.r // deg.d) AS m
        FROM r2 JOIN deg ON deg.src = r2.node JOIN e ON e.src = r2.node
        GROUP BY e.dst),
      r3 AS (SELECT r2.node, r2.base,
          (15 * r2.base) // 100 + (85 * coalesce(i3.m, 0)) // 100 AS r
        FROM r2 LEFT JOIN i3 ON i3.node = r2.node)
      SELECT node, CAST(r AS BIGINT) AS score FROM r3
      WHERE node LIKE 'p:%'
      ORDER BY score DESC, node LIMIT 25"""))

  /** The DIRECTED customer→part edge set (distinct), materialized
    * once per (JVM, dir) — q294 and the q299 SQL door feed the HITS
    * loop from 2-column parquet (the purchaseEdgesMaterialized
    * shape); cp is distinct, so both pass `assumeDistinct`. */
  private val directedEdgesDirByInput = new graft.sources.JvmMemo[String]
  private def directedPurchaseEdgesMaterialized(s: SparkSession,
                                                d: String): DataFrame =
    s.read.parquet(
      LlmOps.materializedTempDir(directedEdgesDirByInput, d,
        "graft_dedges_") { out =>
        li(s, d)
          .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("src"),
            concat(lit("p:"), col("l_partkey")).as("dst"))
          .distinct()
          .write.mode("overwrite").parquet(out)
      })

  // ---- q294: HITS hubs & authorities over the purchase graph ---------
  // The DIRECTED customer→part graph through Graph.hits: PageRank
  // (q153) scores one centrality; HITS separates the two roles —
  // customers that buy broadly are HUBS, parts bought by good hubs
  // are AUTHORITIES — the asymmetry a crawl scheduler exploits
  // (authorities fill the corpus, hubs refill the frontier). Two
  // sum-normalized integer rounds; the oracle unrolls all four
  // half-steps — raw sums, the global totals, the integer quotient
  // normalization — in the same int64 arithmetic, so a drifted join
  // direction or a float norm anywhere flips the hash.

  private val q294 = GraftQuery(
    "q294_hits",
    (s, d) =>
      graft.operators.Graph.hits(
          directedPurchaseEdgesMaterialized(s, d), "src", "dst",
          iters = 2, assumeDistinct = true)
        .orderBy(col("auth_score").desc, col("node")).limit(25),
    Some("""WITH e AS (SELECT DISTINCT 'c:' || o_custkey AS src,
          'p:' || l_partkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      h0 AS (SELECT node, 1000000000 AS s FROM n),
      a0 AS (SELECT node, 1000000000 AS s FROM n),
      ra1 AS (SELECT e.dst AS node, sum(h0.s) AS r
        FROM e JOIN h0 ON e.src = h0.node GROUP BY e.dst),
      ta1 AS (SELECT greatest(sum(r), 1) AS t FROM ra1),
      a1 AS (SELECT n.node,
          coalesce(ra1.r, 0) // greatest(ta1.t // 1000000000, 1) AS s
        FROM n LEFT JOIN ra1 ON ra1.node = n.node, ta1),
      rh1 AS (SELECT e.src AS node, sum(a1.s) AS r
        FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
      th1 AS (SELECT greatest(sum(r), 1) AS t FROM rh1),
      h1 AS (SELECT n.node,
          coalesce(rh1.r, 0) // greatest(th1.t // 1000000000, 1) AS s
        FROM n LEFT JOIN rh1 ON rh1.node = n.node, th1),
      ra2 AS (SELECT e.dst AS node, sum(h1.s) AS r
        FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
      ta2 AS (SELECT greatest(sum(r), 1) AS t FROM ra2),
      a2 AS (SELECT n.node,
          coalesce(ra2.r, 0) // greatest(ta2.t // 1000000000, 1) AS s
        FROM n LEFT JOIN ra2 ON ra2.node = n.node, ta2),
      rh2 AS (SELECT e.src AS node, sum(a2.s) AS r
        FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src),
      th2 AS (SELECT greatest(sum(r), 1) AS t FROM rh2),
      h2 AS (SELECT n.node,
          coalesce(rh2.r, 0) // greatest(th2.t // 1000000000, 1) AS s
        FROM n LEFT JOIN rh2 ON rh2.node = n.node, th2)
      SELECT h2.node, CAST(h2.s AS BIGINT) AS hub_score,
        CAST(a2.s AS BIGINT) AS auth_score
      FROM h2 JOIN a2 ON h2.node = a2.node
      ORDER BY auth_score DESC, h2.node LIMIT 25"""))

  // ---- q298/q299: the link-analysis tier from pure SQL --------------------
  // q153 and q294 reached entirely through the parser: the
  // MATERIALIZED edge tables register as temp views (the q231/q232
  // registered-index pattern — the SQL persona probes build-once
  // artifacts; the first cut derived the edges inside the view per
  // call and benched 11.7 s, the slowest row in the battery, where
  // q153's materialized feed runs ~5 s), the `page_rank`/`hits` TVFs
  // run the exact Scala operators (their iterated integer loops
  // execute at resolution; the plans read the checkpointed scores),
  // and the oracles are q153's/q294's VERBATIM — the doors must add
  // no semantics.

  private val q298 = GraftQuery(
    "q298_sql_pagerank",
    (s, d) => {
      purchaseEdgesMaterialized(s, d).createOrReplaceTempView("pr_edges")
      s.sql("""SELECT node, score
        FROM page_rank('pr_edges', 'src', 'dst', 3)
        ORDER BY score DESC, node LIMIT 25""")
    },
    q153.oracle)

  private val q299 = GraftQuery(
    "q299_sql_hits",
    (s, d) => {
      directedPurchaseEdgesMaterialized(s, d)
        .createOrReplaceTempView("hits_edges")
      s.sql("""SELECT node, hub_score, auth_score
        FROM hits('hits_edges', 'src', 'dst', 2)
        ORDER BY auth_score DESC, node LIMIT 25""")
    },
    q294.oracle)

  /** Canonical co-purchase pair counts (`pa < pb`, weight = #distinct
    * orders containing both) as a materialized table shared by q169
    * (weight floor → triangle edges) and q182 (directed rules are the
    * canonical counts mirrored — exact, since a directed (a,b) count
    * equals the canonical count of (min,max)): the lineitem self-join
    * — the expensive Σ basket² census — runs once per JVM and dir
    * (the purchaseEdges deployment shape). */
  private val pairsDirByInput = new graft.sources.JvmMemo[String]
  private def pairCountsMaterialized(s: SparkSession,
                                     d: String): org.apache.spark.sql.DataFrame =
    s.read.parquet(
      LlmOps.materializedTempDir(pairsDirByInput, d, "graft_copairs_") { out =>
        val pr = li(s, d)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        pr.as("a")
          .join(pr.as("b"), col("a.o") === col("b.o") &&
            col("a.p") < col("b.p"))
          .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
          .agg(count(lit(1)).as("w"))
          .write.mode("overwrite").parquet(out)
      })

  // ---- q169: co-purchase triangle census ------------------------------
  // Parts bought together in ≥ 2 distinct orders form the co-purchase
  // graph (the weight floor is what bounds the wedge join — raw
  // co-occurrence would be Σ deg² over 1.2 M edges); triangles are
  // its tight cluster cores. The oracle replays the projection, the
  // floor, the canonical a<b<c closure and the corner explode.

  private val q169 = GraftQuery(
    "q169_triangle_census",
    (s, d) => {
      val e = pairCountsMaterialized(s, d)
        .filter(col("w") >= 2)
        .select(col("pa"), col("pb"))
      graft.operators.Graph.triangleCensus(e, "pa", "pb")
        .orderBy(col("n_triangles").desc, col("node"))
    },
    Some("""WITH pr AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem),
      e AS (SELECT a.p AS pa, b.p AS pb
        FROM pr a JOIN pr b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      t AS (SELECT x.pa AS n1, x.pb AS n2, y.pb AS n3
        FROM e x JOIN e y ON x.pb = y.pa
        JOIN e z ON z.pa = x.pa AND z.pb = y.pb),
      u AS (SELECT unnest([n1, n2, n3]) AS node FROM t)
      SELECT node, count(*) AS n_triangles FROM u
      GROUP BY node ORDER BY n_triangles DESC, node"""))

  // ---- q172: key-skew report ------------------------------------------
  // ScaleOps.skewReport over the event stream's type key — the
  // measurement that sizes q163's salting lever ("measure, don't
  // guess"). The oracle replays the census, the integer ppm share and
  // the ceiling salt division.

  private val q172 = GraftQuery(
    "q172_skew_report",
    (s, d) => graft.operators.ScaleOps.skewReport(
      ev(s, d), "event_type", targetRowsPerTask = 500L, topN = 10),
    Some("""WITH c AS (SELECT event_type AS key, count(*) AS n_rows
        FROM events GROUP BY 1),
      t AS (SELECT sum(n_rows) AS total FROM c)
      SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
        CAST((n_rows * 1000000) // total AS BIGINT) AS share_ppm,
        CAST((n_rows + 499) // 500 AS BIGINT) AS n_salts
      FROM c, t ORDER BY n_rows DESC, key LIMIT 10"""))

  // ---- q180: rolling active users (DAU / WAU / stickiness) ------------
  // The engagement board every event pipeline ships: per day, distinct
  // daily actives, distinct trailing-7-day actives, and the
  // DAU/WAU stickiness ratio in ppm (integer div). The rolling
  // distinct is NOT a window (distinct doesn't decompose over
  // frames): each distinct (day, user) pair explodes to the ≤ 7
  // target days it supports — a 7× expansion of day-user pairs, never
  // a |days|× re-scan — and lands in ONE map-side-combined distinct
  // count per target day. Partial leading windows are reported as-is
  // (the standard convention).

  private val q180 = GraftQuery(
    "q180_rolling_actives",
    (s, d) => {
      val du = ev(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val grid = du.select(col("day")).distinct()
      val wau = du
        .select(col("day"), col("user_id"),
          explode(sequence(lit(0), lit(6))).as("_o"))
        .select(date_add(col("day"), col("_o")).as("day"), col("user_id"))
        .join(broadcast(grid), Seq("day"), "left_semi")
        .groupBy(col("day"))
        .agg(count_distinct(col("user_id")).as("wau"))
      val dau = du.groupBy(col("day"))
        .agg(count_distinct(col("user_id")).as("dau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
          expr("(dau * 1000000L) div wau").as("stickiness_ppm"))
        .orderBy(col("day"))
    },
    Some("""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
        FROM events),
      g AS (SELECT DISTINCT day FROM du),
      ex AS (SELECT du.day + CAST(o.o AS INTEGER) AS day, du.user_id
        FROM du, generate_series(0, 6) o(o)),
      wau AS (SELECT e.day, count(DISTINCT e.user_id) AS wau
        FROM ex e JOIN g ON g.day = e.day GROUP BY e.day),
      dau AS (SELECT day, count(DISTINCT user_id) AS dau
        FROM du GROUP BY day)
      SELECT d.day, CAST(d.dau AS BIGINT) AS dau,
        CAST(w.wau AS BIGINT) AS wau,
        CAST((d.dau * 1000000) // w.wau AS BIGINT) AS stickiness_ppm
      FROM dau d JOIN wau w USING (day) ORDER BY day"""))

  // ---- q182: market-basket association rules --------------------------
  // Association.associationRules over order baskets — "bought X also
  // bought Y" with integer confidence and STAGED-division lift (the
  // PMI overflow convention). The oracle replays the dedup, the
  // directed pair census, the support floor and both divisions.

  private val q182 = GraftQuery(
    "q182_association_rules",
    (s, d) => {
      val canon = pairCountsMaterialized(s, d)
      val directed = canon
        .select(col("pa").as("ante"), col("pb").as("cons"),
          col("w").as("n_ab"))
        .union(canon.select(col("pb").as("ante"), col("pa").as("cons"),
          col("w").as("n_ab")))
      graft.operators.Association.associationRulesFromCounts(directed,
        li(s, d).select(col("l_orderkey"), col("l_partkey")),
        "l_orderkey", "l_partkey", minPairSupport = 3L, topN = 25)
    },
    Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem),
      n AS (SELECT count(DISTINCT b) AS n FROM bi),
      ic AS (SELECT i, count(*) AS ni FROM bi GROUP BY i),
      pc AS (SELECT a.i AS ante, b.i AS cons, count(*) AS nab
        FROM bi a JOIN bi b ON a.b = b.b AND a.i <> b.i
        GROUP BY 1, 2 HAVING count(*) >= 3),
      r AS (SELECT pc.ante, pc.cons, pc.nab, ia.ni AS na, ib.ni AS nb,
          (pc.nab * 1000000) // ia.ni AS conf_ppm
        FROM pc JOIN ic ia ON ia.i = pc.ante
        JOIN ic ib ON ib.i = pc.cons)
      SELECT ante, cons, CAST(nab AS BIGINT) AS n_ab,
        CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        CAST(conf_ppm AS BIGINT) AS conf_ppm,
        CAST((conf_ppm * n.n) // nb AS BIGINT) AS lift_ppm
      FROM r, n ORDER BY lift_ppm DESC, ante, cons LIMIT 25"""))

  // ---- q187: co-purchase clustering coefficients ----------------------
  // Graph.clusteringCoefficients over the floored pair census — how
  // clique-like each part's co-purchase neighborhood is (1e6 = every
  // neighbor pair itself co-purchased). The oracle replays the floor,
  // the degree census, the triangle closure and the ppm division.

  private val q187 = GraftQuery(
    "q187_clustering_coeffs",
    (s, d) => {
      val e = pairCountsMaterialized(s, d)
        .filter(col("w") >= 2).select(col("pa"), col("pb"))
      graft.operators.Graph.clusteringCoefficients(e, "pa", "pb")
        .orderBy(col("cc_ppm").desc, col("node"))
    },
    Some("""WITH pr AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        FROM lineitem),
      e AS (SELECT a.p AS pa, b.p AS pb
        FROM pr a JOIN pr b ON a.o = b.o AND a.p < b.p
        GROUP BY 1, 2 HAVING count(*) >= 2),
      deg AS (SELECT node, count(*) AS degree FROM
        (SELECT pa AS node FROM e UNION ALL SELECT pb FROM e)
        GROUP BY node),
      t AS (SELECT x.pa AS n1, x.pb AS n2, y.pb AS n3
        FROM e x JOIN e y ON x.pb = y.pa
        JOIN e z ON z.pa = x.pa AND z.pb = y.pb),
      u AS (SELECT unnest([n1, n2, n3]) AS node FROM t),
      tc AS (SELECT node, count(*) AS nt FROM u GROUP BY node)
      SELECT d.node, CAST(d.degree AS BIGINT) AS degree,
        CAST(coalesce(tc.nt, 0) AS BIGINT) AS n_triangles,
        CAST(CASE WHEN d.degree < 2 THEN 0
          ELSE (coalesce(tc.nt, 0) * 2000000) //
            (d.degree * (d.degree - 1)) END AS BIGINT) AS cc_ppm
      FROM deg d LEFT JOIN tc ON tc.node = d.node
      ORDER BY cc_ppm DESC, d.node"""))

  // ---- q184/q186: the diagnostics TVF surface -------------------------
  // q172's skew report and q182's rules reached from pure SQL — parser
  // paths, not new semantics; oracles are the Scala twins' verbatim
  // (q186 runs the ad-hoc census tier, which equals the materialized
  // composition exactly).

  private val q184 = GraftQuery(
    "q184_sql_skew_report",
    (s, d) => {
      Tables.registerAllOnce(s, d)
      s.sql("""SELECT key, n_rows, share_ppm, n_salts
        FROM skew_report('events', 'event_type', 500, 10)
        ORDER BY n_rows DESC, key""")
    },
    Some("""WITH c AS (SELECT event_type AS key, count(*) AS n_rows
        FROM events GROUP BY 1),
      t AS (SELECT sum(n_rows) AS total FROM c)
      SELECT key, CAST(n_rows AS BIGINT) AS n_rows,
        CAST((n_rows * 1000000) // total AS BIGINT) AS share_ppm,
        CAST((n_rows + 499) // 500 AS BIGINT) AS n_salts
      FROM c, t ORDER BY n_rows DESC, key LIMIT 10"""))

  private val q186 = GraftQuery(
    "q186_sql_association",
    (s, d) => {
      Tables.registerAllOnce(s, d)
      s.sql("""SELECT ante, cons, n_ab, n_a, n_b, conf_ppm, lift_ppm
        FROM association_rules('lineitem', 'l_orderkey', 'l_partkey', 3, 25)
        ORDER BY lift_ppm DESC, ante, cons""")
    },
    Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem),
      n AS (SELECT count(DISTINCT b) AS n FROM bi),
      ic AS (SELECT i, count(*) AS ni FROM bi GROUP BY i),
      pc AS (SELECT a.i AS ante, b.i AS cons, count(*) AS nab
        FROM bi a JOIN bi b ON a.b = b.b AND a.i <> b.i
        GROUP BY 1, 2 HAVING count(*) >= 3),
      r AS (SELECT pc.ante, pc.cons, pc.nab, ia.ni AS na, ib.ni AS nb,
          (pc.nab * 1000000) // ia.ni AS conf_ppm
        FROM pc JOIN ic ia ON ia.i = pc.ante
        JOIN ic ib ON ib.i = pc.cons)
      SELECT ante, cons, CAST(nab AS BIGINT) AS n_ab,
        CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        CAST(conf_ppm AS BIGINT) AS conf_ppm,
        CAST((conf_ppm * n.n) // nb AS BIGINT) AS lift_ppm
      FROM r, n ORDER BY lift_ppm DESC, ante, cons LIMIT 25"""))

  // ---- q213: item-item cosine similarity (collaborative filtering) ----
  // The "customers also bought" board beside q182's rules: cosine
  // normalization (squared, to stay rational — sim_micro =
  // n_ab²·10⁶ div (n_a·n_b)) over the SAME materialized canonical
  // pair census, per-item top-3 through the bounded heap. Rules rank
  // by confidence/lift (directional); cosine is the symmetric
  // geometry the recommender tier uses.

  private val q213 = GraftQuery(
    "q213_item_similarity",
    (s, d) => {
      val canon = pairCountsMaterialized(s, d)
      val directed = canon
        .select(col("pa").as("item"), col("pb").as("nbr"),
          col("w").as("n_ab"))
        .union(canon.select(col("pb").as("item"), col("pa").as("nbr"),
          col("w").as("n_ab")))
        .filter(col("n_ab") >= 3)
      val ic = li(s, d)
        .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
        .distinct()
        .groupBy(col("i")).agg(count(lit(1)).as("ni"))
      val scored = directed
        .join(ic.select(col("i").as("item"), col("ni").as("n_a")),
          Seq("item"))
        .join(ic.select(col("i").as("nbr"), col("ni").as("n_b")),
          Seq("nbr"))
        .withColumn("sim_micro",
          expr("(n_ab * n_ab * 1000000L) div (n_a * n_b)"))
      graft.plans.TopKPerGroup(scored, Seq("item"),
          Seq(("sim_micro", false), ("nbr", true)), 3)
        .select(col("item"), col("nbr"), col("n_ab"),
          col("sim_micro"))
        .orderBy(col("item"), col("sim_micro").desc, col("nbr"))
    },
    Some("""WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
        FROM lineitem),
      ic AS (SELECT i, count(*) AS ni FROM bi GROUP BY i),
      pc AS (SELECT a.i AS pa, b.i AS pb, count(*) AS w
        FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
        GROUP BY 1, 2),
      dir AS (SELECT pa AS item, pb AS nbr, w FROM pc
        UNION ALL SELECT pb, pa, w FROM pc),
      sc AS (SELECT dir.item, dir.nbr, dir.w AS n_ab,
          (dir.w * dir.w * 1000000) // (ca.ni * cb.ni) AS sim_micro
        FROM dir JOIN ic ca ON ca.i = dir.item
        JOIN ic cb ON cb.i = dir.nbr
        WHERE dir.w >= 3),
      r AS (SELECT *, row_number() OVER (PARTITION BY item
          ORDER BY sim_micro DESC, nbr) AS rn FROM sc)
      SELECT item, nbr, CAST(n_ab AS BIGINT) AS n_ab,
        CAST(sim_micro AS BIGINT) AS sim_micro
      FROM r WHERE rn <= 3
      ORDER BY item, sim_micro DESC, nbr"""))

  def all: Seq[GraftQuery] =
    Seq(q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q27, q28, q81,
      q82, q88, q89, q148, q153, q163, q164, q166, q169, q172, q180, q182,
      q184, q186, q187, q213, q294, q298, q299)
}
