package graft.queries

import org.apache.spark.sql.functions._
import Tables._

/** Analytic headliners over the TPC-H-ish tables — the A2 "metrics over an
  * events log" family (SURVEY.md §2.7) generalized to the scan-heavy
  * aggregations a 100 TB deployment would actually run.
  *
  * Scale design:
  *  - Fact table (`lineitem`/`orders`) is only ever scanned once per query;
  *    filters + column pruning push into the parquet reader.
  *  - All dimension joins are explicit `broadcast()` — at 100 TB the facts
  *    are TBs but region/nation/customer/supplier stay broadcastable;
  *    no shuffle of the big side, the only exchange is the final partial →
  *    final aggregation on the (low-cardinality) group keys.
  *  - Top-k uses sort-free TakeOrderedAndProject (orderBy+limit).
  */
object AnalyticsQueries {

  val queries: Map[String, Q] = Map(
    // TPC-H Q1 shape: pricing summary — single scan, partial aggs
    "q1_pricing_summary" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus")).agg(
          moneySum(col("l_quantity")).as("sum_qty"),
          moneySum(col("l_extendedprice")).as("sum_base_price"),
          round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
            .cast("double").as("sum_disc_price"),
          exactAvg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q3 shape: revenue per order for one market segment, top 10.
    // customer is broadcast; lineitem⋈orders shuffles only the filtered keys.
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = load(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select("c_custkey")
      val ord = load(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = load(s, dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(broadcast(ord.join(broadcast(cust),
          col("o_custkey") === col("c_custkey"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(
          round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
            .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
    }),

    // TPC-H Q5 shape: revenue by nation — star join, all dims broadcast
    "q5_nation_volume" -> ((s, dir) => {
      val nat = load(s, dir, "nation")
      val reg = load(s, dir, "region")
      val sup = load(s, dir, "supplier")
      val li = load(s, dir, "lineitem")
        .select("l_suppkey", "l_extendedprice", "l_discount")
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name")).agg(
          round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // TPC-H Q6 shape: forecast revenue — pure scan+filter+agg, fully pushed
    "q6_forecast_revenue" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .filter(col("l_discount") >= 0.05 && col("l_discount") <= 0.07)
        .filter(col("l_quantity") < 24)
        .agg(
          round(sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)")), 2)
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))),

    // TPC-H Q4 shape: order-priority count with EXISTS — left-semi join
    // (no row multiplication, the semi side never materializes)
    "q4_order_priority" -> ((s, dir) => {
      val lateLines = load(s, dir, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select("l_orderkey")
      load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .join(lateLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q12 shape: conditional aggregation (CASE-sum) after a semi-ish
    // join — one scan of each side, broadcast of the filtered orders keys
    "q12_priority_lines" -> ((s, dir) => {
      val ord = load(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_returnflag")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(
          sum(when(col("l_returnflag") === "R", 1).otherwise(0))
            .cast("bigint").as("returned_lines"),
          sum(when(col("l_returnflag") =!= "R", 1).otherwise(0))
            .cast("bigint").as("kept_lines"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q14 shape: promo-revenue ratio — conditional DECIMAL sums,
    // single IEEE division at the end
    "q14_promo_effect" -> ((s, dir) =>
      load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp"))
        .filter(col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .join(broadcast(load(s, dir, "part")
          .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          (round(sum(when(col("p_type").startsWith("SMALL"),
            col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)")))
            .otherwise(lit(0).cast("decimal(18,2)"))), 2).cast("double") /
            round(sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1) - col("l_discount").cast("decimal(18,2)"))), 2)
              .cast("double")).as("promo_ratio"),
          count(lit(1)).as("n_lines"))),

    // TPC-H Q18 shape: large-volume orders — aggregate-then-filter
    // (HAVING) feeding a second join; the HAVING side is tiny ⇒ broadcast
    "q18_large_orders" -> ((s, dir) => {
      val big = load(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(moneySum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150)
      load(s, dir, "orders")
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          moneyCol(col("o_totalprice")).as("o_totalprice"), col("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey")).limit(20)
    }),

    // TPC-H Q17 shape: correlated aggregate threshold — revenue from
    // lineitems below 40% of their part's average quantity. The
    // correlated scalar subquery decorrelates to a per-part aggregate
    // joined back; parts are the small side at any scale of lineitem.
    "q17_small_quantity" -> ((s, dir) => {
      val li = load(s, dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val avgQty = li.groupBy(col("l_partkey"))
        .agg((sum(col("l_quantity").cast("decimal(18,2)")).cast("double") /
          count(lit(1))).as("avg_qty"))
      li.join(avgQty.toDF("p_key", "avg_qty"),
          col("l_partkey") === col("p_key"))
        .filter(col("l_quantity") < col("avg_qty") * 0.4)
        .agg(
          round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
            .cast("double").as("small_qty_revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // Anti-join shape (the NOT EXISTS family): customers who never placed
    // a large order — the filter pushes into the anti side's scan
    "q_customers_no_orders" -> ((s, dir) =>
      load(s, dir, "customer")
        .join(load(s, dir, "orders")
          .filter(col("o_totalprice") > 300000).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    // Top-k heavy hitters: customer spend, TakeOrderedAndProject (no global sort)
    "topk_customers" -> ((s, dir) => {
      val cust = load(s, dir, "customer").select("c_custkey", "c_name")
      load(s, dir, "orders")
        .groupBy(col("o_custkey")).agg(
          moneySum(col("o_totalprice")).as("spend"),
          count(lit(1)).as("n_orders"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("spend"), col("n_orders"))
        .orderBy(col("spend").desc, col("c_custkey")).limit(20)
    }),

    // Windowed analytics on the stream table: per-user running totals —
    // the "metrics over time" family (A2) with event-time semantics.
    // Product path: EventsCdc.runningTotals (user_id window shuffle only);
    // the ORDER BY here is oracle-harness determinism.
    "events_sessionized_stats" -> ((s, dir) =>
      graft.operators.EventsCdc.runningTotals(load(s, dir, "events"))
        .orderBy(col("event_id"))),

    // Gap-based sessionization via Spark's session_window() — the
    // Structured-Streaming session primitive, batch form: a session ends
    // after 1 day of user inactivity. The oracle rebuilds the same
    // islands with LAG + running sum. Start is rendered as a string for
    // engine-exact compare.
    "events_session_windows" -> ((s, dir) =>
      load(s, dir, "events")
        .withColumn("t", timestamp_micros(expr("ts div 1000")))
        .groupBy(col("user_id"), session_window(col("t"), "1 day").as("w"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("session_start"))),

    // Event-time tumbling windows via Spark's window() — the idiomatic
    // Structured-Streaming aggregation shape, batch form. Window start
    // rendered as a string so both engines compare exactly.
    "events_hourly_window" -> ((s, dir) =>
      load(s, dir, "events")
        .groupBy(
          window(timestamp_micros(expr("ts div 1000")), "1 hour").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), moneySum(col("value")).as("sum_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy(col("hour_start"), col("event_type"))),

    // Event-time bucketing (tumbling day windows, batch form): count+sum per
    // day per type. `ts` arrives as raw nanos (nanosAsLong read of the
    // parquet TIMESTAMP(NANOS) column) — integer-divide to micros, then
    // truncate; exact integer math, no float risk.
    "events_daily_rollup" -> ((s, dir) =>
      load(s, dir, "events")
        .groupBy(
          to_date(timestamp_micros(expr("ts div 1000"))).as("day"),
          col("event_type")).agg(
          count(lit(1)).as("n"),
          moneySum(col("value")).as("sum_value"))
        .orderBy(col("day"), col("event_type")))
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
                CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
                CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
                CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
                COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q3_shipping_priority" ->
      """SELECT o_orderkey,
                CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY o_orderkey
         ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q5_nation_volume" ->
      """SELECT r_name, n_name,
                CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS revenue,
                COUNT(*) AS n_items
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
           AND EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q12_priority_lines" ->
      """SELECT o_orderpriority,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned_lines,
                CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS kept_lines
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q14_promo_effect" ->
      """SELECT CAST(ROUND(SUM(CASE WHEN p_type LIKE 'SMALL%'
                       THEN CAST(l_extendedprice AS DECIMAL(18,2))
                            * (1 - CAST(l_discount AS DECIMAL(18,2)))
                       ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
                / CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE)
                  AS promo_ratio,
                COUNT(*) AS n_lines
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-03-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'""",
    "q18_large_orders" ->
      """WITH big AS (
           SELECT l_orderkey,
                  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_qty
           FROM lineitem GROUP BY l_orderkey
           HAVING CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) > 150)
         SELECT o_orderkey, o_custkey,
                CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,2)), 2) AS DOUBLE) AS o_totalprice,
                total_qty
         FROM orders JOIN big ON o_orderkey = l_orderkey
         ORDER BY total_qty DESC, o_orderkey LIMIT 20""",
    "q17_small_quantity" ->
      """WITH a AS (
           SELECT l_partkey AS p_key,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*) AS avg_qty
           FROM lineitem GROUP BY l_partkey)
         SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE)
                  AS small_qty_revenue,
                COUNT(*) AS n_lines
         FROM lineitem JOIN a ON l_partkey = p_key
         WHERE l_quantity < avg_qty * 0.4""",
    "q_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
         FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 300000)
         ORDER BY c_custkey""",
    "q6_forecast_revenue" ->
      """SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
                COUNT(*) AS n_items
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount >= 0.05 AND l_discount <= 0.07
           AND l_quantity < 24""",
    "topk_customers" ->
      """SELECT c_custkey, c_name,
                CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS spend,
                COUNT(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_custkey, c_name
         ORDER BY spend DESC, c_custkey LIMIT 20""",
    "events_sessionized_stats" ->
      """SELECT event_id, user_id,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
                  PARTITION BY user_id ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
                CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id) AS BIGINT) AS seq
         FROM events ORDER BY event_id""",
    "events_session_windows" ->
      """WITH m AS (
           SELECT user_id, ts, value,
                  CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 1 DAY THEN 1 ELSE 0 END AS brk
           FROM events),
         g AS (
           SELECT user_id, ts, value,
                  SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
           FROM m)
         SELECT user_id,
                strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
                COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
         FROM g GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "events_hourly_window" ->
      """SELECT strftime(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
                event_type, COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""",
    "events_daily_rollup" ->
      """SELECT CAST(DATE_TRUNC('day', ts) AS DATE) AS day, event_type,
                COUNT(*) AS n,
                CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY day, event_type"""
  )
}
