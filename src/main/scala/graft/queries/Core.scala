package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Det
import graft.tables.Tables

/** Core relational operator surface, re-expressed Spark-first over the
  * harness star schema.
  *
  * Covers every operator family in SURVEY.md §2 (scan, projection+cast,
  * SQL-string filter, groupBy-agg mean/stddev_samp/count, HAVING, desc sort,
  * top-k limit, set ops) plus the join/window/grouping-set breadth the
  * reference lacks but any real engine needs
  * (reference: CollegeScorecard.scala:70-157 for the parity shapes).
  *
  * Every query ends in a deterministic ORDER BY (unique tie-break) and every
  * float output goes through [[graft.ops.Det]] so the DuckDB oracle matches
  * bit-for-bit.
  *
  * Scale notes per query are inline; the common rules: filters and 9-of-N
  * column projections sit directly on the parquet scan (pushdown + pruning),
  * small dimensions are broadcast, aggregates are partial+final hash aggs,
  * top-k is TakeOrderedAndProject (no global sort materialization).
  */
object Core {

  /** q01 — TPC-H Q1 shape: pricing summary.
    * scan → filter (pushed to parquet) → groupBy(2 low-card keys) →
    * 6 aggregates (partial+final hash agg, map-side combine) → sort.
    * At 100 TB: the only shuffle is the 6-group exchange — minimal. */
  def q01Pricing(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Det.dsum(col("l_quantity")).as("sum_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_base_price"),
        Det.davg(col("l_quantity")).as("avg_qty"),
        Det.davg(col("l_extendedprice")).as("avg_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${Det.sqlSum("l_quantity")} AS sum_qty,
       |  ${Det.sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${Det.sqlAvg("l_quantity")} AS avg_qty,
       |  ${Det.sqlAvg("l_extendedprice")} AS avg_price,
       |  ${Det.sqlAvg("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-01-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — reference Q2 shape (fiveTexasCollegesWithHighestMedianDebt,
    * CollegeScorecard.scala:102-119): filter → project/cast → top-k.
    * Unique-key tie-break makes top-k deterministic.
    * Plans as TakeOrderedAndProject: each partition keeps 5 rows, driver
    * merges — O(k) memory regardless of input size. */
  def q02TopOrders(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter("o_orderstatus == 'F' AND o_totalprice IS NOT NULL")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(5)

  val q02Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_orderstatus == 'F' AND o_totalprice IS NOT NULL
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 5""".stripMargin

  /** q03 — reference Q3 shape (completionRateStatsInTexasByCity,
    * CollegeScorecard.scala:142-157): filter → groupBy →
    * {mean, stddev_samp, count} → HAVING count>1 → sort desc. */
  def q03StatsHaving(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter("l_returnflag == 'A' AND l_quantity IS NOT NULL")
      .groupBy(col("l_linestatus"))
      .agg(
        Det.davg(col("l_quantity")).as("qty_mean"),
        Det.dstddev(col("l_quantity")).as("qty_stddev"),
        count(lit(1)).as("cnt"))
      .filter("cnt > 1")
      .orderBy(col("qty_mean").desc, col("l_linestatus"))

  val q03Sql: String =
    s"""SELECT l_linestatus,
       |  ${Det.sqlAvg("l_quantity")} AS qty_mean,
       |  ${Det.sqlStddev("l_quantity")} AS qty_stddev,
       |  count(*) AS cnt
       |FROM lineitem
       |WHERE l_returnflag == 'A' AND l_quantity IS NOT NULL
       |GROUP BY l_linestatus
       |HAVING count(*) > 1
       |ORDER BY qty_mean DESC, l_linestatus""".stripMargin

  /** q04 — 3-way join + agg (TPC-H Q3 family): customer ⋈ orders ⋈ lineitem,
    * revenue per market segment.
    * At scale: customer⋈orders and orders⋈lineitem are shuffle joins on
    * their natural keys; the final groupBy(c_mktsegment) is a 5-group
    * exchange. AQE handles skew. Revenue uses exact decimal arithmetic. */
  def q04SegmentRevenue(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val rev = (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(java.math.BigDecimal.ONE).cast("decimal(18,2)") -
        col("l_discount").cast("decimal(18,2)")))
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(rev).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_mktsegment"))
  }

  val q04Sql: String =
    """SELECT c_mktsegment,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS revenue,
      |  count(*) AS n_items
      |FROM customer, orders, lineitem
      |WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_mktsegment
      |ORDER BY revenue DESC, c_mktsegment""".stripMargin

  /** q05 — broadcast-join rollup over the dimension chain
    * region ⋈ nation ⋈ customer. region+nation are tiny at every scale →
    * explicit broadcast() keeps the plan shuffle-free until the final agg. */
  def q05RegionStats(s: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(s, dir)
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        Det.dsum(col("c_acctbal")).as("total_acctbal"))
      .orderBy(col("r_name"), col("n_name"))
  }

  val q05Sql: String =
    s"""SELECT r_name, n_name, count(*) AS n_customers,
       |  ${Det.sqlSum("c_acctbal")} AS total_acctbal
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  /** q06 — per-group top-k via window: 2 highest-value orders per customer.
    * One shuffle on o_custkey; window runs within partitions. At scale this
    * beats global sort by never materializing a total order. */
  def q06WindowTopN(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 2)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  val q06Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk
      |  FROM orders)
      |WHERE rnk <= 2
      |ORDER BY o_custkey, rnk""".stripMargin

  /** q07 — semi/anti joins: customers with no orders, counted per segment.
    * left_anti avoids materializing the join — at scale Spark turns this
    * into a broadcast-anti or shuffled-anti without row explosion. */
  def q07AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir).filter("o_orderpriority == '1-URGENT'")
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers_no_urgent"))
      .orderBy(col("c_mktsegment"))
  }

  val q07Sql: String =
    """SELECT c_mktsegment, count(*) AS n_customers_no_urgent
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority == '1-URGENT')
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** q08 — set ops (reference test idiom U1-U3, DataTest.scala:120):
    * high-balance customer keys ∩ ordering customers, minus suppliers' keys.
    * intersect/except plan as semi/anti joins + distinct. */
  def q08SetOps(s: SparkSession, dir: String): DataFrame = {
    val rich    = Tables.customer(s, dir).filter("c_acctbal > 5000")
      .select(col("c_custkey").as("id"))
    val orderers = Tables.orders(s, dir).select(col("o_custkey").as("id"))
    val supp    = Tables.supplier(s, dir).select(col("s_suppkey").as("id"))
    rich.intersect(orderers).except(supp).orderBy(col("id"))
  }

  val q08Sql: String =
    """SELECT c_custkey AS id FROM customer WHERE c_acctbal > 5000
      |INTERSECT
      |SELECT o_custkey AS id FROM orders
      |EXCEPT
      |SELECT s_suppkey AS id FROM supplier
      |ORDER BY id""".stripMargin

  /** q09 — distinct counts per group. countDistinct shuffles on
    * (group, value) then re-aggregates — Spark's expand+2-phase plan.
    * (At 100 TB prefer approx_count_distinct when exactness isn't needed —
    * see Ext queries.) */
  def q09DistinctCounts(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  val q09Sql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q10 — ROLLUP grouping sets; grouping nulls are coalesced to 'ALL' so
    * null-ordering differences between engines can't matter. */
  def q10Rollup(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(Det.dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  val q10Sql: String =
    s"""SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       |  coalesce(l_linestatus, 'ALL') AS linestatus,
       |  ${Det.sqlSum("l_quantity")} AS sum_qty,
       |  count(*) AS n
       |FROM lineitem
       |GROUP BY ROLLUP(l_returnflag, l_linestatus)
       |ORDER BY returnflag, linestatus""".stripMargin

  /** q11 — TPC-H Q4 shape: order-priority count for orders having at least
    * one returned lineitem (EXISTS → left_semi, no row multiplication). */
  def q11PriorityExists(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir).filter("l_returnflag == 'R'")
      .select(col("l_orderkey"))
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  val q11Sql: String =
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_returnflag == 'R')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** q12 — conditional aggregation (TPC-H Q12 shape): when/otherwise inside
    * sums, one pass, no extra shuffle beyond the groupBy. */
  def q12ConditionalAgg(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_linestatus"))
  }

  val q12Sql: String =
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** q13 — string functions: upper/substring/length/LIKE over part. */
  def q13StringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  val q13Sql: String =
    """SELECT p_partkey, upper(p_brand) AS brand_uc,
      |  substring(p_type, 1, 5) AS type_prefix,
      |  CAST(length(p_name) AS BIGINT) AS name_len,
      |  concat_ws('|', p_brand, p_type) AS brand_type
      |FROM part
      |WHERE p_name LIKE '%a%'
      |ORDER BY p_partkey""".stripMargin

  /** q14 — date/time functions: per-(year, month) order stats. Computed
    * ints cast to BIGINT on both sides so schemas align. */
  def q14DateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("o_year"),
        month(col("o_orderdate")).cast("long").as("o_month"))
      .agg(
        count(lit(1)).as("n_orders"),
        Det.dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_year"), col("o_month"))

  val q14Sql: String =
    s"""SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
       |  CAST(extract(month FROM o_orderdate) AS BIGINT) AS o_month,
       |  count(*) AS n_orders,
       |  ${Det.sqlSum("o_totalprice")} AS total_price
       |FROM orders
       |GROUP BY 1, 2
       |ORDER BY o_year, o_month""".stripMargin

  /** q15 — tumbling time-window aggregation over events via the `window()`
    * function (the batch twin of the Structured Streaming pipeline in
    * graft.streaming). 1-hour windows align to epoch → identical to
    * date_trunc in the oracle. */
  def q15Tumbling(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        Det.dsum(col("value")).as("total_value"))
      .select(
        col("window.start").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("hour_start"), col("event_type"))

  val q15Sql: String =
    s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
       |  count(*) AS n_events,
       |  ${Det.sqlSum("value")} AS total_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY hour_start, event_type""".stripMargin

  /** q16 — gap-based sessionization (30-min inactivity) in one SQL-window
    * pass: lag → new-session flag → running sum → per-session agg. The
    * standard scalable formulation: one shuffle on user_id, sessions never
    * materialized driver-side. Streaming twin lives in graft.streaming. */
  def q16Sessionize(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        Det.dsum(col("value")).as("session_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  val q16Sql: String =
    s"""WITH flagged AS (
       |  SELECT user_id, event_id, ts, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
       |         THEN 1 ELSE 0 END AS new_sess
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sessions AS (
       |  SELECT user_id, ts, value,
       |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS session_idx
       |  FROM flagged)
       |SELECT user_id, session_idx, count(*) AS n_events,
       |  min(ts) AS session_start, max(ts) AS session_end,
       |  ${Det.sqlSum("value")} AS session_value
       |FROM sessions
       |GROUP BY user_id, session_idx
       |ORDER BY user_id, session_idx""".stripMargin

  /** Registry of this file's queries. */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing"      -> (q01Pricing _),
    "q02_top_orders"   -> (q02TopOrders _),
    "q03_stats_having" -> (q03StatsHaving _),
    "q04_segment_revenue" -> (q04SegmentRevenue _),
    "q05_region_stats" -> (q05RegionStats _),
    "q06_window_topn"  -> (q06WindowTopN _),
    "q07_anti_join"    -> (q07AntiJoin _),
    "q08_set_ops"      -> (q08SetOps _),
    "q09_distinct_counts" -> (q09DistinctCounts _),
    "q10_rollup"       -> (q10Rollup _),
    "q11_priority_exists" -> (q11PriorityExists _),
    "q12_conditional_agg" -> (q12ConditionalAgg _),
    "q13_string_funcs" -> (q13StringFuncs _),
    "q14_date_funcs"   -> (q14DateFuncs _),
    "q15_tumbling"     -> (q15Tumbling _),
    "q16_sessionize"   -> (q16Sessionize _))

  val oracles: Map[String, String] = Map(
    "q01_pricing"      -> q01Sql,
    "q02_top_orders"   -> q02Sql,
    "q03_stats_having" -> q03Sql,
    "q04_segment_revenue" -> q04Sql,
    "q05_region_stats" -> q05Sql,
    "q06_window_topn"  -> q06Sql,
    "q07_anti_join"    -> q07Sql,
    "q08_set_ops"      -> q08Sql,
    "q09_distinct_counts" -> q09Sql,
    "q10_rollup"       -> q10Sql,
    "q11_priority_exists" -> q11Sql,
    "q12_conditional_agg" -> q12Sql,
    "q13_string_funcs" -> q13Sql,
    "q14_date_funcs"   -> q14Sql,
    "q15_tumbling"     -> q15Sql,
    "q16_sessionize"   -> q16Sql)
}
