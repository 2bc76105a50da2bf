package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Det
import graft.tables.Tables

/** Multi-dimensional OLAP aggregation shapes — CUBE subtotal lattices and
  * PIVOT (long→wide conditional aggregation). SURVEY.md §2.4 covers plain
  * GROUP BY; these are the reporting-layer spellings a warehouse user of
  * the reference (reference: CollegeScorecard.scala:73 groupBy+agg) reaches
  * for next. ROLLUP is already exercised by the recall audits
  * (Similarity.scala q117/q154); this module adds the full lattice and the
  * wide-table transpose.
  */
object Olap {

  /** q192 — CUBE over (priority, status) with grouping flags.
    *
    * Scale shape: Spark's `cube` plans an Expand that multiplies its INPUT
    * by the number of grouping sets (4 here). Cubing the raw scan would
    * ship 4× the fact table through the exchange at 100 TB. Instead we
    * pre-aggregate to the (priority, status) grain — one ordinary
    * partial+final hash agg, ≤|priorities|×|statuses| rows — and apply the
    * cube to that tiny intermediate, re-aggregating the exact decimal sums
    * (decimal addition is associative, so subtotal-of-subtotals is exact;
    * Det.scala's determinism argument). Expand thus multiplies ~15 rows,
    * not 15k (or 150 billion). The grouping flags disambiguate subtotal
    * NULLs from data NULLs, matching GROUPING() in the oracle. */
  def q192CubeAggregate(s: SparkSession, dir: String): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(18, 2)
    val grain = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast(D)).as("price"))
    grain.cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        grouping(col("o_orderpriority")).cast("int").as("g_priority"),
        grouping(col("o_orderstatus")).cast("int").as("g_status"),
        sum(col("n")).as("n_orders"),
        sum(col("price")).cast("double").as("sum_price"))
      .orderBy(col("g_priority"), col("g_status"),
        col("o_orderpriority"), col("o_orderstatus"))
  }

  val q192Sql: String =
    """SELECT o_orderpriority, o_orderstatus,
      |  CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
      |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
      |    AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderpriority, o_orderstatus)
      |ORDER BY g_priority, g_status, o_orderpriority, o_orderstatus
      |""".stripMargin

  /** The pivot's fixed column set. Spark's `pivot(col)` without explicit
    * values runs an extra distinct-collect job and makes the output schema
    * data-dependent — a silent schema drift hazard for downstream tables.
    * Production pivots pin the vocabulary (compile-time here). */
  val PivotEventTypes: Seq[String] =
    Seq("click", "error", "purchase", "signup", "view")

  /** q193 — PIVOT: per calendar day, one column per event type.
    *
    * Long→wide transpose of the events stream. With the value list pinned
    * ([[PivotEventTypes]]), Catalyst compiles this to ONE pass: a single
    * hash aggregate whose pivot arms are conditional counts — no join per
    * column, no second job to discover values, and an unseen event type
    * cannot silently reshape the table. Missing (month, type) combos are 0,
    * not NULL, so the wide table is arithmetic-safe downstream. */
  def q193PivotEvents(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.events(s, dir)
      .withColumn("day", dayofmonth(col("ts")))
      .groupBy(col("day"))
      .pivot("event_type", PivotEventTypes)
      .agg(count(lit(1)))
    PivotEventTypes.foldLeft(wide) { (df, t) =>
      df.withColumn(s"n_$t", coalesce(col(s"`$t`"), lit(0L))).drop(t)
    }.orderBy(col("day"))
  }

  val q193Sql: String = {
    val arms = PivotEventTypes.map { t =>
      s"CAST(sum(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t"
    }.mkString(",\n  ")
    s"""SELECT CAST(day(ts) AS INTEGER) AS day,
       |  $arms
       |FROM events
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q192_cube_aggregate" -> (q192CubeAggregate _),
    "q193_pivot_events"   -> (q193PivotEvents _))

  val oracles: Map[String, String] = Map(
    "q192_cube_aggregate" -> q192Sql,
    "q193_pivot_events"   -> q193Sql)
}
