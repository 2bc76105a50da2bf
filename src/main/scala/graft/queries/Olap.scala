package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Det
import graft.tables.Tables

/** SCALE-SPELLED multi-dimensional OLAP shapes. The semantic surface
  * already exists in the registry — q10 ROLLUP, q34 CUBE, q81 GROUPING
  * SETS, q30 pivot, q28's window-rank suite — as the direct (naive)
  * spellings; this module adds the formulations that survive a 100 TB
  * fact table: q192 cubes a PRE-AGGREGATED grain (Expand over ~15 rows,
  * not the corpus — q34 cubes the raw scan and pays 4× the table through
  * Expand) and carries GROUPING() flags instead of q34's sentinel-string
  * coalesce (which can't distinguish a real 'ALL' value from a
  * subtotal); q193 pivots the high-frequency events stream at day grain
  * with zero-filled counts; q197 replaces the per-partition window of
  * ntile/percent_rank/cume_dist with banded two-phase ranking (q28's
  * suite is the spec; its single-partition-per-key window is the
  * 100 TB cliff).
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

  // ---- q197: distribution-rank window family, two-phase at scale ----------

  /** Price bands per priority for the two-phase ranking (shard count). */
  final val RankBands = 64L

  /** q197 — ntile / percent_rank / cume_dist summarized per (priority,
    * quartile): the distribution-position window family the reference's
    * groupBy surface lacks, spelled SCALABLY.
    *
    * The naive spelling is one window per priority — but a partition per
    * low-cardinality key means 5 reducers rank 20% of the table each at
    * 100 TB (the WindowExec single-partition cliff). Instead, ranks are
    * computed by the q95/q130 two-phase discipline, sharded by an
    * equi-width PRICE BAND (descending): a window inside each (priority,
    * band) — thousands of independent shards — plus per-band offsets from
    * a ≤|priorities|·[[RankBands]]-row count relation. rank = offset +
    * within-band rank reproduces the global (price desc, orderkey) rank
    * exactly (bands are order-aligned), and ntile/percent_rank/cume_dist
    * are pure integer formulas of (rank, n):
    *
    *   ntile(4): big-first ANSI fill — q = n div 4, r = n % 4,
    *     rank ≤ (q+1)·r  ⇒  1 + (rank−1) div (q+1)
    *     else              1 + r + (rank−1 − (q+1)·r) div q
    *   percent_rank = (rank−1)/(n−1);  cume_dist = rank/n
    *     (the sort key (price desc, orderkey) is unique, so every row is
    *     its own peer group and cume_dist needs no peer-max pass)
    *
    * both exactly-rounded single divisions of integers — bit-identical
    * to DuckDB's built-in window functions, which the oracle uses.
    * OlapSpec additionally locks the two-phase ranks to the naive
    * global-window spelling row-for-row. */
  def q197WindowRanks(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir).select(
      col("o_orderpriority").as("pri"), col("o_orderkey").as("okey"),
      col("o_totalprice").as("price"),
      // exact cents: 2-decimal monetary double → lossless long
      expr("bigint(round(o_totalprice * 100))").as("pc"))
    val bounds = o.agg(min(col("pc")).as("mn"), max(col("pc")).as("mx"))
    val banded = o.crossJoin(broadcast(bounds))
      // descending bands: band 0 holds the HIGHEST prices
      .withColumn("band",
        expr(s"(mx - pc) div (((mx - mn) div $RankBands) + 1)"))
      .localCheckpoint(eager = false) // feeds ranks AND offsets
    val rnIn = row_number().over(
      Window.partitionBy(col("pri"), col("band"))
        .orderBy(col("price").desc, col("okey")))
    val offs = banded.groupBy(col("pri"), col("band"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.partitionBy(col("pri")).orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("pri"), col("band"), col("off"))
    val np = banded.groupBy(col("pri")).agg(count(lit(1)).as("n"))
    val ranked = banded.withColumn("rn_in", rnIn)
      .join(broadcast(offs), Seq("pri", "band"))
      .join(broadcast(np), Seq("pri"))
      .withColumn("rank", col("off") + col("rn_in"))
      .withColumn("nt", expr(
        """CASE WHEN rank <= ((n div 4) + 1) * (n % 4)
          |  THEN 1 + (rank - 1) div ((n div 4) + 1)
          |  ELSE 1 + (n % 4) +
          |    (rank - 1 - ((n div 4) + 1) * (n % 4)) div (n div 4)
          |END""".stripMargin))
      .withColumn("pr",
        (col("rank") - 1).cast("double") / (col("n") - 1).cast("double"))
      .withColumn("cd", col("rank").cast("double") / col("n").cast("double"))
    ranked.groupBy(col("pri"), col("nt"))
      .agg(count(lit(1)).as("n_rows"),
        Det.dsum(col("price")).as("sum_price"),
        min(col("pr")).as("min_pr"), max(col("pr")).as("max_pr"),
        min(col("cd")).as("min_cd"), max(col("cd")).as("max_cd"))
      .orderBy(col("pri"), col("nt"))
  }

  /** DuckDB spelling: the BUILT-IN window family over the same unique
    * total order — the semantic contract the two-phase plan implements. */
  val q197Sql: String =
    s"""WITH r AS (
       |  SELECT o_orderpriority AS pri, o_totalprice AS price,
       |    CAST(ntile(4) OVER w AS BIGINT) AS nt,
       |    percent_rank() OVER w AS pr,
       |    cume_dist() OVER w AS cd
       |  FROM orders
       |  WINDOW w AS (PARTITION BY o_orderpriority
       |               ORDER BY o_totalprice DESC, o_orderkey))
       |SELECT pri, nt, CAST(count(*) AS BIGINT) AS n_rows,
       |  ${Det.sqlSum("price")} AS sum_price,
       |  min(pr) AS min_pr, max(pr) AS max_pr,
       |  min(cd) AS min_cd, max(cd) AS max_cd
       |FROM r GROUP BY pri, nt
       |ORDER BY pri, nt""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q192_cube_aggregate" -> (q192CubeAggregate _),
    "q193_pivot_events"   -> (q193PivotEvents _),
    "q197_window_ranks"   -> (q197WindowRanks _))

  val oracles: Map[String, String] = Map(
    "q192_cube_aggregate" -> q192Sql,
    "q193_pivot_events"   -> q193Sql,
    "q197_window_ranks"   -> q197Sql)
}
