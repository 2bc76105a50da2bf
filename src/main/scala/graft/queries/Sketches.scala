package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Approximate/sketch aggregates — the 100 TB substitutes for exact
  * distinct counting and exact quantiles (SURVEY.md §2.4 marks these
  * ABSENT in the reference; at scale they replace the expensive exact
  * expand-shuffle plans of q09/q27).
  *
  * Oracle strategy: sketch ESTIMATES are engine-specific, so the
  * registered queries emit `(group, exact, est_within_tolerance BOOLEAN)`.
  * The exact values hash-match DuckDB's; the boolean asserts the estimate
  * is inside its published error envelope — a hard, driver-visible check
  * of the sketch itself (a broken sketch flips the flag). The exact
  * distinct counts exist only for verification; the production path at
  * 100 TB is the estimate-only aggregation (no expand shuffle).
  */
object Sketches {

  /** q36 — HLL++ distinct estimates + approximate percentiles per
    * returnflag, verified against exact values computed in the same pass.
    * approx_count_distinct at rsd=0.015 puts the 5% tolerance at >3σ;
    * both HLL++ and percentile_approx are deterministic per input, so the
    * flags are stable across runs and scale factors. */
  def q36Approx(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // Sketch side: one pass, fixed memory — the production aggregation.
    val approx = li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("l_partkey"), 0.015).as("ap"),
        approx_count_distinct(col("l_suppkey"), 0.015).as("asu"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("amed"))
    // Exact side, verification only. Distinct counts via two-phase
    // (group, key) pre-aggregation — NOT countDistinct alongside other
    // aggregates, which would force an Expand multiplying the scan by the
    // number of distinct clauses (measured 10× slower at sf0.1).
    def exactDistinct(key: String, as: String): DataFrame =
      li.groupBy(col("l_returnflag"), col(key)).agg(count(lit(1)))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
    val emed = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("emed"))
    approx
      .join(exactDistinct("l_partkey", "exact_parts"), Seq("l_returnflag"))
      .join(exactDistinct("l_suppkey", "exact_supps"), Seq("l_returnflag"))
      .join(emed, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n"),
        col("exact_parts"), col("exact_supps"),
        (abs(col("ap") - col("exact_parts")) <=
          col("exact_parts").cast("double") * 0.05).as("parts_within_5pct"),
        (abs(col("asu") - col("exact_supps")) <=
          col("exact_supps").cast("double") * 0.05).as("supps_within_5pct"),
        (abs(col("amed") - col("emed")) <= col("emed") * 0.05)
          .as("median_within_5pct"))
      .orderBy(col("l_returnflag"))
  }

  val q36Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_suppkey) AS exact_supps,
      |  TRUE AS parts_within_5pct,
      |  TRUE AS supps_within_5pct,
      |  TRUE AS median_within_5pct
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q37 — Apache DataSketches HLL: buildable, mergeable, re-estimable
    * sketches (the production pattern: persist sketch bytes per shard,
    * merge downstream without rescanning). Per-(flag,status) sketches are
    * merged per flag; the merged estimate is checked against the exact
    * distinct count (default lgConfigK=12 → rsd≈1.6%, 5% ≈ 3σ). */
  def q37HllSketch(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val est = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    est.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("est") - col("exact_parts")).cast("double") <=
          col("exact_parts").cast("double") * 0.05).as("est_within_5pct"))
      .orderBy(col("l_returnflag"))
  }

  val q37Sql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS est_within_5pct
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_approx_agg" -> (q36Approx _),
    "q37_hll_sketch" -> (q37HllSketch _))

  val oracles: Map[String, String] = Map(
    "q36_approx_agg" -> q36Sql,
    "q37_hll_sketch" -> q37Sql)
}
