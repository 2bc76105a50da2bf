package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Approximate/sketch aggregates — the 100 TB substitutes for exact
  * distinct counting and exact quantiles (SURVEY.md §2.4 marks these
  * ABSENT in the reference; at scale they replace the expensive exact
  * expand-shuffle plans of q09/q27).
  *
  * No DuckDB oracle: sketch estimates are engine-specific by design.
  * SketchSpec bounds them against the exact answers instead. */
object Sketches {

  /** q36 — HLL++ distinct estimates + approximate percentiles per
    * returnflag. approx_count_distinct is a single-pass, fixed-memory
    * partial aggregate (no expand shuffle); percentile_approx likewise. */
  def q36Approx(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median_price"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  /** q37 — Apache DataSketches HLL: buildable, mergeable, re-estimable
    * sketches (the production pattern: persist sketch bytes per shard,
    * merge downstream without rescanning). */
  def q37HllSketch(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .cast("long").as("distinct_parts_est"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_approx_agg" -> (q36Approx _),
    "q37_hll_sketch" -> (q37HllSketch _))

  val oracles: Map[String, String] = Map.empty
}
