package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D skyline (Pareto front, both dimensions minimized) — an operator
  * family Spark has no primitive for. The distributed shape follows the
  * partition-local-pruning design of "Integration of Skyline Queries into
  * Spark SQL" (EDBT 2023; PAPERS.md): each partition reduces its rows to
  * the LOCAL Pareto front with an O(n log n) sort-sweep, and only those
  * candidates — bounded by partitions × front size, orders of magnitude
  * smaller than the input — reach the global dominance check. At 100 TB
  * the scan side stays embarrassingly parallel and nothing quadratic ever
  * touches the full relation; the naive "no dominator EXISTS" theta-join
  * (what the DuckDB oracle runs) is O(N²).
  *
  * The candidate set carries (key, x, y) ONLY — attributes re-attach by
  * key afterwards (the id-not-payload shuffle rule, SCALE.md). The final
  * dominance check is a broadcast LEFT ANTI theta-join of the candidate
  * set against itself: quadratic, but in the candidate count, not N.
  *
  * WORST CASE: on anti-correlated data the Pareto front — and therefore
  * the candidate set — is O(N), and both the broadcast and the quadratic
  * anti-join degrade to full-relation scale. A count-based guard catches
  * this: when the local fronts fail to shrink the input below
  * `broadcastGuard`, the global check switches to an O(C log C)
  * sort-sweep — the partition-local sweep re-expressed as a running
  * `min(struct(y, x))` over all strictly-preceding candidates in
  * (x, y, key) order. That prefix is BANDED two-phase (the
  * cumBefore/q197 shape), never one global window: range-partition on
  * the sort key, window the running min WITHIN each band, and fold in
  * the preceding bands' min via a bounded non-equi self-join of the
  * ≤P-row band-summary relation. Nothing candidate-set-sized crosses a
  * single window partition — the fallback stays distributed exactly in
  * the case (numerous candidates) that triggers it.
  *
  * mapPartitions is justified here (SURVEY §7.4 preference order): the
  * local sweep is genuinely per-partition imperative state — no
  * window/aggregate composition expresses "running Pareto front" without
  * forcing a single global sort partition.
  */
object Skyline {

  /** One partition's Pareto front: sort by (x, y, key), sweep with the
    * running (minY, x-of-first-minY) pair. A point is dominated iff an
    * earlier point has strictly smaller y, or equal y at strictly
    * smaller x. Equal (x, y) pairs dominate neither — both kept. */
  private def sweep(
      it: Iterator[(Long, Double, Double)]): Iterator[(Long, Double, Double)] = {
    val sorted = it.toArray.sortBy(p => (p._2, p._3, p._1))
    var minY = Double.PositiveInfinity
    var minYminX = Double.PositiveInfinity
    val out = Array.newBuilder[(Long, Double, Double)]
    sorted.foreach { p =>
      val dominated = minY < p._3 || (minY == p._3 && minYminX < p._2)
      if (!dominated) out += p
      if (p._3 < minY) { minY = p._3; minYminX = p._2 }
    }
    out.result().iterator
  }

  /** Keys of the skyline rows of `points` under (minimize xCol, minimize
    * yCol). Dimensions are compared as double (exact for integer-valued
    * columns); dominance: b ≼ a ⟺ b.x ≤ a.x ∧ b.y ≤ a.y ∧ (b.x < a.x ∨
    * b.y < a.y). Returns a 1-column DataFrame named after keyCol. */
  def skyline2dKeys(points: DataFrame, keyCol: String,
      xCol: String, yCol: String, broadcastGuard: Long = 4000000L): DataFrame = {
    val sess = points.sparkSession
    import sess.implicits._
    // materialized once (lazy localCheckpoint): the candidate set feeds
    // the guard count AND both sides of the dominance check — without it
    // the full scan + sweep would run per consumer (multi-consumer rule)
    val cand = points
      .select(col(keyCol).cast("long"), col(xCol).cast("double"),
        col(yCol).cast("double"))
      .as[(Long, Double, Double)]
      .mapPartitions(sweep)
      .toDF(keyCol, "x", "y")
      .localCheckpoint(eager = false)
    if (cand.count() <= broadcastGuard) {
      val b = cand.select(col("x").as("bx"), col("y").as("by"))
      cand.join(broadcast(b),
          col("bx") <= col("x") && col("by") <= col("y") &&
            (col("bx") < col("x") || col("by") < col("y")),
          "left_anti")
        .select(col(keyCol))
    } else {
      // Anti-correlated fallback: the partition sweep's (minY, minYminX)
      // running state IS min(struct(y, x)) over all strictly-preceding
      // rows in (x, y, key) order — proven equal to the broadcast path in
      // PropertySpec (guard = 0 forces this branch). The prefix is banded
      // two-phase: range partitioning puts band i's rows strictly before
      // band i+1's in the total order, so a row's prefix = min over its
      // own band's preceding rows (per-band window) ∧ min over ALL rows
      // of earlier bands (non-equi join of the ≤P-row summary relation).
      val p = math.max(sess.sessionState.conf.numShufflePartitions, 2)
      val banded = cand
        .repartitionByRange(p, col("x"), col("y"), col(keyCol))
        .withColumn("band", spark_partition_id())
        .localCheckpoint(eager = false) // feeds summaries AND the prefix
      val bs = banded.groupBy(col("band"))
        .agg(min(struct(col("y"), col("x"))).as("bmin"))
        .localCheckpoint(eager = false) // both sides of the offset join
      val off = bs.select(col("band"))
        .join(bs.select(col("band").as("b2"), col("bmin")),
          col("b2") < col("band"), "left")
        .groupBy(col("band")).agg(min(col("bmin")).as("pband"))
      val wIn = Window.partitionBy(col("band"))
        .orderBy(col("x"), col("y"), col(keyCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      banded
        .withColumn("wprev", min(struct(col("y"), col("x"))).over(wIn))
        .join(off, Seq("band"))
        // least() skips NULLs (first row of a band / first band), so it
        // combines the two partial prefixes exactly like the running min
        .withColumn("prev", least(col("wprev"), col("pband")))
        .filter(col("prev").isNull ||
          !(col("prev.y") < col("y") ||
            (col("prev.y") === col("y") && col("prev.x") < col("x"))))
        .select(col(keyCol))
    }
  }
}
