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
  * sort-sweep (the partition-local sweep re-expressed as a running
  * `min(struct(y, x))` window over the globally (x, y)-sorted
  * candidates). That path pays one single-partition sort instead of an
  * O(C²) broadcast join — the right trade exactly when C is large.
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
      // SkylineSpec. One global sort, no quadratic join, no broadcast.
      val w = Window.orderBy(col("x"), col("y"), col(keyCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      cand
        .withColumn("prev", min(struct(col("y"), col("x"))).over(w))
        .filter(col("prev").isNull ||
          !(col("prev.y") < col("y") ||
            (col("prev.y") === col("y") && col("prev.x") < col("x"))))
        .select(col(keyCol))
    }
  }
}
