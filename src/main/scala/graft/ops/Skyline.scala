package graft.ops

import org.apache.spark.sql.DataFrame
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
      xCol: String, yCol: String): DataFrame = {
    val sess = points.sparkSession
    import sess.implicits._
    // materialized once (lazy localCheckpoint): the candidate set feeds
    // BOTH sides of the dominance anti-join — without it the full scan +
    // sweep would run twice (the shingle-index multi-consumer rule)
    val cand = points
      .select(col(keyCol).cast("long"), col(xCol).cast("double"),
        col(yCol).cast("double"))
      .as[(Long, Double, Double)]
      .mapPartitions(sweep)
      .toDF(keyCol, "x", "y")
      .localCheckpoint(eager = false)
    val b = cand.select(col("x").as("bx"), col("y").as("by"))
    cand.join(broadcast(b),
        col("bx") <= col("x") && col("by") <= col("y") &&
          (col("bx") < col("x") || col("by") < col("y")),
        "left_anti")
      .select(col(keyCol))
  }
}
