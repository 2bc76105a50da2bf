package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE's skew-join path made load-bearing: q50 handles KEY-level skew
  * by salting ([[graft.ops.Skew.saltedJoin]]); Spark's own
  * `OptimizeSkewedJoin` is the PARTITION-level half of the story and
  * was never asserted until this suite. A planted hot key must make
  * the runtime re-plan split the oversized partition (the final
  * adaptive plan carries `isSkewJoin=true`) without changing values.
  * The salting-vs-AQE decision rule lives in [[graft.ops.Skew]]'s
  * scaladoc, where q50 points. */
class AqeSkewSpec extends SparkSpec {

  /** A session whose skew thresholds are scaled down to spec-sized
    * data (the defaults trigger at 256 MB partitions); broadcast off so
    * the join actually shuffles, partition coalescing off so the skew
    * detector sees the raw map output sizes. */
  private def skewSession(skewEnabled: Boolean): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", skewEnabled.toString)
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s
  }

  /** One hot key carrying half the big side (the q100 skew-audit
    * shape), joined to a uniform small side — big enough that the hot
    * partition crosses the lowered threshold, small enough for a spec. */
  private def joined(s: SparkSession) = {
    val big = s.range(0, 100000).select(
      when(col("id") % 2 === 0, lit(7L)).otherwise(col("id")).as("k"),
      col("id").as("payload"))
    val small = s.range(0, 100000).select(col("id").as("k"),
      (col("id") * 2).as("v"))
    big.join(small, "k")
  }

  test("OptimizeSkewedJoin fires on a planted hot key: the final " +
      "adaptive plan splits the skewed partition (isSkewJoin=true), " +
      "and the split is value-invisible (red check: skewJoin off)") {
    val on = joined(skewSession(skewEnabled = true))
    val onRows = on.collect() // drives THIS df's own adaptive execution
    val finalPlan = on.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"), finalPlan.take(500))
    assert(finalPlan.contains("skew=true"),
      s"OptimizeSkewedJoin did not fire:\n${finalPlan.take(3000)}")
    // red check: with the rule disabled the same join carries no skew
    // marker — the assertion above cannot be vacuously matching a label
    // that is always present
    val off = joined(skewSession(skewEnabled = false))
    val offRows = off.collect()
    assert(!off.queryExecution.executedPlan.toString.contains("skew=true"))
    // value gate: the runtime split changes task boundaries only
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(canon(onRows) === canon(offRows))
    // the hot key really was hot: all 50k evens plus the odd id=7 itself
    assert(onRows.count(_.getLong(0) == 7L) === 50001)
  }
}
