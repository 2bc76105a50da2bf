package graft

import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Bucketing: the co-located-join story for 100 TB — both sides
  * pre-hash-partitioned into the same bucket count on the join key means
  * the join runs with NO exchange on either side. */
class BucketingSpec extends SparkSpec {

  test("bucketed saveAsTable join plans without a shuffle exchange") {
    // force the sort-merge path (a broadcast join would sidestep the
    // bucketing demonstration on this small fixture)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  private def bucketedJoinBody(): Unit = {
    Tables.orders(spark, sf).write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("bkt_orders")
    Tables.customer(spark, sf).write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("bkt_customer")

    val joined = spark.table("bkt_orders")
      .join(spark.table("bkt_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"))

    // correctness vs unbucketed join
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
    assert(joined.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      plain.collect().map(r => (r.getString(0), r.getLong(1))).toSet)

    // the join itself must not shuffle either side: any Exchange in the
    // plan may only sit ABOVE the join (for the groupBy), never below it.
    // (AQE's toString appends the pre-adaptive "Initial Plan" — scan only
    // the final plan section.)
    val physical = joined.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val joinIdx = physical.indexOf("SortMergeJoin")
    assert(joinIdx >= 0, s"expected a sort-merge join:\n$physical")
    val belowJoin = physical.substring(joinIdx)
    assert(!belowJoin.contains("Exchange"),
      s"bucketed join should not re-shuffle its inputs:\n$physical")
  }
}
