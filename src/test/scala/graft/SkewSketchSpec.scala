package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.queries.Sketches
import graft.tables.Tables

class SkewSketchSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of big-side rows share key 1 — the classic hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i))
      .toDF("k", "v")
    val small = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted.select(plain.columns.map(col).toIndexedSeq: _*))
      .count() === 0)
  }

  test("approx distinct counts within 10% of exact") {
    val approx = Sketches.q36Approx(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (p, s)) =>
      val (ap, as_) = approx(k)
      assert(math.abs(ap - p).toDouble / p < 0.10, s"$k parts: $ap vs $p")
      assert(math.abs(as_ - s).toDouble / s < 0.10, s"$k supps: $as_ vs $s")
    }
  }

  test("datasketches HLL union estimate within 10% of exact") {
    val est = Sketches.q37HllSketch(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, p) =>
      assert(math.abs(est(k) - p).toDouble / p < 0.10, s"$k: ${est(k)} vs $p")
    }
  }
}
