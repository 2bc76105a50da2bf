package graft

import org.apache.spark.sql.functions._
import graft.queries.Olap
import graft.tables.Tables

/** Lattice arithmetic of the CUBE and the transpose-completeness of the
  * PIVOT — properties the oracle hash alone wouldn't localize on failure. */
class OlapSpec extends SparkSpec {

  test("q192: subtotal rows are exact sums of their detail rows") {
    val rows = Olap.q192CubeAggregate(spark, sf).collect()
    def slice(gp: Int, gs: Int) =
      rows.filter(r => r.getInt(r.fieldIndex("g_priority")) == gp &&
        r.getInt(r.fieldIndex("g_status")) == gs)
    val detail = slice(0, 0)
    val grand  = slice(1, 1)
    assert(grand.length == 1)
    def n(r: org.apache.spark.sql.Row) = r.getLong(r.fieldIndex("n_orders"))
    def p(r: org.apache.spark.sql.Row) = r.getDouble(r.fieldIndex("sum_price"))
    assert(grand.head.get(0) == null && grand.head.get(1) == null)
    assert(n(grand.head) == detail.map(n).sum)
    // decimal re-aggregation is exact → doubles match bit-for-bit
    assert(p(grand.head) == detail.map(r =>
      BigDecimal(p(r)).setScale(2)).sum.toDouble)
    // per-priority subtotals each match their detail slice
    for (row <- slice(0, 1)) {
      val pr = row.getString(row.fieldIndex("o_orderpriority"))
      val d = detail.filter(_.getString(0) == pr)
      assert(n(row) == d.map(n).sum, s"priority $pr subtotal")
    }
    // 4 grouping sets: detail + 2 one-dim subtotals + grand total
    assert(rows.length ==
      detail.length + slice(0, 1).length + slice(1, 0).length + 1)
  }

  test("q193: wide counts are a complete transpose (row sums = |events|)") {
    val wide = Olap.q193PivotEvents(spark, sf)
    val total = wide.select(
      Olap.PivotEventTypes.map(t => sum(col(s"n_$t"))).reduce(_ + _))
      .first().getLong(0)
    assert(total == Tables.events(spark, sf).count(),
      "pivot dropped or duplicated events")
    // pinned vocabulary: schema is static regardless of data
    assert(wide.columns.toSeq ==
      "day" +: Olap.PivotEventTypes.map(t => s"n_$t"))
  }

  test("q197: two-phase banded ranks equal the naive global window exactly") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val naive = Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("pri"),
        col("o_totalprice").as("price"),
        ntile(4).over(w).cast("long").as("nt"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
      .groupBy(col("pri"), col("nt"))
      .agg(count(lit(1)).as("n_rows"),
        graft.ops.Det.dsum(col("price")).as("sum_price"),
        min(col("pr")).as("min_pr"), max(col("pr")).as("max_pr"),
        min(col("cd")).as("min_cd"), max(col("cd")).as("max_cd"))
      .orderBy(col("pri"), col("nt"))
      .collect().toSeq
    val twoPhase = Olap.q197WindowRanks(spark, sf).collect().toSeq
    assert(twoPhase === naive,
      "banded two-phase ranking diverged from the window spelling")
  }
}
