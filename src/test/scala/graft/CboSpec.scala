package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Cost-based optimization made LOAD-BEARING (the q258/q259 discipline
  * applied to the statistics tier): q148 computes the ANALYZE-shape
  * statistics; this suite persists the canon star schema to the
  * catalog, runs the real `ANALYZE TABLE … COMPUTE STATISTICS FOR ALL
  * COLUMNS`, and proves Spark's `CostBasedJoinReorder` actually
  * CONSUMES them on the 8-relation Q8-shaped join (q216's topology) —
  * with both red checks: CBO off keeps the written join order, and CBO
  * on WITHOUT statistics keeps it too (the reorder is stats-driven,
  * not flag-driven).
  *
  * Scale rationale: on the 1000-executor target a mis-ordered
  * 8-relation join materializes fact×fact intermediates that dwarf the
  * input; the DP reorder (dp.threshold 12 covers all canon shapes)
  * plus per-column NDV/null/min/max is what turns the declared order
  * into the cheapest one. The manual-broadcast spellings in TpchCanon
  * stay the per-query belt-and-braces; this pins that UNHINTED SQL
  * over ANALYZEd catalog tables re-plans from statistics alone. */
class CboSpec extends SparkSpec {

  private val canon =
    Seq("lineitem", "orders", "customer", "supplier", "part",
      "nation", "region")

  /** Persist the canon tables under `db`, optionally ANALYZEd. */
  private def persist(db: String, analyze: Boolean): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    canon.foreach { t =>
      graft.tables.Tables.load(spark, sf, t)
        .write.mode("overwrite").saveAsTable(s"$db.$t")
      if (analyze)
        spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
  }

  /** The Q8-shaped 8-relation join (q216's topology) in a DELIBERATELY
    * bad declared order: both fact joins first, every selective
    * dimension (region-filtered customer chain, type-filtered part)
    * LAST — the order a cost-blind planner executes as written. No
    * broadcast hints: the planner must earn its order from statistics. */
  private def q8Sql(db: String): String =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(l_quantity) AS BIGINT) AS qty
       |FROM $db.lineitem
       |JOIN $db.orders    ON l_orderkey  = o_orderkey
       |JOIN $db.customer  ON o_custkey   = c_custkey
       |JOIN $db.nation n1 ON c_nationkey = n1.n_nationkey
       |JOIN $db.region    ON n1.n_regionkey = r_regionkey
       |JOIN $db.supplier  ON l_suppkey   = s_suppkey
       |JOIN $db.nation n2 ON s_nationkey = n2.n_nationkey
       |JOIN $db.part      ON l_partkey   = p_partkey
       |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Left-to-right leaf (table) order of the optimized join tree. */
  private def leafOrder(s: SparkSession, sql: String): Seq[String] =
    s.sql(sql).queryExecution.optimizedPlan.collect {
      case r: LogicalRelation =>
        r.catalogTable.map(_.identifier.table).getOrElse("?")
    }

  private def session(cbo: Boolean): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", cbo.toString)
    s.conf.set("spark.sql.cbo.joinReorder.enabled", cbo.toString)
    s
  }

  test("ANALYZE-fed CBO reorders the 8-relation canon join; CBO-off " +
      "and stats-less sessions keep the written (bad) order; values " +
      "are mode-invariant") {
    persist("cbo_canon", analyze = true)
    persist("cbo_bare", analyze = false)
    val on = session(cbo = true)
    val off = session(cbo = false)

    val ordOn = leafOrder(on, q8Sql("cbo_canon"))
    val ordOff = leafOrder(off, q8Sql("cbo_canon"))
    assert(ordOn.size === 8 && ordOff.size === 8,
      s"expected 8 leaves, got on=$ordOn off=$ordOff")
    // red check 1: without CBO the declared order survives verbatim
    assert(ordOff === canonOrderWritten, s"CBO-off order drifted: $ordOff")
    // the LOAD-BEARING assertion: statistics changed the join order
    assert(ordOn !== ordOff,
      s"CBO + ANALYZE left the join order untouched: $ordOn")
    // directional: the type-filtered part table (written LAST) moves
    // ahead of at least one fact join — filtering earlier, the whole
    // point of a cost-based reorder
    assert(ordOn.indexOf("part") < ordOff.indexOf("part"),
      s"part did not move earlier: on=$ordOn off=$ordOff")
    // red check 2: CBO on but NO statistics — the reorder must not
    // fire (it is stats-driven, not flag-driven)
    val ordBare = leafOrder(on, q8Sql("cbo_bare"))
    assert(ordBare === canonOrderWritten.map(identity),
      s"CBO reordered without statistics: $ordBare")
    // value gate: the reorder is plan-only
    val a = on.sql(q8Sql("cbo_canon")).collect().map(_.toSeq).toSeq
    val b = off.sql(q8Sql("cbo_canon")).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  /** The leaf order the SQL above declares (nation appears twice: the
    * customer chain's n1, then the supplier chain's n2). */
  private val canonOrderWritten: Seq[String] =
    Seq("lineitem", "orders", "customer", "nation", "region",
      "supplier", "nation", "part")

  test("the CBO statistics are the q148 triple: rowCount and per-column " +
      "NDV/null counts land in the catalog and match a direct scan") {
    persist("cbo_canon", analyze = true)
    // lineitem rowCount + l_partkey NDV straight from catalog stats
    val tbl = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        "lineitem", Some("cbo_canon")))
    val st = tbl.stats.getOrElse(fail("ANALYZE left no table stats"))
    val li = graft.tables.Tables.lineitem(spark, sf)
    assert(st.rowCount.contains(BigInt(li.count())))
    val colStats = st.colStats
    assert(colStats.contains("l_partkey"), s"no column stats: ${colStats.keys}")
    val ndv = colStats("l_partkey").distinctCount
      .getOrElse(fail("no NDV for l_partkey"))
    val exact = li.select(org.apache.spark.sql.functions
      .countDistinct(org.apache.spark.sql.functions.col("l_partkey")))
      .head().getLong(0)
    // ANALYZE uses HyperLogLog++ NDV; exactness is not the contract —
    // consumption is. Accept the standard ±5% HLL envelope.
    assert(math.abs(ndv.toLong - exact) <= math.max(1L, exact / 20),
      s"catalog NDV $ndv vs exact $exact")
  }
}
