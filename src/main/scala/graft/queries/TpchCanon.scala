package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables
import graft.ops.Det

/** The remaining classic TPC-H join TOPOLOGIES over the star schema —
  * Q7 (two-role dimension), Q9 (fact ⋈ two dims ⋈ fact-side dim chain),
  * Q8 (8-relation market share), Q2 (decorrelated min-subquery) — the
  * multi-join shapes rounds 1–9 had not yet exercised, driving CBO/AQE
  * join ordering at 5–8 relations. (The fixture ships no `partsupp`,
  * so Q2/Q9 re-anchor their part-supplier economics on `lineitem`; the
  * join SHAPES — which is what these queries exist to cover — are
  * faithful. Reference: none of this exists in the 3-query course
  * project, build.sbt:1–9; the shapes follow the public TPC-H spec.)
  *
  * Money math follows the [[graft.ops.Det]] discipline: 2-decimal
  * inputs cast to decimal, EXACT decimal sums/mins, ONE final
  * conversion (and at most one IEEE division) to double — identical in
  * both engines at any partitioning.
  */
object TpchCanon {

  private val D = "decimal(18,2)"
  /** `l_extendedprice · (1 − l_discount)` exactly (scale-4 decimal). */
  private def revDec =
    col("l_extendedprice").cast(D) *
      (lit(java.math.BigDecimal.ONE).cast(D) - col("l_discount").cast(D))
  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * " +
      "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"

  // ---- q214: supplier↔customer nation volume (TPC-H Q7 shape) ------------

  /** The audited nation pair (both directions, Q7's contract) —
    * chosen to have suppliers at EVERY fixture SF (sf0.001 populates
    * only 10 of the 25 nations on the supplier side). */
  final val VolNationA = "NATION_3"
  final val VolNationB = "NATION_8"

  /** q214 — shipping volume between two nations by year: lineitem ⋈
    * orders ⋈ customer ⋈ supplier ⋈ nation×2, where `nation` joins in
    * TWO ROLES (supplier's and customer's) — the Q7 topology. The pair
    * predicate references both roles, so Catalyst must split it into
    * per-side `IN (A, B)` pushdowns under the join (semi-join
    * reduction), which is the planning behavior this query locks in.
    *
    * Scale shape: the two fact joins (l⋈o, o⋈c) shuffle on their
    * natural keys; supplier and both nation roles broadcast (dimension
    * tables — supplier is SF·10k rows in spec TPC-H, megabytes against
    * a 100 TB fact side); the final agg has ≤ 2·#years groups. */
  def q214NationVolume(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("snk"))
      .join(broadcast(n2), col("c_nationkey") === col("cnk"))
      .filter(
        (col("supp_nation") === VolNationA && col("cust_nation") === VolNationB) ||
        (col("supp_nation") === VolNationB && col("cust_nation") === VolNationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revDec).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q214Sql: String =
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST(sum(rev) AS DOUBLE) AS revenue, count(*) AS n_items
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(year(l_shipdate) AS BIGINT) AS l_year, $revSql AS rev
       |  FROM lineitem
       |  JOIN orders   ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE (n1.n_name = '$VolNationA' AND n2.n_name = '$VolNationB')
       |     OR (n1.n_name = '$VolNationB' AND n2.n_name = '$VolNationA'))
       |GROUP BY 1, 2, 3
       |ORDER BY 1, 2, 3""".stripMargin

  // ---- q215: product-line profit by nation and year (TPC-H Q9 shape) -----

  /** Q9's `p_name LIKE '%green%'` analogue on this corpus. */
  final val ProfitPartToken = "widget"

  /** q215 — profit per (supplier nation, order year) for one product
    * line: part ⋈ lineitem ⋈ supplier ⋈ orders ⋈ nation — the Q9
    * topology, where the selective `p_name LIKE` predicate must prune
    * the FACT side through the part join before the wider joins run.
    * Without `partsupp`, unit cost is modeled as p_retailprice/10 per
    * unit: profit = Σ rev − Σ retail·qty / 10, computed as TWO exact
    * decimal sums combined by one IEEE subtraction/division — never a
    * triple decimal product (whose precision exceeds 38 in DuckDB).
    *
    * Scale shape: l⋈part prunes first (LIKE-filtered part broadcast at
    * test SF; a shuffle join at spec SF where part is SF·200k rows —
    * unhinted, so AQE picks), l⋈o shuffles on orderkey, supplier and
    * nation broadcast; ≤ 25·#years output groups. */
  def q215ProductProfit(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
      .filter(col("p_name").contains(ProfitPartToken))
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val costDec = col("p_retailprice").cast(D) * col("l_quantity").cast(D)
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg((sum(revDec).cast("double") -
          sum(costDec).cast("double") / lit(10.0)).as("profit"),
        count(lit(1)).as("n_items"))
      .orderBy(col("nation"), col("o_year"))
  }

  val q215Sql: String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |  CAST(sum($revSql) AS DOUBLE) -
       |    CAST(sum(CAST(p_retailprice AS DECIMAL(18,2)) *
       |             CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / 10.0
       |    AS profit,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN part     ON l_partkey = p_partkey
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation   ON s_nationkey = n_nationkey
       |WHERE p_name LIKE '%$ProfitPartToken%'
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  // ---- q216: market share (TPC-H Q8 shape, 8 relations) ------------------

  final val ShareRegion = "ASIA"
  final val ShareNation = "NATION_3"
  final val SharePartType = "PROMO"

  /** q216 — [[ShareNation]]'s share of [[SharePartType]] volume sold to
    * [[ShareRegion]] customers, by order year: part ⋈ lineitem ⋈ orders
    * ⋈ customer ⋈ nation(cust) ⋈ region on one side and supplier ⋈
    * nation(supp) on the other — 8 relations, nation again in two
    * roles, the widest join tree in the suite and the Q8 CBO exercise.
    * The share is a conditional-sum ratio: numerator and denominator
    * are EXACT decimal sums over the same rows (one pass, no second
    * scan), divided once in double.
    *
    * Scale shape: region/nation/supplier broadcast; part's type filter
    * prunes the fact scan through the first join; the two fact joins
    * shuffle; output is #years rows. */
  def q216MarketShare(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_type") === SharePartType)
    val l = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val su = Tables.supplier(s, dir)
    val nc = Tables.nation(s, dir)
      .select(col("n_nationkey").as("cnk"), col("n_regionkey").as("crk"))
    val r = Tables.region(s, dir).filter(col("r_name") === ShareRegion)
    val ns = Tables.nation(s, dir)
      .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(nc), col("c_nationkey") === col("cnk"))
      .join(broadcast(r), col("crk") === col("r_regionkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .join(broadcast(ns), col("s_nationkey") === col("snk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        coalesce(sum(when(col("supp_nation") === ShareNation, revDec)),
          lit(java.math.BigDecimal.ZERO).cast(D)).cast("double")
          .as("nation_volume"),
        sum(revDec).cast("double").as("total_volume"))
      .select(col("o_year"), col("nation_volume"), col("total_volume"),
        (col("nation_volume") / col("total_volume")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q216Sql: String =
    s"""WITH base AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       |    n2.n_name AS supp_nation, $revSql AS rev
       |  FROM lineitem
       |  JOIN part     ON l_partkey = p_partkey
       |  JOIN orders   ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region   ON n1.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = '$ShareRegion' AND p_type = '$SharePartType'),
       |g AS (
       |  SELECT o_year,
       |    CAST(coalesce(sum(CASE WHEN supp_nation = '$ShareNation'
       |      THEN rev END), 0) AS DOUBLE) AS nation_volume,
       |    CAST(sum(rev) AS DOUBLE) AS total_volume
       |  FROM base GROUP BY 1)
       |SELECT o_year, nation_volume, total_volume,
       |  nation_volume / total_volume AS mkt_share
       |FROM g ORDER BY o_year""".stripMargin

  // ---- q217: min-cost supplier per part (TPC-H Q2 shape) -----------------

  final val MinCostRegion = "EUROPE"
  final val MinCostSizeFloor = 25

  /** q217 — for every part of size ≥ [[MinCostSizeFloor]], the
    * [[MinCostRegion]] supplier(s) offering it at the minimum observed
    * price — the Q2 topology: an aggregate-derived relation joined back
    * to itself on the (group, min) pair, i.e. the DECORRELATED spelling
    * of Q2's `ps_supplycost = (SELECT min …)` subquery, plus the
    * supplier ⋈ nation ⋈ region dimension chain on both the subquery
    * and the outer side. Without `partsupp`, the offer relation is
    * derived from lineitem: min l_extendedprice per (part, supplier) —
    * exact decimal, so the min-equality join key is bit-stable in both
    * engines. Ties (several suppliers at the min) all surface, Q2's
    * contract.
    *
    * Scale shape: the offer relation partial-aggregates down to
    * |part|·|supp-per-part| rows BEFORE any dimension work; the min
    * relation re-aggregates offers (never the fact); the back-join is
    * offer ⋈ broadcast(min-per-part at test SF — shuffle at spec SF,
    * unhinted); part's size filter prunes last-stage rows. */
  def q217MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
    val su = Tables.supplier(s, dir)
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir).filter(col("r_name") === MinCostRegion)
    val p = Tables.part(s, dir).filter(col("p_size") >= MinCostSizeFloor)
    val offers = l.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice").cast(D)).as("cost"))
      .join(broadcast(su), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
    val minCost = offers.groupBy(col("l_partkey").as("mk"))
      .agg(min(col("cost")).as("min_cost"))
    offers
      .join(minCost,
        col("l_partkey") === col("mk") && col("cost") === col("min_cost"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey"), col("p_name"), col("s_name"),
        col("n_name"), col("cost").cast("double").as("cost"))
      .orderBy(col("cost").desc, col("p_partkey"), col("s_name"))
  }

  val q217Sql: String =
    s"""WITH offers AS (
       |  SELECT l_partkey, l_suppkey,
       |    min(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
       |  FROM lineitem GROUP BY 1, 2),
       |eu AS (
       |  SELECT o.l_partkey, o.cost, s_name, n_name
       |  FROM offers o
       |  JOIN supplier ON o.l_suppkey = s_suppkey
       |  JOIN nation   ON s_nationkey = n_nationkey
       |  JOIN region   ON n_regionkey = r_regionkey
       |  WHERE r_name = '$MinCostRegion'),
       |mn AS (SELECT l_partkey, min(cost) AS min_cost FROM eu GROUP BY 1)
       |SELECT p_partkey, p_name, s_name, n_name,
       |  CAST(eu.cost AS DOUBLE) AS cost
       |FROM eu
       |JOIN mn ON eu.l_partkey = mn.l_partkey AND eu.cost = mn.min_cost
       |JOIN part ON eu.l_partkey = p_partkey
       |WHERE p_size >= $MinCostSizeFloor
       |ORDER BY cost DESC, p_partkey, s_name""".stripMargin

  // ---- q218: late sole-blamed supplier (TPC-H Q21 shape) -----------------

  /** Days past the order date after which a shipment counts as LATE. */
  final val LateDays = 365

  /** q218 — suppliers solely to blame for late multi-supplier orders:
    * for each late lineitem, there must EXIST another supplier's line
    * in the same order (multi-supplier) and NOT EXIST another LATE
    * line from a different supplier (sole blame) — the Q21 topology:
    * the fact table referenced THREE times (base, semi, anti), both
    * correlations equi-keyed on l_orderkey. Per-supplier wait counts,
    * Q21's deliverable.
    *
    * Scale shape: all three fact references key on l_orderkey, so one
    * hash-partitioning serves the semi AND the anti join
    * (co-partitioned self-joins, no extra shuffle class); supplier
    * broadcasts; output is ≤|supplier| rows. The lateness predicate
    * prunes the left side BEFORE either correlated join runs. */
  def q218LateSoleSupplier(s: SparkSession, dir: String): DataFrame = {
    val lat = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          > LateDays).as("late"))
      // three consumers (base, semi, anti): materialize the l⋈o pass
      // once instead of re-scanning both fact tables per reference
      .localCheckpoint(eager = false)
    val l1 = lat.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val others = lat.select(col("l_orderkey").as("ok2"),
      col("l_suppkey").as("sk2"), col("late").as("late2"))
    l1
      .join(others,
        col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
        "left_semi")
      .join(others.filter(col("late2")),
        col("l_orderkey") === col("ok2") && col("l_suppkey") =!= col("sk2"),
        "left_anti")
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val q218Sql: String =
    s"""WITH lat AS (
       |  SELECT l_orderkey, l_suppkey,
       |    date_diff('day', CAST(o_orderdate AS DATE),
       |      CAST(l_shipdate AS DATE)) > $LateDays AS late
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
       |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
       |FROM lat l1
       |JOIN supplier ON l1.l_suppkey = s_suppkey
       |WHERE l1.late
       |  AND EXISTS (SELECT 1 FROM lat l2
       |    WHERE l2.l_orderkey = l1.l_orderkey
       |      AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lat l3
       |    WHERE l3.l_orderkey = l1.l_orderkey
       |      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
       |GROUP BY s_name
       |ORDER BY numwait DESC, s_name""".stripMargin

  // ---- q219: customer order-count distribution (TPC-H Q13 shape) ---------

  /** Priority class excluded from the count (Q13's comment filter). */
  final val HistExcludedPriority = "1-URGENT"

  /** q219 — the customer order-count histogram: customer LEFT OUTER
    * JOIN filtered orders, orders counted per customer (zero-order
    * customers KEPT — the point of the outer join), then the counts
    * themselves aggregated into a distribution — Q13's double
    * aggregation over an outer join, the one topology where dropping
    * the unmatched side silently corrupts the answer.
    *
    * Scale shape: one shuffle join on custkey (the filter prunes the
    * orders side first), one partial-agg per customer, then a tiny
    * second agg over ≤ max-orders-per-customer groups. */
  def q219OrderCountHistogram(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
      .filter(col("o_orderpriority") =!= HistExcludedPriority)
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, dir).select(col("c_custkey"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count")) // count(col): NULLs don't count
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q219Sql: String =
    s"""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
       |FROM (
       |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
       |  FROM customer
       |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
       |    AND o_orderpriority <> '$HistExcludedPriority'
       |  GROUP BY c_custkey)
       |GROUP BY c_count
       |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---- q220: part value vs global threshold (TPC-H Q11 shape) ------------

  /** A part qualifies when its value exceeds [[ValueMeanMultNum]]/
    * [[ValueMeanMultDen]] × the MEAN per-part value. Q11's fixed
    * fraction is divided by SF in the spec precisely because a constant
    * share cannot survive scaling (max share ∝ 1/|parts|); a
    * mean-relative threshold is the SF-independent spelling of the same
    * intent. */
  final val ValueMeanMultNum = 3L
  final val ValueMeanMultDen = 2L

  /** q220 — parts whose traded value exceeds a GLOBAL threshold: the
    * Q11 topology — a grouped aggregate HAVING-compared against a
    * scalar aggregate of the SAME relation. The sums are EXACT
    * decimals; the 1.5×-mean comparison is spelled `v·2·nparts >
    * 3·total` over doubles derived from those exact decimals —
    * identical IEEE ops on identical inputs in both engines, and never
    * a wide decimal product (DuckDB rejects width > 38). `nparts`
    * comes from counting the per-part relation, NOT a countDistinct
    * beside the sum (which would force an Expand of the fact scan —
    * SCALE.md ground rule).
    *
    * Scale shape: one fact scan feeds the per-part partial agg; total
    * and nparts re-aggregate the SMALL per-part relation (never the
    * fact); the 1-row threshold broadcast-crossJoins back — the
    * decorrelated scalar-HAVING plan; output is the qualifying tail. */
  def q220PartValueThreshold(s: SparkSession, dir: String): DataFrame = {
    val value = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast(D)).as("valdec"))
      .localCheckpoint(eager = false) // feeds the filter AND the total
    val total = value.agg(sum(col("valdec")).cast("double").as("total"),
      count(lit(1)).as("nparts"))
    value.crossJoin(broadcast(total))
      .filter(col("valdec").cast("double") * lit(2.0 * ValueMeanMultDen)
        * col("nparts") > lit(2.0 * ValueMeanMultNum) * col("total"))
      .select(col("l_partkey"), col("valdec").cast("double").as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  val q220Sql: String =
    s"""WITH v AS (
       |  SELECT l_partkey,
       |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS valdec
       |  FROM lineitem GROUP BY 1),
       |t AS (
       |  SELECT CAST(sum(valdec) AS DOUBLE) AS total,
       |    CAST(count(*) AS BIGINT) AS nparts
       |  FROM v)
       |SELECT l_partkey, CAST(valdec AS DOUBLE) AS value
       |FROM v, t
       |WHERE CAST(valdec AS DOUBLE) * ${2 * ValueMeanMultDen}.0 * nparts
       |  > ${2 * ValueMeanMultNum}.0 * total
       |ORDER BY value DESC, l_partkey""".stripMargin

  // ---- q221: idle high-balance customers (TPC-H Q22 shape) ---------------

  /** Customers count as IDLE with no order on/after this date. */
  final val IdleCutoff = "2000-01-01"

  /** q221 — high-balance customers gone idle, by nation: acctbal above
    * the positive-balance average (a scalar-subquery threshold) AND no
    * order since [[IdleCutoff]] (an anti-join on the fact table) — the
    * Q22 topology. The average is the [[Det]] spelling (exact decimal
    * sum / count, one double division), so the threshold double is
    * bit-identical in both engines and boundary rows cannot flip.
    *
    * Scale shape: the scalar average is a 1-row broadcast; the
    * anti-join keys on custkey (one shuffle, or broadcast when the
    * recent-order projection fits); nation broadcasts; output is ≤25
    * rows. */
  def q221IdleRichCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(Det.davg(col("c_acctbal")).as("avg_bal"))
    val recent = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit(IdleCutoff).cast("timestamp"))
      .select(col("o_custkey"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        Det.dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val q221Sql: String =
    s"""WITH a AS (
       |  SELECT ${Det.sqlAvg("c_acctbal")} AS avg_bal
       |  FROM customer WHERE c_acctbal > 0)
       |SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
       |  ${Det.sqlSum("c_acctbal")} AS totacctbal
       |FROM customer, a
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE c_acctbal > avg_bal
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey
       |      AND o_orderdate >= TIMESTAMP '$IdleCutoff')
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  // ---- q253: small-quantity revenue loss (TPC-H Q17 shape) ---------------

  /** The audited brand (Q17's Brand#23 analogue; populated at every SF). */
  final val SmallQtyBrand = "Brand#4"

  /** q253 — average yearly revenue lost by refusing small-quantity
    * orders of one brand: lineitems of the brand's parts whose quantity
    * falls below 20% of that PART's average quantity — TPC-H Q17's
    * correlated-aggregate topology, decorrelated: the per-part average
    * pre-aggregates ONCE over the brand-pruned fact rows (the same
    * relation the outer query reads, materialized once behind a lazy
    * localCheckpoint), then joins back on the part key. The threshold
    * never becomes a double: `qty < avg/5` is spelled
    * `5·qty·cnt < Σqty` in exact integers (quantities are integral),
    * so boundary rows cannot flip on a ULP — the [[Det]] discipline
    * applied to a PREDICATE, not just an output.
    *
    * Scale shape: the brand-filtered part list broadcasts into the
    * fact scan (fact rows prune before anything widens); the per-part
    * (Σqty, cnt) relation exchanges once on partkey and equi-joins the
    * same pruned relation; output is ONE row — exact decimal Σrev,
    * one IEEE division by 7. */
  /** q253's brand-pruned fact rows BEFORE the checkpoint barrier —
    * separate so PlanShapeSpec can lock the broadcast prune shape (the
    * barrier hides everything upstream from the outer query's plan). */
  private[graft] def q253Pruned(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir).filter(col("p_brand") === SmallQtyBrand)
      .select(col("p_partkey"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .drop("p_partkey")
  }

  def q253SmallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val pruned = q253Pruned(s, dir)
      .localCheckpoint(eager = false) // feeds the stats AND the outer join
    val stats = pruned.groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("qsum"),
        count(lit(1)).as("qcnt"))
    pruned.join(stats, Seq("l_partkey"))
      .filter(col("l_quantity").cast("long") * lit(5L) * col("qcnt")
        < col("qsum"))
      .agg(count(lit(1)).as("n_small"),
        (sum(col("l_extendedprice").cast(D)).cast("double") / lit(7.0))
          .as("avg_yearly"))
  }

  val q253Sql: String =
    s"""WITH pr AS (
       |  SELECT l_partkey, l_quantity, l_extendedprice
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  WHERE p_brand = '$SmallQtyBrand'),
       |st AS (
       |  SELECT l_partkey, SUM(CAST(l_quantity AS BIGINT)) AS qsum,
       |    CAST(count(*) AS BIGINT) AS qcnt
       |  FROM pr GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_small,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
       |    AS avg_yearly
       |FROM pr JOIN st USING (l_partkey)
       |WHERE CAST(l_quantity AS BIGINT) * 5 * qcnt < qsum""".stripMargin

  // ---- q254: recently-hot promo-part suppliers (TPC-H Q20 shape) ---------

  /** Recency cutoff and serve size for the promo-supplier worklist. */
  final val PromoCutoff = "2000-01-01"
  final val PromoTopK = 20

  /** q254 — suppliers whose shipping of a promo part line has gone
    * RECENT: the TPC-H Q20 topology — a nested name-filtered part list
    * feeding a correlated aggregate on the COMPOSITE (part, supplier)
    * key, resolved into a supplier→nation chain. The fixture ships no
    * `partsupp`, so Q20's `availqty > ½·volume` re-anchors on lineitem
    * itself: a (part, supplier) pair is HOT when >80% of its all-time
    * shipped quantity shipped on/after [[PromoCutoff]]
    * (`5·recent > 4·total`, exact integers); the serve is the top
    * [[PromoTopK]] suppliers by hot-pair count (suppkey tie-break —
    * unique row order, so the driver compares order-sensitively).
    *
    * Scale shape: the name-filtered part list broadcasts into the fact
    * scan; ONE exchange on the composite (partkey, suppkey) key with
    * map-side partial aggregation; the per-supplier rollup re-exchanges
    * the pair-level relation (≤ |matched parts|·|suppliers per part|
    * rows, already corpus-independent per pair); supplier and nation
    * broadcast; TakeOrderedAndProject serves the top-k. */
  def q254PromoSuppliers(s: SparkSession, dir: String): DataFrame = {
    val pp = Tables.part(s, dir)
      .filter(col("p_name").contains(ProfitPartToken))
      .select(col("p_partkey"))
    val qty = col("l_quantity").cast("long")
    val g = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_shipdate"))
      .join(broadcast(pp), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(qty).as("total_qty"),
        sum(when(col("l_shipdate") >= lit(PromoCutoff).cast("timestamp"),
          qty).otherwise(0L)).as("recent_qty"))
    val per = g.groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_matched"),
        sum(when(col("recent_qty") * 5 > col("total_qty") * 4, 1L)
          .otherwise(0L)).as("n_hot"))
    per
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"),
        col("n_matched"), col("n_hot"))
      .orderBy(col("n_hot").desc, col("s_suppkey"))
      .limit(PromoTopK)
  }

  val q254Sql: String =
    s"""WITH pp AS (
       |  SELECT p_partkey FROM part
       |  WHERE p_name LIKE '%$ProfitPartToken%'),
       |g AS (
       |  SELECT l_partkey, l_suppkey,
       |    SUM(CAST(l_quantity AS BIGINT)) AS total_qty,
       |    SUM(CASE WHEN l_shipdate >= TIMESTAMP '$PromoCutoff'
       |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS recent_qty
       |  FROM lineitem JOIN pp ON l_partkey = p_partkey
       |  GROUP BY 1, 2),
       |per AS (
       |  SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_matched,
       |    CAST(SUM(CASE WHEN recent_qty * 5 > total_qty * 4
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_hot
       |  FROM g GROUP BY 1)
       |SELECT s_suppkey, s_name, n_name, n_matched, n_hot
       |FROM per
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |ORDER BY n_hot DESC, s_suppkey
       |LIMIT $PromoTopK""".stripMargin

  // ---- q255: top revenue supplier(s) (TPC-H Q15 shape) --------------------

  /** Q15's quarter window (inclusive start, exclusive end). */
  final val TopRevStart = "2000-01-01"
  final val TopRevEnd = "2000-04-01"

  /** q255 — supplier(s) achieving the MAXIMUM quarterly revenue: the
    * TPC-H Q15 topology — an aggregate view (revenue per supplier over
    * a shipdate window) joined against its own scalar max. The equality
    * join runs on EXACT decimals (the [[Det]] discipline): `rev` and
    * `max(rev)` are the same exact decimal sums, so the winning row
    * matches bit-for-bit in both engines — with double revenue this is
    * the canonical ULP trap (a tie at the max flips on summation
    * order). The decimal stays INTERNAL; the output emits double.
    *
    * Scale shape: one windowed fact scan partial-aggregated on suppkey
    * (the revenue view materializes once — it feeds the scalar max AND
    * the equality filter); the max is a 1-row broadcast; supplier
    * broadcasts; output is the winner row(s). */
  /** q255's revenue view BEFORE the checkpoint barrier — separate so
    * PlanShapeSpec can lock the windowed scan + partial-agg shape (the
    * barrier hides everything upstream from the outer query's plan). */
  private[graft] def q255Rev(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit(TopRevStart).cast("timestamp") &&
        col("l_shipdate") < lit(TopRevEnd).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revDec).as("revd"))

  def q255TopRevenueSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = q255Rev(s, dir)
      .localCheckpoint(eager = false) // feeds the max AND the filter
    val mx = rev.agg(max(col("revd")).as("mxd"))
    rev.crossJoin(broadcast(mx))
      .filter(col("revd") === col("mxd"))
      .join(broadcast(Tables.supplier(s, dir)),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("revd").cast("double").as("total_rev"))
      .orderBy(col("s_suppkey"))
  }

  val q255Sql: String =
    s"""WITH r AS (
       |  SELECT l_suppkey, sum($revSql) AS revd
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$TopRevStart'
       |    AND l_shipdate < TIMESTAMP '$TopRevEnd'
       |  GROUP BY 1),
       |m AS (SELECT max(revd) AS mxd FROM r)
       |SELECT s_suppkey, s_name, CAST(revd AS DOUBLE) AS total_rev
       |FROM r CROSS JOIN m
       |JOIN supplier ON l_suppkey = s_suppkey
       |WHERE revd = mxd
       |ORDER BY s_suppkey""".stripMargin

  // ---- q256: large-volume customers (TPC-H Q18 shape) --------------------

  /** Q18's spec threshold (sum of quantities per order); populated at
    * every fixture SF (5 orders at sf0.001, 473 at sf0.1). */
  final val BigOrderQty = 300L

  /** q256 — LARGE-VOLUME customers: orders whose total lineitem
    * quantity exceeds [[BigOrderQty]], with their customer and the
    * total — TPC-H Q18's `o_orderkey IN (SELECT l_orderkey … GROUP BY
    * l_orderkey HAVING sum(l_quantity) > T)` topology, the
    * HAVING-sum-subquery-on-the-fact-key decorrelation class: the
    * literal SQL reads lineitem TWICE (once in the subquery, once in
    * the outer join re-summing the same per-order quantity). Here the
    * per-order sum aggregates ONCE; because the outer GROUP BY is per
    * order (every grouping column is order- or customer-functional),
    * the outer sum IS the subquery's sum, so carrying it through the
    * join is value-identical to the spec's double scan.
    *
    * Scale shape: one fact-wide partial aggregate on the order key
    * (map-side combine compacts to per-order rows before the
    * exchange); the HAVING filter leaves a rare set (~1 in 3k orders
    * at spec selectivity) which BROADCASTS into orders — the fact-side
    * prune — and the surviving orders broadcast again into the
    * customer scan, so neither big table reshuffles; the top-100 serve
    * is a TakeOrderedAndProject, never a global sort. Quantities are
    * integral, so the threshold compares exact BIGINTs (never a double
    * sum on a boundary row). Ordered contract: spec's (o_totalprice
    * DESC, o_orderdate) plus o_orderkey — a unique total order, so the
    * row sequence is pinned (the fixture's totalprice ties would
    * otherwise make the serve order engine-dependent). */
  def q256BigOrders(s: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > BigOrderQty)
    val surv = Tables.orders(s, dir)
      .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
    Tables.customer(s, dir)
      .join(broadcast(surv), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate"),
        col("o_orderkey"))
      .limit(100)
  }

  val q256Sql: String =
    s"""WITH big AS (
       |  SELECT l_orderkey,
       |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
       |  FROM lineitem GROUP BY 1
       |  HAVING SUM(CAST(l_quantity AS BIGINT)) > $BigOrderQty)
       |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  total_qty
       |FROM big
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
       |LIMIT 100""".stripMargin

  // ---- q257: discounted revenue, disjunctive join (TPC-H Q19 shape) ------

  /** q257 — promotion revenue under an OR of conjunction groups
    * spanning BOTH join sides: each disjunct repeats the
    * `p_partkey = l_partkey` key, a shared shipdate recency predicate,
    * and its own (type-prefix, quantity-range, size-range) band —
    * TPC-H Q19's topology, THE test of predicate factoring through a
    * join. A naive planner sees a non-conjunctive join condition and
    * degrades to a nested-loop cross product; the correct plan
    * CNF-extracts the common equi-key (hash join on partkey), factors
    * the shared recency predicate to the fact scan, and pushes each
    * side's OR-of-bands into ITS scan as a residual filter (both
    * parquet scans show the Or in PushedFilters — locked in
    * PlanShapeSpec). Spark's own extraction does all three from the
    * declarative spelling; nothing is hand-factored.
    *
    * Fixture re-anchoring (as q253/q254): the fixture's `part` has no
    * container/brand density to populate the spec's
    * (brand, container) bands at sf0.001 (200 parts × 25 brands × 6
    * types leave joint cells empty), so the bands anchor on
    * p_type prefix × p_size × l_quantity, and the spec's repeated
    * shipmode/shipinstruct conjunct becomes a repeated shipdate
    * recency cut. The SHAPE — disjunction of multi-predicate
    * conjunctions straddling the join, with common factors — is what
    * this query exists to cover and is faithful.
    *
    * Det discipline: revenue sums exact decimals, ONE cast to double;
    * n_items pins the matched-row set exactly (a revenue ULP could
    * never mask a row-membership bug). */
  final val DisjShipCut = "1995-01-01"

  def q257DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_shipdate"))
    val p = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_type"), col("p_size"))
    def band(t: String, q1: Int, q2: Int, s1: Int, s2: Int) =
      col("p_partkey") === col("l_partkey") &&
        col("l_shipdate") >= lit(DisjShipCut).cast("timestamp") &&
        col("p_type").startsWith(t) &&
        col("l_quantity").between(q1, q2) &&
        col("p_size").between(s1, s2)
    l.join(broadcast(p),
        band("SMALL", 1, 15, 1, 15) ||
        band("MEDIUM", 10, 25, 1, 25) ||
        band("LARGE", 20, 35, 1, 35))
      .agg(count(lit(1)).as("n_items"),
        sum(revDec).cast("double").as("revenue"))
  }

  val q257Sql: String =
    s"""SELECT count(*) AS n_items, CAST(sum($revSql) AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON
       |  (p_partkey = l_partkey AND l_shipdate >= TIMESTAMP '$DisjShipCut'
       |    AND p_type LIKE 'SMALL%'
       |    AND l_quantity BETWEEN 1 AND 15 AND p_size BETWEEN 1 AND 15)
       |  OR
       |  (p_partkey = l_partkey AND l_shipdate >= TIMESTAMP '$DisjShipCut'
       |    AND p_type LIKE 'MEDIUM%'
       |    AND l_quantity BETWEEN 10 AND 25 AND p_size BETWEEN 1 AND 25)
       |  OR
       |  (p_partkey = l_partkey AND l_shipdate >= TIMESTAMP '$DisjShipCut'
       |    AND p_type LIKE 'LARGE%'
       |    AND l_quantity BETWEEN 20 AND 35 AND p_size BETWEEN 1 AND 35)""".stripMargin

  // ---- q260: supplier variety per part class (TPC-H Q16 shape) -----------

  /** The Q16 size list (all within the fixture's 1–50 domain). */
  final val VarietySizes: Seq[Int] = Seq(3, 9, 14, 19, 23, 36, 45, 49)

  /** q260 — SUPPLIER VARIETY per part class: how many DISTINCT
    * suppliers ship each (brand, type, size) class, excluding one brand,
    * one type prefix, and a blacklisted supplier set — TPC-H Q16's
    * topology, the DISTINCT-AGGREGATE-over-an-ANTI-JOIN class the canon
    * still lacked (q07 has the anti-join, q09 the distinct counts; Q16
    * composes them under part-side attribute pruning). The fixture has
    * no partsupp or comment column, so the supply relation re-anchors on
    * lineitem's (l_partkey, l_suppkey) — the same re-anchoring as
    * q215/q217 — and the spec's complaint-comment blacklist becomes the
    * negative-balance suppliers (`s_acctbal < 0`), the same
    * "problem supplier" role.
    *
    * Scale shape: the part side prunes FIRST (brand ≠, type NOT LIKE,
    * size IN — all pushed into its scan) and the survivors broadcast
    * into the fact scan; the blacklist is a ≤#suppliers relation that
    * also broadcasts, as a LEFT ANTI join (spec's NOT IN is
    * null-safe-equivalent here — s_suppkey is never NULL). The distinct
    * count is spelled TWO-PHASE (dedupe on (class, suppkey) first, then
    * count) per the engine's no-Expand-next-to-distinct rule, so both
    * exchanges carry id-width rows and partial aggregation collapses
    * map-side. Ordered contract: spec's (cnt DESC, brand, type, size) —
    * a unique total order since (brand, type, size) is the group key. */
  def q260SupplierVariety(s: SparkSession, dir: String): DataFrame = {
    val parts = Tables.part(s, dir)
      .filter(col("p_brand") =!= "Brand#13" &&
        !col("p_type").startsWith("MEDIUM") &&
        col("p_size").isin(VarietySizes: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("p_size"))
    val blacklist = Tables.supplier(s, dir)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    Tables.lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(parts), col("p_partkey") === col("l_partkey"))
      .join(broadcast(blacklist), col("s_suppkey") === col("l_suppkey"),
        "left_anti")
      // two-phase distinct: dedupe to (class, suppkey) rows map-side…
      .groupBy(col("p_brand"), col("p_type"), col("p_size"),
        col("l_suppkey"))
      .agg(count(lit(1)).as("_dup"))
      // …then count the survivors per class
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(count(lit(1)).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q260Sql: String =
    s"""SELECT p_brand, p_type, p_size,
       |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE p_brand <> 'Brand#13' AND p_type NOT LIKE 'MEDIUM%'
       |  AND p_size IN (${VarietySizes.mkString(", ")})
       |  AND NOT EXISTS (SELECT 1 FROM supplier
       |                  WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q260_supplier_variety" -> (q260SupplierVariety _),
    "q256_big_orders" -> (q256BigOrders _),
    "q257_disjunctive_revenue" -> (q257DisjunctiveRevenue _),
    "q255_top_rev_supplier" -> (q255TopRevenueSupplier _),
    "q253_small_qty_revenue" -> (q253SmallQtyRevenue _),
    "q254_promo_suppliers" -> (q254PromoSuppliers _),
    "q214_nation_volume" -> (q214NationVolume _),
    "q215_product_profit" -> (q215ProductProfit _),
    "q216_market_share" -> (q216MarketShare _),
    "q217_min_cost_supplier" -> (q217MinCostSupplier _),
    "q218_late_sole_supplier" -> (q218LateSoleSupplier _),
    "q219_order_count_histogram" -> (q219OrderCountHistogram _),
    "q220_part_value_threshold" -> (q220PartValueThreshold _),
    "q221_idle_rich_customers" -> (q221IdleRichCustomers _))

  val oracles: Map[String, String] = Map(
    "q260_supplier_variety" -> q260Sql,
    "q256_big_orders" -> q256Sql,
    "q257_disjunctive_revenue" -> q257Sql,
    "q255_top_rev_supplier" -> q255Sql,
    "q253_small_qty_revenue" -> q253Sql,
    "q254_promo_suppliers" -> q254Sql,
    "q214_nation_volume" -> q214Sql,
    "q215_product_profit" -> q215Sql,
    "q216_market_share" -> q216Sql,
    "q217_min_cost_supplier" -> q217Sql,
    "q218_late_sole_supplier" -> q218Sql,
    "q219_order_count_histogram" -> q219Sql,
    "q220_part_value_threshold" -> q220Sql,
    "q221_idle_rich_customers" -> q221Sql)
}
