package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.ops.Det
import graft.tables.Tables

/** Second operator wave: quantiles, full window-function suite, bag set
  * ops, pivot, as-of join, range join, JSON extraction, CUBE, and the
  * pure-SQL interface — breadth the reference lacks but an engine
  * claiming its capabilities plus north-star scale needs.
  *
  * Determinism rules as in [[Core]]: decimal-exact sums, integer-valued
  * quantile inputs (interpolation at .25/.5/.75 between integers is exact
  * in IEEE double → engine-independent), epoch-microsecond longs for time
  * arithmetic. */
object Advanced {

  /** q27 — exact quantiles per group. l_quantity is integer-valued, so
    * (1-d)*a + d*b at d ∈ {.25,.5,.75} is exact in both engines. */
  def q27Quantiles(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("q25"),
        percentile(col("l_quantity"), lit(0.5)).as("q50"),
        percentile(col("l_quantity"), lit(0.75)).as("q75"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q27Sql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS q25,
      |  quantile_cont(l_quantity, 0.50) AS q50,
      |  quantile_cont(l_quantity, 0.75) AS q75,
      |  count(*) AS n
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q28 — window-function suite over orders per customer: rank,
    * dense_rank, ntile, lag, lead, running decimal-exact sum. One shuffle
    * on o_custkey serves every window (same partitioning + ordering). */
  def q28WindowSuite(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 100)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(run)
          .cast("double").as("running_total"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  val q28Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS prank,
      |  cume_dist() OVER w AS cdist,
      |  lag(o_totalprice, 1) OVER w AS prev_price,
      |  lead(o_totalprice, 1) OVER w AS next_price,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_total
      |FROM orders
      |WHERE o_custkey < 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, rnk""".stripMargin

  /** q29 — bag-semantics set ops: customers' order-keys under 'F' status
    * EXCEPT ALL under 'O' status (multiplicity-aware, unlike the
    * reference's set-semantics idiom — SURVEY.md §5.3). */
  def q29BagSetOps(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter("o_orderstatus == 'F'").select(col("o_custkey"))
    val open = o.filter("o_orderstatus == 'O'").select(col("o_custkey"))
    f.exceptAll(open)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("surplus"))
      .orderBy(col("o_custkey"))
  }

  val q29Sql: String =
    """SELECT o_custkey, count(*) AS surplus FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus == 'F'
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderstatus == 'O')
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** q30 — pivot: orders per (year × status), statuses as columns.
    * Explicit pivot values avoid the extra distinct-scan Spark otherwise
    * runs to discover them (and keep the output schema static — required
    * at scale and for the oracle). */
  def q30Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))
      .orderBy(col("o_year"))

  val q30Sql: String =
    """SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
      |FROM orders
      |GROUP BY 1
      |ORDER BY o_year""".stripMargin

  /** q31 — as-of join via running window (the scalable formulation: one
    * shuffle+sort on user_id, no self-join row explosion): for each
    * purchase event, the most recent prior-or-same signup of that user.
    * Gap emitted as exact epoch-microsecond difference. */
  def q31AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .withColumn("signup_ts",
        last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true)
          .over(w))
      .filter(col("event_type") === "purchase" && col("signup_ts").isNotNull)
      .select(col("event_id"), col("user_id"),
        (unix_micros(col("ts")) - unix_micros(col("signup_ts")))
          .as("micros_since_signup"))
      .orderBy(col("event_id"))
  }

  val q31Sql: String =
    """SELECT event_id, user_id,
      |  epoch_us(ts) - epoch_us(signup_ts) AS micros_since_signup
      |FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS signup_ts
      |  FROM events)
      |WHERE event_type = 'purchase' AND signup_ts IS NOT NULL
      |ORDER BY event_id""".stripMargin

  /** q32 — range (interval) join: event pairs across users within 1 second
    * of each other. Scalable form: bucket each event by epoch second and
    * equi-join on adjacent buckets (explode ±1), then apply the exact
    * range predicate — turns an O(N²) theta-join into a bucketed
    * equi-join, the standard interval-join technique. */
  def q32RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("us"))
    val a = e.select(col("event_id").as("a_id"), col("event_type").as("a_type"),
      col("us").as("a_us"),
      explode(array(
        (col("us") / 1000000L).cast("long") - 1,
        (col("us") / 1000000L).cast("long"),
        (col("us") / 1000000L).cast("long") + 1)).as("bucket"))
    val b = e.select(col("event_id").as("b_id"), col("event_type").as("b_type"),
      col("us").as("b_us"),
      (col("us") / 1000000L).cast("long").as("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id") &&
        abs(col("a_us") - col("b_us")) <= 1000000L)
      // no dedup needed — and none would ever fire: b carries ONE
      // bucket and a's three exploded buckets are distinct values, so
      // a qualifying pair matches on exactly one bucket; a
      // dropDuplicates here cost a full extra (a_id, b_id) exchange
      // over the candidate-pair relation for nothing
      .groupBy(col("a_type"), col("b_type"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("a_type"), col("b_type"))
  }

  val q32Sql: String =
    """SELECT a.event_type AS a_type, b.event_type AS b_type,
      |  count(*) AS n_pairs
      |FROM events a JOIN events b
      |  ON a.event_id < b.event_id
      | AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 1000000
      |GROUP BY 1, 2
      |ORDER BY a_type, b_type""".stripMargin

  /** q33 — JSON extraction from the props column: mean payload k per
    * event type (exact long sum / count). */
  def q33Json(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("k_sum"),
        (sum(col("k")).cast("double") / count(col("k"))).as("k_avg"))
      .orderBy(col("event_type"))

  val q33Sql: String =
    """SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS k_sum,
      |  CAST(sum(k) AS DOUBLE) / count(k) AS k_avg
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q105 — VARIANT-typed semi-structured access (Spark 4's native
    * open-schema type): `parse_json` encodes the payload ONCE into the
    * binary variant form; every field access is then a typed binary path
    * lookup (`variant_get`), not a per-access string re-parse — the
    * difference between q33's `get_json_object` (re-tokenizes the JSON
    * text on every extraction) and a columnar semi-structured store. At
    * 100 TB the variant encoding happens at INGEST and persists in
    * parquet; this query exercises the full parse → typed-extract →
    * aggregate path. The oracle recomputes the same values from the raw
    * JSON — the variant layer must be value-invisible. */
  def q105Variant(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"), max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  val q105Sql: String =
    """SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS k_sum,
      |  min(k) AS k_min, max(k) AS k_max
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** q106 — rank-based winsorization audit: per event type, the exact
    * 1%-tail order statistics — how many rows each tail clips (k = n/100
    * by integer division) and the clip boundary values (the (k+1)-th
    * order statistic from each end, ties broken by event_id). Rank-based
    * rather than interpolated percentiles BY DESIGN: an interpolated
    * p1/p99 is a float whose cross-engine equality is accidental, while
    * "the k-th smallest value" is a single stored double — engine-exact.
    *
    * Scale: exact tail statistics require one sort per type partition —
    * the honest cost of exactness (no prefilter can bound it without
    * knowing the value distribution first; contrast q90, where the
    * ranking key is a content hash known in advance). The production
    * 100 TB path uses approx_percentile thresholds (q27) for the
    * clipping itself and runs THIS query as the exactness audit on
    * samples or at release gates. */
  def q106Winsorize(s: SparkSession, dir: String): DataFrame = {
    // ONE window sort: (value, event_id) is a total order (event_id
    // unique), so the rank from the high end is exactly n + 1 − rn_lo —
    // a second reversed window would re-sort every partition for a
    // value that is already determined
    val wLo = Window.partitionBy(col("event_type"))
      .orderBy(col("value"), col("event_id"))
    val wN = Window.partitionBy(col("event_type"))
    Tables.events(s, dir)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn_lo", row_number().over(wLo))
      .withColumn("n", count(lit(1)).over(wN))
      .groupBy(col("event_type"), expr("n div 100").as("k"))
      .agg(max(col("n")).as("n"),
        sum(when(col("rn_lo") <= expr("n div 100"), 1L).otherwise(0L))
          .as("n_lo"),
        sum(when(col("rn_lo") > col("n") - expr("n div 100"), 1L)
          .otherwise(0L)).as("n_hi"),
        min(when(col("rn_lo") === expr("n div 100") + 1, col("value")))
          .as("lo_val"),
        max(when(col("rn_lo") === col("n") - expr("n div 100"),
          col("value"))).as("hi_val"))
      .select(col("event_type"), col("n"), col("k"), col("n_lo"),
        col("n_hi"), col("lo_val"), col("hi_val"))
      .orderBy(col("event_type"))
  }

  val q106Sql: String =
    """WITH r AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS rn_lo,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events)
      |SELECT event_type, CAST(max(n) AS BIGINT) AS n,
      |  CAST(n // 100 AS BIGINT) AS k,
      |  CAST(sum(CASE WHEN rn_lo <= n // 100 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_lo,
      |  CAST(sum(CASE WHEN rn_lo > n - n // 100 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_hi,
      |  min(CASE WHEN rn_lo = n // 100 + 1 THEN value END) AS lo_val,
      |  max(CASE WHEN rn_lo = n - n // 100 THEN value END) AS hi_val
      |FROM r GROUP BY event_type, n // 100
      |ORDER BY event_type""".stripMargin

  /** q110 — frequent itemset pairs (the first level of market-basket /
    * FP-growth mining): baskets are the DISTINCT event types a user
    * exhibits per day; every unordered type pair's support is counted
    * corpus-wide. Pairs are generated IN-ROW from each basket's sorted
    * type set (nested transform over index pairs) — baskets are tiny
    * (≤ #types), so the pair explosion is basket-local and the only
    * exchange carries (pair, partial count), bounded by #types² — the
    * q93 shape applied to sets instead of sequences. The oracle uses
    * the equivalent self-join spelling. */
  /** In-row unordered-pair expansion of a SORTED array column: every
    * (i < j) element pair as struct(ta, tb) — ONE definition shared by
    * q110 and q151 so their candidate generation cannot drift (the
    * Text.intersectionsOf anti-drift discipline). */
  private def sortedPairsCol(ts: Column): Column =
    flatten(transform(
      sequence(lit(1), size(ts) - 1),
      i => transform(sequence(i + 1, size(ts)),
        j => struct(element_at(ts, i).as("ta"),
          element_at(ts, j).as("tb")))))

  def q110ItemsetPairs(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .distinct()
      .groupBy(col("user_id"), col("d"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
      .filter(size(col("ts")) >= 2)
    baskets
      .select(explode(sortedPairsCol(col("ts"))).as("p"))
      .groupBy(col("p.ta").as("ta"), col("p.tb").as("tb"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("ta"), col("tb"))
  }

  val q110Sql: String =
    """WITH t AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
      |  FROM events)
      |SELECT a.event_type AS ta, b.event_type AS tb,
      |  CAST(count(*) AS BIGINT) AS support
      |FROM t a JOIN t b
      |  ON a.user_id = b.user_id AND a.d = b.d
      |  AND a.event_type < b.event_type
      |GROUP BY 1, 2
      |ORDER BY ta, tb""".stripMargin

  /** q111 — behavioral transition matrix (first-order Markov counts):
    * for each user's event sequence in (ts, event_id) order, count every
    * consecutive (from_type → to_type) transition corpus-wide — the
    * relation session-flow and funnel-discovery analyses start from
    * (q73's funnel checks ONE fixed path; this materializes all edges).
    * One shuffle by user for the sequence window — inherent to
    * order-sensitive analytics — then the transition counts
    * partial-aggregate into ≤ #types² rows. */
  def q111Transitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("nxt").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val q111Sql: String =
    """WITH s AS (
      |  SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS nxt
      |  FROM events)
      |SELECT event_type AS from_type, nxt AS to_type,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM s WHERE nxt IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY from_type, to_type""".stripMargin

  /** q131 — SCD type-2 dimension build (Kimball slowly-changing
    * dimension): each user's observed "tier" (floor(value/50) at each
    * event) becomes a history of validity intervals — consecutive
    * same-tier observations collapse into one version row carrying
    * (valid_from, valid_to, n_obs, is_current), the
    * gaps-and-islands spelling every warehouse uses to load a
    * dimension from an observation changelog. q133 is the type-1
    * companion (current state only); this keeps full history.
    *
    * Scale shape: both windows partition by user_id — one shuffle by
    * the dimension's natural key, per-user fan-in bounded by that
    * user's event count; the version roll-up partial-aggregates and
    * the valid_to lead runs over the already-collapsed ≤#versions
    * rows. No global sort, nothing corpus-wide in one partition. */
  def q131Scd2(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val prev = lag(col("tier"), 1).over(w)
    val versions = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") / lit(50.0d)).cast("int").as("tier"))
      .withColumn("chg",
        when(prev.isNull.or(prev =!= col("tier")), 1L).otherwise(0L))
      .withColumn("version", sum(col("chg")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("tier")).as("tier"), min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_obs"))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("version"))
    versions
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wv))
      .select(col("user_id"), col("version"), col("tier"),
        col("valid_from"), col("valid_to"), col("n_obs"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  val q131Sql: String =
    """WITH flag AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(floor(value / 50) AS INT) AS tier,
      |    CASE WHEN lag(CAST(floor(value / 50) AS INT)) OVER w IS NULL
      |           OR lag(CAST(floor(value / 50) AS INT)) OVER w
      |              <> CAST(floor(value / 50) AS INT)
      |         THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |ver AS (
      |  SELECT user_id, tier, ts,
      |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS version
      |  FROM flag),
      |coll AS (
      |  SELECT user_id, version, min(tier) AS tier, min(ts) AS valid_from,
      |    CAST(count(*) AS BIGINT) AS n_obs
      |  FROM ver GROUP BY user_id, version)
      |SELECT user_id, version, tier, valid_from,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |    AS valid_to,
      |  n_obs,
      |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |    IS NULL AS is_current
      |FROM coll
      |ORDER BY user_id, version""".stripMargin

  /** q133 — CDC changelog apply (SCD type-1 / MERGE INTO semantics):
    * events are a change stream keyed by user_id — `error` rows are
    * DELETE markers, everything else an UPSERT — and the query
    * materializes the current-state table under last-writer-wins by
    * (ts, event_id). A key whose LAST change is a delete is absent
    * from the result; otherwise the newest change's attributes win.
    * This is the batch apply step of every CDC ingestion pipeline
    * (Debezium→warehouse, lakehouse MERGE), and the type-1 companion
    * to q131's full-history type-2 build.
    *
    * Scale shape: ONE partial-aggregable max(struct) — the changelog
    * never windows, never sorts, never self-joins; map-side combine
    * collapses each partition to ≤#keys rows before the single
    * key-hash exchange. The delete filter runs on the aggregated
    * #keys-row relation. */
  def q133CdcMerge(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("last"))
      .filter(col("last.event_type") =!= "error")
      .select(col("user_id"), col("last.ts").as("last_ts"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"))
      .orderBy(col("user_id"))

  val q133Sql: String =
    """WITH ranked AS (
      |  SELECT user_id, ts, event_type, value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id, ts AS last_ts, event_type AS last_type,
      |  value AS last_value
      |FROM ranked WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** q138 — time-grid resample with forward fill: each user's event
    * stream resampled onto a dense hourly grid between their first and
    * last active hour; hours with activity carry that hour's LAST
    * observed value (by ts, event_id — the q133 last-writer rule at
    * hour granularity), silent hours forward-fill the most recent
    * observation. The missing-data-repair step every per-entity
    * time-series feature pipeline runs before modeling.
    *
    * Scale shape: one shuffle by user for the per-(user, hour) argmax
    * partial agg; the grid explode is bounded by each user's active
    * span (never the corpus time range × all users — inactive spans
    * outside a user's own range generate nothing); the fill window
    * partitions by user with bounded fan-in. No global sort. */
  def q138GapFill(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(max(struct(col("ts"), col("event_id"), col("value")))
        .getField("value").as("obs"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR")))
          .as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        last(col("obs"), ignoreNulls = true).over(w).as("value_filled"),
        col("obs").isNotNull.as("is_observed"))
      .orderBy(col("user_id"), col("hour"))
  }

  val q138Sql: String =
    """WITH ranked AS (
      |  SELECT user_id, date_trunc('hour', ts) AS hour, value,
      |    row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events),
      |hourly AS (
      |  SELECT user_id, hour, value AS obs FROM ranked WHERE rn = 1),
      |grid AS (
      |  SELECT user_id,
      |    unnest(generate_series(min(hour), max(hour),
      |      INTERVAL 1 HOUR)) AS hour
      |  FROM hourly GROUP BY user_id),
      |joined AS (
      |  SELECT g.user_id, g.hour, h.obs,
      |    count(h.obs) OVER (PARTITION BY g.user_id ORDER BY g.hour) AS grp
      |  FROM grid g LEFT JOIN hourly h
      |    ON g.user_id = h.user_id AND g.hour = h.hour)
      |SELECT user_id, hour,
      |  max(obs) OVER (PARTITION BY user_id, grp) AS value_filled,
      |  obs IS NOT NULL AS is_observed
      |FROM joined
      |ORDER BY user_id, hour""".stripMargin

  /** q143 patterns: each user's chronologically-ordered event initials
    * (signup/view/click/purchase/error → s/v/c/p/e) scanned with
    * RE2-safe regexes (no backrefs/lookaround, so Java and RE2 agree on
    * match counts). */
  val SeqPatterns: Seq[(String, String)] = Seq(
    ("signup_to_purchase",  "s[vce]*p"),
    ("browse_then_buy",     "[vc]p"),
    ("error_retry_success", "e[ve]*p"),
    ("pure_browser",        "^[vc]+$"))

  /** q143 — behavioral sequence-pattern matching (the MATCH_RECOGNIZE
    * capability of Flink/Trino, composed from in-row ops): each user's
    * event history becomes one chronologically-ordered initials string
    * (array_sort over (ts, event_id, initial) structs — collect order
    * never matters), and each [[SeqPatterns]] regex reports how many
    * users match and the total non-overlapping match count. q73 checks
    * ONE fixed funnel; q111 counts single transitions; this matches
    * arbitrary sequence patterns.
    *
    * Scale shape: one shuffle by user builds the per-user string
    * (bounded by that user's history — the inherent cost of
    * order-sensitive analytics); the pattern scan is in-row over
    * #patterns broadcast literals and partial-aggregates into
    * #patterns rows. */
  def q143SeqPattern(s: SparkSession, dir: String): DataFrame = {
    val seqs = Tables.events(s, dir)
      .select(col("user_id"), struct(col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("ini")).as("ev"))
      .groupBy(col("user_id"))
      .agg(array_join(transform(array_sort(collect_list(col("ev"))),
        e => e.getField("ini")), "").as("seq"))
      // multi-consumer rule: WITHOUT this, the 4-arm union re-plans the
      // events scan + user-keyed sort-aggregate once PER PATTERN
      .localCheckpoint(eager = false)
    val arms = SeqPatterns.map { case (name, pat) =>
      seqs.select(
        lit(name).as("pattern"),
        when(regexp_count(col("seq"), lit(pat)) > 0, 1L).otherwise(0L)
          .as("hit"),
        regexp_count(col("seq"), lit(pat)).cast("long").as("m"))
    }.reduce(_.unionAll(_))
    arms.groupBy(col("pattern"))
      .agg(sum(col("hit")).as("n_users"), sum(col("m")).as("n_matches"))
      .orderBy(col("pattern"))
  }

  val q143Sql: String = {
    val arms = SeqPatterns.map { case (name, pat) =>
      s"""SELECT '$name' AS pattern,
         |  CAST(sum(CASE WHEN len(regexp_extract_all(seq, '$pat')) > 0
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
         |  CAST(sum(len(regexp_extract_all(seq, '$pat'))) AS BIGINT)
         |    AS n_matches
         |FROM seqs""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH seqs AS (
       |  SELECT user_id, string_agg(ini, '' ORDER BY ts, event_id) AS seq
       |  FROM (SELECT user_id, ts, event_id,
       |          substr(event_type, 1, 1) AS ini FROM events)
       |  GROUP BY user_id)
       |SELECT * FROM (
       |$arms
       |) ORDER BY pattern""".stripMargin
  }

  /** q144 — multi-touch conversion attribution: every purchase credits
    * the user's preceding touchpoints (view/click/signup within 24 h)
    * under the three standard models at once — first-touch, last-touch,
    * and linear. Linear credit is integer MICRO-credits
    * (1_000_000 div n per touch, remainder dropped — deterministic in
    * both engines, never a sum of per-touch IEEE ratios); purchases
    * with no preceding touch report under `(direct)`, so conversions
    * are partitioned, not silently dropped.
    *
    * Scale shape: the touch↔purchase pairing is a USER-keyed equi-join
    * with an in-partition interval filter (the per-user spelling of
    * q32's range join — never a global theta-join); per-purchase
    * first/last/n collapse as ONE partial-aggregable min/max(struct);
    * the three credit roll-ups run on the per-purchase relation
    * (#purchases rows) and the per-pair linear relation, each one
    * exchange into ≤#types rows. */
  def q144Attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("pts"),
        col("event_id").as("pid"))
    val touches = ev.filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("ts").as("tts"),
        col("event_id").as("tid"), col("event_type").as("ttype"))
    val pairs = purchases.join(touches, Seq("user_id"))
      .filter(col("tts") < col("pts") &&
        col("tts") >= col("pts") - expr("INTERVAL 24 HOURS"))
      .localCheckpoint(eager = false) // feeds per-purchase agg AND linear
    val perPurchase = pairs
      .groupBy(col("user_id"), col("pid"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("tts"), col("tid"), col("ttype")))
          .getField("ttype").as("first_type"),
        max(struct(col("tts"), col("tid"), col("ttype")))
          .getField("ttype").as("last_type"))
    val direct = purchases.join(perPurchase.select(col("pid")), Seq("pid"),
        "left_anti")
      .select(lit("(direct)").as("event_type"),
        lit(1L).as("ft"), lit(1L).as("lt"), lit(1000000L).as("lin"))
    val firsts = perPurchase.groupBy(col("first_type").as("event_type"))
      .agg(count(lit(1)).as("ft"))
    val lasts = perPurchase.groupBy(col("last_type").as("event_type"))
      .agg(count(lit(1)).as("lt"))
    val linear = pairs
      .join(perPurchase.select(col("pid"), col("n")), Seq("pid"))
      .groupBy(col("ttype").as("event_type"))
      .agg(sum(expr("1000000 div n")).as("lin"))
    val directAgg = direct.groupBy(col("event_type"))
      .agg(sum(col("ft")).as("ft"), sum(col("lt")).as("lt"),
        sum(col("lin")).as("lin"))
    firsts.join(lasts, Seq("event_type"), "full_outer")
      .join(linear, Seq("event_type"), "full_outer")
      .unionByName(directAgg)
      .select(col("event_type"),
        coalesce(col("ft"), lit(0L)).as("first_touch"),
        coalesce(col("lt"), lit(0L)).as("last_touch"),
        coalesce(col("lin"), lit(0L)).as("linear_micros"))
      .orderBy(col("event_type"))
  }

  val q144Sql: String =
    """WITH purchases AS (
      |  SELECT user_id, ts AS pts, event_id AS pid FROM events
      |  WHERE event_type = 'purchase'),
      |touches AS (
      |  SELECT user_id, ts AS tts, event_id AS tid, event_type AS ttype
      |  FROM events WHERE event_type IN ('view', 'click', 'signup')),
      |pairs AS (
      |  SELECT p.user_id, p.pid, t.tts, t.tid, t.ttype
      |  FROM purchases p JOIN touches t ON p.user_id = t.user_id
      |  WHERE t.tts < p.pts AND t.tts >= p.pts - INTERVAL 24 HOUR),
      |per_p AS (
      |  SELECT user_id, pid, CAST(count(*) AS BIGINT) AS n,
      |    min(struct_pack(tts := tts, tid := tid, ttype := ttype)).ttype
      |      AS first_type,
      |    max(struct_pack(tts := tts, tid := tid, ttype := ttype)).ttype
      |      AS last_type
      |  FROM pairs GROUP BY 1, 2),
      |firsts AS (
      |  SELECT first_type AS event_type, CAST(count(*) AS BIGINT) AS ft
      |  FROM per_p GROUP BY 1),
      |lasts AS (
      |  SELECT last_type AS event_type, CAST(count(*) AS BIGINT) AS lt
      |  FROM per_p GROUP BY 1),
      |linear AS (
      |  SELECT pr.ttype AS event_type,
      |    CAST(sum(1000000 // pp.n) AS BIGINT) AS lin
      |  FROM pairs pr JOIN per_p pp ON pr.pid = pp.pid GROUP BY 1),
      |direct AS (
      |  SELECT '(direct)' AS event_type,
      |    CAST(count(*) AS BIGINT) AS ft, CAST(count(*) AS BIGINT) AS lt,
      |    CAST(count(*) * 1000000 AS BIGINT) AS lin
      |  FROM purchases p WHERE NOT EXISTS (
      |    SELECT 1 FROM per_p x WHERE x.pid = p.pid)
      |  HAVING count(*) > 0),
      |merged AS (
      |  SELECT coalesce(f.event_type, l.event_type, n.event_type)
      |      AS event_type,
      |    coalesce(ft, 0) AS first_touch, coalesce(lt, 0) AS last_touch,
      |    coalesce(lin, 0) AS linear_micros
      |  FROM firsts f
      |  FULL OUTER JOIN lasts l ON f.event_type = l.event_type
      |  FULL OUTER JOIN linear n ON coalesce(f.event_type, l.event_type)
      |    = n.event_type
      |  UNION ALL
      |  SELECT event_type, ft, lt, lin FROM direct)
      |SELECT event_type, CAST(first_touch AS BIGINT) AS first_touch,
      |  CAST(last_touch AS BIGINT) AS last_touch,
      |  CAST(linear_micros AS BIGINT) AS linear_micros
      |FROM merged
      |ORDER BY event_type""".stripMargin

  /** q146 — change-point detection by integer CUSUM: per event type,
    * the day where the cumulative deviation of daily volume from the
    * type's own mean rate peaks — the standard drift detector an ingest
    * monitor runs per stream. Deviations are kept EXACTLY integral by
    * scaling: dev_d = n_d·D − T (D days in the type's span, T total
    * events) sums to zero over the span, so the running sum is an exact
    * BIGINT walk and the peak (argmax |cusum|, earliest day on ties) is
    * engine-exact with no mean division anywhere. q75 flags POINT
    * anomalies; this locates the sustained LEVEL SHIFT a point detector
    * misses.
    *
    * Scale shape: one partial-aggregable (type, day) count; the dense
    * day grid explodes per type bounded by that type's own span
    * (zero-filled silent days — a gap IS signal for drift); the walk
    * and the peak are per-type windows over ≤span rows. */
  def q146ChangePoint(s: SparkSession, dir: String): DataFrame =
    changePointFromDaily(Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n")))

  /** The q146 walk from an already-aggregated (event_type, day, n)
    * relation — split out so the streaming drift monitor
    * ([[graft.streaming.EventStreams.maintainDriftMonitor]]) can
    * recompute the SAME detector from its incrementally-maintained
    * daily counts without rescanning any corpus. */
  private[graft] def changePointFromDaily(daily0: DataFrame): DataFrame = {
    // multi-consumer rule: `daily` feeds BOTH the span grid and the
    // left join below — un-checkpointed, the daily aggregate (and in
    // the q146 batch path, the events scan under it) planned and ran
    // twice; the relation is (type, day)-sized, so the checkpoint is
    // tiny even when the streaming drift monitor calls this per wave
    val daily = daily0.localCheckpoint(eager = false)
    val grid = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"),
        sum(col("n")).as("t"))
      .select(col("event_type"), col("t"),
        explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY")))
          .as("day"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val walk = grid.join(daily, Seq("event_type", "day"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("d_cnt", count(lit(1)).over(
        Window.partitionBy(col("event_type"))))
      .withColumn("cusum", sum(col("n") * col("d_cnt") - col("t")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    walk
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(abs(col("cusum")).desc, col("day"))))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("day").as("peak_day"),
        col("cusum").as("peak_cusum"), col("d_cnt").as("n_days"),
        col("t").as("n_events"))
      .orderBy(col("event_type"))
  }

  val q146Sql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |spans AS (
      |  SELECT event_type, min(day) AS d0, max(day) AS d1,
      |    CAST(sum(n) AS BIGINT) AS t
      |  FROM daily GROUP BY 1),
      |grid AS (
      |  SELECT event_type, t,
      |    unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      |  FROM spans),
      |walk AS (
      |  SELECT g.event_type, g.day, g.t,
      |    coalesce(d.n, 0) AS n,
      |    CAST(count(*) OVER (PARTITION BY g.event_type) AS BIGINT)
      |      AS d_cnt
      |  FROM grid g LEFT JOIN daily d
      |    ON g.event_type = d.event_type AND g.day = d.day),
      |cus AS (
      |  SELECT event_type, day, d_cnt, t,
      |    CAST(sum(n * d_cnt - t) OVER (PARTITION BY event_type
      |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cusum
      |  FROM walk),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY event_type
      |    ORDER BY abs(cusum) DESC, day) AS rn
      |  FROM cus)
      |SELECT event_type, day AS peak_day, cusum AS peak_cusum,
      |  d_cnt AS n_days, t AS n_events
      |FROM r WHERE rn = 1
      |ORDER BY event_type""".stripMargin

  /** q147 — time-weighted average (TWAP): each user's `value`
    * observations weighted by how long they were the CURRENT value —
    * Σ cents·held_µs / Σ held_µs over [first, last] observation — the
    * metric a billing/pricing/telemetry pipeline wants where a plain
    * mean over-counts bursts. Exact integers until the single final
    * division: cents = ⌊value·100 + 0.5⌋, holds in epoch-µs longs
    * (headroom: max_cents·span ≈ 10¹⁷ ≪ 2⁶³); the last observation
    * holds for 0 µs by construction, so single-event users (span 0)
    * are excluded rather than dividing by zero.
    *
    * Scale shape: one shuffle by user for the lead window (bounded
    * per-user fan-in), then a partial-aggregable sum pair and one
    * division on the #users relation. */
  def q147Twap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 100 + lit(0.5d)).cast("long").as("cents"))
      .withColumn("held",
        coalesce(unix_micros(lead(col("ts"), 1).over(w)), unix_micros(col("ts")))
          - unix_micros(col("ts")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_obs"), sum(col("held")).as("span_us"),
        sum(col("cents") * col("held")).as("wsum"))
      .filter(col("span_us") > 0)
      .select(col("user_id"), col("n_obs"), col("span_us"), col("wsum"),
        (col("wsum").cast("double") / col("span_us").cast("double"))
          .as("twap_cents"))
      .orderBy(col("user_id"))
  }

  val q147Sql: String =
    """WITH held AS (
      |  SELECT user_id,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
      |    CAST(coalesce(epoch_us(lead(ts) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id)), epoch_us(ts)) - epoch_us(ts)
      |      AS BIGINT) AS held
      |  FROM events),
      |agg AS (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_obs,
      |    CAST(sum(held) AS BIGINT) AS span_us,
      |    CAST(sum(cents * held) AS BIGINT) AS wsum
      |  FROM held GROUP BY 1)
      |SELECT user_id, n_obs, span_us, wsum,
      |  CAST(wsum AS DOUBLE) / CAST(span_us AS DOUBLE) AS twap_cents
      |FROM agg WHERE span_us > 0
      |ORDER BY user_id""".stripMargin

  /** q148 column groups: (table, column) pairs profiled by the stats
    * collector — the compile-time manifest the oracle mirrors. */
  val AnalyzeColumns: Seq[(String, String)] = Seq(
    ("lineitem", "l_orderkey"), ("lineitem", "l_partkey"),
    ("lineitem", "l_returnflag"), ("lineitem", "l_shipdate"),
    ("orders", "o_custkey"), ("orders", "o_orderpriority"),
    ("events", "user_id"), ("events", "event_type"),
    ("documents", "lang"), ("documents", "source"))

  /** q148 — planner-statistics collection (the ANALYZE TABLE shape):
    * per profiled column, row count, null count and EXACT distinct
    * count — the triple every cost-based optimizer's reorder/broadcast
    * decisions start from. One scan arm per column (exactly how ANALYZE
    * runs), each a partial-aggregable count/countDistinct; the union is
    * #columns rows.
    *
    * At 100 TB the per-column arms each prune to a single-column scan
    * (column pruning reaches the parquet reader), so the cost is
    * #profiled-columns single-column passes — the honest price of exact
    * NDV; approximate NDV is one scan total via q36's
    * approx_count_distinct. */
  def q148AnalyzeStats(s: SparkSession, dir: String): DataFrame = {
    val arms = AnalyzeColumns.map { case (t, c) =>
      // events must go through Tables.events so a profiled timestamp
      // column sees the vintage-normalized ts, not the raw encoding
      val rel = if (t == "events") Tables.events(s, dir)
                else Tables.load(s, dir, t)
      rel.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("ndv"))
        .select(lit(t).as("table_name"), lit(c).as("column_name"),
          col("n_rows"), col("n_null"), col("ndv"))
    }
    arms.reduce(_.unionAll(_)).orderBy(col("table_name"), col("column_name"))
  }

  val q148Sql: String = {
    val arms = AnalyzeColumns.map { case (t, c) =>
      s"""SELECT '$t' AS table_name, '$c' AS column_name,
         |  CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_null,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS ndv
         |FROM $t""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT * FROM (
       |$arms
       |) ORDER BY table_name, column_name""".stripMargin
  }

  // ---- q199: join-cardinality estimation audit ----------------------------

  /** The audited equi-joins: (name, left, right, left key, right key). */
  val CardJoins: Seq[(String, String, String, String, String)] = Seq(
    ("customer_nation", "customer", "nation", "c_nationkey", "n_nationkey"),
    ("events_events", "events", "events", "user_id", "user_id"),
    ("lineitem_orders", "lineitem", "orders", "l_orderkey", "o_orderkey"),
    ("lineitem_part", "lineitem", "part", "l_partkey", "p_partkey"),
    ("orders_customer", "orders", "customer", "o_custkey", "c_custkey"))

  /** q199 — the Selinger uniformity estimate priced against reality:
    * for each audited equi-join, est = |A|·|B| div max(ndv_A, ndv_B)
    * (System R's containment-of-values rule — what every cost-based
    * optimizer, Catalyst's CBO included, computes from exactly the
    * q148 ANALYZE relation) beside the TRUE join cardinality, with the
    * signed error in ppm. This is the planner-trust audit: run per
    * release, it tells you WHICH joins the optimizer will mis-plan
    * (skewed keys blow the uniformity assumption; clean FK joins land
    * within noise) — at 100 TB a 10× cardinality miss is the
    * difference between a broadcast and a 100-executor shuffle spill.
    *
    * Scale shape: the stats arms are single-pass partial aggs (exact
    * NDV by two-phase key groupBy, the q36 discipline); the actual-
    * cardinality arm is the priced q117-style audit join, aggregated
    * to ONE count per join — nothing corpus-sized is materialized. */
  def q199CardinalityAudit(s: SparkSession, dir: String): DataFrame = {
    // ONE materialized key-column projection per table, shared across
    // every arm (guide §1.2): lineitem/orders/events each fed multiple
    // stats sides AND actual-cardinality joins before, re-scanning the
    // table per use (lineitem 4×, orders 3×, events 3× per run).
    // events still goes through Tables.events (vintage-normalized ts) —
    // the q148 rule, even though only the key column is read today.
    val keyCols: Map[String, Seq[String]] =
      CardJoins.flatMap { case (_, lt, rt, lk, rk) => Seq(lt -> lk, rt -> rk) }
        .groupBy(_._1).map { case (t, ks) => t -> ks.map(_._2).distinct }
    val shared: Map[String, DataFrame] = keyCols.map { case (t, ks) =>
      val rel = if (t == "events") Tables.events(s, dir)
                else Tables.load(s, dir, t)
      t -> rel.select(ks.map(col): _*).localCheckpoint(eager = false)
    }
    val arms = CardJoins.map { case (name, lt, rt, lk, rk) =>
      def side(t: String, k: String) =
        shared(t).groupBy(col(k)).agg(count(lit(1)).as("c"))
          .agg(sum(col("c")).as("n"), count(lit(1)).as("ndv"))
      val l = side(lt, lk).select(col("n").as("n_left"),
        col("ndv").as("ndv_left"))
      val r = side(rt, rk).select(col("n").as("n_right"),
        col("ndv").as("ndv_right"))
      val actual = shared(lt).select(col(lk).as("k"))
        .join(shared(rt).select(col(rk).as("k")), Seq("k"))
        .agg(count(lit(1)).as("actual_rows"))
      l.crossJoin(r).crossJoin(actual)
        .select(lit(name).as("join_name"),
          col("n_left"), col("n_right"), col("ndv_left"), col("ndv_right"),
          expr("n_left * n_right div greatest(ndv_left, ndv_right)")
            .as("est_rows"),
          col("actual_rows"),
          expr("(n_left * n_right div greatest(ndv_left, ndv_right) " +
            "- actual_rows) * 1000000 div actual_rows").as("err_ppm"))
    }
    arms.reduce(_.unionAll(_)).orderBy(col("join_name"))
  }

  val q199Sql: String = {
    val arms = CardJoins.map { case (name, lt, rt, lk, rk) =>
      s"""SELECT '$name' AS join_name,
         |  (SELECT count(*) FROM $lt) AS n_left,
         |  (SELECT count(*) FROM $rt) AS n_right,
         |  (SELECT count(DISTINCT $lk) FROM $lt) AS ndv_left,
         |  (SELECT count(DISTINCT $rk) FROM $rt) AS ndv_right,
         |  (SELECT count(*) FROM $lt la JOIN $rt ra ON la.$lk = ra.$rk)
         |    AS actual_rows
         |""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT join_name,
       |  CAST(n_left AS BIGINT) AS n_left,
       |  CAST(n_right AS BIGINT) AS n_right,
       |  CAST(ndv_left AS BIGINT) AS ndv_left,
       |  CAST(ndv_right AS BIGINT) AS ndv_right,
       |  CAST(n_left * n_right // greatest(ndv_left, ndv_right) AS BIGINT)
       |    AS est_rows,
       |  CAST(actual_rows AS BIGINT) AS actual_rows,
       |  CAST((n_left * n_right // greatest(ndv_left, ndv_right)
       |    - actual_rows) * 1000000 // actual_rows AS BIGINT) AS err_ppm
       |FROM (
       |$arms
       |) ORDER BY join_name""".stripMargin
  }

  // ---- q213: chi-square independence audit --------------------------------

  /** χ² critical value at α=0.05 for (5−1)(7−1) = 24 degrees of
    * freedom, embedded as a literal (the NdcgW discipline — no
    * query-time distribution functions). Valid ONLY when the derived
    * dof is 24, and BOTH engines enforce that: crit_05 and
    * reject_independence are emitted NULL whenever the margins derive
    * any other dof (a vanished type/weekday), so a vocabulary change
    * can never yield a verdict tested against the wrong distribution.
    * Q213Spec pins the fixture vocabulary to 5 types × 7 weekdays so
    * the literal applies there. */
  final val Chi2Crit24 = 36.415
  /** Headroom note: the per-cell difference O·N − R·C is formed in
    * WIDE integers (decimal(38,0) in Spark, HUGEINT in DuckDB) — exact
    * up to N ≈ 10¹⁹ cell observations — and only then rounded once to
    * double and squared. The naive int64 spelling would wrap silently
    * once N·|O−E| exceeded ~3·10⁹ (≈10⁸ events even near
    * independence), which is why the widening happens BEFORE the
    * square, not after. */

  /** q213 — is activity MIX independent of weekday? The r×c chi-square
    * on the event_type × weekday contingency table, computed exactly:
    * each cell's term is (O·N − R·C)²/(N·R·C) — the difference formed
    * in wide integers (decimal(38,0) / HUGEINT, exact to N ≈ 10¹⁹),
    * rounded ONCE to double, squared — and the 35 terms are summed
    * IN-ROW over the
    * SORTED cell array (the q126 fixed-fold discipline), so both
    * engines add identical doubles in identical order and the
    * statistic is bit-equal. q177's SRM is this test's 1-dof special
    * case on assignment arms; q210's KS asks about a continuous SHAPE
    * — this completes the categorical side (seasonality detection: a
    * weekday-dependent mix breaks naive daily mixture planning).
    *
    * Scale shape: one partial-agg pass to the ≤|types|·7 contingency
    * cells; margins by re-aggregation of cells (never the corpus); the
    * fold runs on ONE row holding ≤35 structs. */
  def q213Chi2Independence(s: SparkSession, dir: String): DataFrame = {
    val observed = Tables.events(s, dir)
      .select(col("event_type").as("t"),
        expr("datediff(to_date(ts), to_date('1970-01-01')) % 7").as("wd"))
      .groupBy(col("t"), col("wd")).agg(count(lit(1)).as("o"))
      .localCheckpoint(eager = false) // feeds the grid sides AND the pad
    // pad to the FULL observed-type × observed-day grid: an UNOBSERVED
    // cell still contributes its expected-count term (O=0 → R·C/N) to
    // the statistic — omitting empty cells understates chi² in both
    // engines identically, which the cross-engine gate cannot see.
    // Padding with the OBSERVED distincts keeps the dof margins (and
    // the vanished-type/weekday NULL-verdict gate below) unchanged.
    val grid = observed.select(col("t")).distinct()
      .crossJoin(observed.select(col("wd")).distinct()) // ≤ |types|·7 rows
    val cells = grid.join(observed, Seq("t", "wd"), "left")
      .select(col("t"), col("wd"), coalesce(col("o"), lit(0L)).as("o"))
      .localCheckpoint(eager = false) // cells feed margins AND the fold
    val rowm = cells.groupBy(col("t")).agg(sum(col("o")).as("r"))
    val colm = cells.groupBy(col("wd")).agg(sum(col("o")).as("c"))
    val n = cells.agg(sum(col("o")).as("n"))
    cells.join(broadcast(rowm), Seq("t")).join(broadcast(colm), Seq("wd"))
      .crossJoin(broadcast(n))
      .select(struct(col("t"), col("wd"), col("o"), col("r"), col("c"),
        col("n")).as("cell"))
      .agg(sort_array(collect_list(col("cell"))).as("arr"))
      .select(
        expr("element_at(arr, 1).n").as("n"),
        size(col("arr")).cast("long").as("n_cells"),
        expr("size(array_distinct(transform(arr, x -> x.t)))")
          .cast("long").as("n_types"),
        expr("size(array_distinct(transform(arr, x -> x.wd)))")
          .cast("long").as("n_days"),
        expr(
          """aggregate(arr, 0.0d, (acc, x) ->
            |  acc + cast(cast(x.o as decimal(38,0)) * x.n -
            |             cast(x.r as decimal(38,0)) * x.c as double)
            |      * cast(cast(x.o as decimal(38,0)) * x.n -
            |             cast(x.r as decimal(38,0)) * x.c as double)
            |        / (cast(x.n as double) * x.r * x.c))""".stripMargin)
          .as("chi2"))
      .select(col("n"), col("n_cells"),
        ((col("n_types") - 1) * (col("n_days") - 1)).as("dof"),
        col("chi2"),
        // the embedded critical value is the 24-dof one: if the margins
        // ever produce a different dof (a vanished type/weekday), emit
        // NULL instead of a verdict computed against the wrong
        // distribution — both engines gate identically, so the paired
        // output surfaces the vocabulary change as NULLs, not as a
        // silently wrong reject bit
        when(((col("n_types") - 1) * (col("n_days") - 1)) === 24,
          lit(Chi2Crit24)).as("crit_05"),
        when(((col("n_types") - 1) * (col("n_days") - 1)) === 24,
          col("chi2") > Chi2Crit24).as("reject_independence"))
  }

  /** DuckDB spelling: same cells/margins, the same sorted fold with
    * the same parenthesization. */
  val q213Sql: String =
    s"""WITH observed AS (
       |  SELECT event_type AS t,
       |    date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS wd,
       |    CAST(count(*) AS BIGINT) AS o
       |  FROM events GROUP BY 1, 2),
       |grid AS (
       |  SELECT t, wd
       |  FROM (SELECT DISTINCT t FROM observed),
       |       (SELECT DISTINCT wd FROM observed)),
       |cells AS (
       |  SELECT grid.t, grid.wd, coalesce(o, 0) AS o
       |  FROM grid LEFT JOIN observed
       |    ON observed.t = grid.t AND observed.wd = grid.wd),
       |rowm AS (SELECT t, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY 1),
       |colm AS (SELECT wd, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY 1),
       |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
       |arr AS (
       |  SELECT list_sort(list(struct_pack(t := cells.t, wd := cells.wd,
       |      o := o, r := r, c := c, n := n.n))) AS arr
       |  FROM cells JOIN rowm ON rowm.t = cells.t
       |  JOIN colm ON colm.wd = cells.wd, n)
       |SELECT arr[1].n AS n, CAST(len(arr) AS BIGINT) AS n_cells,
       |  CAST((len(list_distinct(list_transform(arr, x -> x.t))) - 1)
       |     * (len(list_distinct(list_transform(arr, x -> x.wd))) - 1)
       |     AS BIGINT) AS dof,
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(arr, x ->
       |      CAST(CAST(x.o AS HUGEINT) * x.n - CAST(x.r AS HUGEINT) * x.c
       |        AS DOUBLE)
       |      * CAST(CAST(x.o AS HUGEINT) * x.n - CAST(x.r AS HUGEINT) * x.c
       |        AS DOUBLE) / (CAST(x.n AS DOUBLE) * x.r * x.c))),
       |    (a, b) -> a + b) AS chi2,
       |  CASE WHEN (len(list_distinct(list_transform(arr, x -> x.t))) - 1)
       |          * (len(list_distinct(list_transform(arr, x -> x.wd))) - 1)
       |          = 24 THEN $Chi2Crit24 END AS crit_05,
       |  CASE WHEN (len(list_distinct(list_transform(arr, x -> x.t))) - 1)
       |          * (len(list_distinct(list_transform(arr, x -> x.wd))) - 1)
       |          = 24 THEN
       |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |      list_transform(arr, x ->
       |        CAST(CAST(x.o AS HUGEINT) * x.n - CAST(x.r AS HUGEINT) * x.c
       |          AS DOUBLE)
       |        * CAST(CAST(x.o AS HUGEINT) * x.n - CAST(x.r AS HUGEINT) * x.c
       |          AS DOUBLE) / (CAST(x.n AS DOUBLE) * x.r * x.c))),
       |      (a, b) -> a + b) > $Chi2Crit24
       |  END AS reject_independence
       |FROM arr""".stripMargin

  // ---- q210: two-sample Kolmogorov–Smirnov drift test ---------------------

  /** KS critical coefficient c(α)² at α = 0.05, as the rational
    * 18442/10⁴ (c = 1.358). */
  final val KsCrit2Num = 18442L
  final val KsCrit2Den = 10000L

  /** q210 — exact two-sample KS test per event type: does the VALUE
    * distribution drift between the first and second half of the month?
    * D = sup|F₁−F₂| computed as the exact rational A/(n₁n₂) with
    * A = max|c₁n₂ − c₂n₁| over the merged support, and the α=0.05
    * decision made by cross-multiplied INTEGER comparison
    * A² > ⌊c²·(n₁+n₂)·n₁·n₂/10⁴⌋ — no float ever enters the verdict
    * (q146's CUSUM asks "did the LEVEL shift"; this asks "did the
    * SHAPE change", the distribution-free way). Int64 headroom: A ≤
    * n₁n₂ so A² needs n₁n₂ < 3.0·10⁹ — √(2⁶³); past ~55k rows per
    * side, widen to decimal(38,0) (q134's gate discipline).
    *
    * Scale shape: one pass to (type, half, value-cent) counts; the
    * CDF walk is a window over the per-type merged SUPPORT (bounded by
    * the value domain — the q165 argument), and the verdict is a
    * per-type 1-row aggregate. */
  def q210KsDrift(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_type").as("t"),
        expr("bigint(round(value * 100))").as("c"),
        (dayofmonth(col("ts")) <= 15).as("h1"))
    val counts = ev.groupBy(col("t"), col("c"))
      .agg(sum(when(col("h1"), 1L).otherwise(0L)).as("d1"),
        sum(when(!col("h1"), 1L).otherwise(0L)).as("d2"))
    val cum = counts
      .withColumn("c1", sum(col("d1")).over(
        Window.partitionBy(col("t")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("c2", sum(col("d2")).over(
        Window.partitionBy(col("t")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val n = ev.groupBy(col("t"))
      .agg(sum(when(col("h1"), 1L).otherwise(0L)).as("n1"),
        sum(when(!col("h1"), 1L).otherwise(0L)).as("n2"))
    cum.join(broadcast(n), Seq("t"))
      .groupBy(col("t"), col("n1"), col("n2"))
      .agg(max(abs(col("c1") * col("n2") - col("c2") * col("n1"))).as("a"))
      .select(col("t").as("event_type"), col("n1"), col("n2"), col("a"),
        // nullif: a type whose events all fall in ONE half-month has
        // n1·n2 = 0 — ANSI integer division would abort the query; the
        // degenerate split reports NULL distance in both engines
        expr("a * 1000000 div nullif(n1 * n2, 0)").as("d_x1e6"),
        (col("a") * col("a") >
          expr(s"($KsCrit2Num * (n1 + n2) * n1 * n2) div $KsCrit2Den"))
          .as("reject_same_dist"))
      .orderBy(col("event_type"))
  }

  val q210Sql: String =
    s"""WITH ev AS (
       |  SELECT event_type AS t, CAST(round(value * 100) AS BIGINT) AS c,
       |    day(ts) <= 15 AS h1
       |  FROM events),
       |counts AS (
       |  SELECT t, c,
       |    CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
       |    CAST(sum(CASE WHEN h1 THEN 0 ELSE 1 END) AS BIGINT) AS d2
       |  FROM ev GROUP BY 1, 2),
       |cum AS (
       |  SELECT t,
       |    SUM(d1) OVER (PARTITION BY t ORDER BY c
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
       |    SUM(d2) OVER (PARTITION BY t ORDER BY c
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
       |  FROM counts),
       |ns AS (
       |  SELECT t, CAST(sum(CASE WHEN h1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       |    CAST(sum(CASE WHEN h1 THEN 0 ELSE 1 END) AS BIGINT) AS n2
       |  FROM ev GROUP BY 1),
       |agg AS (
       |  SELECT cum.t, ns.n1, ns.n2,
       |    CAST(max(abs(c1 * n2 - c2 * n1)) AS BIGINT) AS a
       |  FROM cum JOIN ns ON ns.t = cum.t
       |  GROUP BY cum.t, ns.n1, ns.n2)
       |SELECT t AS event_type, n1, n2, a,
       |  a * 1000000 // nullif(n1 * n2, 0) AS d_x1e6,
       |  a * a > ($KsCrit2Num * (n1 + n2) * n1 * n2) // $KsCrit2Den
       |    AS reject_same_dist
       |FROM agg ORDER BY event_type""".stripMargin

  // ---- q208: column-encoding advisor --------------------------------------

  /** Columns the encoding advisor profiles: (table, column, isString).
    * Numeric columns are costed at their fixed 8-byte width. */
  val EncodingColumns: Seq[(String, String, Boolean)] = Seq(
    ("lineitem", "l_returnflag", true), ("lineitem", "l_partkey", false),
    ("orders", "o_orderpriority", true), ("orders", "o_orderkey", false),
    ("events", "event_type", true), ("events", "user_id", false),
    ("documents", "source", true), ("documents", "lang", true))

  /** q208 — dictionary-vs-plain encoding advisor from one stats pass
    * per column: plain cost = Σ value bytes (8n for numerics), dict
    * cost = dictionary bytes (Σ distinct-value bytes) + n·⌈log₂ ndv⌉
    * bits of codes. This is the decision parquet/ORC writers make per
    * row group; at 100 TB making it FROM MEASURED STATS (per release,
    * per column) instead of writer defaults is real money — a
    * low-cardinality string column left plain is a ~10× size
    * regression. Exactly-integer byte arithmetic; ⌈log₂⌉ via floats
    * only at exact powers of two, where IEEE log2 is exact in both
    * engines.
    *
    * Scale shape: each arm is the q36 two-phase distinct discipline —
    * a (column-value) partial agg bounded by the value domain, then a
    * 1-row rollup; arms union into a #columns-row relation. */
  def q208EncodingAdvisor(s: SparkSession, dir: String): DataFrame = {
    val arms = EncodingColumns.map { case (t, c, isStr) =>
      val rel = if (t == "events") Tables.events(s, dir)
                else Tables.load(s, dir, t)
      val vals =
        if (isStr) rel.select(col(c).as("v"), length(col(c)).cast("long").as("w"))
        else rel.select(col(c).as("v"), lit(8L).as("w"))
      vals.groupBy(col("v")).agg(count(lit(1)).as("cnt"), max(col("w")).as("w"))
        .agg(sum(col("cnt")).as("n"), count(lit(1)).as("ndv"),
          sum(col("cnt") * col("w")).as("plain_bytes"),
          sum(col("w")).as("dict_value_bytes"))
        .select(lit(t).as("table_name"), lit(c).as("column_name"),
          col("n"), col("ndv"), col("plain_bytes"),
          (col("dict_value_bytes") +
            expr("(n * bigint(ceil(log2(ndv))) + 7) div 8")).as("dict_bytes"))
        .withColumn("recommend_dict", col("dict_bytes") < col("plain_bytes"))
    }
    arms.reduce(_.unionAll(_))
      .orderBy(col("table_name"), col("column_name"))
  }

  val q208Sql: String = {
    val arms = EncodingColumns.map { case (t, c, isStr) =>
      val w = if (isStr) s"CAST(strlen($c) AS BIGINT)" else "CAST(8 AS BIGINT)"
      s"""SELECT '$t' AS table_name, '$c' AS column_name,
         |  CAST(sum(cnt) AS BIGINT) AS n,
         |  CAST(count(*) AS BIGINT) AS ndv,
         |  CAST(sum(cnt * w) AS BIGINT) AS plain_bytes,
         |  CAST(sum(w) + (sum(cnt) * CAST(ceil(log2(count(*))) AS BIGINT)
         |    + 7) // 8 AS BIGINT) AS dict_bytes
         |FROM (SELECT $c AS v, count(*) AS cnt, max($w) AS w
         |      FROM $t GROUP BY 1)""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT *, dict_bytes < plain_bytes AS recommend_dict FROM (
       |$arms
       |) ORDER BY table_name, column_name""".stripMargin
  }

  // ---- q207: watermark-horizon lateness audit -----------------------------

  /** Candidate watermark horizons, in seconds. */
  val WatermarkHorizonsSec: Seq[Long] = Seq(30L, 60L, 120L)
  /** Simulated transport jitter half-window, µs: each event's ARRIVAL
    * is its event time plus a deterministic md5-derived offset in
    * ±[[ArrivalJitterUs]] — the corpus's event_id order is already
    * time-sorted, so without modeled transport skew every lateness is
    * zero and the audit is vacuous. In production the arrival order is
    * simply the ingest offset and the jitter model disappears. */
  final val ArrivalJitterUs = 60000000L
  /** Arrival shards for the two-phase running max. */
  final val LatenessShards = 32L

  /** q207 — the number you need BEFORE configuring
    * `withWatermark(...)`: treating event_id as arrival order, the
    * high-water mark at each event is the running max of event time
    * over the arrival prefix; an event's lateness is highmark − ts,
    * and an event would be DROPPED by a horizon-h watermark iff
    * lateness > h. The audit emits, per candidate horizon, how many
    * ingested events a streaming twin (q15's windows, the q99 gates)
    * would silently lose — measured on the real arrival/event-time
    * skew, not guessed.
    *
    * The running max is computed the q197 way — never a global
    * window: arrival is range-sharded by event_id ([[LatenessShards]]
    * equal id-ranges from a 1-row max broadcast), the within-shard
    * running max is a shard-partitioned window, and the exclusive
    * prefix max across shards is a ≤32-row relation; highmark =
    * greatest(shard-prefix max, within-shard running max). Exact
    * epoch-µs integers end to end; one final share division per
    * horizon.
    *
    * Scale shape: one scan + one shard-keyed window exchange + a
    * 32-row broadcast; the horizon rollup is a 3-arm conditional
    * aggregation in the same pass. */
  def q207WatermarkAudit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("ak", col("us") +
        graft.ext.Text.md5Bucket(col("event_id"), 2 * ArrivalJitterUs)
        - ArrivalJitterUs)
    val mx = ev.agg(max(col("ak")).as("mxak"), min(col("ak")).as("mnak"))
    val sharded = ev.crossJoin(broadcast(mx))
      // equal ARRIVAL-key ranges: shard order aligns with arrival order
      .withColumn("shard",
        expr(s"(ak - mnak) div (((mxak - mnak) div $LatenessShards) + 1)"))
      .localCheckpoint(eager = false) // feeds shard maxes AND running max
    val shardMax = sharded.groupBy(col("shard"))
      .agg(max(col("us")).as("smax"))
      .withColumn("pre", max(col("smax")).over(
        Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1))) // ≤32 rows
      .select(col("shard"), col("pre"))
    val run = sharded
      .withColumn("wrun", max(col("us")).over(
        Window.partitionBy(col("shard"))
          .orderBy(col("ak"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(shardMax), Seq("shard"))
      .select((greatest(coalesce(col("pre"), lit(Long.MinValue)),
        col("wrun")) - col("us")).as("late_us"))
    val arms = WatermarkHorizonsSec.map { h =>
      sum(when(col("late_us") > h * 1000000L, 1L).otherwise(0L))
        .as(s"drop_$h")
    }
    val aggCols = count(lit(1)).as("n_events") +: arms
    val agg = run.agg(aggCols.head, aggCols.tail: _*)
      .localCheckpoint(eager = false)
    val rows = WatermarkHorizonsSec.map { h =>
      agg.select(lit(h).as("horizon_sec"), col("n_events"),
        col(s"drop_$h").as("n_dropped"),
        (col(s"drop_$h").cast("double") / col("n_events"))
          .as("drop_share"))
    }
    rows.reduce(_.unionAll(_)).orderBy(col("horizon_sec"))
  }

  /** DuckDB spelling: the single global running-max window — the
    * semantic contract the two-phase plan implements. */
  val q207Sql: String = {
    val arms = WatermarkHorizonsSec.map { h =>
      val hUs = h * 1000000L
      s"""SELECT CAST($h AS BIGINT) AS horizon_sec,
         |  CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN late_us > $hUs
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
         |  CAST(sum(CASE WHEN late_us > $hUs
         |    THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS drop_share
         |FROM lat""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (
       |  SELECT event_id, epoch_us(ts) AS us,
       |    epoch_us(ts)
       |      + (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
       |         % ${2 * ArrivalJitterUs}) - $ArrivalJitterUs AS ak
       |  FROM events),
       |lat AS (
       |  SELECT max(us) OVER (ORDER BY ak, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |    - us AS late_us
       |  FROM a)
       |SELECT * FROM (
       |$arms
       |) ORDER BY horizon_sec""".stripMargin
  }

  // ---- q206: integer EWMA monitoring series -------------------------------

  /** EWMA smoothing: s_t = (n_t + (Den−1)·s_{t−1}) div Den (α = 1/Den),
    * s_1 = n_1 — the floor-integer recurrence, so every engine computes
    * the identical series with no float accumulation. */
  final val EwmaDen = 4L
  /** Alert rule: day t alerts when n_t > [[EwmaSpikeNum]]/[[EwmaSpikeDen]]
    * × s_{t−1} (50% above the smoothed baseline). */
  final val EwmaSpikeNum = 3L
  final val EwmaSpikeDen = 2L

  /** q206 — per-type EWMA of the daily event count with spike alerts:
    * the monitoring primitive behind ingest-volume dashboards (q146's
    * CUSUM detects sustained LEVEL SHIFTS; EWMA + threshold catches
    * one-day SPIKES against a slowly-adapting baseline). The recurrence
    * is inherently sequential, so it runs IN-ROW over the per-type
    * daily-count array — 30 elements, bounded by the DAY DOMAIN (the
    * q165 histogram argument), re-folded per prefix (O(days²) ≤ 900
    * integer ops per type). Emits the full (day, n, ewma, alert)
    * series per type; alerts compare n_t against the PRIOR day's
    * smoothed baseline s_{t−1} in exact integers (n·Den > Num·s).
    *
    * Scale shape: one partial-agg pass to (type, day, n); the fold
    * runs on ≤|types| rows each holding a ≤31-element array; nothing
    * corpus-sized is collected or shuffled twice. */
  def q206EwmaMonitor(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("d"))
      .agg(count(lit(1)).as("n"))
    val series = daily.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("d"), col("n")))).as("arr"))
      // prefix re-fold: ewma at position t = fold of counts 1..t
      .select(col("event_type"), expr(
        """transform(arr, (e, i) -> named_struct(
          |  'd', e.d, 'n', e.n,
          |  'ewma', aggregate(slice(arr, 2, i), e0.n,
          |            (acc, x) -> (x.n + 3 * acc) div 4),
          |  'prev', CASE WHEN i = 0 THEN CAST(NULL AS BIGINT)
          |          ELSE aggregate(slice(arr, 2, i - 1), e0.n,
          |            (acc, x) -> (x.n + 3 * acc) div 4) END))"""
          .stripMargin
          .replaceAll("e0", "element_at(arr, 1)")).as("sr"))
      .select(col("event_type"), explode(col("sr")).as("e"))
    series.select(col("event_type"), col("e.d").as("day"),
        col("e.n").as("n"), col("e.ewma").as("ewma"),
        (col("e.prev").isNotNull &&
          col("e.n") * EwmaSpikeDen > col("e.prev") * EwmaSpikeNum)
          .as("alert"))
      .orderBy(col("event_type"), col("day"))
  }

  /** DuckDB spelling: same sorted array, same prefix list_reduce fold,
    * same integer alert rule. */
  val q206Sql: String =
    s"""WITH daily AS (
       |  SELECT event_type, CAST(day(ts) AS BIGINT) AS d,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |arrs AS (
       |  SELECT event_type,
       |    list_sort(list(struct_pack(d := d, n := n))) AS arr
       |  FROM daily GROUP BY 1),
       |sr AS (
       |  SELECT event_type,
       |    unnest(list_transform(range(1, len(arr) + 1), i -> struct_pack(
       |      d := arr[i].d, n := arr[i].n,
       |      ewma := list_reduce(list_prepend(arr[1].n,
       |        list_transform(arr[2:i], x -> x.n)),
       |        (acc, x) -> (x + ${EwmaDen - 1} * acc) // $EwmaDen),
       |      prev := CASE WHEN i = 1 THEN NULL
       |        ELSE list_reduce(list_prepend(arr[1].n,
       |          list_transform(arr[2:i-1], x -> x.n)),
       |          (acc, x) -> (x + ${EwmaDen - 1} * acc) // $EwmaDen) END)))
       |      AS e
       |  FROM arrs)
       |SELECT event_type, e.d AS day, e.n AS n,
       |  CAST(e.ewma AS BIGINT) AS ewma,
       |  e.prev IS NOT NULL AND
       |    e.n * $EwmaSpikeDen > e.prev * $EwmaSpikeNum AS alert
       |FROM sr ORDER BY event_type, day""".stripMargin

  // ---- q204: session-basket association (support + lift) ------------------

  /** q204 — market-basket association over q16's gap sessions: each
    * session is a basket of the distinct event types it contains; for
    * every unordered type pair the audit emits the support counts and
    * the lift n_ab·N / (n_a·n_b) — the association measure (lift > 1:
    * the behaviors co-occur beyond chance) that funnel (q73) and
    * transition (q111) views can't see because they are order-bound.
    *
    * Scale shape: sessionization is the one user-keyed window pass
    * (q16's shuffle); baskets collapse in the same aggregation
    * (collect_set bounded by the TYPE VOCABULARY, not session length),
    * and pair generation is IN-ROW over the ≤|types| sorted basket
    * (q93's pattern) — no self-join of the item relation, so the
    * exchange after sessionization carries O(|types|²) distinct keys.
    * Lift is one exact-integer division per pair. The oracle spells
    * pair generation as the classic relational self-join — value-
    * identical, locking the in-row rewrite. */
  def q204BasketLift(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val baskets = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts") > col("prev_ts") + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_idx",
        sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(sort_array(collect_set(col("event_type"))).as("its"))
      .localCheckpoint(eager = false) // feeds N, singles AND pairs
    val n = baskets.agg(count(lit(1)).as("n_sessions"))
    val singles = baskets.select(explode(col("its")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    val pairs = baskets
      .select(explode(expr(
        "flatten(transform(its, (x, i) -> " +
          "transform(slice(its, i + 2, size(its)), " +
          "y -> struct(x AS a, y AS b))))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(singles.select(col("t").as("a"), col("n_t").as("n_a"))),
        Seq("a"))
      .join(broadcast(singles.select(col("t").as("b"), col("n_t").as("n_b"))),
        Seq("b"))
      .crossJoin(broadcast(n))
      .select(col("a"), col("b"), col("n_a"), col("n_b"), col("n_ab"),
        col("n_sessions"),
        ((col("n_ab") * col("n_sessions")).cast("double") /
          (col("n_a") * col("n_b"))).as("lift"))
      .orderBy(col("a"), col("b"))
  }

  val q204Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, event_type,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS session_idx
      |  FROM flagged),
      |di AS (SELECT DISTINCT user_id, session_idx, event_type FROM sessions),
      |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM
      |  (SELECT DISTINCT user_id, session_idx FROM di)),
      |singles AS (SELECT event_type AS t, CAST(count(*) AS BIGINT) AS n_t
      |  FROM di GROUP BY 1),
      |pairs AS (
      |  SELECT x.event_type AS a, y.event_type AS b,
      |    CAST(count(*) AS BIGINT) AS n_ab
      |  FROM di x JOIN di y
      |    ON x.user_id = y.user_id AND x.session_idx = y.session_idx
      |    AND x.event_type < y.event_type
      |  GROUP BY 1, 2)
      |SELECT a, b, sa.n_t AS n_a, sb.n_t AS n_b, n_ab, n_sessions,
      |  CAST(n_ab * n_sessions AS DOUBLE) / (sa.n_t * sb.n_t) AS lift
      |FROM pairs JOIN singles sa ON sa.t = a JOIN singles sb ON sb.t = b,
      |  ns
      |ORDER BY a, b""".stripMargin

  // ---- q200: grouped OLS trend fit ----------------------------------------

  /** q200 — per-segment least-squares trend: for each event type,
    * regress the DAILY value total (exact cents) on the day index and
    * emit the closed-form OLS fit — slope, intercept, r² — from the
    * five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²). This is
    * the one-pass regression primitive behind drift dashboards and
    * per-domain scaling-law fits: Spark has ML-library regressors, but
    * a GROUPED trend over a 100 TB fact table wants the sufficient-
    * statistics spelling — plain partial+final hash aggregation, no
    * iteration, no driver state, one exchange keyed by segment.
    *
    * Determinism: y is exact integer cents (Det's argument), x an
    * integer day index, so all six sums are exact int64; the emitted
    * moments S_xy = nΣxy−ΣxΣy etc. are exact integers, and slope /
    * intercept / r² are fixed sequences of int64→double casts,
    * multiplies and ONE division each — bit-identical cross-engine
    * (int64→double rounding is nearest-even in both). r² multiplies in
    * double deliberately: S_xy² can pass 2⁶³ while each factor is far
    * under 2⁵³. */
  def q200GroupTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), dayofmonth(col("ts")).cast("long").as("x"),
        expr("bigint(round(value * 100))").as("cents"))
      .groupBy(col("event_type"), col("x"))
      .agg(sum(col("cents")).as("y"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"), col("n"),
        (col("n") * col("sxy") - col("sx") * col("sy")).as("m_xy"),
        (col("n") * col("sxx") - col("sx") * col("sx")).as("m_xx"),
        (col("n") * col("syy") - col("sy") * col("sy")).as("m_yy"),
        col("sx"), col("sy"))
      .select(col("event_type"), col("n"), col("m_xy"), col("m_xx"),
        col("m_yy"),
        (col("m_xy").cast("double") / col("m_xx")).as("slope_cents_per_day"),
        ((col("sy") * col("m_xx") - col("m_xy") * col("sx")).cast("double") /
          (col("n") * col("m_xx"))).as("intercept_cents"),
        ((col("m_xy").cast("double") * col("m_xy")) /
          (col("m_xx").cast("double") * col("m_yy"))).as("r2"))
      .orderBy(col("event_type"))
  }

  val q200Sql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(day(ts) AS BIGINT) AS x,
      |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events GROUP BY 1, 2),
      |suf AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx,
      |    CAST(sum(y * y) AS BIGINT) AS syy
      |  FROM daily GROUP BY 1),
      |m AS (
      |  SELECT event_type, n, n * sxy - sx * sy AS m_xy,
      |    n * sxx - sx * sx AS m_xx, n * syy - sy * sy AS m_yy, sx, sy
      |  FROM suf)
      |SELECT event_type, n, m_xy, m_xx, m_yy,
      |  CAST(m_xy AS DOUBLE) / m_xx AS slope_cents_per_day,
      |  CAST(sy * m_xx - m_xy * sx AS DOUBLE) / (n * m_xx)
      |    AS intercept_cents,
      |  (CAST(m_xy AS DOUBLE) * m_xy) / (CAST(m_xx AS DOUBLE) * m_yy) AS r2
      |FROM m ORDER BY event_type""".stripMargin

  /** q149 — point-in-time (temporal) join against the q131 SCD2
    * dimension: every purchase is enriched with the tier that was
    * VALID AT its event time (valid_from ≤ ts < valid_to, open current
    * row unbounded) — the feature-store correctness join that keeps
    * training data free of future-attribute leakage; joining today's
    * tier onto last month's purchase is exactly the label-leak q59/q77
    * guard against, in dimension form. Purchases roll up per
    * tier-at-purchase-time.
    *
    * Scale shape: the interval join keys on user_id FIRST (equi-join,
    * per-user intervals are few) with the validity predicate evaluated
    * in-partition — q32's range-join discipline applied to a versioned
    * dimension; the roll-up partial-aggregates into ≤#tiers rows. */
  def q149PitJoin(s: SparkSession, dir: String): DataFrame = {
    val dim = q131Scd2(s, dir)
      .select(col("user_id"), col("tier"), col("valid_from"), col("valid_to"))
    val purchases = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        floor(col("value") * 100 + lit(0.5d)).cast("long").as("cents"))
    purchases.join(dim, Seq("user_id"))
      .filter(col("valid_from") <= col("ts") &&
        (col("valid_to").isNull || col("ts") < col("valid_to")))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("revenue_cents"))
      .orderBy(col("tier"))
  }

  val q149Sql: String =
    """WITH flag AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(floor(value / 50) AS INT) AS tier,
      |    CASE WHEN lag(CAST(floor(value / 50) AS INT)) OVER w IS NULL
      |           OR lag(CAST(floor(value / 50) AS INT)) OVER w
      |              <> CAST(floor(value / 50) AS INT)
      |         THEN 1 ELSE 0 END AS chg
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |ver AS (
      |  SELECT user_id, tier, ts,
      |    sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version
      |  FROM flag),
      |coll AS (
      |  SELECT user_id, version, min(tier) AS tier, min(ts) AS valid_from
      |  FROM ver GROUP BY user_id, version),
      |dim AS (
      |  SELECT user_id, tier, valid_from,
      |    lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
      |      AS valid_to
      |  FROM coll),
      |p AS (
      |  SELECT user_id, ts,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase')
      |SELECT d.tier, CAST(count(*) AS BIGINT) AS n_purchases,
      |  CAST(sum(p.cents) AS BIGINT) AS revenue_cents
      |FROM p JOIN dim d ON p.user_id = d.user_id
      |  AND d.valid_from <= p.ts
      |  AND (d.valid_to IS NULL OR p.ts < d.valid_to)
      |GROUP BY d.tier
      |ORDER BY d.tier""".stripMargin

  /** q150 — UNPIVOT / melt (the inverse of q30's pivot): the wide
    * per-priority order-count matrix stacks back to long
    * (priority, status, n) form via `stack`, dropping the NULL cells a
    * sparse wide table carries. Wide↔long reshaping is core relational
    * surface; stack evaluates in-row (no shuffle beyond the pivot's
    * own aggregation). */
  def q150Unpivot(s: SparkSession, dir: String): DataFrame = {
    val wide = Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
    wide.select(col("o_orderpriority"),
        expr("stack(3, 'F', F, 'O', O, 'P', P) AS (status, n)"))
      .filter(col("n").isNotNull)
      .select(col("o_orderpriority").as("priority"), col("status"),
        col("n").cast("long").as("n"))
      .orderBy(col("priority"), col("status"))
  }

  /** The oracle is the direct long-form aggregate — pivot→unpivot must
    * be the identity on the non-null cells. */
  val q150Sql: String =
    """SELECT o_orderpriority AS priority, o_orderstatus AS status,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders
      |WHERE o_orderstatus IN ('F', 'O', 'P')
      |GROUP BY 1, 2
      |ORDER BY priority, status""".stripMargin

  /** q151 — item-item collaborative-filtering similarity: q110's
    * (user, day) baskets re-scored as association strengths — for every
    * co-occurring type pair, cosine c_ab/√(c_a·c_b) and lift
    * c_ab·N/(c_a·c_b) — the item-item neighborhood model classic
    * recommenders (and data-mixing correlation audits) run. All counts
    * are exact BIGINTs; lift's numerator/denominator ship as exact
    * integers beside the ONE IEEE division each metric takes, so the
    * hash compare never sees accumulated float error.
    *
    * Scale shape: q110's in-row pair generation (baskets never
    * self-join); per-item counts and the basket total are two more
    * partial aggs; the metric join keys on item over a ≤#types relation
    * and broadcasts. */
  def q151ItemSimilarity(s: SparkSession, dir: String): DataFrame = {
    val baskets = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .distinct()
      .localCheckpoint(eager = false) // feeds pairs, item counts, and N
    val basketsGrouped = baskets
      .groupBy(col("user_id"), col("d"))
      .agg(sort_array(collect_set(col("event_type"))).as("ts"))
    val pairs = basketsGrouped
      .filter(size(col("ts")) >= 2)
      .select(explode(sortedPairsCol(col("ts"))).as("p"))
      .groupBy(col("p.ta").as("ta"), col("p.tb").as("tb"))
      .agg(count(lit(1)).as("c_ab"))
    val items = baskets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("c"))
    val n = basketsGrouped.agg(count(lit(1)).as("n_baskets"))
    pairs
      .join(broadcast(items.select(col("event_type").as("ta"),
        col("c").as("c_a"))), Seq("ta"))
      .join(broadcast(items.select(col("event_type").as("tb"),
        col("c").as("c_b"))), Seq("tb"))
      .crossJoin(broadcast(n))
      .select(col("ta"), col("tb"), col("c_ab"), col("c_a"), col("c_b"),
        col("n_baskets"),
        (col("c_ab").cast("double") /
          sqrt((col("c_a") * col("c_b")).cast("double"))).as("cosine"),
        ((col("c_ab") * col("n_baskets")).cast("double") /
          (col("c_a") * col("c_b")).cast("double")).as("lift"))
      .orderBy(col("ta"), col("tb"))
  }

  val q151Sql: String =
    """WITH t AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
      |  FROM events),
      |pairs AS (
      |  SELECT a.event_type AS ta, b.event_type AS tb,
      |    CAST(count(*) AS BIGINT) AS c_ab
      |  FROM t a JOIN t b
      |    ON a.user_id = b.user_id AND a.d = b.d
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2),
      |items AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS c
      |  FROM t GROUP BY 1),
      |n AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_baskets
      |  FROM (SELECT DISTINCT user_id, d FROM t))
      |SELECT p.ta, p.tb, p.c_ab, ia.c AS c_a, ib.c AS c_b, n.n_baskets,
      |  CAST(p.c_ab AS DOUBLE) / sqrt(CAST(ia.c * ib.c AS DOUBLE))
      |    AS cosine,
      |  CAST(p.c_ab * n.n_baskets AS DOUBLE)
      |    / CAST(ia.c * ib.c AS DOUBLE) AS lift
      |FROM pairs p
      |JOIN items ia ON ia.event_type = p.ta
      |JOIN items ib ON ib.event_type = p.tb
      |CROSS JOIN n
      |ORDER BY ta, tb""".stripMargin

  /** q152 — conversion-latency distribution: per user, the time from
    * FIRST signup to the FIRST subsequent purchase; across users, exact
    * p25/p50/p75 of that latency in integer microseconds plus the
    * conversion rate — the time-to-convert panel every activation
    * funnel report carries (q73 counts WHO converts; this measures HOW
    * LONG conversion takes). Latencies are epoch-µs differences
    * (exact longs); the quartiles interpolate between integer order
    * statistics — (1−d)·a + d·b at d ∈ {.25,.5,.75} — identically in
    * both engines (q27's rule); the rate is one IEEE division of two
    * exact counts.
    *
    * Scale shape: two partial-aggregable min-aggs by user (no window:
    * first-signup is a min, first-purchase-after is a min over a
    * filtered join), then one global 4-value aggregate over the
    * #converted-users relation. */
  def q152ConversionLatency(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("s0"))
    val firstBuy = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("pt"))
      .join(signup, Seq("user_id"))
      .filter(col("pt") >= col("s0"))
      .groupBy(col("user_id"), col("s0")).agg(min(col("pt")).as("p0"))
      .select(col("user_id"), (col("p0") - col("s0")).as("latency_us"))
    firstBuy
      .crossJoin(broadcast(signup.agg(count(lit(1)).as("n_signup"))))
      .groupBy(col("n_signup"))
      .agg(count(lit(1)).as("n_converted"),
        percentile(col("latency_us"), lit(0.25)).as("p25_us"),
        percentile(col("latency_us"), lit(0.5)).as("p50_us"),
        percentile(col("latency_us"), lit(0.75)).as("p75_us"))
      .select(col("n_signup"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_signup"))
          .as("conversion_rate"),
        col("p25_us"), col("p50_us"), col("p75_us"))
  }

  val q152Sql: String =
    """WITH signup AS (
      |  SELECT user_id, min(epoch_us(ts)) AS s0 FROM events
      |  WHERE event_type = 'signup' GROUP BY 1),
      |lat AS (
      |  SELECT e.user_id, min(epoch_us(e.ts)) - any_value(s.s0)
      |      AS latency_us
      |  FROM events e JOIN signup s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.s0
      |  GROUP BY e.user_id, s.s0),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_signup FROM signup)
      |SELECT n.n_signup, CAST(count(*) AS BIGINT) AS n_converted,
      |  CAST(count(*) AS DOUBLE) / n.n_signup AS conversion_rate,
      |  quantile_cont(latency_us, 0.25) AS p25_us,
      |  quantile_cont(latency_us, 0.50) AS p50_us,
      |  quantile_cont(latency_us, 0.75) AS p75_us
      |FROM lat, n
      |GROUP BY n.n_signup""".stripMargin

  /** q34 — CUBE grouping sets over order priority × status. */
  def q34Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))
      .orderBy(col("priority"), col("status"))

  val q34Sql: String =
    s"""SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       |  coalesce(o_orderstatus, 'ALL') AS status,
       |  count(*) AS n,
       |  ${Det.sqlSum("o_totalprice")} AS total
       |FROM orders
       |GROUP BY CUBE(o_orderpriority, o_orderstatus)
       |ORDER BY priority, status""".stripMargin

  /** q35 — the reference's name-based SQL interface (SURVEY.md §2.1 S2):
    * register the corpus as views, run a multi-join aggregation as pure
    * SQL text through spark.sql. */
  def q35SqlInterface(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""SELECT n_name,
         |  count(*) AS n_customers,
         |  ${Det.sqlSum("c_acctbal")} AS total_acctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name
         |ORDER BY n_name""".stripMargin)
  }

  val q35Sql: String =
    s"""SELECT n_name, count(*) AS n_customers,
       |  ${Det.sqlSum("c_acctbal")} AS total_acctbal
       |FROM customer JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  /** q45 — array/string function breadth over documents: slice,
    * array_join, reverse, sorted distinct tokens. Array outputs are
    * flattened to strings so the comparison stays engine-exact. */
  def q45ArrayFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(
        col("doc_id"),
        array_join(slice(col("w"), 1, 3), "-").as("first3"),
        // clamp like DuckDB's w[-2:]: Spark's slice(w, -2, 2) returns
        // EMPTY for a 1-token doc (negative start past the front) where
        // the oracle returns the lone token — latent only because the
        // fixture's min doc length is 10 tokens
        array_join(when(size(col("w")) >= 2, slice(col("w"), -2, 2))
          .otherwise(col("w")), "-").as("last2"),
        reverse(array_join(slice(col("w"), 1, 2), " ")).as("rev2"),
        array_join(array_sort(array_distinct(slice(col("w"), 1, 10))), ",")
          .as("sorted_distinct_10"),
        size(col("w")).cast("long").as("n"))
      .orderBy(col("doc_id"))

  val q45Sql: String =
    """SELECT doc_id,
      |  array_to_string(w[1:3], '-') AS first3,
      |  array_to_string(w[-2:], '-') AS last2,
      |  reverse(array_to_string(w[1:2], ' ')) AS rev2,
      |  array_to_string(list_sort(list_distinct(w[1:10])), ',')
      |    AS sorted_distinct_10,
      |  CAST(len(w) AS BIGINT) AS n
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** q50 — salted shuffle join, end to end: events (the big, potentially
    * key-skewed fact) joined to customer (the dim) on user_id through
    * [[graft.ops.Skew.saltedJoin]], then a per-segment aggregate. The salt
    * spreads any hot user_id across 8 sub-keys before the shuffle; the
    * join RESULT is provably identical to the unsalted join, which is
    * exactly what the plain-SQL oracle checks. At 100 TB this is the
    * manual remedy when a single key (not merely a partition) is hot and
    * AQE's skew split can't help — for PARTITION-level skew on a free
    * shuffle join, AQE's OptimizeSkewedJoin handles it with no salt at
    * all (PlanShapeSpec proves the split engages); reach for the salt
    * when the join's output distribution is pinned by a same-key
    * consumer or a single key dwarfs whole partitions. */
  def q50SaltedJoin(s: SparkSession, dir: String): DataFrame = {
    val events = Tables.events(s, dir)
      .select(col("user_id"), col("value"))
    val dim = Tables.customer(s, dir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    graft.ops.Skew.saltedJoin(events, dim, "user_id", salts = 8)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_events"),
        Det.dsum(col("value")).as("total_value"))
      .orderBy(col("c_mktsegment"))
  }

  val q50Sql: String =
    s"""SELECT c_mktsegment, count(*) AS n_events,
       |  ${Det.sqlSum("value")} AS total_value
       |FROM events JOIN customer ON user_id = c_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  /** q102 — correlated LATERAL subquery (SQL surface): for every region,
    * the two alphabetically-first nations with their customer counts —
    * the "top-N related rows per outer row" idiom users write directly
    * when the window spelling is less natural. Catalyst decorrelates the
    * lateral subquery into a join + per-key ranking (DecorrelateInnerQuery
    * → RewriteLateralSubquery), so the executed plan is the same shape as
    * the q06 window top-N — no per-outer-row re-execution survives into
    * the physical plan at any scale. */
  def q102LateralTopN(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT r.r_name, t.n_name, t.n_customers
        |FROM region r,
        |  LATERAL (
        |    SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
        |    FROM nation JOIN customer ON c_nationkey = n_nationkey
        |    WHERE n_regionkey = r.r_regionkey
        |    GROUP BY n_name
        |    ORDER BY n_name
        |    LIMIT 2) t
        |ORDER BY r.r_name, t.n_name""".stripMargin)
  }

  val q102Sql: String =
    """SELECT r.r_name, t.n_name, t.n_customers
      |FROM region r,
      |  LATERAL (
      |    SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers
      |    FROM nation JOIN customer ON c_nationkey = n_nationkey
      |    WHERE n_regionkey = r.r_regionkey
      |    GROUP BY n_name
      |    ORDER BY n_name
      |    LIMIT 2) t
      |ORDER BY r.r_name, t.n_name""".stripMargin

  /** Heavy hitters reported by the skew audit. */
  val SkewTopK = 20
  /** A key is flagged hot when its count exceeds this multiple of the
    * mean per-key count — compared by exact integer cross-multiplication
    * (cnt · n_keys > HotFactor · total), never a rounded average. */
  val SkewHotFactor = 4L

  /** q100 — shuffle-skew audit over the q50 join key: exact per-key
    * counts, the [[SkewTopK]] heaviest keys, and a hot flag at
    * [[SkewHotFactor]]× the mean — the diagnostic a pipeline runs BEFORE
    * picking q50's salt factor (or trusting AQE's skew split). A hot key
    * is invisible in partition-size metrics until the job stalls; this
    * makes it a queryable relation instead.
    *
    * Scale shape: the per-key count partial-aggregates map-side (the only
    * corpus-sized stage); the top-k runs on the AGGREGATED key relation
    * via sort+limit — Catalyst plans TakeOrderedAndProject, never a
    * global sort (the q02 plan lock pattern); the 1-row totals relation
    * broadcasts. */
  def q100SkewAudit(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      // multi-consumer rule: counts feeds the totals aggregate AND the
      // join — un-checkpointed, the events scan + per-user aggregate
      // (the only corpus-sized stage) planned and ran twice
      .localCheckpoint(eager = false)
    val totals = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    counts.join(broadcast(totals))
      .select(col("user_id"), col("cnt"),
        (col("cnt") * col("n_keys") > lit(SkewHotFactor) * col("total"))
          .as("hot"))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(SkewTopK)
  }

  val q100Sql: String =
    s"""WITH counts AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1),
       |totals AS (
       |  SELECT CAST(sum(cnt) AS BIGINT) AS total,
       |    CAST(count(*) AS BIGINT) AS n_keys
       |  FROM counts)
       |SELECT user_id, cnt, cnt * n_keys > $SkewHotFactor * total AS hot
       |FROM counts, totals
       |ORDER BY cnt DESC, user_id
       |LIMIT $SkewTopK""".stripMargin

  /** q65 — skyline of `part` under (minimize retail price, minimize
    * size): "the cheapest part at every size class one could not shrink
    * without paying more". Distributed two-phase Pareto pruning in
    * [[graft.ops.Skyline]] (partition-local sweep → broadcast dominance
    * anti-join over the tiny candidate set); the oracle runs the naive
    * O(N²) NOT-EXISTS spelling — same rows, quadratic plan. */
  def q65Skyline(s: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(s, dir)
    val keys = graft.ops.Skyline.skyline2dKeys(
      p, "p_partkey", "p_retailprice", "p_size")
    p.join(broadcast(keys), Seq("p_partkey"))
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .orderBy(col("p_partkey"))
  }

  val q65Sql: String =
    """SELECT p_partkey, p_retailprice, p_size FROM part a
      |WHERE NOT EXISTS (SELECT 1 FROM part b
      |  WHERE b.p_retailprice <= a.p_retailprice AND b.p_size <= a.p_size
      |    AND (b.p_retailprice < a.p_retailprice OR b.p_size < a.p_size))
      |ORDER BY p_partkey""".stripMargin

  /** q67 — incremental top-k (the EDBT 2020 interactive-session shape,
    * PAPERS.md): yesterday's materialized top-100 unioned with only the
    * NEW events, re-topped. Correct for insert-only deltas because a
    * global top-k is a semilattice: topK(all) = topK(topK(old) ∪ delta).
    * Both branches plan TakeOrderedAndProject (bounded, no global sort),
    * and at 100 TB the old branch is a 100-row cached artifact while the
    * scan touches ONLY the delta partition — the whole point of
    * incremental refresh. The oracle recomputes the from-scratch top-100;
    * hash equality IS the incremental-equivalence proof. The final
    * ranking window runs over exactly 100 rows (post-limit), so its
    * single-partition sort is bounded, not a scale hazard. */
  def q67IncrementalTopK(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-25 00:00:00").cast("timestamp")
    val ev = Tables.events(s, dir).select(col("event_id"), col("ts"), col("value"))
    val prevTop = ev.filter(col("ts") < cutoff)
      .select(col("event_id"), col("value"))
      .orderBy(col("value").desc, col("event_id")).limit(100)
    val delta = ev.filter(col("ts") >= cutoff)
      .select(col("event_id"), col("value"))
    val top = prevTop.union(delta)
      .orderBy(col("value").desc, col("event_id")).limit(100)
    top.withColumn("rnk", row_number().over(
        Window.orderBy(col("value").desc, col("event_id"))).cast("long"))
      .orderBy(col("rnk"))
  }

  val q67Sql: String =
    """SELECT event_id, value,
      |  CAST(row_number() OVER (ORDER BY value DESC, event_id) AS BIGINT)
      |    AS rnk
      |FROM events
      |ORDER BY value DESC, event_id
      |LIMIT 100""".stripMargin

  /** q72 — fixed-width histogram of event values per event type: the
    * bucketed-distribution idiom (floor(value / width) keys). One scan,
    * one partial-agg shuffle on (type, bucket); floor of an IEEE
    * division is bit-deterministic, so buckets agree cross-engine. The
    * declarative spelling is what lets a 100 TB histogram be one
    * map-side-combined aggregation instead of a collect-and-bin. */
  def q72Histogram(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        floor(col("value") / 10.0d).cast("long").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("bucket"))

  val q72Sql: String =
    """SELECT event_type,
      |  CAST(floor(value / 10.0) AS BIGINT) AS bucket,
      |  count(*) AS n
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** q73 — ordered conversion funnel view → click → purchase: per user,
    * the first view, the first click AFTER that view, the first purchase
    * AFTER that click; funnel counts per stage. Each stage is one
    * filtered aggregation on the user key joined to the previous
    * stage's (small) per-user min — never a window over the full event
    * stream, so at 100 TB each stage is a partial-agg shuffle of user
    * keys. Strictly-after comparisons run on epoch-microsecond longs
    * (`unix_micros` ≡ DuckDB `epoch_us`, the q31/q32 convention). */
  def q73Funnel(s: SparkSession, dir: String): DataFrame = {
    // ev feeds three stage filters, and each stage frame is consumed
    // twice (next stage's join + its own count) — materialize once per
    // relation (the multi-consumer localCheckpoint rule), or one run
    // scans the events table ~6 times
    val ev = Tables.events(s, dir).select(col("user_id"),
      col("event_type"), unix_micros(col("ts")).as("us"))
      .localCheckpoint(eager = false)
    def firstAfter(tpe: String, prev: DataFrame, prevCol: String,
        outCol: String): DataFrame =
      ev.filter(col("event_type") === tpe)
        .join(prev, Seq("user_id"))
        .filter(col("us") > col(prevCol))
        .groupBy(col("user_id")).agg(min(col("us")).as(outCol))
        .localCheckpoint(eager = false)
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
      .localCheckpoint(eager = false)
    val c = firstAfter("click", v, "t_view", "t_click")
    val p = firstAfter("purchase", c, "t_click", "t_buy")
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_view_click_purchase")))
  }

  val q73Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      |v AS (
      |  SELECT user_id, min(us) AS t_view FROM e
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(us) AS t_click FROM e
      |  JOIN v ON v.user_id = e.user_id
      |  WHERE event_type = 'click' AND us > t_view
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(us) AS t_buy FROM e
      |  JOIN c ON c.user_id = e.user_id
      |  WHERE event_type = 'purchase' AND us > t_click
      |  GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |  (SELECT count(*) FROM c) AS n_view_click,
      |  (SELECT count(*) FROM p) AS n_view_click_purchase""".stripMargin

  /** q74 — weekly retention cohorts: users grouped by their first active
    * epoch-week; for each (cohort, week offset), how many distinct users
    * were active. Two-phase distinct — dedupe (user, week) first, then
    * count — so no countDistinct Expand; both shuffles are on user/week
    * keys with map-side partial aggregation. All-integer epoch-week
    * arithmetic (`div` ≡ DuckDB `//`) keeps the cohort assignment
    * bit-deterministic. */
  def q74Retention(s: SparkSession, dir: String): DataFrame = {
    val weekUs = 604800000000L // 7 * 86400 * 1e6
    // uw feeds both the first-week aggregate and the join side
    val uw = Tables.events(s, dir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) div $weekUs").as("week"))
      .distinct()
      .localCheckpoint(eager = false)
    val first = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    uw.join(first, Seq("user_id"))
      .groupBy(col("cohort"), (col("week") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  val q74Sql: String =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      |  FROM events),
      |f AS (SELECT user_id, min(week) AS cohort FROM uw GROUP BY user_id)
      |SELECT cohort, week - cohort AS week_offset, count(*) AS n_users
      |FROM uw JOIN f USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** q75 — z-score outlier counts per event type: the two-pass anomaly
    * scan (aggregate stats, re-scan and flag |value − mean| > 3σ). The
    * stats relation is tiny (one row per type) and broadcasts; both
    * passes are partial-agg shuffles on the type key. Determinism at the
    * 3σ boundary: mean and σ come from [[Det]]'s exact decimal sums, so
    * both engines compare against bit-identical doubles — a raw
    * stddev_samp would flip flags in ULP-distance cases. */
  def q75Anomaly(s: SparkSession, dir: String): DataFrame = {
    // ev feeds the stats aggregate and the flagging pass
    val ev = Tables.events(s, dir).select(col("event_type"), col("value"))
      .localCheckpoint(eager = false)
    val stats = ev.groupBy(col("event_type"))
      .agg(Det.davg(col("value")).as("mean"),
        Det.dstddev(col("value")).as("sd"))
    ev.join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(col("mean")).as("mean_value"),
        sum(when(abs(col("value") - col("mean")) > col("sd") * 3, 1L)
          .otherwise(0L)).as("n_anomalies"))
      .orderBy(col("event_type"))
  }

  val q75Sql: String =
    s"""WITH s AS (
       |  SELECT event_type, ${Det.sqlAvg("value")} AS mean,
       |    ${Det.sqlStddev("value")} AS sd
       |  FROM events GROUP BY event_type)
       |SELECT e.event_type, count(*) AS n,
       |  max(mean) AS mean_value,
       |  CAST(sum(CASE WHEN abs(value - mean) > 3 * sd THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_anomalies
       |FROM events e JOIN s USING (event_type)
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** q81 — GROUPING SETS with explicit grouping flags: the third member
    * of the grouping family next to q10's ROLLUP and q34's CUBE, but with
    * a hand-picked set list — (flag, status), (flag), () — the shape a
    * reporting layer uses when the full cube is wasteful.
    *
    * These three sets form a CHAIN ((rf,ls) ⊃ (rf) ⊃ ()), and count/sum
    * re-aggregate, so the native `groupingSets` plan — an Expand that
    * replicates EVERY input row once per set (3× the corpus through the
    * partial aggregate) — is the wrong shape at 100 TB. Instead: one
    * ordinary partial-agg pass to the FINEST grouping (map-side combine
    * compacts to ≲|rf×ls| rows per task before any shuffle), then the
    * coarser sets re-aggregate the few-row finest RESULT. Input rows
    * cross the aggregate exactly once; the Expand multiplier is gone.
    * Sums stay exact decimals through both levels and cast to double
    * ONCE at emission (Det discipline), so values are bit-identical to
    * the one-level plan. q10/q34 keep the native ROLLUP/CUBE operators —
    * this rewrite applies only when the requested sets nest.
    * Per-grouping flags are emitted as separate `grouping(col)`-style
    * ints (engine-portable; grouping_id bit orders are not guaranteed
    * to agree across engines). */
  /** q81's finest-grouping aggregate BEFORE the checkpoint barrier —
    * separate so PlanShapeSpec can lock the real scan+agg shape (the
    * barrier hides everything upstream from the outer query's plan). */
  private[graft] def q81Base(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).as("qd"))

  def q81GroupingSets(s: SparkSession, dir: String): DataFrame = {
    // finest grouping once; feeds all three levels (multi-consumer rule)
    val base = q81Base(s, dir).localCheckpoint(eager = false)
    val nullS = lit(null).cast("string")
    val lvl0 = base.select(col("l_returnflag"), col("l_linestatus"),
      lit(0L).as("g_rf"), lit(0L).as("g_ls"), col("n"), col("qd"))
    // coalesce(sum(n), 0): lvl2 is a GLOBAL aggregate, so an empty base
    // still emits one row — its sum(n) is NULL where GROUPING SETS' ()
    // set yields count(*) = 0. qd stays NULL (sum over empty IS NULL in
    // both spellings). lvl1's groups can't have NULL n (a group exists
    // only with rows, each carrying n >= 1) — coalesced anyway so the
    // two levels state the same contract.
    val lvl1 = base.groupBy(col("l_returnflag"))
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        sum(col("qd")).as("qd"))
      .select(col("l_returnflag"), nullS.as("l_linestatus"),
        lit(0L).as("g_rf"), lit(1L).as("g_ls"), col("n"), col("qd"))
    val lvl2 = base
      .agg(coalesce(sum(col("n")), lit(0L)).as("n"),
        sum(col("qd")).as("qd"))
      .select(nullS.as("l_returnflag"), nullS.as("l_linestatus"),
        lit(1L).as("g_rf"), lit(1L).as("g_ls"), col("n"), col("qd"))
    lvl0.unionByName(lvl1).unionByName(lvl2)
      .select(col("l_returnflag"), col("l_linestatus"), col("g_rf"),
        col("g_ls"), col("n"), col("qd").cast("double").as("sum_qty"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"),
        col("l_linestatus"))
  }

  val q81Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
       |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
       |  count(*) AS n,
       |  ${Det.sqlSum("l_quantity")} AS sum_qty
       |FROM lineitem
       |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
       |  (l_returnflag), ())
       |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  /** q82 — per-group linear regression + correlation of extendedprice on
    * quantity, Det-exact: the five sufficient statistics (n, Σx, Σy, Σxy,
    * Σx², Σy²) aggregate as EXACT decimals (associative/commutative →
    * partitioning-independent), then slope/intercept/corr are one fixed
    * IEEE expression tree over the final scalars — the same order in the
    * generated SQL, so even sqrt() is applied to bit-identical inputs.
    * Spark's builtin regr_slope/corr sum doubles and would differ in ULPs
    * per partitioning (the Det rationale). One partial-agg shuffle on the
    * (flag, year) key; nothing driver-side. The per-group sums (Σy² is
    * ~3e18 at sf0.1) EXCEED double's 2^53 mantissa — exactness ends at the
    * decimal sums; cross-engine agreement past that rests on both engines
    * applying the same correctly-rounded scale-0 decimal→double cast to
    * the same exact integer (see the inline integer-units rationale). */
  def q82Regression(s: SparkSession, dir: String): DataFrame = {
    // INTEGER units (quantity counts, price cents): every sufficient
    // statistic is an exact scale-0 decimal, so the decimal→double cast
    // is ONE correctly-rounded integer conversion in both engines. A
    // scaled decimal (e.g. sum of (18,2)² products) exceeds 2^53 UNITS at
    // bench SF, and DuckDB's two-step scaled cast (int→double, then
    // /10^scale) then differs from Spark's correctly-rounded BigDecimal
    // conversion by an ULP — which the `n·Σy²−(Σy)²` cancellation
    // amplifies ~10 ULPs into corr. Integer units have no divide step to
    // disagree on. The cents scaling cancels in corr; slope/intercept
    // convert back via one exact /100 at the end.
    // DECIMAL(18,0), not (38,0): both engines type a product at w1+w2
    // digits, and DuckDB hard-errors past 38 — 18+18=36 leaves room,
    // while the actual values (quantity ≤ 50, cents ≤ 10^7) fit easily.
    val D0 = DecimalType(18, 0)
    val x = col("l_quantity").cast("long").cast(D0)
    val y = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
      .cast("long").cast(D0)
    val n = count(lit(1)).cast("double")
    val sx = sum(x).cast("double"); val sy = sum(y).cast("double")
    val sxy = sum(x * y).cast("double")
    val sxx = sum(x * x).cast("double")
    val syy = sum(y * y).cast("double")
    val num = n * sxy - sx * sy
    val denx = n * sxx - sx * sx
    val deny = n * syy - sy * sy
    // Degenerate-group guard: constant x (or y) makes denx (deny) exactly
    // 0.0 — both engines compute it with the same IEEE ops on the same
    // exact inputs, so the zero test agrees. Unguarded, Spark emits
    // NaN/±Inf while DuckDB's double 0/0 handling is version-dependent;
    // NULL is the portable answer (mirrored with NULLIF in the oracle).
    val nullD = lit(null).cast("double")
    val slope = when(denx === 0.0, nullD).otherwise((num / denx) / 100.0)
    val intercept = when(denx === 0.0, nullD)
      .otherwise(((sy - (num / denx) * sx) / n) / 100.0)
    val corrE = when(denx === 0.0 || deny === 0.0, nullD)
      .otherwise(num / (sqrt(denx) * sqrt(deny)))
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), year(col("l_shipdate")).as("yr"))
      .agg(count(lit(1)).as("n"),
        slope.as("slope"),
        intercept.as("intercept"),
        corrE.as("corr"))
      .orderBy(col("l_returnflag"), col("yr"))
  }

  val q82Sql: String = {
    val x = "CAST(CAST(l_quantity AS BIGINT) AS DECIMAL(18,0))"
    val y = "CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS DECIMAL(18,0))"
    val n = "CAST(count(*) AS DOUBLE)"
    val sx = s"CAST(sum($x) AS DOUBLE)"
    val sy = s"CAST(sum($y) AS DOUBLE)"
    val sxy = s"CAST(sum($x * $y) AS DOUBLE)"
    val sxx = s"CAST(sum($x * $x) AS DOUBLE)"
    val syy = s"CAST(sum($y * $y) AS DOUBLE)"
    val num = s"($n * $sxy - $sx * $sy)"
    val denx = s"($n * $sxx - $sx * $sx)"
    val deny = s"($n * $syy - $sy * $sy)"
    s"""SELECT l_returnflag, year(l_shipdate) AS yr,
       |  count(*) AS n,
       |  ($num / NULLIF($denx, 0)) / 100.0 AS slope,
       |  (($sy - ($num / NULLIF($denx, 0)) * $sx) / $n) / 100.0 AS intercept,
       |  $num / (sqrt(NULLIF($denx, 0)) * sqrt(NULLIF($deny, 0))) AS corr
       |FROM lineitem
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin
  }

  /** q83 — time-RANGE window frames over the event stream: per event, how
    * many events the same user produced in the preceding hour (value-based
    * frame — peers at the boundary included, per the SQL standard) and in
    * the following 5 minutes. RANGE frames complete the frame surface next
    * to q28's ROWS frames. Ordering is the epoch-MICROSECOND long (the
    * nanosAsLong read path truncated by `div 1000` — µs is the precision
    * DuckDB actually keeps when it reads parquet TIMESTAMP(NANOS), so µs
    * is what both engines share), and the frame bounds are exact integer
    * comparisons. Scale: one shuffle on user_id,
    * per-partition sorted frame scan — the standard windowed-stream shape;
    * counts and long sums only (order-free), no float accumulation. */
  def q83RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000 * 1000
    val fiveMinUs = 300L * 1000 * 1000
    val wPrev = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-hourUs, 0)
    val wNext = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(0, fiveMinUs)
    // Canonical events read path (Tables.events owns the ns→µs truncation);
    // unix_micros recovers the epoch-µs long the frame bounds need.
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("n_prev_1h", count(lit(1)).over(wPrev))
      .withColumn("n_next_5m", count(lit(1)).over(wNext))
      .orderBy(col("event_id"))
  }

  val q83Sql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |    AS n_prev_1h,
      |  count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN CURRENT ROW AND 300000000 FOLLOWING)
      |    AS n_next_5m
      |FROM events
      |ORDER BY event_id""".stripMargin

  // ---- q171: A/B experiment readout ---------------------------------------

  /** q171 — A/B experiment readout: users hash-split into two arms by
    * the library's content-keyed md5 bucket (the REAL assignment
    * mechanism — stable across sessions, retries, and replans, so a
    * user can never flip arms mid-experiment), per-user metric = total
    * purchase cents, and the Welch z-statistic comparing arm means.
    * Sufficient statistics (n, Σx, Σx²) are EXACT BIGINTs per arm; the
    * means/variances/z are a fixed parenthesized chain of IEEE ops both
    * engines evaluate identically from identical integers — the q82
    * regression discipline applied to experimentation. This is the
    * product-analytics counterpart of the curation audits: the readout
    * every experimentation platform computes per metric per day.
    *
    * Scale shape: one scan → per-user partial-aggregable rollup (the
    * only exchange, keyed by user) → a 1-row conditional aggregate.
    * At truly web-scale per-user cent totals the Σx² widens to
    * decimal(38,0) (q134's gate discipline); int64 headroom here is
    * ~10⁹ users at ~10⁶ cents each. */
  def q171AbTest(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
      .select(col("x"),
        when(graft.ext.Text.md5Bucket(col("user_id"), 1000L) < 500, "A")
          .otherwise("B").as("arm"))
    def armAgg(a: String, f: Column) =
      sum(when(col("arm") === a, f).otherwise(0L))
    val agg = perUser.agg(
      armAgg("A", lit(1L)).as("n_a"), armAgg("A", col("x")).as("s_a"),
      armAgg("A", col("x") * col("x")).as("ss_a"),
      armAgg("B", lit(1L)).as("n_b"), armAgg("B", col("x")).as("s_b"),
      armAgg("B", col("x") * col("x")).as("ss_b"))
    // NULLIF-guarded denominators (the q82 portability rule): an arm
    // with 0 or 1 users would otherwise emit x/0 or 0/0, whose double
    // handling is engine-version-dependent — both spellings emit NULL
    def mean(sc: Column, n: Column) =
      sc.cast("double") / nullif(n.cast("double"), lit(0.0))
    def variance(sc: Column, ss: Column, n: Column) =
      (ss.cast("double") - sc.cast("double") * sc.cast("double")
        / nullif(n.cast("double"), lit(0.0))) /
        nullif((n - 1).cast("double"), lit(0.0))
    agg.select(col("n_a"), col("s_a"), col("n_b"), col("s_b"),
      mean(col("s_a"), col("n_a")).as("mean_a"),
      mean(col("s_b"), col("n_b")).as("mean_b"),
      ((mean(col("s_a"), col("n_a")) - mean(col("s_b"), col("n_b"))) /
        sqrt(variance(col("s_a"), col("ss_a"), col("n_a"))
            / col("n_a").cast("double")
          + variance(col("s_b"), col("ss_b"), col("n_b"))
            / col("n_b").cast("double"))).as("z"))
  }

  /** DuckDB spelling: identical assignment hash, identical integer
    * sufficient statistics, identically parenthesized float chain. */
  val q171Sql: String =
    """WITH pu AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS x
      |  FROM events GROUP BY user_id),
      |armed AS (
      |  SELECT x, CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
      |    1, 8))::BIGINT % 1000 < 500 THEN 'A' ELSE 'B' END AS arm
      |  FROM pu),
      |agg AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 'A' THEN x ELSE 0 END) AS BIGINT) AS s_a,
      |    CAST(SUM(CASE WHEN arm = 'A' THEN x * x ELSE 0 END) AS BIGINT)
      |      AS ss_a,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN x ELSE 0 END) AS BIGINT) AS s_b,
      |    CAST(SUM(CASE WHEN arm = 'B' THEN x * x ELSE 0 END) AS BIGINT)
      |      AS ss_b
      |  FROM armed)
      |SELECT n_a, s_a, n_b, s_b,
      |  CAST(s_a AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0) AS mean_a,
      |  CAST(s_b AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0) AS mean_b,
      |  ((CAST(s_a AS DOUBLE) / NULLIF(CAST(n_a AS DOUBLE), 0))
      |    - (CAST(s_b AS DOUBLE) / NULLIF(CAST(n_b AS DOUBLE), 0))) /
      |  sqrt(((CAST(ss_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
      |      / NULLIF(CAST(n_a AS DOUBLE), 0))
      |        / NULLIF(CAST(n_a - 1 AS DOUBLE), 0))
      |      / NULLIF(CAST(n_a AS DOUBLE), 0)
      |    + ((CAST(ss_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
      |      / NULLIF(CAST(n_b AS DOUBLE), 0))
      |        / NULLIF(CAST(n_b - 1 AS DOUBLE), 0))
      |      / NULLIF(CAST(n_b AS DOUBLE), 0)) AS z
      |FROM agg""".stripMargin

  // ---- q172: CUPED variance-reduction readout -----------------------------

  /** q172 — CUPED coefficient fitting (Deng et al.: Controlled
    * experiments Using Pre-Experiment Data): split the event timeline
    * at its midpoint, roll up per-user purchase cents in the pre and
    * post periods, and fit θ = cov(pre, post)/var(pre) plus the
    * variance-reduction factor ρ² that adjusting the experiment metric
    * by θ·(pre − mean) would buy. This is the step every mature
    * experimentation platform runs before q171's readout — the same
    * experiment detects an effect ~1/(1−ρ²)× faster on the adjusted
    * metric. All sufficient statistics (n, Σpre, Σpost, Σpre²,
    * Σpre·post, Σpost²) are exact BIGINTs; θ and ρ² are identically
    * parenthesized IEEE chains both engines evaluate bit-equally (the
    * q171/q82 discipline). Timeline midpoint is exact integer
    * microseconds from a 1-row broadcast bounds aggregate.
    *
    * Scale shape: one scan → per-user partial-aggregable rollup (the
    * only real exchange) → a 1-row moment aggregate. Σ(pre·post)
    * headroom mirrors q171's note — decimal(38,0) past ~10⁶ cents ×
    * 10⁹ users. */
  def q172Cuped(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"),
      floor(col("value") * 100).cast("long").as("cents"))
      .localCheckpoint(eager = false) // feeds bounds AND the rollup
    val bounds = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    def half(cmp: Column => Column) =
      sum(when(col("event_type") === "purchase" &&
        cmp(expr("(mn + mx) div 2")), col("cents")).otherwise(0L))
    val perUser = ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(half(col("us") < _).as("pre"), half(col("us") >= _).as("post"))
    val agg = perUser.agg(count(lit(1)).as("n"),
      sum(col("pre")).as("s1"), sum(col("post")).as("s2"),
      sum(col("pre") * col("pre")).as("s11"),
      sum(col("pre") * col("post")).as("s12"),
      sum(col("post") * col("post")).as("s22"))
    def c(x: Column) = x.cast("double")
    // NULLIF-guarded like q171: 0 or 1 users, or a zero pre-period
    // variance, would emit engine-version-dependent 0/0 — NULL instead
    val n = nullif(col("n").cast("double"), lit(0.0))
    val nm1 = nullif((col("n") - 1).cast("double"), lit(0.0))
    val cov = (c(col("s12")) - c(col("s1")) * c(col("s2")) / n) / nm1
    val varp = (c(col("s11")) - c(col("s1")) * c(col("s1")) / n) / nm1
    val varq = (c(col("s22")) - c(col("s2")) * c(col("s2")) / n) / nm1
    agg.select(col("n"), col("s1"), col("s2"), col("s11"), col("s12"),
      col("s22"), (cov / nullif(varp, lit(0.0))).as("theta"),
      ((cov * cov) / nullif(varp * varq, lit(0.0))).as("rho2"))
  }

  /** DuckDB spelling: identical midpoint, moments, and float chains. */
  val q172Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us,
      |    CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev),
      |pu AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |      AND us < (mn + mx) // 2 THEN cents ELSE 0 END) AS BIGINT) AS pre,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |      AND us >= (mn + mx) // 2 THEN cents ELSE 0 END) AS BIGINT) AS post
      |  FROM ev CROSS JOIN b GROUP BY user_id),
      |a AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pre) AS BIGINT) AS s1, CAST(SUM(post) AS BIGINT) AS s2,
      |    CAST(SUM(pre * pre) AS BIGINT) AS s11,
      |    CAST(SUM(pre * post) AS BIGINT) AS s12,
      |    CAST(SUM(post * post) AS BIGINT) AS s22
      |  FROM pu)
      |SELECT n, s1, s2, s11, s12, s22,
      |  ((CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
      |      / NULLIF(CAST(n AS DOUBLE), 0))
      |        / NULLIF(CAST(n - 1 AS DOUBLE), 0))
      |    / NULLIF((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)
      |        * CAST(s1 AS DOUBLE) / NULLIF(CAST(n AS DOUBLE), 0))
      |        / NULLIF(CAST(n - 1 AS DOUBLE), 0), 0) AS theta,
      |  (((CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
      |      / NULLIF(CAST(n AS DOUBLE), 0))
      |        / NULLIF(CAST(n - 1 AS DOUBLE), 0))
      |    * ((CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
      |      / NULLIF(CAST(n AS DOUBLE), 0))
      |        / NULLIF(CAST(n - 1 AS DOUBLE), 0)))
      |    / NULLIF(((CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)
      |        * CAST(s1 AS DOUBLE) / NULLIF(CAST(n AS DOUBLE), 0))
      |        / NULLIF(CAST(n - 1 AS DOUBLE), 0))
      |      * ((CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)
      |        * CAST(s2 AS DOUBLE) / NULLIF(CAST(n AS DOUBLE), 0))
      |        / NULLIF(CAST(n - 1 AS DOUBLE), 0)), 0) AS rho2
      |FROM a""".stripMargin

  // ---- q175: leakage-free training-label construction ---------------------

  /** q175 — supervised-dataset construction with temporal correctness:
    * the observation point is the exact integer-microsecond timeline
    * midpoint (q172's split); per user, FEATURES aggregate strictly
    *-before events (event count, purchase count, purchase cents,
    * distinct active days, recency in µs) and the LABEL is "purchased
    * within the next (mx−mn)/16 µs horizon" — a short horizon keeps
    * both classes alive, and no feature can see the label window (the q149
    * point-in-time discipline applied to ML labels; training on
    * features that leak future information is the classic silent
    * model-quality bug this relation makes structurally impossible).
    * Only users OBSERVED before the midpoint get a row: an entity with
    * no feature history is not a training example.
    *
    * All columns are exact integers — counts, cents, epoch-µs
    * differences, a 0/1 label — so the hash compare is ULP-proof.
    * Scale shape: one scan, one user-keyed partial-aggregable rollup
    * (conditional aggregates split pre/post in the same pass; the
    * distinct-days count is the one two-phase distinct, q36's rule). */
  def q175TrainLabels(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"),
      floor(col("value") * 100).cast("long").as("cents"),
      to_date(col("ts")).as("d"))
      .localCheckpoint(eager = false) // bounds + rollup
    val bounds = ev.agg(min(col("us")).as("mn"), max(col("us")).as("mx"))
    val mid = expr("(mn + mx) div 2")
    ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("us") < mid, 1L).otherwise(0L)).as("n_events_pre"),
        sum(when(col("us") < mid && col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("n_purchases_pre"),
        sum(when(col("us") < mid && col("event_type") === "purchase",
          col("cents")).otherwise(0L)).as("cents_pre"),
        countDistinct(when(col("us") < mid, col("d"))).as("days_active_pre"),
        max(when(col("us") < mid, col("us"))).as("last_pre_us"),
        max(col("mn")).as("mn"), max(col("mx")).as("mx"),
        max(when(col("us") >= mid &&
            col("us") < expr("(mn + mx) div 2 + (mx - mn) div 16") &&
            col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("label"))
      .filter(col("n_events_pre") > 0) // unobserved users are not examples
      .select(col("user_id"), col("n_events_pre"), col("n_purchases_pre"),
        col("cents_pre"), col("days_active_pre"),
        (expr("(mn + mx) div 2") - col("last_pre_us")).as("recency_us"),
        col("label"))
      .orderBy(col("user_id"))
  }

  /** DuckDB spelling: identical midpoint, conditional rollups, recency. */
  val q175Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us,
      |    CAST(floor(value * 100) AS BIGINT) AS cents, CAST(ts AS DATE) AS d
      |  FROM events),
      |b AS (SELECT MIN(us) AS mn, MAX(us) AS mx FROM ev)
      |SELECT user_id,
      |  CAST(SUM(CASE WHEN us < (mn + mx) // 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_events_pre,
      |  CAST(SUM(CASE WHEN us < (mn + mx) // 2 AND event_type = 'purchase'
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases_pre,
      |  CAST(SUM(CASE WHEN us < (mn + mx) // 2 AND event_type = 'purchase'
      |    THEN cents ELSE 0 END) AS BIGINT) AS cents_pre,
      |  CAST(COUNT(DISTINCT CASE WHEN us < (mn + mx) // 2 THEN d END)
      |    AS BIGINT) AS days_active_pre,
      |  CAST((mn + mx) // 2
      |    - MAX(CASE WHEN us < (mn + mx) // 2 THEN us END) AS BIGINT)
      |    AS recency_us,
      |  CAST(MAX(CASE WHEN us >= (mn + mx) // 2
      |      AND us < (mn + mx) // 2 + (mx - mn) // 16
      |      AND event_type = 'purchase'
      |    THEN 1 ELSE 0 END) AS BIGINT) AS label
      |FROM ev CROSS JOIN b
      |GROUP BY user_id, (mn + mx) // 2
      |HAVING SUM(CASE WHEN us < (mn + mx) // 2 THEN 1 ELSE 0 END) > 0
      |ORDER BY user_id""".stripMargin

  // ---- q177: sample-ratio-mismatch guardrail ------------------------------

  /** q177 — daily sample-ratio-mismatch (SRM) check for the q171
    * experiment: per day, the count of distinct ACTIVE users in each
    * hash arm and the one-degree-of-freedom chi-square against the
    * designed 50/50 split, χ² = (nA − nB)²/(nA + nB) — the first
    * guardrail every experimentation platform evaluates before reading
    * a metric, because a skewed arm ratio means the assignment or
    * logging is broken and every downstream readout is invalid. The
    * statistic is a ratio of exact BIGINTs with ONE terminal IEEE
    * division per row; day-level granularity localizes WHEN the
    * imbalance started (q146's change-point discipline applied to
    * experiment health).
    *
    * Scale shape: one scan → per-(day, user) distinct (two-phase,
    * q36's rule) → per-day conditional counts; the exchange carries
    * (day, user) pairs, bounded by daily active users. */
  def q177SrmCheck(s: SparkSession, dir: String): DataFrame = {
    val active = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
    active
      .select(col("d"),
        when(graft.ext.Text.md5Bucket(col("user_id"), 1000L) < 500, 1L)
          .otherwise(0L).as("a"))
      .groupBy(col("d"))
      .agg(sum(col("a")).as("n_a"), sum(lit(1L) - col("a")).as("n_b"))
      .select(col("d"), col("n_a"), col("n_b"),
        (((col("n_a") - col("n_b")) * (col("n_a") - col("n_b")))
          .cast("double") / (col("n_a") + col("n_b")).cast("double"))
          .as("chi2"))
      .orderBy(col("d"))
  }

  /** DuckDB spelling: same assignment hash, same distinct, same χ². */
  val q177Sql: String =
    """WITH act AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
      |armed AS (
      |  SELECT d, CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)),
      |    1, 8))::BIGINT % 1000 < 500 THEN 1 ELSE 0 END AS a
      |  FROM act),
      |g AS (
      |  SELECT d, CAST(SUM(a) AS BIGINT) AS n_a,
      |    CAST(SUM(1 - a) AS BIGINT) AS n_b
      |  FROM armed GROUP BY d)
      |SELECT d, n_a, n_b,
      |  CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE)
      |    / CAST(n_a + n_b AS DOUBLE) AS chi2
      |FROM g ORDER BY d""".stripMargin

  // ---- q179: deterministic Poisson-bootstrap CI ---------------------------

  /** Poisson(1) pmf as cumulative per-mille-of-10000 thresholds:
    * P(0)=P(1)=.3679, P(2)=.1839, P(3)=.0613, P(4)=.0153, tail→5. */
  private val PoissonCum = Seq(3679L, 7358L, 9197L, 9810L, 9963L)
  private val BootstrapReps = 32

  /** q179 — Poisson-bootstrap distribution of the mean per-user
    * purchase-cents metric (q171's metric): the classical bootstrap
    * resamples users WITH replacement, which cannot be coordinated
    * across executors; the Poisson bootstrap (Chamandy et al.) replaces
    * the multinomial with an independent per-(user, replicate) count ~
    * Poisson(1) — and here that count is derived DETERMINISTICALLY from
    * an md5 bucket of (user_id, rep), so every replicate is
    * reproducible across engines, runs, and partitionings (the q53
    * content-keyed-sampling discipline applied to resampling). Output:
    * per replicate, the effective user count, the exact BIGINT weighted
    * cents total, the replicate mean (ONE IEEE division), and its rank
    * among the [[BootstrapReps]] means — ranks 2 and 31 of 32 are the
    * empirical ~5%/95% CI endpoints, pure SELECTION of already-computed
    * doubles, no interpolation arithmetic to diverge cross-engine.
    *
    * Scale shape: the user metric aggregates FIRST (the user-keyed
    * exchange any per-user metric already pays), THEN explodes ×32 on
    * the users-sized relation — never ×32 on raw events; the replicate
    * rollup partial-aggs map-side into 32 groups, and the rank window
    * sorts 32 rows. */
  def q179BootstrapCi(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        floor(col("value") * 100).cast("long")).otherwise(0L)).as("x"))
    val weighted = perUser
      .select(col("user_id"), col("x"),
        explode(sequence(lit(0), lit(BootstrapReps - 1))).as("rep"))
      .withColumn("b", graft.ext.Text.md5Bucket(
        concat(col("user_id").cast("string"), lit(":"),
          col("rep").cast("string")), 10000L))
      .withColumn("w",
        when(col("b") < PoissonCum(0), 0L)
          .when(col("b") < PoissonCum(1), 1L)
          .when(col("b") < PoissonCum(2), 2L)
          .when(col("b") < PoissonCum(3), 3L)
          .when(col("b") < PoissonCum(4), 4L)
          .otherwise(5L))
    val reps = weighted.groupBy(col("rep"))
      .agg(sum(col("w")).as("n_eff"),
        sum(col("w") * col("x")).as("tot"))
      .select(col("rep").cast("long").as("rep"), col("n_eff"), col("tot"),
        (col("tot").cast("double") / col("n_eff").cast("double"))
          .as("mean_cents"))
    reps.withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("mean_cents"), col("rep"))).cast("long"))
      .orderBy(col("rep"))
  }

  /** DuckDB spelling: same per-user metric, same md5(user:rep) weight
    * table, same single division and rank. */
  val q179Sql: String =
    s"""WITH pu AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |      THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS x
      |  FROM events GROUP BY user_id),
      |w AS (
      |  SELECT rep, x,
      |    CASE WHEN b < ${PoissonCum(0)} THEN 0
      |         WHEN b < ${PoissonCum(1)} THEN 1
      |         WHEN b < ${PoissonCum(2)} THEN 2
      |         WHEN b < ${PoissonCum(3)} THEN 3
      |         WHEN b < ${PoissonCum(4)} THEN 4
      |         ELSE 5 END AS w
      |  FROM (
      |    SELECT pu.user_id, pu.x, r.rep,
      |      ('0x' || substr(md5(CAST(pu.user_id AS VARCHAR) || ':' ||
      |        CAST(r.rep AS VARCHAR)), 1, 8))::BIGINT % 10000 AS b
      |    FROM pu CROSS JOIN
      |      (SELECT unnest(range(0, $BootstrapReps)) AS rep) r)),
      |reps AS (
      |  SELECT CAST(rep AS BIGINT) AS rep,
      |    CAST(SUM(w) AS BIGINT) AS n_eff,
      |    CAST(SUM(w * x) AS BIGINT) AS tot,
      |    CAST(SUM(w * x) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)
      |      AS mean_cents
      |  FROM w GROUP BY rep)
      |SELECT rep, n_eff, tot, mean_cents,
      |  CAST(row_number() OVER (ORDER BY mean_cents, rep) AS BIGINT) AS rk
      |FROM reps ORDER BY rep""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q179_bootstrap_ci" -> (q179BootstrapCi _),
    "q177_srm_check" -> (q177SrmCheck _),
    "q175_train_labels" -> (q175TrainLabels _),
    "q172_cuped" -> (q172Cuped _),
    "q171_ab_test" -> (q171AbTest _),
    "q81_grouping_sets" -> (q81GroupingSets _),
    "q82_regression"    -> (q82Regression _),
    "q83_range_frame"   -> (q83RangeFrame _),
    "q100_skew_audit"   -> (q100SkewAudit _),
    "q102_lateral_topn" -> (q102LateralTopN _),
    "q105_variant"      -> (q105Variant _),
    "q106_winsorize"    -> (q106Winsorize _),
    "q110_itemset_pairs" -> (q110ItemsetPairs _),
    "q111_transitions"  -> (q111Transitions _),
    "q131_scd2"         -> (q131Scd2 _),
    "q133_cdc_merge"    -> (q133CdcMerge _),
    "q138_gap_fill"     -> (q138GapFill _),
    "q143_seq_pattern"  -> (q143SeqPattern _),
    "q144_attribution"  -> (q144Attribution _),
    "q146_change_point" -> (q146ChangePoint _),
    "q147_twap"         -> (q147Twap _),
    "q148_analyze_stats" -> (q148AnalyzeStats _),
    "q199_cardinality_audit" -> (q199CardinalityAudit _),
    "q200_group_trend" -> (q200GroupTrend _),
    "q204_basket_lift" -> (q204BasketLift _),
    "q206_ewma_monitor" -> (q206EwmaMonitor _),
    "q207_watermark_audit" -> (q207WatermarkAudit _),
    "q208_encoding_advisor" -> (q208EncodingAdvisor _),
    "q210_ks_drift" -> (q210KsDrift _),
    "q213_chi2_independence" -> (q213Chi2Independence _),
    "q149_pit_join"     -> (q149PitJoin _),
    "q150_unpivot"      -> (q150Unpivot _),
    "q151_item_similarity" -> (q151ItemSimilarity _),
    "q152_conversion_latency" -> (q152ConversionLatency _),
    "q75_anomaly"       -> (q75Anomaly _),
    "q73_funnel"        -> (q73Funnel _),
    "q74_retention"     -> (q74Retention _),
    "q72_histogram"     -> (q72Histogram _),
    "q67_incremental_topk" -> (q67IncrementalTopK _),
    "q65_skyline"       -> (q65Skyline _),
    "q50_salted_join"   -> (q50SaltedJoin _),
    "q45_array_funcs"   -> (q45ArrayFuncs _),
    "q27_quantiles"     -> (q27Quantiles _),
    "q28_window_suite"  -> (q28WindowSuite _),
    "q29_bag_setops"    -> (q29BagSetOps _),
    "q30_pivot"         -> (q30Pivot _),
    "q31_asof_join"     -> (q31AsofJoin _),
    "q32_range_join"    -> (q32RangeJoin _),
    "q33_json"          -> (q33Json _),
    "q34_cube"          -> (q34Cube _),
    "q35_sql_interface" -> (q35SqlInterface _))

  val oracles: Map[String, String] = Map(
    "q179_bootstrap_ci" -> q179Sql,
    "q177_srm_check" -> q177Sql,
    "q175_train_labels" -> q175Sql,
    "q172_cuped" -> q172Sql,
    "q171_ab_test" -> q171Sql,
    "q100_skew_audit"   -> q100Sql,
    "q102_lateral_topn" -> q102Sql,
    "q105_variant"      -> q105Sql,
    "q106_winsorize"    -> q106Sql,
    "q110_itemset_pairs" -> q110Sql,
    "q111_transitions"  -> q111Sql,
    "q131_scd2"         -> q131Sql,
    "q133_cdc_merge"    -> q133Sql,
    "q138_gap_fill"     -> q138Sql,
    "q143_seq_pattern"  -> q143Sql,
    "q144_attribution"  -> q144Sql,
    "q146_change_point" -> q146Sql,
    "q147_twap"         -> q147Sql,
    "q148_analyze_stats" -> q148Sql,
    "q199_cardinality_audit" -> q199Sql,
    "q200_group_trend" -> q200Sql,
    "q204_basket_lift" -> q204Sql,
    "q206_ewma_monitor" -> q206Sql,
    "q207_watermark_audit" -> q207Sql,
    "q208_encoding_advisor" -> q208Sql,
    "q210_ks_drift" -> q210Sql,
    "q213_chi2_independence" -> q213Sql,
    "q149_pit_join"     -> q149Sql,
    "q150_unpivot"      -> q150Sql,
    "q151_item_similarity" -> q151Sql,
    "q152_conversion_latency" -> q152Sql,
    "q81_grouping_sets" -> q81Sql,
    "q82_regression"    -> q82Sql,
    "q83_range_frame"   -> q83Sql,
    "q75_anomaly"       -> q75Sql,
    "q73_funnel"        -> q73Sql,
    "q74_retention"     -> q74Sql,
    "q72_histogram"     -> q72Sql,
    "q67_incremental_topk" -> q67Sql,
    "q65_skyline"       -> q65Sql,
    "q50_salted_join"   -> q50Sql,
    "q45_array_funcs"   -> q45Sql,
    "q27_quantiles"     -> q27Sql,
    "q28_window_suite"  -> q28Sql,
    "q29_bag_setops"    -> q29Sql,
    "q30_pivot"         -> q30Sql,
    "q31_asof_join"     -> q31Sql,
    "q32_range_join"    -> q32Sql,
    "q33_json"          -> q33Sql,
    "q34_cube"          -> q34Sql,
    "q35_sql_interface" -> q35Sql)
}
