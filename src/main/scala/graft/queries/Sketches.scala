package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Approximate/sketch aggregates — the 100 TB substitutes for exact
  * distinct counting and exact quantiles (SURVEY.md §2.4 marks these
  * ABSENT in the reference; at scale they replace the expensive exact
  * expand-shuffle plans of q09/q27).
  *
  * Oracle strategy: sketch ESTIMATES are engine-specific, so the
  * registered queries emit `(group, exact, est_within_tolerance BOOLEAN)`.
  * The exact values hash-match DuckDB's; the boolean asserts the estimate
  * is inside its published error envelope — a hard, driver-visible check
  * of the sketch itself (a broken sketch flips the flag). The exact
  * distinct counts exist only for verification; the production path at
  * 100 TB is the estimate-only aggregation (no expand shuffle).
  */
object Sketches {

  /** q36 — HLL++ distinct estimates + approximate percentiles per
    * returnflag, verified against exact values computed in the same pass.
    * approx_count_distinct at rsd=0.015 puts the 5% tolerance at >3σ;
    * both HLL++ and percentile_approx are deterministic per input, so the
    * flags are stable across runs and scale factors. */
  def q36Approx(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // Sketch side: one pass, fixed memory — the production aggregation.
    val approx = li.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("l_partkey"), 0.015).as("ap"),
        approx_count_distinct(col("l_suppkey"), 0.015).as("asu"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("amed"))
    // Exact side, verification only. Distinct counts via two-phase
    // (group, key) pre-aggregation — NOT countDistinct alongside other
    // aggregates, which would force an Expand multiplying the scan by the
    // number of distinct clauses (measured 10× slower at sf0.1).
    def exactDistinct(key: String, as: String): DataFrame =
      li.groupBy(col("l_returnflag"), col(key)).agg(count(lit(1)))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
    val emed = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.5)").as("emed"))
    approx
      .join(exactDistinct("l_partkey", "exact_parts"), Seq("l_returnflag"))
      .join(exactDistinct("l_suppkey", "exact_supps"), Seq("l_returnflag"))
      .join(emed, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n"),
        col("exact_parts"), col("exact_supps"),
        (abs(col("ap") - col("exact_parts")) <=
          col("exact_parts").cast("double") * 0.05).as("parts_within_5pct"),
        (abs(col("asu") - col("exact_supps")) <=
          col("exact_supps").cast("double") * 0.05).as("supps_within_5pct"),
        (abs(col("amed") - col("emed")) <= col("emed") * 0.05)
          .as("median_within_5pct"))
      .orderBy(col("l_returnflag"))
  }

  val q36Sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_suppkey) AS exact_supps,
      |  TRUE AS parts_within_5pct,
      |  TRUE AS supps_within_5pct,
      |  TRUE AS median_within_5pct
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** q37 — Apache DataSketches HLL: buildable, mergeable, re-estimable
    * sketches (the production pattern: persist sketch bytes per shard,
    * merge downstream without rescanning). Per-(flag,status) sketches are
    * merged per flag; the merged estimate is checked against the exact
    * distinct count (default lgConfigK=12 → rsd≈1.6%, 5% ≈ 3σ). */
  def q37HllSketch(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val est = li
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(hll_sketch_agg(col("l_partkey")).as("sk"))
      .groupBy(col("l_returnflag"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
    est.join(exact, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("est") - col("exact_parts")).cast("double") <=
          col("exact_parts").cast("double") * 0.05).as("est_within_5pct"))
      .orderBy(col("l_returnflag"))
  }

  val q37Sql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  TRUE AS est_within_5pct
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---- q123: Count-Min sketch heavy-hitter estimation ---------------------

  /** CMS geometry: [[CmsDepth]] independent hash rows × [[CmsWidth]]
    * buckets (compile-time constants — read while building oracle SQL).
    * Width is deliberately SMALLER than the fixture vocabulary so
    * collisions — the thing a CMS exists to bound — actually occur and
    * the overestimates are visible (13/20, 10/20, 12/20 probes exact at
    * the three SFs). */
  final val CmsDepth = 4
  final val CmsWidth = 16L

  /** q123 — Count-Min sketch over corpus token frequencies, probed at
    * the true top-20 terms: the fixed-size frequency summary a streaming
    * ingest keeps when the vocabulary doesn't fit anywhere (beside
    * q37's HLL for distinct counts and q103's bitmap for exact small
    * domains). Emits per-probe exact count, CMS estimate, and the
    * overestimate — `est ≥ exact` ALWAYS (one-sided error is the CMS
    * contract; SketchesSpec asserts it), with equality whenever some
    * row isolates the term.
    *
    * Portable hashing: row i of the sketch hashes md5("i|term") into
    * [[CmsWidth]] buckets — both engines fold identical bytes, so every
    * cell value and every estimate matches the oracle bit-for-bit.
    *
    * Scale shape: the sketch is (depth·width) = 64 cells — token
    * occurrences partial-aggregate per (row, bucket) map-side, ONE
    * constant-size exchange; the top-20 probe set is sort+limit
    * (TakeOrderedAndProject — never a vocabulary-wide window), and the
    * probe-vs-cell join broadcasts the 64-cell relation. At 100 TB the
    * sketch update stream is the only corpus-sized pass. */
  def q123CmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    val exact = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      // feeds the cells AND the probe set
      .localCheckpoint(eager = false)
    val depths = exact.sparkSession.range(CmsDepth)
      .select(col("id").cast("int").as("d"))
    def bucket(d: org.apache.spark.sql.Column,
        term: org.apache.spark.sql.Column) =
      pmod(conv(substring(md5(concat(d.cast("string"), lit("|"), term)),
        1, 8), 16, 10).cast("long"), lit(CmsWidth))
    val cells = exact.crossJoin(depths)
      .groupBy(col("d"), bucket(col("d"), col("term")).as("h"))
      .agg(sum(col("cnt")).as("cell"))
    val probes = exact
      .withColumn("tid", conv(substring(md5(col("term")), 1, 15), 16, 10)
        .cast("long"))
      .orderBy(col("cnt").desc, col("tid")).limit(20)
      // bounded 20-row window AFTER the limit (q67's pattern)
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("tid"))).cast("long"))
    val pd = probes.crossJoin(depths)
    pd.join(broadcast(cells),
        pd("d") === cells("d") && bucket(pd("d"), pd("term")) === cells("h"))
      .groupBy(pd("term"), pd("cnt"), pd("rnk"))
      .agg(min(col("cell")).as("est"))
      .select(col("term"), col("rnk"), col("cnt"), col("est"),
        (col("est") - col("cnt")).as("over"))
      .orderBy(col("rnk"))
  }

  /** DuckDB spelling of [[q123CmsHeavyHitters]]: same md5 row hashes,
    * same geometry, same probe ranking. */
  val q123Sql: String = {
    val depthRows = (0 until CmsDepth).map(i => s"SELECT $i AS d")
      .mkString(" UNION ALL ")
    s"""WITH tx AS (
       |  SELECT unnest(string_split(text, ' ')) AS term FROM documents
       |  WHERE text IS NOT NULL),
       |exact AS (SELECT term, count(*) AS cnt FROM tx GROUP BY 1),
       |depths AS ($depthRows),
       |cells AS (
       |  SELECT d,
       |    ('0x' || substr(md5(d || '|' || term), 1, 8))::BIGINT % $CmsWidth
       |      AS h,
       |    CAST(sum(cnt) AS BIGINT) AS cell
       |  FROM exact CROSS JOIN depths GROUP BY 1, 2),
       |probes AS (
       |  SELECT term, cnt, CAST(row_number() OVER (ORDER BY cnt DESC,
       |    ('0x' || substr(md5(term), 1, 15))::BIGINT) AS BIGINT) AS rnk
       |  FROM exact QUALIFY rnk <= 20),
       |est AS (
       |  SELECT p.term, p.rnk, CAST(p.cnt AS BIGINT) AS cnt,
       |    min(c.cell) AS est
       |  FROM probes p CROSS JOIN depths d
       |  JOIN cells c ON c.d = d.d
       |    AND c.h = ('0x' || substr(md5(d.d || '|' || p.term), 1, 8))::BIGINT
       |      % $CmsWidth
       |  GROUP BY 1, 2, 3)
       |SELECT term, rnk, cnt, est, est - cnt AS over
       |FROM est ORDER BY rnk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_cms_heavy_hitters" -> (q123CmsHeavyHitters _),
    "q36_approx_agg" -> (q36Approx _),
    "q37_hll_sketch" -> (q37HllSketch _))

  val oracles: Map[String, String] = Map(
    "q123_cms_heavy_hitters" -> q123Sql,
    "q36_approx_agg" -> q36Sql,
    "q37_hll_sketch" -> q37Sql)
}
