package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Data-layout operators: Z-order (Morton) clustering keys and the
  * per-file min/max statistics a multi-dimensional data-skipping scan
  * consults. North-star extension (no counterpart in the reference's
  * 3-query surface).
  *
  * Why this is a first-class 100 TB operator: a table laid out in
  * insertion order answers `WHERE custkey BETWEEN … AND orderdate
  * BETWEEN …` by reading everything — per-file min/max cover the whole
  * domain on at least one dimension. Writing the same rows sorted by the
  * bit-interleaved Z-value of both dimensions makes every run of
  * consecutive Z-values a small axis-aligned tile, so per-file min/max
  * are tight on BOTH dimensions at once and the scan prunes
  * multidimensionally (Delta/Iceberg `OPTIMIZE ZORDER BY`; the
  * technique is Orenstein & Merrett 1984). This module computes the
  * Z-key and the per-Z-range stats — i.e. exactly the pruning metadata
  * the layout would publish — so the tile-tightness property is
  * oracle-checkable.
  */
object Layout {

  /** Bits per dimension (16 buckets per dim, 256 Z-values). */
  val Bits = 4
  /** Z-values per emitted range ("file"): 2^Bits ranges overall, each an
    * aligned 4×4 tile of (x-bucket, y-bucket) space. */
  val RangeSize = 1 << Bits

  /** q94 — Z-order layout stats over orders on dimensions (o_custkey,
    * order day): equi-width integer bucketing of both dims to
    * 2^[[Bits]] buckets (widths derived from in-query min/max — all
    * integer arithmetic, `div`-exact in both engines), Morton
    * interleave, then per-Z-range row counts and min/max of both bucket
    * coordinates. The invariant a skipping scan relies on — and the spec
    * asserts — is that each Z-range spans ≤ a 4×4 tile (spread ≤ 3 on
    * each axis), versus a spread of 15 for an unclustered layout.
    *
    * Scale shape: one scan, one broadcast of the 1-row bounds aggregate,
    * one partial-agg exchange keyed by the 8-bit Z-range — the stats
    * relation is O(#files), never O(rows). At 100 TB the same Z
    * expression becomes the `repartitionByRange`/write-sort key; the
    * stats here are what the writer would publish per file. */
  def zorderStats(s: SparkSession, dir: String): DataFrame =
    zorderStatsOf(Tables.orders(s, dir).select(
      col("o_custkey").as("x"),
      datediff(to_date(col("o_orderdate")),
        to_date(lit("1970-01-01"))).cast("long").as("y")))

  /** The shared grid: equi-width bucketing of (x, y) to 2^[[Bits]] buckets
    * per dim plus the Morton interleave — one scan, one 1-row bounds
    * broadcast. Feeds [[zorderStatsOf]] and the q196 pruning audit. */
  private[graft] def zBucketedOf(base: DataFrame): DataFrame = {
    val bounds = base.agg(
      min(col("x")).as("minx"), max(col("x")).as("maxx"),
      min(col("y")).as("miny"), max(col("y")).as("maxy"))
    val nb = RangeSize // buckets per dimension
    // bit i of xb → Z bit 2i; bit i of yb → Z bit 2i+1 (integer-only)
    val zTerms = (0 until Bits).map { i =>
      val w = 1L << (2 * i)
      s"(((xb div ${1L << i}) % 2) * $w + ((yb div ${1L << i}) % 2) * ${2 * w})"
    }.mkString(" + ")
    base.join(broadcast(bounds))
      .selectExpr(
        s"(x - minx) div (((maxx - minx) div $nb) + 1) AS xb",
        s"(y - miny) div (((maxy - miny) div $nb) + 1) AS yb")
      .selectExpr("xb", "yb", s"($zTerms) AS z")
  }

  /** [[zorderStats]] over any (x, y) long frame — split out so the
    * property spec exercises the PRODUCTION interleave expression on the
    * full grid, not a re-derivation of it. */
  private[graft] def zorderStatsOf(base: DataFrame): DataFrame = {
    zBucketedOf(base)
      .groupBy(expr(s"z div $RangeSize").as("z_range"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("xb")).as("min_xb"), max(col("xb")).as("max_xb"),
        min(col("yb")).as("min_yb"), max(col("yb")).as("max_yb"))
      .orderBy(col("z_range"))
  }

  /** DuckDB spelling of [[zorderStats]]: same integer bucketing (`//` is
    * DuckDB's integer division), same interleave terms, same ranges. */
  val zorderStatsSql: String = {
    val nb = RangeSize
    val zTerms = (0 until Bits).map { i =>
      val w = 1L << (2 * i)
      s"(((xb // ${1L << i}) % 2) * $w + ((yb // ${1L << i}) % 2) * ${2 * w})"
    }.mkString(" + ")
    s"""WITH base AS (
       |  SELECT o_custkey AS x,
       |    CAST(date_diff('day', DATE '1970-01-01',
       |      CAST(o_orderdate AS DATE)) AS BIGINT) AS y
       |  FROM orders),
       |bounds AS (
       |  SELECT min(x) AS minx, max(x) AS maxx,
       |         min(y) AS miny, max(y) AS maxy
       |  FROM base),
       |bucketed AS (
       |  SELECT (x - minx) // (((maxx - minx) // $nb) + 1) AS xb,
       |         (y - miny) // (((maxy - miny) // $nb) + 1) AS yb
       |  FROM base, bounds),
       |zed AS (
       |  SELECT xb, yb, ($zTerms) AS z FROM bucketed)
       |SELECT z // $RangeSize AS z_range,
       |  CAST(count(*) AS BIGINT) AS n_rows,
       |  min(xb) AS min_xb, max(xb) AS max_xb,
       |  min(yb) AS min_yb, max(yb) AS max_yb
       |FROM zed GROUP BY 1 ORDER BY z_range""".stripMargin
  }

  // ---- q196: probe-driven pruning — Z-order vs linear layout --------------

  /** The embedded 2-D probe workload, in bucket coordinates (0..15 per
    * axis): (probe_id, xlo, xhi, ylo, yhi). One x-band, one y-band, two
    * aligned quadrant tiles, one point-ish corner, one off-grid band —
    * the mix a BI/curation dashboard actually issues. Compile-time so
    * both spellings evaluate the identical workload. */
  val PruneProbes: Seq[(Long, Long, Long, Long, Long)] = Seq(
    (1L, 0L, 3L, 0L, 15L),   // x-range only — linear layout's home turf
    (2L, 0L, 15L, 2L, 4L),   // y-range only — linear layout's blind spot
    (3L, 4L, 7L, 4L, 7L),    // aligned 2-D tile
    (4L, 12L, 15L, 12L, 15L),
    (5L, 0L, 1L, 0L, 1L),    // near-point corner
    (6L, 8L, 11L, 2L, 9L))   // unaligned 2-D band

  /** q196 — the data-layout DECISION, quantified: the same orders rows
    * written two ways — 16 files by Z-range (q94's layout) vs 16 files
    * by x-range (single-column sort) — and the same probe workload
    * evaluated against each layout's published per-file min/max. A file
    * is scanned iff its [min,max] box intersects the probe box (the
    * exact min-max skipping rule scans/Delta/Iceberg apply); the audit
    * emits files_scanned and rows_scanned per (layout, probe).
    *
    * This turns q94's "tiles are tight" invariant into the number an
    * engineer needs before a 100 TB OPTIMIZE: how many files does each
    * layout read for MY workload? (Answer on this grid: linear wins
    * only the pure-x probe; Z reads ≤¼ of the files on every 2-D and
    * y-only probe.)
    *
    * Scale shape: one scan → grid bucketing (1-row bounds broadcast) →
    * one partial-agg exchange keyed by file id; the per-file stats
    * relation is O(#files) and the probe evaluation is a crossJoin of
    * 32 stat rows × 6 probes — driver-trivial, corpus-independent. */
  def pruneAudit(s: SparkSession, dir: String): DataFrame = {
    val zb = zBucketedOf(Tables.orders(s, dir).select(
        col("o_custkey").as("x"),
        datediff(to_date(col("o_orderdate")),
          to_date(lit("1970-01-01"))).cast("long").as("y")))
      .localCheckpoint(eager = false) // feeds both layouts' stats
    def statsBy(file: Column, layout: String): DataFrame =
      zb.groupBy(file.as("file"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("xb")).as("min_xb"), max(col("xb")).as("max_xb"),
          min(col("yb")).as("min_yb"), max(col("yb")).as("max_yb"))
        .withColumn("layout", lit(layout))
    val stats = statsBy(expr(s"z div $RangeSize"), "zorder")
      .unionByName(statsBy(col("xb"), "linear"))
    import s.implicits._
    val pr = PruneProbes.toDF("probe_id", "xlo", "xhi", "ylo", "yhi")
    stats.crossJoin(broadcast(pr))
      .withColumn("hit",
        (col("xhi") >= col("min_xb")) && (col("xlo") <= col("max_xb")) &&
          (col("yhi") >= col("min_yb")) && (col("ylo") <= col("max_yb")))
      .groupBy(col("layout"), col("probe_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("files_scanned"),
        sum(when(col("hit"), col("n_rows")).otherwise(0L))
          .as("rows_scanned"))
      .orderBy(col("layout"), col("probe_id"))
  }

  /** DuckDB spelling: q94's bucketing CTEs, both file keys, the same
    * box-intersection rule over the same embedded probes. */
  val pruneAuditSql: String = {
    val nb = RangeSize
    val zTerms = (0 until Bits).map { i =>
      val w = 1L << (2 * i)
      s"(((xb // ${1L << i}) % 2) * $w + ((yb // ${1L << i}) % 2) * ${2 * w})"
    }.mkString(" + ")
    val probes = PruneProbes
      .map { case (id, xlo, xhi, ylo, yhi) =>
        s"($id, $xlo, $xhi, $ylo, $yhi)" }
      .mkString(", ")
    s"""WITH base AS (
       |  SELECT o_custkey AS x,
       |    CAST(date_diff('day', DATE '1970-01-01',
       |      CAST(o_orderdate AS DATE)) AS BIGINT) AS y
       |  FROM orders),
       |bounds AS (
       |  SELECT min(x) AS minx, max(x) AS maxx,
       |         min(y) AS miny, max(y) AS maxy
       |  FROM base),
       |bucketed AS (
       |  SELECT (x - minx) // (((maxx - minx) // $nb) + 1) AS xb,
       |         (y - miny) // (((maxy - miny) // $nb) + 1) AS yb
       |  FROM base, bounds),
       |zed AS (
       |  SELECT xb, yb, ($zTerms) AS z FROM bucketed),
       |stats AS (
       |  SELECT 'zorder' AS layout, z // $RangeSize AS file,
       |    count(*) AS n_rows, min(xb) AS min_xb, max(xb) AS max_xb,
       |    min(yb) AS min_yb, max(yb) AS max_yb
       |  FROM zed GROUP BY 2
       |  UNION ALL
       |  SELECT 'linear', xb, count(*), min(xb), max(xb), min(yb), max(yb)
       |  FROM zed GROUP BY 2),
       |probes(probe_id, xlo, xhi, ylo, yhi) AS (VALUES $probes)
       |SELECT layout, CAST(probe_id AS BIGINT) AS probe_id,
       |  CAST(count(*) AS BIGINT) AS n_files,
       |  CAST(sum(CASE WHEN xhi >= min_xb AND xlo <= max_xb
       |    AND yhi >= min_yb AND ylo <= max_yb THEN 1 ELSE 0 END)
       |    AS BIGINT) AS files_scanned,
       |  CAST(sum(CASE WHEN xhi >= min_xb AND xlo <= max_xb
       |    AND yhi >= min_yb AND ylo <= max_yb THEN n_rows ELSE 0 END)
       |    AS BIGINT) AS rows_scanned
       |FROM stats CROSS JOIN probes
       |GROUP BY layout, probe_id
       |ORDER BY layout, probe_id""".stripMargin
  }

  // ---- q124: bucketed-table co-located join (exchange-free) ---------------

  /** Buckets per table — both sides MUST agree for bucket-wise joins. */
  val Buckets = 8

  /** Stable per-dataset table-name tag so tests (which touch several SF
    * dirs in one session) and Verify (fresh JVM over a leftover
    * warehouse) never cross-contaminate bucketed tables. NAMES tables
    * only — freshness is the fingerprint's job ([[fingerprintOf]]):
    * a path hash alone would serve a stale table silently if the data
    * under the same directory changed. */
  private[graft] def dirTag(dir: String): String = md5HexPrefix(dir, 4)

  /** Driver-side md5 prefix as lowercase hex — the JVM spelling of the
    * scan-side `substring(md5(x), 1, 2n)` convention ([[Text.md5Bucket]]
    * is the Column side). One helper so the driver-computed constants
    * (dir tags, schema fingerprints, bloom probe bits) can never drift
    * from each other's digest spelling. */
  private def md5HexPrefix(x: String, nBytes: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).take(nBytes)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Cheap data fingerprint of a source relation: row count, max of the
    * id column, and an md5 of the schema — enough to catch append,
    * delete, re-id, and schema drift, the change classes a refreshed
    * source drop actually exhibits. One column-pruned agg scan per
    * ensure call (parquet count is footer-metadata work; max reads one
    * column) — the price of never serving a stale index. An in-place
    * single-VALUE edit that preserves count and max id is invisible to
    * this fingerprint; a pipeline needing that guarantee publishes a
    * content hash with the snapshot (q166's Merkle manifest is exactly
    * that artifact) and passes it here instead. */
  private[graft] def fingerprintOf(df: DataFrame, idCol: String): String = {
    val row = df.agg(count(lit(1)).as("n"),
      max(col(idCol).cast("long")).as("m")).collect()(0)
    val maxId = if (row.isNullAt(1)) "-" else row.getLong(1).toString
    val sch = md5HexPrefix(df.schema.catalogString, 8)
    s"${row.getLong(0)}_${maxId}_$sch"
  }

  private def tableLoc(s: SparkSession, table: String) =
    new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)

  /** The fingerprint rides INSIDE the managed table directory as the
    * `_graft_fp` sidecar — underscore-prefixed files are invisible to
    * parquet scans (the `_SUCCESS` convention), and dropping/replacing
    * the table atomically drops its fingerprint with it. */
  private def fpFile(s: SparkSession, table: String) =
    new org.apache.hadoop.fs.Path(tableLoc(s, table), "_graft_fp")

  /** A persisted table is fresh iff it exists in the catalog AND its
    * sidecar fingerprint equals the source's CURRENT fingerprint. Any
    * read failure counts as stale — the rebuild is idempotent. */
  private[graft] def isFresh(s: SparkSession, table: String,
      fp: String): Boolean =
    s.catalog.tableExists(table) && {
      val p = fpFile(s, table)
      try {
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.exists(p) && {
          val in = fs.open(p)
          try new String(in.readAllBytes(), "UTF-8") == fp
          finally in.close()
        }
      } catch { case _: Exception => false }
    }

  private def writeFp(s: SparkSession, table: String, fp: String): Unit = {
    val p = fpFile(s, table)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(fp.getBytes("UTF-8")) finally out.close()
  }

  /** q124 — bucketed-table co-located join: `orders` and `customer` are
    * written ONCE as parquet tables bucketed (and sort-ordered) by their
    * join key (`bucketBy(`[[Buckets]]`, custkey)`), then the fact-dim
    * join AND the per-customer aggregation both run with ZERO exchanges:
    * the scan's hash-bucketed layout already satisfies the join's
    * clustering requirement, and grouping on the same key reuses it
    * (PlanShapeSpec locks "no Exchange anywhere in the plan").
    *
    * Why this is THE 100 TB join shape: a fact table joined on the same
    * key daily (orders⋈customer, events⋈user, doc⋈cluster) pays its
    * shuffle once at write time and never again — every subsequent join
    * or aggregation on the bucket key is exchange-free, which at 100 TB
    * turns the dominant network cost of the pipeline into a local
    * sort-merge per bucket. The `.hint("merge")` pins sort-merge (a
    * broadcast would hide the co-location being demonstrated).
    *
    * The bucketed tables are pure LAYOUT: the oracle recomputes the same
    * aggregate from the raw parquet, so bucketing must be value-invisible
    * (the q109 "maintenance is value-invisible" discipline, applied to
    * storage). Writes are skipped when a FRESH copy exists — fresh per
    * the data fingerprint, not mere existence — so steady-state cost is
    * the O(1)-column fingerprint probe plus the join. */
  /** The shared fresh-or-rebuild discipline both writers use: skip when
    * a FRESH copy (per `fp`, see [[isFresh]]) already exists; otherwise
    * drop the stale table, delete its surviving warehouse location (a
    * PREVIOUS JVM's managed location may outlive the fresh in-memory
    * catalog, and Spark 4 then rejects even overwrite-mode `saveAsTable`
    * with LOCATION_ALREADY_EXISTS), run the write, and only THEN write
    * the fingerprint sidecar — so a failed rebuild re-runs instead of
    * serving a half-written table. Kept in ONE place: the rebuild
    * ordering and the stale-location workaround are invariants, not
    * per-writer details. */
  private def ensureFresh(s: SparkSession, table: String, fp: String)(
      write: => Unit): Unit =
    if (!isFresh(s, table, fp)) {
      if (s.catalog.tableExists(table)) s.sql(s"DROP TABLE `$table`")
      val loc = tableLoc(s, table)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      write
      writeFp(s, table, fp)
    }

  /** Write `df` as a bucket-sorted managed table under the
    * [[ensureFresh]] discipline. */
  private[graft] def writeBucketed(df: DataFrame, table: String,
      key: String, buckets: Int = Buckets, fp: String): Unit =
    ensureFresh(df.sparkSession, table, fp) {
      df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, key).sortBy(key).saveAsTable(table)
    }

  /** [[writeBucketed]]'s plain-layout sibling for small side tables
    * (e.g. q153's PQ codebook): same fresh-or-rebuild + stale-location
    * semantics, no bucketing. */
  private[graft] def writeManaged(df: DataFrame, table: String,
      fp: String): Unit =
    ensureFresh(df.sparkSession, table, fp) {
      df.write.mode("overwrite").format("parquet").saveAsTable(table)
    }

  def bucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val tag = dirTag(dir)
    val ordT  = s"graft_bkt_orders_$tag"
    val custT = s"graft_bkt_customer_$tag"
    val ordSrc = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val custSrc = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    // per-source fingerprints: a changed drop under the SAME path (new
    // rows, re-keyed ids, schema drift) invalidates and rebuilds the
    // bucketed copy instead of serving the stale layout; the bucket
    // count prefixes the fingerprint so a binary with a different
    // Buckets constant rebuilds over a leftover warehouse
    writeBucketed(ordSrc, ordT, "o_custkey",
      fp = s"b${Buckets}_" + fingerprintOf(ordSrc, "o_orderkey"))
    writeBucketed(custSrc, custT, "c_custkey",
      fp = s"b${Buckets}_" + fingerprintOf(custSrc, "c_custkey"))
    val o = s.table(ordT).hint("merge")
    val c = s.table(custT).hint("merge")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        graft.ops.Det.dsum(col("o_totalprice")).as("revenue"))
    // no orderBy: any sort would add the exchange this query exists to
    // avoid, and the driver's compare is order-insensitive
  }

  /** Oracle for [[bucketedJoin]] recomputes from the RAW parquet — the
    * bucketed layout must not change a single value. */
  val bucketedJoinSql: String =
    s"""SELECT c_custkey, c_mktsegment,
       |  CAST(count(*) AS BIGINT) AS n_orders,
       |  ${graft.ops.Det.sqlSum("o_totalprice")} AS revenue
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY 1, 2""".stripMargin

  // ---- q137: target-size file packing planner -----------------------------

  /** q137 packing constants: output-file byte target, and the fixed
    * doc_id range width each prefix-sum shard covers. */
  final val PackTargetBytes = 65536L
  final val PackRangeWidth  = 256L

  /** q137 — write-layout packing manifest: assign documents (in doc_id
    * order) to output files of ≈[[PackTargetBytes]] each via an
    * EXCLUSIVE cumulative byte sum — file_id = bytes_before div target —
    * and emit the per-file manifest (doc range, doc count, bytes). This
    * is the planner behind "write the corpus as uniform ~1 GiB files":
    * repartitionByRange sizes by ROW count; real layout needs BYTE
    * budgets, and the div of the running total is the standard spelling
    * (a file boundary falls wherever the cumulative bytes cross a
    * target multiple; oversized docs overflow their file exactly once,
    * never split).
    *
    * Scale shape: the q85/q95 two-phase prefix sum — per-shard running
    * sums inside fixed doc_id ranges of [[PackRangeWidth]] (grouped
    * windows, bounded fan-in), plus ONE ≤#shards-row exclusive offset
    * window — no global sort, no corpus-wide single partition. The
    * per-file roll-up partial-aggregates. At truly web-scale shard
    * counts the offset window recurses one more level (q85's note);
    * everything else is unchanged. */
  def filePacking(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").as("n_bytes"),
        expr(s"doc_id div $PackRangeWidth").as("rng")) // integer div: exact at any id
      .localCheckpoint(eager = false) // feeds in-range cumsums AND offsets
    val inRange = sum(col("n_bytes")).over(
      Window.partitionBy(col("rng")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1))
    val offsets = docs.groupBy(col("rng"))
      .agg(sum(col("n_bytes")).as("rb"))
      .withColumn("off", coalesce(sum(col("rb")).over(
        Window.orderBy(col("rng"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("rng"), col("off"))
    docs
      .withColumn("before", coalesce(inRange, lit(0L)))
      .join(broadcast(offsets), Seq("rng"))
      .select(col("doc_id"), col("n_bytes"),
        expr(s"(off + before) div $PackTargetBytes").as("file_id"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("file_bytes"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("file_id"))
  }

  /** Oracle: the naive single-window global cumulative sum — the
    * ordering contract the two-phase plan implements. */
  val filePackingSql: String =
    s"""WITH c AS (
       |  SELECT doc_id, n_chars AS n_bytes,
       |    CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      // $PackTargetBytes AS BIGINT) AS file_id
       |  FROM documents)
       |SELECT file_id, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_bytes) AS BIGINT) AS file_bytes,
       |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
       |FROM c GROUP BY file_id
       |ORDER BY file_id""".stripMargin

  // ---- q162: rendezvous-hash resharding audit -----------------------------

  /** q162 shard counts: the audit scales the corpus layout from
    * [[ShardsOld]] to [[ShardsNew]] shards under both schemes. */
  final val ShardsOld = 8
  final val ShardsNew = 10

  /** Highest-random-weight key of (doc, shard): the md5-derived 32-bit
    * weight (this library's portable-hash idiom, [[graft.ext.Text]]'s
    * md5Bucket convention) made injective by folding the shard id into
    * the low bits — so the per-doc argmax is unique with NO tie rule
    * needed in either engine. */
  private def rvKey(i: Int): Column =
    conv(substring(md5(concat(col("doc_id").cast("string"),
      lit("#" + i))), 1, 8), 16, 10).cast("long") * 64 + i

  /** Per-doc rendezvous winner among shards 0..n-1, entirely IN-ROW:
    * `greatest` over n (key, shard) structs — no shuffle, no join. */
  private def rvPick(n: Int): Column =
    greatest((0 until n).map(i =>
      struct(rvKey(i).as("k"), lit(i.toLong).as("s"))): _*).getField("s")

  /** q162 — resharding audit under rendezvous (highest-random-weight)
    * hashing vs modulo hashing: assign every document to a shard under
    * the old ([[ShardsOld]]) and new ([[ShardsNew]]) shard counts with
    * both schemes, and report per (scheme, new shard) the doc count and
    * how many docs MOVED shards. This is the decision relation behind
    * re-laying-out a stored corpus when the shard/worker count changes:
    * rendezvous hashing provably moves ONLY the docs the new shards win
    * (expected k/(n+k) of the corpus — here exactly the docs landing on
    * shards 8–9, a law the spec asserts), while `id mod n` reshuffles
    * almost everything. At 100 TB that difference is the whole network
    * bill of a topology change, which is why every distributed store
    * (Riak, Ceph's CRUSH, consistent-hash caches) plans placement this
    * way.
    *
    * Scale shape: ONE scan of doc ids; the double assignment is in-row
    * (`greatest` over a constant-size struct list — 18 md5s per row, no
    * shuffle, no join, codegen'd); the only exchange is the final
    * ≤ 2·[[ShardsNew]]-group aggregate. The audit never touches doc
    * payloads, so it runs on the manifest, not the corpus. */
  def reshardAudit(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.documents(s, dir).select(col("doc_id"),
      rvPick(ShardsOld).as("rv_old"), rvPick(ShardsNew).as("rv_new"),
      (col("doc_id") % ShardsOld).as("m_old"),
      (col("doc_id") % ShardsNew).as("m_new"))
    // both schemes emit from the SAME row via inline — a union of two
    // selects over `a` would plan the manifest scan twice
    a.select(inline(array(
        struct(lit("rendezvous").as("scheme"), col("rv_new").as("shard"),
          (col("rv_old") =!= col("rv_new")).cast("long").as("mv")),
        struct(lit("mod").as("scheme"), col("m_new").as("shard"),
          (col("m_old") =!= col("m_new")).cast("long").as("mv")))))
      .groupBy(col("scheme"), col("shard"))
      .agg(count(lit(1)).as("docs"), sum(col("mv")).as("moved"))
      .orderBy(col("scheme"), col("shard"))
  }

  /** Oracle: the unnested spelling — cross join against the 10-row shard
    * relation, FILTERed arg_max per width, same injective keys. */
  val reshardAuditSql: String =
    s"""WITH sh AS (SELECT unnest(range($ShardsNew)) AS s),
       |w AS (
       |  SELECT d.doc_id, sh.s,
       |    ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '#' ||
       |       CAST(sh.s AS VARCHAR)), 1, 8))::BIGINT * 64 + sh.s AS key
       |  FROM documents d CROSS JOIN sh),
       |a AS (
       |  SELECT doc_id,
       |    arg_max(s, key) FILTER (WHERE s < $ShardsOld) AS rv_old,
       |    arg_max(s, key) AS rv_new,
       |    doc_id % $ShardsOld AS m_old, doc_id % $ShardsNew AS m_new
       |  FROM w GROUP BY doc_id),
       |u AS (
       |  SELECT 'rendezvous' AS scheme, rv_new AS shard,
       |    CAST(rv_old <> rv_new AS BIGINT) AS mv FROM a
       |  UNION ALL
       |  SELECT 'mod' AS scheme, m_new AS shard,
       |    CAST(m_old <> m_new AS BIGINT) AS mv FROM a)
       |SELECT scheme, shard, CAST(COUNT(*) AS BIGINT) AS docs,
       |  CAST(SUM(mv) AS BIGINT) AS moved
       |FROM u GROUP BY scheme, shard
       |ORDER BY scheme, shard""".stripMargin

  // ---- q166: Merkle release manifest --------------------------------------

  /** Docs per manifest shard: bounds the level-1 hash fan-in. */
  final val ManifestShard = 128L

  /** q166 — Merkle-style release manifest: every document's content
    * fingerprint rolls up into per-shard hashes (md5 of the shard's
    * doc fingerprints in doc_id order), and the shard hashes roll up
    * into ONE root hash — the integrity artifact a reproducible data
    * release ships. Re-running the pipeline must reproduce the root
    * bit-for-bit; any silently changed/dropped/duplicated document
    * flips its shard hash and the root, and the shard level localizes
    * WHICH ~[[ManifestShard]] docs to diff. This is how model/data
    * release processes make "same data as last time" checkable instead
    * of aspirational (content-addressed stores, DVC, OCI manifests).
    *
    * Determinism: collect order never matters — fingerprints sort by
    * doc_id inside the aggregate (q143's array_sort discipline), so
    * any partitioning/replan yields the same concatenation.
    *
    * Scale shape: shard fan-in is bounded by [[ManifestShard]] BY
    * CONSTRUCTION (doc_id ranges), so level-1 aggregation is grouped
    * bounded-size work at any corpus size; the root folds #shards
    * hashes — at truly web scale the same range roll-up recurses one
    * more level (q85/q137's note), unchanged otherwise. */
  /** Per-doc manifest fingerprints of any documents frame — the carried
    * state of the streaming maintainer
    * ([[graft.streaming.DocStreams.maintainManifest]]). */
  private[graft] def manifestFingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      expr(s"doc_id div $ManifestShard").as("sh"),
      md5(col("text")).as("fp"), col("n_chars"))

  /** Level-1 roll-up: per-shard doc/byte counts and ordered-fp hash.
    * Fan-in bounded by [[ManifestShard]] by construction. */
  private[graft] def manifestShardsOf(fps: DataFrame): DataFrame =
    fps.groupBy(col("sh")).agg(
      count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_bytes"),
      md5(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), col("fp")))),
        x => x.getField("fp")), "")).as("hash"))

  /** Root roll-up + output shape over a (possibly maintained) shard
    * relation. */
  private[graft] def manifestAssemble(shards: DataFrame): DataFrame = {
    val root = shards.agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_bytes")).as("n_bytes"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("sh"), col("hash")))),
          x => x.getField("hash")), "")).as("hash"))
      .select(lit("root").as("level"), lit(-1L).as("id"),
        col("n_docs"), col("n_bytes"), col("hash"))
    shards.select(lit("shard").as("level"), col("sh").as("id"),
        col("n_docs"), col("n_bytes"), col("hash"))
      .union(root)
      .orderBy(col("level"), col("id"))
  }

  def releaseManifest(s: SparkSession, dir: String): DataFrame = {
    val shards = manifestShardsOf(
        manifestFingerprints(Tables.documents(s, dir)))
      .localCheckpoint(eager = false) // feeds both output levels
    manifestAssemble(shards)
  }

  /** Oracle: string_agg ORDER BY — the same ordered concatenation. */
  val releaseManifestSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, doc_id // $ManifestShard AS sh, md5(text) AS fp,
       |    n_chars
       |  FROM documents),
       |sh AS (
       |  SELECT sh, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_chars) AS BIGINT) AS n_bytes,
       |    md5(string_agg(fp, '' ORDER BY doc_id)) AS hash
       |  FROM d GROUP BY sh),
       |rt AS (
       |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_bytes) AS BIGINT) AS n_bytes,
       |    md5(string_agg(hash, '' ORDER BY sh)) AS hash
       |  FROM sh)
       |SELECT 'shard' AS level, sh AS id, n_docs, n_bytes, hash FROM sh
       |UNION ALL
       |SELECT 'root' AS level, CAST(-1 AS BIGINT) AS id, n_docs, n_bytes,
       |  hash FROM rt
       |ORDER BY level, id""".stripMargin

  // ---- q176: Bloom-filter data-skipping audit -----------------------------

  /** q176 geometry: docs per file, bloom bits per file (32 × 32-bit
    * words), hash count, and the fixed probe workload — three ids
    * present in every SF's corpus, three absent. */
  final val BloomFileDocs = 256L
  final val BloomBits = 1024L   // as 32 × 32-bit words
  final val BloomHashes = 3
  val BloomProbeIds: Seq[Long] =
    Seq(7L, 123L, 456L, 1000000001L, 1000000002L, 1000000003L)

  /** The probe's (word index, OR-combined mask) positions — computed
    * once on the driver with the SAME md5 the scan-side hashing uses,
    * then embedded as constants in both engines' plans. */
  private def bloomPositions(id: Long): Seq[(Long, Long)] =
    (0 until BloomHashes).map { i =>
      val h = java.lang.Long.parseLong(
        md5HexPrefix(s"$i:$id", 4), 16) % BloomBits
      (h / 32, 1L << (h % 32))
    }.groupBy(_._1).map { case (w, ms) =>
      (w, ms.map(_._2).reduce(_ | _))
    }.toSeq.sortBy(_._1)

  /** q176 — per-file Bloom-filter data skipping with a measured
    * false-positive audit: every ~[[BloomFileDocs]]-doc file publishes a
    * [[BloomBits]]-bit Bloom filter over its doc ids (32-bit words —
    * q103's convention, and BIGINT<<63 overflows DuckDB's checked
    * shift; [[BloomHashes]]
    * md5 hashes, built with q103's word/bit_or idiom), and each probe id
    * reports how many files the filter says MIGHT contain it, the file
    * that truly does (NULL for absent ids), and the false-positive
    * count. This is the equality-predicate half of data skipping beside
    * q94's min/max Z-order tiles (Parquet column Blooms, Delta/Iceberg
    * bloom indexes): a point lookup reads only bloom-positive files, and
    * the audit prices the wasted reads exactly — Blooms have NO false
    * negatives (the spec pins it), so positives are the complete
    * candidate set.
    *
    * Scale shape: the filter build is one scan → per-(file, word)
    * bit_or partial aggregate (32 words per file, constant metadata per
    * file at any corpus size); probing touches ONLY the metadata
    * relation — probe bits are driver-computed constants, the
    * membership test is a widx equi-join plus a bitwise AND, O(#files ·
    * k) at any data size, the point of skipping indexes. */
  def bloomSkipAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select(col("doc_id"),
        expr(s"doc_id div $BloomFileDocs").as("file_id"))
      .localCheckpoint(eager = false) // filter build + truth + file count
    val hashes = docs.select(col("file_id"), explode(array(
      (0 until BloomHashes).map(i =>
        // Text.md5Bucket IS this convention (8 hex digits, positive
        // domain, so % ≡ pmod) — routed through the shared helper so a
        // convention change cannot desync this scan from the
        // driver-computed bloomPositions constants
        Text.md5Bucket(concat(lit(s"$i:"), col("doc_id").cast("string")),
          BloomBits)): _*)).as("hv"))
    val words = hashes
      .groupBy(col("file_id"), expr("hv div 32").as("widx"))
      .agg(expr("bit_or(shiftleft(1L, cast(hv % 32 as int)))").as("word"))
    val pb = BloomProbeIds.flatMap(p =>
      bloomPositions(p).map { case (w, m) => (p, w, m) })
      .toDF("probe_id", "widx", "mask")
    // one row per (probe, word) in pb → needed is its per-probe count
    val need = pb.groupBy(col("probe_id")).agg(count(lit(1)).as("needed"))
    val sat = pb.join(words, Seq("widx"))
      .groupBy(col("probe_id"), col("file_id"))
      .agg(sum(when(col("word").bitwiseAND(col("mask")) === col("mask"), 1L)
        .otherwise(0L)).as("s"))
    val pos = sat.join(broadcast(need), Seq("probe_id"))
      .filter(col("s") === col("needed"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as("n_positive"))
    val truth = docs.filter(col("doc_id").isin(BloomProbeIds: _*))
      .select(col("doc_id").as("probe_id"), col("file_id").as("true_file"))
    val nf = docs.agg(countDistinct(col("file_id")).as("n_files"))
    BloomProbeIds.toDF("probe_id")
      .join(truth, Seq("probe_id"), "left")
      .join(pos, Seq("probe_id"), "left")
      .crossJoin(broadcast(nf))
      .select(col("probe_id"),
        col("true_file").isNotNull.cast("long").as("present"),
        col("true_file"), col("n_files"),
        coalesce(col("n_positive"), lit(0L)).as("n_positive"),
        (coalesce(col("n_positive"), lit(0L))
          - col("true_file").isNotNull.cast("long")).as("n_false_positive"))
      .orderBy(col("probe_id"))
  }

  /** Oracle: same per-doc hashes, q103's word spelling, the same
    * driver-computed probe-bit constants. */
  val bloomSkipAuditSql: String = {
    val hashArms = (0 until BloomHashes).map(i =>
      s"('0x' || substr(md5('$i:' || CAST(doc_id AS VARCHAR)), 1, 8))" +
        s"::BIGINT % $BloomBits").mkString(",\n    ")
    val pbRows = BloomProbeIds.flatMap(p =>
      bloomPositions(p).map { case (w, m) =>
        s"(CAST($p AS BIGINT), CAST($w AS BIGINT), CAST($m AS BIGINT))" })
      .mkString(", ")
    val ids = BloomProbeIds.mkString(", ")
    s"""WITH d AS (
       |  SELECT doc_id, doc_id // $BloomFileDocs AS file_id FROM documents),
       |h AS (
       |  SELECT file_id, unnest([
       |    $hashArms]) AS hv
       |  FROM d),
       |words AS (
       |  SELECT file_id, hv // 32 AS widx,
       |    bit_or(CAST(1 AS BIGINT) << CAST(hv % 32 AS INT)) AS word
       |  FROM h GROUP BY 1, 2),
       |pb(probe_id, widx, mask) AS (VALUES $pbRows),
       |need AS (SELECT probe_id, COUNT(*) AS needed FROM pb GROUP BY 1),
       |sat AS (
       |  SELECT p.probe_id, w.file_id,
       |    SUM(CASE WHEN (w.word & p.mask) = p.mask THEN 1 ELSE 0 END) AS s
       |  FROM pb p JOIN words w ON w.widx = p.widx
       |  GROUP BY 1, 2),
       |pos AS (
       |  SELECT s.probe_id, CAST(COUNT(*) AS BIGINT) AS n_positive
       |  FROM sat s JOIN need n ON n.probe_id = s.probe_id
       |  WHERE s.s = n.needed GROUP BY 1),
       |truth AS (
       |  SELECT doc_id AS probe_id, file_id AS true_file FROM d
       |  WHERE doc_id IN ($ids)),
       |nf AS (SELECT CAST(COUNT(DISTINCT file_id) AS BIGINT) AS n_files
       |  FROM d),
       |pr AS (SELECT CAST(unnest([$ids]) AS BIGINT) AS probe_id)
       |SELECT pr.probe_id,
       |  CAST(t.true_file IS NOT NULL AS BIGINT) AS present,
       |  t.true_file, nf.n_files,
       |  COALESCE(p.n_positive, 0) AS n_positive,
       |  COALESCE(p.n_positive, 0)
       |    - CAST(t.true_file IS NOT NULL AS BIGINT) AS n_false_positive
       |FROM pr
       |LEFT JOIN truth t ON t.probe_id = pr.probe_id
       |LEFT JOIN pos p ON p.probe_id = pr.probe_id
       |CROSS JOIN nf
       |ORDER BY pr.probe_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q94_zorder_stats" -> (zorderStats _),
    "q196_prune_audit" -> (pruneAudit _),
    "q124_bucketed_join" -> (bucketedJoin _),
    "q137_file_packing" -> (filePacking _),
    "q162_reshard_audit" -> (reshardAudit _),
    "q166_release_manifest" -> (releaseManifest _),
    "q176_bloom_skip" -> (bloomSkipAudit _))

  val oracles: Map[String, String] = Map(
    "q94_zorder_stats" -> zorderStatsSql,
    "q196_prune_audit" -> pruneAuditSql,
    "q124_bucketed_join" -> bucketedJoinSql,
    "q137_file_packing" -> filePackingSql,
    "q162_reshard_audit" -> reshardAuditSql,
    "q166_release_manifest" -> releaseManifestSql,
    "q176_bloom_skip" -> bloomSkipAuditSql)
}
