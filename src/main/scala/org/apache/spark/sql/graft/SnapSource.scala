package org.apache.spark.sql.graft

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo,
  Expression, GreaterThan, GreaterThanOrEqual, In, LessThan,
  LessThanOrEqual, Literal}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.datasources.{FileIndex,
  HadoopFsRelation, LogicalRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister,
  RelationProvider}
import org.apache.spark.sql.types.StructType

/** PLAN-DRIVEN manifest skipping for `graft.io.SnapTable` — the
  * format's DataSource front door (VERDICT r14 #2): a custom
  * [[FileIndex]] whose `listFiles` consults the snapshot manifest's
  * per-file min/max stats and bloom bits against the data filters
  * Catalyst pushes down. With it, a plain
  * `SnapTable.read(...).filter(col("doc_id") === x)` schedules tasks
  * for ONLY the admissible files — skipping is no longer an opt-in
  * explicit API (`readPruned*`), it is what the planner does. This is
  * how Delta's TahoeFileIndex and Iceberg's planning hook into Spark's
  * native parquet scan: swap the file listing, keep the vectorized
  * reader, whole-stage codegen, and `_metadata` columns.
  *
  * Lives in the org.apache.spark.sql namespace solely for access to
  * the `private[sql]` datasource internals; the pruning DECISIONS stay
  * in `graft.io.SnapTable` (passed in as closures over the manifest),
  * so the driver-side and plan-driven paths share one spelling and
  * cannot drift.
  *
  * @param files       (relative path, byte size) of every live file in
  *                    the scanned snapshot scope — sizes come from the
  *                    manifest's `sz:` tags, so planning needs NO
  *                    per-file FS round-trip
  * @param statsCols   the table's declared stats columns (physical
  *                    names — the scan's output attributes)
  * @param bloomCol    the declared bloom column, if any
  * @param pruneRanges manifest min/max pruning: per-stats-col ranges →
  *                    surviving relative paths
  * @param pruneEq     manifest bloom pruning: probe value → surviving
  *                    relative paths
  */
class SnapFileIndex(
    tableDir: String,
    files: Seq[(String, Long)],
    statsCols: Seq[String],
    bloomCol: Option[String],
    pruneRanges: Seq[Option[(Long, Long)]] => Set[String],
    pruneEq: Any => Set[String]) extends FileIndex {

  private val statuses: Seq[(String, FileStatus)] = files.map {
    case (rel, len) =>
      rel -> new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L,
        new Path(s"$tableDir/$rel"))
  }

  override def rootPaths: Seq[Path] = Seq(new Path(tableDir))
  override def partitionSchema: StructType = new StructType()
  override def sizeInBytes: Long = files.map(_._2).sum
  override def inputFiles: Array[String] =
    files.map { case (rel, _) => s"$tableDir/$rel" }.toArray
  override def refresh(): Unit = ()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val chosen = chosenFor(dataFilters)
    Seq(PartitionDirectory(InternalRow.empty,
      statuses.collect { case (rel, st) if chosen(rel) => st }.toArray))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def longOf(l: Literal): Option[Long] = l.value match {
    case i: java.lang.Integer => Some(i.longValue)
    case i: java.lang.Long => Some(i.longValue)
    case i: java.lang.Short => Some(i.longValue)
    case i: java.lang.Byte => Some(i.longValue)
    case _ => None
  }

  /** The file subset the pushed filters admit: every skippable
    * conjunct INTERSECTS the survivor set (conjunction semantics), and
    * any conjunct this extractor does not understand simply prunes
    * nothing — the residual row-level filter still applies, so an
    * unrecognized shape costs reads, never correctness. */
  private def chosenFor(filters: Seq[Expression]): Set[String] = {
    val all = files.map(_._1).toSet
    var chosen = all
    // per-stats-column conjunctive range, tightened across conjuncts
    val lo = Array.fill(statsCols.size)(Long.MinValue)
    val hi = Array.fill(statsCols.size)(Long.MaxValue)
    var anyRange = false
    def tighten(name: String, newLo: Long, newHi: Long): Unit = {
      val i = statsCols.indexOf(name)
      if (i >= 0) {
        lo(i) = math.max(lo(i), newLo)
        hi(i) = math.min(hi(i), newHi)
        anyRange = true
      }
    }
    filters.flatMap(conjuncts).foreach {
      case EqualTo(a: Attribute, l: Literal) =>
        longOf(l).foreach(v => tighten(a.name, v, v))
        if (bloomCol.contains(a.name) && l.value != null)
          chosen = chosen intersect pruneEq(l.value)
      case EqualTo(l: Literal, a: Attribute) =>
        longOf(l).foreach(v => tighten(a.name, v, v))
        if (bloomCol.contains(a.name) && l.value != null)
          chosen = chosen intersect pruneEq(l.value)
      case GreaterThan(a: Attribute, l: Literal) =>
        longOf(l).foreach(v => tighten(a.name, v + 1, Long.MaxValue))
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        longOf(l).foreach(v => tighten(a.name, v, Long.MaxValue))
      case LessThan(a: Attribute, l: Literal) =>
        longOf(l).foreach(v => tighten(a.name, Long.MinValue, v - 1))
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        longOf(l).foreach(v => tighten(a.name, Long.MinValue, v))
      case GreaterThan(l: Literal, a: Attribute) => // lit > a  ≡  a < lit
        longOf(l).foreach(v => tighten(a.name, Long.MinValue, v - 1))
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        longOf(l).foreach(v => tighten(a.name, Long.MinValue, v))
      case LessThan(l: Literal, a: Attribute) =>
        longOf(l).foreach(v => tighten(a.name, v + 1, Long.MaxValue))
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        longOf(l).foreach(v => tighten(a.name, v, Long.MaxValue))
      case In(a: Attribute, vs) if bloomCol.contains(a.name) &&
          vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
        // a point-lookup IN list: the UNION of the per-value bloom
        // survivors admits the disjunction
        chosen = chosen intersect
          vs.collect { case Literal(v, _) if v != null => pruneEq(v) }
            .foldLeft(Set.empty[String])(_ union _)
      case _ => () // unrecognized conjunct: prunes nothing
    }
    if (anyRange)
      chosen = chosen intersect pruneRanges(
        statsCols.indices.map(i =>
          if (lo(i) == Long.MinValue && hi(i) == Long.MaxValue) None
          else Some((lo(i), hi(i)))))
    chosen
  }
}

/** `private[sql]`-access builders for the SnapTable front door. */
object SnapRelation {

  /** A DataFrame over a manifest-backed [[SnapFileIndex]] — Spark's
    * native parquet scan (vectorized reader, codegen, `_metadata`
    * support) with SnapTable's manifest as the file listing. */
  def dataFrame(spark: SparkSession, index: FileIndex,
      dataSchema: StructType): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      LogicalRelation(relation(spark, index, dataSchema),
        isStreaming = false))

  /** The bare HadoopFsRelation (a BaseRelation) — what the DSv1
    * RelationProvider returns for `spark.read.format("graftsnap")`.
    * The data schema is forced NULLABLE, as Spark's own file-source
    * resolution does: a recorded non-null field would make the
    * vectorized reader refuse schema-evolved files that lack the
    * column ("Required column is missing") instead of null-filling. */
  def relation(spark: SparkSession, index: FileIndex,
      dataSchema: StructType): HadoopFsRelation =
    HadoopFsRelation(index, new StructType(), dataSchema.asNullable, None,
      new ParquetFileFormat, Map.empty)(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}

/** The front door's FALLBACK tier for snapshots a bare
  * [[HadoopFsRelation]] cannot express — deletion vectors (the
  * (file, pos) anti-join) and column maps (the rename projection).
  * A [[org.apache.spark.sql.sources.PrunedFilteredScan]] whose
  * `buildScan` delegates to the format's own scoped read (DV-applied,
  * logically named): the pushed column prunes and filters re-apply on
  * that inner DataFrame, so manifest skipping still fires through its
  * [[SnapFileIndex]] — at the cost of a row-conversion boundary
  * instead of the clean tier's end-to-end codegen. Every filter is
  * left in `unhandledFilters` (the [[BaseRelation]] default), so a
  * conjunct the converter cannot express costs reads, never
  * correctness.
  *
  * @param scan pushed filters (logical names) → the scoped DataFrame
  *             with those filters applied */
class SnapScopedRelation(
    ss: SparkSession,
    rawSchema: StructType,
    tableBytes: Long,
    scan: Seq[org.apache.spark.sql.sources.Filter]
      => DataFrame) extends BaseRelation
    with org.apache.spark.sql.sources.PrunedFilteredScan {
  // nullable like every file-source resolution (see [[SnapRelation]])
  override val schema: StructType = rawSchema.asNullable
  override def sqlContext: SQLContext = ss.sqlContext
  // manifest-derived (`sz:` tags) — without this the default
  // (defaultSizeInBytes ≈ Long.MaxValue) makes a small dimension that
  // happens to carry one sidecar ineligible for auto-broadcast, a
  // silent shuffle-join regression vs the clean tier
  override def sizeInBytes: Long = tableBytes
  override def buildScan(requiredColumns: Array[String],
      filters: Array[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
    val df = scan(filters.toSeq)
    df.select(requiredColumns.toSeq
      .map(n => org.apache.spark.sql.functions.col(SnapFilters.quote(n)))
      : _*).rdd
  }
}

/** `org.apache.spark.sql.sources.Filter` → `Column`, best-effort: a
  * shape the translator does not cover returns None and is simply not
  * applied to the inner scan (Spark re-applies ALL pushed filters
  * above a [[SnapScopedRelation]], so omission is safe). */
object SnapFilters {
  import org.apache.spark.sql.{sources => sf}
  import org.apache.spark.sql.functions.lit
  import org.apache.spark.sql.Column

  /** Backtick-quote a pushed attribute name: a top-level column named
    * `a.b` must not resolve as field b of struct a. */
  def quote(n: String): String = "`" + n.replace("`", "``") + "`"

  private def col(n: String): Column =
    org.apache.spark.sql.functions.col(quote(n))

  def toColumn(f: sf.Filter): Option[Column] = f match {
    case sf.EqualTo(a, v) => Some(col(a) === lit(v))
    case sf.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sf.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sf.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sf.LessThan(a, v) => Some(col(a) < lit(v))
    case sf.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sf.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case sf.IsNull(a) => Some(col(a).isNull)
    case sf.IsNotNull(a) => Some(col(a).isNotNull)
    case sf.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sf.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sf.StringContains(a, v) => Some(col(a).contains(v))
    case sf.And(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc && rc
    case sf.Or(l, r) =>
      for (lc <- toColumn(l); rc <- toColumn(r)) yield lc || rc
    case sf.Not(c) => toColumn(c).map(!_)
    case _ => None
  }
}

/** The snapshot table as a STRUCTURED STREAMING SOURCE — versions are
  * the offsets. The first batch serves the full snapshot at the
  * triggering version (the bootstrap, Delta's initial-snapshot
  * semantics); every later batch serves only the rows its window's
  * transitions APPENDED, read from each commit's drop-sized files —
  * never a rescan. `getBatch` is deterministic for a fixed window
  * (manifests are immutable), so the engine's checkpointed offsets
  * give exactly-once across restarts for free. Non-append transitions
  * and schema changes refuse with the remedy named (or are skipped
  * wholesale under `skipChangeCommits`); see
  * [[graft.io.SnapTable.streamBatch]] for the full contract. */
class SnapStreamSource(
    ss: org.apache.spark.sql.classic.SparkSession,
    dir: String,
    override val schema: StructType,
    skipChangeCommits: Boolean,
    maxVersionsPerTrigger: Option[Int]) extends
    org.apache.spark.sql.execution.streaming.Source {
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  /** The newest version this source has HANDED OUT (via getBatch) —
    * the base `maxVersionsPerTrigger` admission control caps against.
    * None until the first getBatch: a brand-new stream's first window
    * is the bootstrap (one snapshot batch, inherently uncapped), and
    * a restarted stream's recovery replay seeds it from the
    * checkpointed window before the first capped getOffset. */
  private var lastEnd: Option[Int] = None

  override def getOffset
      : Option[org.apache.spark.sql.execution.streaming.Offset] = {
    val v = graft.io.SnapTable.currentVersion(ss, dir)
    if (v <= 0) return None
    val capped = (for (b <- lastEnd; m <- maxVersionsPerTrigger)
      yield math.min(v, b + m)).getOrElse(v)
    Some(LongOffset(capped.toLong))
  }

  private def vOf(
      o: org.apache.spark.sql.execution.streaming.Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case other => other.json.trim.toInt // SerializedOffset after restart
  }

  override def getBatch(
      start: Option[org.apache.spark.sql.execution.streaming.Offset],
      end: org.apache.spark.sql.execution.streaming.Offset): DataFrame = {
    val endV = vOf(end)
    this.synchronized {
      lastEnd = Some(math.max(endV, lastEnd.getOrElse(0)))
    }
    val batch = graft.io.SnapTable.streamBatch(ss, dir,
      start.map(vOf).getOrElse(0), endV, schema, skipChangeCommits)
    ss.internalCreateDataFrame(
      batch.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def stop(): Unit = ()
}

/** `spark.read.format("graftsnap").load(dir)` — the registered
  * DataSource spelling of the front door (DataSourceRegister via
  * META-INF/services). Options: `versionAsOf` (int) for time travel,
  * `timestampAsOf` (epoch millis) for wall-clock time travel. Clean
  * snapshots serve through the native parquet relation; snapshots
  * carrying deletion vectors or a column map fall back to
  * [[SnapScopedRelation]] over the format's scoped read.
  * `spark.readStream.format("graftsnap").load(dir)` serves the table
  * as a streaming source ([[SnapStreamSource]]; option
  * `skipChangeCommits` to skip non-append transitions,
  * `maxVersionsPerTrigger` to pace a deep catch-up into bounded
  * per-trigger windows instead of one giant batch). */
class GraftSnapSource extends RelationProvider with DataSourceRegister
    with org.apache.spark.sql.sources.StreamSourceProvider {
  override def shortName(): String = "graftsnap"
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation =
    graft.io.SnapTable.baseRelation(sqlContext.sparkSession, parameters)

  private def dirOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path", throw new IllegalArgumentException(
      "graftsnap: a table path is required — " +
        "spark.readStream.format(\"graftsnap\").load(<dir>)"))

  /** Refuse a user-specified `.schema(...)`: the table's own schema is
    * authoritative (silently overriding the user's declaration would
    * surface as confusing downstream analysis errors — Delta refuses
    * the same way). */
  private def refuseUserSchema(schema: Option[StructType]): Unit =
    require(schema.isEmpty,
      "graftsnap: do not pass a schema to readStream — the table's " +
        "own (column-mapped) schema is served")

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    refuseUserSchema(schema)
    (shortName(), graft.io.SnapTable.streamLogicalSchema(
      sqlContext.sparkSession, dirOf(parameters)).asNullable)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    refuseUserSchema(schema)
    val ss = sqlContext.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val dir = dirOf(parameters)
    val maxV = parameters.get("maxVersionsPerTrigger").map { s =>
      val n = s.toInt
      require(n >= 1,
        s"graftsnap: maxVersionsPerTrigger must be >= 1, got $n")
      n
    }
    new SnapStreamSource(ss, dir,
      graft.io.SnapTable.streamLogicalSchema(ss, dir).asNullable,
      parameters.get("skipChangeCommits").exists(_.toBoolean), maxV)
  }
}
