package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Dynamic partition pruning made LOAD-BEARING — the CboSpec discipline
  * applied to the third built-in SURVEY §4 deferred ("CBO/DPP if/when
  * needed"): a date-partitioned fact joined to a filtered dimension
  * must scan ONLY the partitions the dim filter selects, with the
  * pruning decided at RUNTIME from the dim side (no static predicate on
  * the fact exists to push down).
  *
  * Scale rationale: at 100 TB the fact table is partitioned by
  * ingest date/domain and almost every query joins it to a filtered
  * dimension. Static pruning cannot help (the partition keys appear
  * only through the join); without DPP every such query scans the full
  * fact. Spark's `PartitionPruning` rule inserts a
  * `DynamicPruningSubquery` on the fact's partition column, reusing the
  * dim side's broadcast — partition skipping at dimension-filter
  * selectivity, the partitioned-table complement of SnapTable's
  * manifest min/max skipping (SCALE.md records when to prefer which).
  *
  * Both directions locked per the q258/q259 rule: the scan carries a
  * `dynamicpruning` partition filter AND provably reads fewer
  * partitions with the feature on; a DPP-disabled session shows
  * neither; values are mode-invariant. */
class DppSpec extends SparkSpec {

  /** lineitem re-laid-out as a HIVE-PARTITIONED fact (one directory per
    * ship month) + a 12-row month dimension, built once. */
  private lazy val factDir: String = {
    val d = graft.ops.TempDirs.create("graft_dpp_fact_")
    graft.tables.Tables.lineitem(spark, sf)
      .withColumn("l_month", month(col("l_shipdate")))
      .write.mode("overwrite").partitionBy("l_month").parquet(d)
    d
  }

  private lazy val dimDir: String = {
    val d = graft.ops.TempDirs.create("graft_dpp_dim_")
    spark.range(1, 13).select(
      col("id").cast("int").as("m_month"),
      concat(lit("label_"), col("id")).as("m_label"),
      when(col("id") <= 2, "winter").otherwise("rest").as("m_season"))
      .coalesce(1).write.mode("overwrite").parquet(d)
    d
  }

  /** The DPP-shaped query: fact ⋈ dim on the PARTITION column, with the
    * selective predicate on the dim's non-key attribute — no static
    * fact-side filter exists, so only runtime pruning can skip. The
    * predicate is a literal comparison deliberately: PartitionPruning
    * only fires for LIKELY-SELECTIVE dim filters (attr-vs-literal,
    * IN, LIKE — a bare boolean attribute does not qualify). */
  private def q(s: SparkSession): DataFrame = {
    val fact = s.read.parquet(factDir)
    val dim = s.read.parquet(dimDir).filter(col("m_season") === "winter")
    fact.join(dim, fact("l_month") === dim("m_month"))
      .groupBy(col("m_label"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("long")).as("qty"))
      .orderBy(col("m_label"))
  }

  /** AQE off for BOTH modes: the assertion targets the static
    * PartitionPruning rule's plan shape and per-scan metrics, and AQE's
    * query-stage wrappers would only obscure the node walk (DPP itself
    * is independent of AQE — AqeSkewSpec covers the adaptive tier). */
  private def session(dpp: Boolean): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled",
      dpp.toString)
    s
  }

  /** The fact table's scan node in the executed plan, found by its
    * partition schema. */
  private def factScan(df: DataFrame): FileSourceScanExec = {
    df.collect() // materialize so the runtime metrics populate
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec
          if s.relation.partitionSchema.fieldNames.contains("l_month") => s
    }.headOption.getOrElse(fail("no partitioned fact scan in the plan"))
  }

  test("a dim-filtered join over a partitioned fact carries a " +
      "dynamicpruning partition filter and reads ONLY the selected " +
      "partitions; the DPP-off red check scans all of them; values " +
      "are mode-invariant") {
    val on = session(dpp = true)
    val off = session(dpp = false)

    val dfOn = q(on)
    val scanOn = factScan(dfOn)
    // the LOAD-BEARING plan assertion: the fact scan's partition
    // filters carry the runtime subquery
    assert(scanOn.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")),
      s"no dynamicpruning filter on the fact scan:\n" +
        scanOn.partitionFilters.mkString("\n"))
    // ...and the pruning is REAL: of the 12 month partitions only the
    // 2 winter ones were read (driver-side metric, populated at run)
    val partsOn = scanOn.metrics("numPartitions").value
    assert(partsOn === 2, s"DPP read $partsOn partitions, expected 2")

    // red check: DPP off — no pruning expression, all 12 partitions
    val dfOff = q(off)
    val scanOff = factScan(dfOff)
    assert(!scanOff.partitionFilters.exists(
      _.toString.toLowerCase.contains("dynamicpruning")),
      "DPP-off session still planned a dynamicpruning filter")
    assert(scanOff.metrics("numPartitions").value === 12,
      "fixture: the unpruned scan should read every month partition")

    // value gate: pruning is plan-only
    val a = q(on).collect().map(_.toSeq).toSeq
    val b = q(off).collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.size === 2) // two winter months
  }
}
