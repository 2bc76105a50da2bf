package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loaders for the harness star schema (TESTDATA.md).
  *
  * Generalizes the reference's catalog-scan entry point
  * (reference: CollegeScorecard.scala:72 `spark.sql("select * from db.tbl")`)
  * to the driver corpus: one parquet file per table under a scale-factor dir.
  *
  * Scale note: `spark.read.parquet` gives Spark's vectorized columnar reader;
  * at 100 TB the same call reads a partitioned directory tree and Catalyst
  * performs partition pruning + predicate pushdown automatically — nothing
  * here assumes single-file inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default. Read it as a long (nanos since epoch) and truncate to
    * microseconds — exactly what DuckDB does when it reads the same file,
    * so oracle comparisons line up. Integer `div` (not `/1000.0`) because
    * epoch-nanos exceed double's 53-bit mantissa.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the SESSION
    * (set it in the builder — Verify/Bench/SparkSpec all do). A loader must
    * not mutate session conf: that is a global side effect from a read
    * path, and under concurrent queries it would race. */
  def events(s: SparkSession, d: String): DataFrame =
    load(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  def documents(s: SparkSession, d: String): DataFrame =
    load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` works against the
    * corpus — the reference's name-based access idiom
    * (reference: CollegeScorecard.scala:72) without requiring a Hive
    * metastore. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, sfDir)
               else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
