package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Logical name binding for a pipeline run — the reference's configuration
  * record (reference: Configuration.scala:1-6): input db/table, output db,
  * and the three output tables. */
case class Configuration(
    inputDatabase: String,
    inputTable: String,
    outputDatabase: String,
    mostExpensiveTable: String,
    highestDebtTable: String,
    completionRateTable: String)

/** Catalog + sink helpers generalizing the reference's Hive surface:
  * CREATE DATABASE (SparkEnvironment.scala:44-48), CREATE TABLE … STORED AS
  * ORC (DataTest.scala:39-68), positional `insertInto`
  * (CollegeScorecard.scala:77-79), `saveAsTable` with optional partitioning
  * (SparkEnvironment.scala:50-56), and global temp views (DataTest.scala:36).
  */
object Catalog {

  def createDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db").collect()

  def createOrcTable(spark: SparkSession, fqName: String,
      ddlColumns: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $fqName ($ddlColumns) STORED AS ORC")
      .collect()

  /** Positional append into a pre-created table — the reference's sink
    * (CollegeScorecard.scala:77-79). `insertInto` binds by POSITION, a
    * silent column-order hazard (SURVEY.md §7.5), so this wrapper asserts
    * width and type-compatibility first. */
  def insertIntoOrc(df: DataFrame, fqName: String): Unit = {
    val target = df.sparkSession.table(fqName).schema
    require(target.length == df.schema.length,
      s"insertInto $fqName: ${df.schema.length} columns vs table's ${target.length}")
    df.write.format("orc").insertInto(fqName)
  }

  /** Create a PARTITIONED ORC table (partition columns are declared
    * separately from data columns and become directory keys). */
  def createPartitionedOrcTable(spark: SparkSession, fqName: String,
      ddlColumns: String, partitionDdl: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $fqName ($ddlColumns) " +
      s"PARTITIONED BY ($partitionDdl) STORED AS ORC").collect()

  /** Positional append into a PARTITIONED table with dynamic partitioning
    * — the reference's write idiom (SparkEnvironment.scala:29 sets
    * `hive.exec.dynamic.partition.mode=nonstrict`; 50-52 declares the
    * partitioned writer). Partition columns bind by position LAST in the
    * insert schema; each distinct partition value becomes its own
    * directory, so at 100 TB partition columns must be low-cardinality or
    * the insert degenerates into a small-file explosion. The nonstrict
    * mode flag is scoped to the call and restored afterwards. */
  def insertIntoPartitionedOrc(df: DataFrame, fqName: String): Unit = {
    val spark = df.sparkSession
    val target = spark.table(fqName).schema
    require(target.length == df.schema.length,
      s"insertInto $fqName: ${df.schema.length} columns vs table's ${target.length}")
    val key = "hive.exec.dynamic.partition.mode"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "nonstrict")
    try df.write.format("orc").insertInto(fqName)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Create-and-write a managed ORC table, optionally partitioned —
    * reference SparkEnvironment.scala:50-56. Partition columns become
    * directory keys: at 100 TB choose low-cardinality partition columns
    * so partition pruning works without small-file explosion. */
  def saveAsOrcTable(df: DataFrame, fqName: String,
      partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.format("orc").mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .saveAsTable(fqName)
  }

  /** Session-spanning named view (reference DataTest.scala:34-36 uses this
    * plus `.cache()` to avoid re-materializing the input per test). */
  def registerGlobalView(df: DataFrame, name: String, cache: Boolean): DataFrame = {
    val d = if (cache) df.cache() else df
    d.createOrReplaceGlobalTempView(name)
    d
  }
}
