package graft

import graft.catalog.Catalog
import org.apache.spark.sql.functions.col

/** Dynamic-partition positional insertInto — the last reference write
  * idiom (reference SparkEnvironment.scala:29 nonstrict mode + 50-52
  * partitioned writer): rows route themselves to partitions by the VALUE
  * of the trailing partition column, not by a static partition spec. */
class CatalogSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("dynamic-partition insertInto routes rows and prunes on read") {
    Catalog.createDatabase(spark, "catspec")
    Catalog.createPartitionedOrcTable(spark, "catspec.dyn_sales",
      "id BIGINT, amount DOUBLE", "region STRING")
    val rows = Seq(
      (1L, 10.0, "emea"), (2L, 20.0, "amer"),
      (3L, 30.0, "emea"), (4L, 40.0, "apac"))
    val df = rows.toDF("id", "amount", "region")
    Catalog.insertIntoPartitionedOrc(df, "catspec.dyn_sales")

    // read-back equals input
    val back = spark.table("catspec.dyn_sales").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(back === rows.toSet)

    // each region landed in its own partition
    val parts = spark.sql("SHOW PARTITIONS catspec.dyn_sales")
      .collect().map(_.getString(0)).toSet
    assert(parts === Set("region=emea", "region=amer", "region=apac"))

    // a second dynamic append adds rows without clobbering partitions
    Catalog.insertIntoPartitionedOrc(
      Seq((5L, 50.0, "emea")).toDF("id", "amount", "region"),
      "catspec.dyn_sales")
    assert(spark.table("catspec.dyn_sales")
      .filter(col("region") === "emea").count() === 3)

    // strict-mode conf is restored after the call
    assert(spark.conf.getOption("hive.exec.dynamic.partition.mode").isEmpty)
  }

  test("dynamic-partition insertInto rejects width-mismatched frames") {
    Catalog.createDatabase(spark, "catspec")
    Catalog.createPartitionedOrcTable(spark, "catspec.dyn_narrow",
      "id BIGINT", "region STRING")
    val bad = Seq((1L, 1.0, "emea")).toDF("id", "extra", "region")
    intercept[IllegalArgumentException] {
      Catalog.insertIntoPartitionedOrc(bad, "catspec.dyn_narrow")
    }
  }
}
