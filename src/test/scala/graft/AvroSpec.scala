package graft

import graft.io.AvroIo
import graft.tables.Tables
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The avro-core-backed container-file source/sink. Like the CSV/ORC
  * surface, this sits outside the DuckDB parquet oracle harness by
  * design (offline DuckDB has no Avro extension) — the gate here is
  * engine-level round-trip equality: `exceptAll` in BOTH directions is
  * empty, which compares full rows (arrays, binary, timestamps)
  * through Spark's own semantics. */
class AvroSpec extends SparkSpec {

  private def roundTrip(df: org.apache.spark.sql.DataFrame,
      parts: Int): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("graft_avro_").toString
    AvroIo.write(df.repartition(parts), dir)
    // distributed sink: one container file per partition
    val files = new java.io.File(dir).listFiles()
      .map(_.getName).filter(_.endsWith(".avro"))
    assert(files.length === parts, s"expected $parts part files: ${files.toSeq}")
    AvroIo.read(spark, dir)
  }

  test("fixture tables round-trip bit-exactly (schema + every row)") {
    for (t <- Seq("documents", "embeddings", "orders", "lineitem")) {
      val df = Tables.load(spark, sf, t)
      val back = roundTrip(df, 4)
      assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ===
        df.schema.map(f => (f.name, f.dataType.simpleString)), s"$t schema")
      assert(back.count() === df.count(), s"$t row count")
      assert(df.exceptAll(back).count() === 0, s"$t: rows lost/changed")
      assert(back.exceptAll(df).count() === 0, s"$t: rows invented")
    }
  }

  test("nulls, binary, arrays, and timestamps survive the union encoding") {
    import SparkSpec.spark.implicits._
    val df = Seq(
      (1L, Option("alpha"), Option(Array[Byte](1, 2, 3)), Seq(1.5f, -2f)),
      (2L, None: Option[String], None: Option[Array[Byte]], Seq.empty[Float]),
      (3L, Option(""), Option(Array.empty[Byte]), Seq(Float.MaxValue)))
      .toDF("id", "s", "b", "v")
      .withColumn("ts",
        when(col("id") =!= 2L,
          to_timestamp(lit("1999-12-31 23:59:59.123456"))))
    val back = roundTrip(df, 2)
    assert(df.exceptAll(back).count() === 0 &&
      back.exceptAll(df).count() === 0)
    // the timestamp's micros survive exactly (no ms truncation)
    val ts = back.filter(col("id") === 1L)
      .select(date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"))
      .as[String].head()
    assert(ts === "1999-12-31 23:59:59.123456")
  }

  test("null ELEMENTS inside arrays survive (element-level union)") {
    import SparkSpec.spark.implicits._
    // Seq(Some, None, Some): without a [null, T] element union the
    // writer dies with "null of long in array"
    val df = Seq(
      (1L, Seq(Option(10L), None, Option(30L))),
      (2L, Seq.empty[Option[Long]]),
      (3L, Seq(None: Option[Long])))
      .toDF("id", "xs")
    val back = roundTrip(df, 1)
    assert(df.exceptAll(back).count() === 0 &&
      back.exceptAll(df).count() === 0, "null array elements lost")
  }

  test("written files are genuine Avro container files") {
    import SparkSpec.spark.implicits._
    val dir = Files.createTempDirectory("graft_avro_magic_").toString
    AvroIo.write(Seq((1L, "x")).toDF("a", "b").coalesce(1), dir)
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val magic = java.nio.file.Files.readAllBytes(f.toPath).take(4)
    assert(magic.toSeq === Seq('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte),
      "missing Avro container magic (Obj\\x01)")
  }

  test("pre-1970 timestamps with sub-second micros round-trip") {
    import SparkSpec.spark.implicits._
    // negative epoch micros: truncating division would pair a
    // rounded-toward-zero milli with negative nanos and crash setNanos
    val df = Seq(1L, 2L, 3L).toDF("id")
      .withColumn("ts", when(col("id") === 1L,
          to_timestamp(lit("1969-12-31 23:59:59.5")))
        .when(col("id") === 2L,
          to_timestamp(lit("1969-12-31 23:59:59.999999")))
        .otherwise(to_timestamp(lit("1901-06-15 01:02:03.000001"))))
    val back = roundTrip(df, 1)
    assert(df.exceptAll(back).count() === 0 &&
      back.exceptAll(df).count() === 0, "pre-1970 micros lost or shifted")
  }

  test("a directory without the _SUCCESS marker refuses to read") {
    import SparkSpec.spark.implicits._
    val dir = Files.createTempDirectory("graft_avro_partial_").toString
    AvroIo.write(Seq((1L, "x"), (2L, "y")).toDF("a", "b").repartition(2), dir)
    // a complete write reads fine; simulate a died-halfway job by
    // removing the marker the driver writes LAST
    assert(AvroIo.read(spark, dir).count() === 2)
    assert(new java.io.File(dir, AvroIo.SuccessMarker).delete())
    val e = intercept[IllegalArgumentException](AvroIo.read(spark, dir))
    assert(e.getMessage.contains(AvroIo.SuccessMarker),
      s"refusal must name the missing marker: ${e.getMessage}")
    // reading a single FILE (not a directory) needs no marker
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro"))
    assert(parts.map(f => AvroIo.read(spark, f.toString).count()).sum === 2L)
  }

  test("exhausted read iterators tolerate repeated hasNext probes") {
    import SparkSpec.spark.implicits._
    val dir = Files.createTempDirectory("graft_avro_iter_").toString
    AvroIo.write((1L to 10L).toDF("n").coalesce(1), dir)
    // a downstream limit stops consuming mid-file, and wrapper iterators
    // (CompletionIterator et al.) probe hasNext after exhaustion — both
    // paths must not throw on the closed reader
    assert(AvroIo.read(spark, dir).limit(3).count() === 3)
    assert(AvroIo.read(spark, dir).collect().length === 10)
  }
}
