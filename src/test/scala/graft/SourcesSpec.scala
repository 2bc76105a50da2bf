package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.io.CsvLoader
import graft.tables.Tables

/** Source/sink round-trips beyond the reference's CSV-in/ORC-out pair:
  * CSV and JSON-lines writers, malformed-record policies, and parquet
  * schema evolution — the ingestion surface a long-lived 100 TB corpus
  * actually exercises (files written by different pipeline versions). */
class SourcesSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString + "/out"

  test("CSV round-trip with explicit schema preserves values and NULLs") {
    val dir = tmp("graft-csv")
    val src = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .withColumn("lang", when(col("doc_id") % 7 === 0, lit(null))
        .otherwise(col("lang")))
    src.write.option("header", "true").option("nullValue", "NULL").csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = CsvLoader.load(spark, dir, schema = Some(schema))
    assert(back.count() === src.count())
    assert(back.filter(col("lang").isNull).count() ===
      src.filter(col("lang").isNull).count())
    assert(back.exceptAll(src).count() === 0)
  }

  test("JSON-lines round-trip preserves nested structure") {
    val dir = tmp("graft-json")
    val src = Tables.documents(spark, sf)
      .select(col("doc_id"),
        struct(col("lang"), col("source")).as("meta"),
        split(col("text"), " ").as("first_words"))
      .withColumn("first_words", slice(col("first_words"), 1, 3))
    src.write.json(dir)
    val back = spark.read.json(dir)
      .select(col("doc_id"), col("meta"), col("first_words"))
    assert(back.count() === src.count())
    val b = back.orderBy("doc_id").collect()
    val s = src.orderBy("doc_id").collect()
    b.zip(s).foreach { case (br, sr) =>
      assert(br.getStruct(1).getString(0) === sr.getStruct(1).getString(0))
      assert(br.getSeq[String](2) === sr.getSeq[String](2))
    }
  }

  test("malformed CSV rows: PERMISSIVE nulls them, FAILFAST raises") {
    val dir = Files.createTempDirectory("graft-badcsv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,n\n1,10\n2,notanumber\n3,30\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("n", LongType)))
    val permissive = spark.read.schema(schema)
      .option("header", "true").csv(dir)
    assert(permissive.count() === 3)
    assert(permissive.filter(col("n").isNull).count() === 1)
    val failfast = spark.read.schema(schema)
      .option("header", "true").option("mode", "FAILFAST").csv(dir)
    intercept[org.apache.spark.SparkException] { failfast.collect() }
  }

  test("JSONL ingest: clean rows round-trip value-exactly, malformed " +
      "lines quarantine with their raw text, and the counts reconcile") {
    val d = Files.createTempDirectory("graft_jsonl_spec_").toString
    val docs = Tables.documents(spark, sf)
    docs.write.mode("overwrite").json(d)
    Files.writeString(java.nio.file.Paths.get(d, "part-corrupt.json"),
      graft.io.JsonlIo.CorruptLines.mkString("\n") + "\n")
    val got = graft.io.JsonlIo.ingest(spark, d).cache()
    val corrupt = got.filter(col("_corrupt").isNotNull)
    assert(corrupt.count() === graft.io.JsonlIo.CorruptLines.size.toLong)
    // the raw line is preserved for forensics, data columns are null
    assert(corrupt.collect().forall(r =>
      r.isNullAt(r.fieldIndex("doc_id")) &&
        graft.io.JsonlIo.CorruptLines.contains(
          r.getAs[String]("_corrupt"))))
    // clean rows equal the parquet source value-for-value
    val clean = got.filter(col("_corrupt").isNull).drop("_corrupt")
    val exp = docs.collect().map(_.toSeq).toSet
    assert(clean.collect().map(_.toSeq).toSet === exp)
    assert(clean.count() === docs.count())
    got.unpersist()
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    val dir = tmp("graft-evolve")
    // v1 files lack the column a later pipeline version added
    Seq((1L, "a")).toDF("id", "v1col").write.parquet(s"$dir/p=1")
    Seq((2L, "b", 42L)).toDF("id", "v1col", "v2col")
      .write.parquet(s"$dir/p=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("id", "v1col", "v2col", "p"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).getAs[Any]("v2col") === null) // old file: evolved col is null
    assert(rows(1).getAs[Long]("v2col") === 42L)
  }

  test("Tables.events normalizes both corpus vintages to identical values") {
    import org.apache.spark.sql.functions._
    // the corpus generator has shipped ts as TIMESTAMP(NANOS)-read-as-long
    // AND as TIMESTAMP(MICROS, NTZ); the loader must read either vintage
    // into the same session-UTC TIMESTAMP values
    val base = Tables.events(SparkSpec.spark, sf)
      .select("event_id", "ts").orderBy("event_id").limit(20).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    // vintage A: epoch-nanos long column named ts, at <dir>/events.parquet
    // so Tables.events itself (not a reimplementation) does the reading
    val dirA = Files.createTempDirectory("graft-ev-nanos").toString
    Tables.events(SparkSpec.spark, sf).limit(20)
      .select(col("event_id"),
        (unix_micros(col("ts")) * 1000L).as("ts"))
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")
    // vintage B: NTZ micros column named ts
    val dirB = Files.createTempDirectory("graft-ev-ntz").toString
    Tables.events(SparkSpec.spark, sf).limit(20)
      .select(col("event_id"), col("ts").cast("timestamp_ntz").as("ts"))
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")
    def readBack(dir: String): Map[Long, java.sql.Timestamp] =
      Tables.events(SparkSpec.spark, dir).collect()
        .map(r => r.getAs[Long]("event_id") ->
          r.getAs[java.sql.Timestamp]("ts")).toMap
    val a = readBack(dirA)
    val b = readBack(dirB)
    base.foreach { case (id, ts) =>
      assert(a(id) === ts, s"nanos-vintage event $id diverges")
      assert(b(id) === ts, s"NTZ-vintage event $id diverges")
    }
  }
}
