package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingestion generalizing the reference loader
  * (reference: CollegeScorecard.scala:35-53 — header, inferSchema,
  * nullValue="NULL", gz auto-detect, projection with corrective casts).
  *
  * Schema inference costs an extra full scan of the input — fine for
  * one-time ingestion, wrong for repeated 100 TB reads. [[load]] therefore
  * takes an optional explicit schema: provide one in production (zero
  * inference scans, stable contract), let inference run in exploration.
  */
object CsvLoader {

  /** Options mirroring the reference defaults. */
  case class CsvOptions(
      header: Boolean = true,
      inferSchema: Boolean = true,
      nullValue: String = "NULL",
      sep: String = ",")

  def load(spark: SparkSession, path: String,
      opts: CsvOptions = CsvOptions(),
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format("csv")
      .option("header", opts.header.toString)
      .option("nullValue", opts.nullValue)
      .option("sep", opts.sep)
    val withSchema = schema match {
      case Some(s) => r.schema(s)
      case None    => r.option("inferSchema", opts.inferSchema.toString)
    }
    withSchema.load(path)
  }

  /** Typed projection with corrective casts — the reference's
    * narrow-then-pin idiom (CollegeScorecard.scala:42-52): select named
    * columns in contract order, casting where inference is untrustworthy.
    * Early manual pruning also keeps the public schema independent of
    * upstream column additions. */
  def project(df: DataFrame, cols: Seq[Column]): DataFrame =
    df.select(cols: _*)
}
