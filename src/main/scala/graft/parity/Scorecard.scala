package graft.parity

import scala.util.Try
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import graft.catalog.{Catalog, Configuration}
import graft.io.CsvLoader

/** Reference-parity pipeline: the College Scorecard analytics surface
  * re-expressed on Spark 4 (reference: CollegeScorecard.scala:1-159).
  *
  * Same contract, modern semantics:
  *  - `-col` descending sort → `.desc` (explicit NULLS LAST; inputs are
  *    null-filtered exactly as the reference's are, SURVEY.md §2.5 O1);
  *  - `stddev_samp` of 1 row is NULL in Spark ≥3.1 (was NaN in 2.2) — the
  *    COUNT > 1 HAVING guard is kept (CollegeScorecard.scala:134-136, 152);
  *  - queries return `Try[Unit]` like the reference (error-as-value
  *    envelope, CollegeScorecard.scala:71/103/143).
  */
object Scorecard {

  /** Load + narrow the scorecard CSV: header, inferSchema,
    * nullValue="NULL", then the 9-column contract projection with
    * corrective casts (reference: CollegeScorecard.scala:35-53). */
  def loadScorecardData(spark: SparkSession, path: String): DataFrame =
    CsvLoader.project(
      CsvLoader.load(spark, path),
      Seq(
        col("UNITID"),
        col("OPEID").cast("Integer"),
        col("INSTNM"),
        col("CITY"),
        col("STABBR"),
        col("COSTT4_A"),
        col("DEBT_MDN").cast("Double"),
        col("C100_4"),
        col("C150_4")))

  private def inputDf(spark: SparkSession, c: Configuration): DataFrame =
    spark.sql(s"select * from ${c.inputDatabase}.${c.inputTable}")

  /** Q1 — five most expensive states by mean cost
    * (reference: CollegeScorecard.scala:70-80). */
  def fiveMostExpensiveStates(spark: SparkSession, c: Configuration): Try[Unit] =
    Try {
      val out = inputDf(spark, c)
        .groupBy("STABBR")
        .agg(mean("COSTT4_A").as("COSTT4_A_MEAN"))
        .orderBy(col("COSTT4_A_MEAN").desc)
        .limit(5)
      Catalog.insertIntoOrc(out, s"${c.outputDatabase}.${c.mostExpensiveTable}")
    }

  /** Q2 — five Texas colleges with highest median debt
    * (reference: CollegeScorecard.scala:102-119). */
  def fiveTexasCollegesWithHighestMedianDebt(
      spark: SparkSession, c: Configuration): Try[Unit] = Try {
    val out = inputDf(spark, c)
      .filter("DEBT_MDN IS NOT NULL AND STABBR == 'TX'")
      .select(col("UNITID"), col("OPEID"), col("INSTNM"), col("CITY"),
        col("STABBR"), col("DEBT_MDN").cast(DoubleType))
      .orderBy(col("DEBT_MDN").desc)
      .limit(5)
    Catalog.insertIntoOrc(out, s"${c.outputDatabase}.${c.highestDebtTable}")
  }

  /** Q3 — completion-rate stats for Texas by city, groups of ≥2
    * (reference: CollegeScorecard.scala:142-157). */
  def completionRateStatsInTexasByCity(
      spark: SparkSession, c: Configuration): Try[Unit] = Try {
    val out = inputDf(spark, c)
      .filter("STABBR == 'TX' AND C100_4 IS NOT NULL")
      .groupBy("CITY")
      .agg(
        mean("C100_4").as("C100_4_MEAN"),
        stddev_samp(col("C100_4")).as("C100_4_STDDEV"),
        count(lit("*")).as("COUNT"))
      .filter("COUNT > 1")
      .orderBy(col("C100_4_MEAN").desc)
    Catalog.insertIntoOrc(out,
      s"${c.outputDatabase}.${c.completionRateTable}")
  }
}
