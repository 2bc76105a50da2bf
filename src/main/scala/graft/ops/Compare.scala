package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, round}

/** The reference's golden-comparison idioms (reference DataTest.scala:
  * 115-121, 190-199), kept as reusable operators. */
object Compare {

  /** Order-insensitive set equality via symmetric difference:
    * `a.union(b).except(a.intersect(b)).count == 0`
    * (reference DataTest.scala:120). Set semantics — duplicate
    * multiplicity is invisible (SURVEY.md §5.3); use [[bagEqual]] when
    * multiplicity matters. */
  def setEqual(a: DataFrame, b: DataFrame): Boolean =
    a.union(b).except(a.intersect(b)).count() == 0

  /** Multiplicity-aware equality: symmetric difference with *All variants. */
  def bagEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  /** Round the named double columns on both sides to `scale` places
    * before comparing (reference float-tolerance idiom,
    * DataTest.scala:115, 119). */
  def roundCols(df: DataFrame, cols: Seq[String], scale: Int): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c), scale)))
}
