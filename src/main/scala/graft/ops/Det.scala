package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic aggregates for cross-engine (Spark vs DuckDB-oracle)
  * bit-exact comparison.
  *
  * Floating-point `sum`/`avg`/`stddev` are accumulation-order-dependent, and
  * Spark's partial/final aggregation over 32 partitions sums in a different
  * order than a single-threaded oracle — so raw double aggregates differ in
  * ULPs and fail hash comparison. The fix is NOT rounding (rounding near a
  * boundary is still nondeterministic) but exact arithmetic: cast inputs to
  * DECIMAL(18,2) (monetary inputs are 2-decimal values, so the cast is exact
  * and identical in every engine), aggregate exactly (decimal sum is
  * associative and commutative), and only then convert the single final value
  * to double (correctly-rounded, engine-independent).
  *
  * This also matters at 100 TB: decimal sums make results independent of
  * partitioning/AQE decisions, so replans don't change answers.
  *
  * Reference parity: generalizes mean/stddev_samp/count of
  * reference CollegeScorecard.scala:73-74, 146-151 with
  * scale-deterministic semantics.
  */
object Det {
  private val D = DecimalType(18, 2)

  /** Exact sum of a 2-decimal monetary/quantity column, as double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Exact-sum average (sum/count in IEEE double, same in every engine). */
  def davg(c: Column): Column = sum(c.cast(D)).cast("double") / count(c)

  /** Order-independent sample stddev: exact decimal sums of x and x*x, then
    * one fixed IEEE-double formula sqrt((Sxx - Sx*Sx/n) / (n-1)).
    * Matches `stddev_samp` up to the usual catastrophic-cancellation caveat,
    * which is irrelevant for the value ranges in the corpus; requires n>1
    * (reference guards the same way, CollegeScorecard.scala:152). */
  def dstddev(c: Column): Column = {
    val d   = c.cast(D)
    val sx  = sum(d).cast("double")
    val sxx = sum(d * d).cast("double")
    val n   = count(c).cast("double")
    sqrt((sxx - sx * sx / n) / (n - lit(1.0)))
  }

  /** The DuckDB-side spellings of the above, for oracle SQL strings. */
  def sqlSum(x: String): String =
    s"CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlAvg(x: String): String =
    s"CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE) / count($x)"
  def sqlStddev(x: String): String = {
    val sx  = s"CAST(sum(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
    val sxx = s"CAST(sum(CAST($x AS DECIMAL(18,2)) * CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
    val n   = s"CAST(count($x) AS DOUBLE)"
    s"sqrt(($sxx - $sx * $sx / $n) / ($n - 1.0))"
  }
}
