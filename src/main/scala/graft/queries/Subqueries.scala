package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.cosine_sim
import graft.ops.Det
import graft.tables.Tables

/** Subquery shapes, typed-Dataset API, and embedding near-dup — third
  * operator wave.
  *
  * Subqueries exercise Catalyst's decorrelation: a correlated scalar
  * subquery becomes a broadcast/shuffle join under the hood — declared
  * declaratively, planned scalably. */
object Subqueries {

  /** q38 — scalar subquery: parts priced above the global average. */
  def q38ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT p_partkey, p_brand, p_retailprice
        |FROM part
        |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
        |ORDER BY p_partkey""".stripMargin)
  }

  val q38Sql: String =
    """SELECT p_partkey, p_brand, p_retailprice
      |FROM part
      |WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
      |ORDER BY p_partkey""".stripMargin

  /** q39 — correlated subquery: suppliers with above-nation-average
    * balance (Catalyst decorrelates to an aggregate + join). */
  def q39CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT s_suppkey, s_name, s_nationkey
        |FROM supplier s
        |WHERE s_acctbal > (SELECT avg(s2.s_acctbal) FROM supplier s2
        |                   WHERE s2.s_nationkey = s.s_nationkey)
        |ORDER BY s_suppkey""".stripMargin)
  }

  val q39Sql: String =
    """SELECT s_suppkey, s_name, s_nationkey
      |FROM supplier s
      |WHERE s_acctbal > (SELECT avg(s2.s_acctbal) FROM supplier s2
      |                   WHERE s2.s_nationkey = s.s_nationkey)
      |ORDER BY s_suppkey""".stripMargin

  /** q40 — TPC-H Q18 shape: customers whose total order value exceeds a
    * threshold, via IN + grouped HAVING subquery. */
  def q40InSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(
      s"""SELECT c_custkey, c_name, count(*) AS n_orders,
         |  ${Det.sqlSum("o_totalprice")} AS total_spent
         |FROM customer JOIN orders ON c_custkey = o_custkey
         |WHERE c_custkey IN (
         |  SELECT o_custkey FROM orders
         |  GROUP BY o_custkey
         |  HAVING sum(CAST(o_totalprice AS DECIMAL(18,2))) >
         |         CAST(3000000 AS DECIMAL(18,2)))
         |GROUP BY c_custkey, c_name
         |ORDER BY c_custkey""".stripMargin)
  }

  val q40Sql: String =
    s"""SELECT c_custkey, c_name, count(*) AS n_orders,
       |  ${Det.sqlSum("o_totalprice")} AS total_spent
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |WHERE c_custkey IN (
       |  SELECT o_custkey FROM orders
       |  GROUP BY o_custkey
       |  HAVING sum(CAST(o_totalprice AS DECIMAL(18,2))) >
       |         CAST(3000000 AS DECIMAL(18,2)))
       |GROUP BY c_custkey, c_name
       |ORDER BY c_custkey""".stripMargin

  // ---- typed Dataset API --------------------------------------------------

  case class LineItem(l_orderkey: Long, l_quantity: Double,
      l_extendedprice: Double, l_discount: Double, l_returnflag: String)
  case class FlagStats(l_returnflag: String, n: Long, max_qty: Double)

  /** q41 — typed-Dataset aggregation: case-class rows, groupByKey +
    * mapGroups (compile-time field checks; SURVEY §1.3 notes the reference
    * never uses typed Datasets — our engine supports both).
    * Outputs only count/max (order-independent) so the oracle matches. */
  def q41TypedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // primitive-Double decode requires non-NULL inputs (a NULL would
    // throw "Null value appeared in non-nullable field", where the
    // oracle's aggregate silently skips) — the q02/q03 defensive
    // filter, declared in BOTH spellings so parity holds by
    // construction even on a corpus with NULL numerics
    val ds: Dataset[LineItem] = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_quantity", "l_extendedprice", "l_discount",
        "l_returnflag")
      .filter(col("l_quantity").isNotNull &&
        col("l_extendedprice").isNotNull && col("l_discount").isNotNull)
      .as[LineItem]
    ds.groupByKey(_.l_returnflag)
      .mapGroups { (flag, rows) =>
        var n = 0L; var maxQ = Double.MinValue
        rows.foreach { r => n += 1; if (r.l_quantity > maxQ) maxQ = r.l_quantity }
        FlagStats(flag, n, maxQ)
      }
      .toDF()
      .orderBy(col("l_returnflag"))
  }

  val q41Sql: String =
    """SELECT l_returnflag, count(*) AS n, max(l_quantity) AS max_qty
      |FROM lineitem
      |WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
      |  AND l_discount IS NOT NULL
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  // ---- embedding near-dup -------------------------------------------------

  /** Pair count above which the exact all-pairs baseline refuses to run
    * raw — the q23/[[graft.ext.Text.UncappedPairBound]] discipline
    * applied to the embedding crossJoin. */
  val AllPairsBound: Long = graft.ext.Text.UncappedPairBound // ONE policy

  /** q42 — embedding-cosine near-duplicate pairs (exact all-pairs ≥ 0.35,
    * integer-only output). Exact formulation, kept as the oracle baseline
    * and recall reference; the PRODUCTION path at 100 TB is
    * [[graft.ext.Similarity.nearDupLsh]] (q49): the same predicate applied
    * to LSH-bucketed candidates only, no cartesian. SELF-GUARDING like
    * q23: the pair count n·(n−1)/2 is predicted from one count() before
    * any quadratic work, and the query refuses past [[AllPairsBound]],
    * naming the q49 twin — so no caller can run the baseline raw at
    * scale. At test scale the prediction is ~10⁵, never tripping the
    * oracle path. */
  def q42EmbeddingNearDup(s: SparkSession, dir: String): DataFrame =
    q42EmbeddingNearDupGuardedOf(Tables.embeddings(s, dir), AllPairsBound)

  /** [[q42EmbeddingNearDup]] with an explicit bound, so the spec can
    * force the refusal on a small corpus. */
  private[graft] def q42EmbeddingNearDupGuardedOf(e: DataFrame,
      bound: Long): DataFrame = {
    val n = e.count()
    // BigInt: n·(n−1)/2 wraps a Long past n ≈ 3.04e9 — i.e. the guard
    // arithmetic itself would overflow at exactly the scale it refuses
    val predicted = BigInt(n) * (n - 1) / 2
    if (predicted > bound) throw new IllegalStateException(
      s"exact all-pairs embedding near-dup (q42) would compare $predicted " +
        s"pairs (> $bound): this query is an exactness baseline — use the " +
        "LSH-bucketed twin (q49/nearDupLsh) at this scale")
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id"))
      .filter(cosine_sim(col("a_emb"), col("b_emb")) >= 0.35)
      .select(col("a_id"), col("b_id"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val q42Sql: String =
    """SELECT a.vec_id AS a_id, b.vec_id AS b_id
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |        CAST(b.embedding AS DOUBLE[])) >= 0.35
      |ORDER BY a_id, b_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_scalar_subquery" -> (q38ScalarSubquery _),
    "q39_corr_subquery"   -> (q39CorrelatedSubquery _),
    "q40_in_subquery"     -> (q40InSubquery _),
    "q41_typed_agg"       -> (q41TypedAgg _),
    "q42_embedding_neardup" -> (q42EmbeddingNearDup _))

  val oracles: Map[String, String] = Map(
    "q38_scalar_subquery" -> q38Sql,
    "q39_corr_subquery"   -> q39Sql,
    "q40_in_subquery"     -> q40Sql,
    "q41_typed_agg"       -> q41Sql,
    "q42_embedding_neardup" -> q42Sql)
}
