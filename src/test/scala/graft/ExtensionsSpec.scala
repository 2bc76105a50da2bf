package graft

import org.apache.spark.sql.SparkSession

class ExtensionsSpec extends SparkSpec {

  test("extension-injected functions are SQL-callable on a new session") {
    val base = spark // ensure shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val cos = s2.sql(
        "SELECT cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))")
        .collect()(0).getDouble(0)
      assert(cos === 1.0)
      val lid = s2.sql("SELECT lang_id('the cat and the hat')")
        .collect()(0).getString(0)
      assert(lid === "en")
      val rh = s2.sql("SELECT rolling_hash('abc'), simhash64('a b c'), " +
        "dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT))), " +
        "portable_simhash('a b c')")
        .collect()(0)
      assert(rh.getLong(0) > 0)
      assert(rh.getDouble(2) === 6.0)
      assert(rh.getLong(3) > 0)
      // optimizer tier: the declarative sorted-intersect-size spelling
      // auto-upgrades to the allocation-free merge kernel — plan shows
      // sorted_intersect_count, value unchanged (inputs reference `id`
      // so constant folding cannot pre-evaluate the whole expression)
      val up = s2.range(1).selectExpr(
        "size(array_intersect(sort_array(array(3L, id + 1L, 2L)), " +
          "sort_array(array(2L, 9L, 3L)))) AS c")
      assert(up.collect()(0).getInt(0) === 2)
      assert(up.queryExecution.optimizedPlan.toString
        .contains("sorted_intersect_count"),
        up.queryExecution.optimizedPlan.toString)
      // guards hold: unsorted inputs and nullable elements do NOT rewrite
      val noRw = s2.range(1).selectExpr(
        "size(array_intersect(array(3L, id + 1L, 2L), " +
          "array(2L, 9L, 3L))) AS a",
        "size(array_intersect(sort_array(array(id + 1L, " +
          "CAST(NULL AS BIGINT))), sort_array(array(id + 1L, " +
          "CAST(NULL AS BIGINT))))) AS b")
      assert(!noRw.queryExecution.optimizedPlan.toString
        .contains("sorted_intersect_count"))
      val noRwRow = noRw.collect()(0)
      assert(noRwRow.getInt(0) === 2)
      assert(noRwRow.getInt(1) === 2) // null elements COUNT in intersect
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("observed telemetry rides the production action: curation drop " +
      "counts arrive with zero extra scans and match a recount") {
    import org.apache.spark.sql.functions._
    // observe the INPUT stage of the q55 curation pipeline: rows in,
    // null-text rows, short rows — the per-drop audit numbers an ingest
    // dashboard wants, accumulated on the same tasks that run the query
    val docs = graft.tables.Tables.documents(spark, sf)
    val (observed, obs) = graft.ops.Telemetry.observed(docs, "ingest",
      "n_in" -> count(lit(1)),
      "n_null_text" -> sum(col("text").isNull.cast("long")),
      "n_short" -> sum((col("n_chars") < 100).cast("long")))
    val kept = observed.filter(col("text").isNotNull &&
      col("n_chars") >= 100).count() // the ONE production action
    val m = obs.get
    assert(m("n_in").asInstanceOf[Long] === docs.count())
    assert(m("n_null_text").asInstanceOf[Long] ===
      docs.filter(col("text").isNull).count())
    assert(m("n_short").asInstanceOf[Long] ===
      docs.filter(col("n_chars") < 100).count())
    // the observed numbers reconcile with the kept count (nulls have
    // NULL n_chars in this corpus check — recount directly)
    assert(kept === docs.filter(col("text").isNotNull &&
      col("n_chars") >= 100).count())
  }
}
