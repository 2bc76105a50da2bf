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
