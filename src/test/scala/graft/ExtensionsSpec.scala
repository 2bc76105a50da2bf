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
}
