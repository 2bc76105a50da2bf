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

  test("declarative int-dot fold rewrites to the codegen kernel with " +
      "ANSI-exact semantics; guards hold") {
    import org.apache.spark.sql.functions.col
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.toString
    val fold = "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, " +
      "(acc, v) -> acc + v)"
    // arrays reference `id` so ConvertToLocalRelation/constant folding
    // cannot pre-evaluate the fold before the rule sees it
    val base = spark.range(2).selectExpr(
      "array(id + 1L, 2L, 3L) AS qa", "array(4L, 5L, id + 6L) AS qb")

    // plan upgrade + value (ANSI session — Spark 4 default): the fold
    // becomes int_dot and the values are the exact dot products
    val up = base.selectExpr("qa", "qb", s"$fold AS dot")
    assert(planOf(up).contains("int_dot"), planOf(up))
    assert(up.orderBy(col("dot")).collect().map(_.getLong(2)).toSeq ===
      Seq(32L, 39L))

    // the kernel reproduces the fold's null semantics: null element →
    // NULL, length mismatch (zip_with null padding) → NULL
    val nulls = spark.range(1).selectExpr(
      "array(id + 1L, CAST(NULL AS BIGINT)) AS qa", "array(2L, 3L) AS qb")
      .union(spark.range(1).selectExpr(
        "array(id + 1L, 2L, 3L)", "array(4L)"))
      .selectExpr(s"$fold AS dot")
    assert(planOf(nulls).contains("int_dot"), planOf(nulls))
    assert(nulls.collect().forall(_.isNullAt(0)))

    // ANSI-exactness: an overflowing multiply must THROW through the
    // kernel exactly as the declarative fold does (same error class) —
    // compare against the fold with the rule excluded
    val ovf = spark.range(1).selectExpr(
      "array(id + 9223372036854775807L) AS qa", "array(2L) AS qb")
      .selectExpr(s"$fold AS dot")
    assert(planOf(ovf).contains("int_dot"), planOf(ovf))
    val viaKernel = intercept[Exception](ovf.collect())
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.graft.RewriteIntDotFold")
    val viaFold = try {
      val raw = spark.range(1).selectExpr(
        "array(id + 9223372036854775807L) AS qa", "array(2L) AS qb")
        .selectExpr(s"$fold AS dot")
      assert(!planOf(raw).contains("int_dot"),
        s"rule exclusion did not remove the kernel:\n${planOf(raw)}")
      intercept[Exception](raw.collect())
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    def arithmeticRoot(e: Throwable): Throwable = {
      var c: Throwable = e
      while (c.getCause != null && !c.isInstanceOf[ArithmeticException])
        c = c.getCause
      c
    }
    assert(arithmeticRoot(viaKernel).getClass ===
      arithmeticRoot(viaFold).getClass,
      s"kernel error ${arithmeticRoot(viaKernel)} != " +
        s"fold error ${arithmeticRoot(viaFold)}")

    // ANSI-exactness on a NULL-result row: a LENGTH-MISMATCHED pair
    // whose overlapping-prefix SUM overflows must still throw (zip_with
    // pads with null at index min, so the fold's checked adds run over
    // the prefix first) — a kernel that short-circuits mismatch to NULL
    // would silently turn this error into a value
    val big = "4611686018427387904L" // 2^62: each product fine, sum overflows
    def mismatchOvf() = spark.range(1).selectExpr(
      s"array(id + $big, $big, 1L) AS qa", "array(1L, 1L) AS qb")
      .selectExpr(s"$fold AS dot")
    assert(planOf(mismatchOvf()).contains("int_dot"), planOf(mismatchOvf()))
    val viaKernel2 = intercept[Exception](mismatchOvf().collect())
    spark.conf.set(key, "org.apache.spark.sql.graft.RewriteIntDotFold")
    val viaFold2 = try intercept[Exception](mismatchOvf().collect())
    finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    assert(arithmeticRoot(viaKernel2).getClass ===
      arithmeticRoot(viaFold2).getClass,
      s"mismatch-row error diverged: ${arithmeticRoot(viaKernel2)} vs " +
        s"${arithmeticRoot(viaFold2)}")

    // LEGACY arm: under ansi=false the fold's Multiply/Add WRAP on
    // overflow — the rewrite must still fire and wrap to the SAME value
    // (not throw); compare kernel vs rule-excluded fold on a wrapping
    // input and on normal values
    val ansiKey = "spark.sql.ansi.enabled"
    val prevAnsi = spark.conf.getOption(ansiKey)
    spark.conf.set(ansiKey, "false")
    try {
      def legacyDf() = spark.range(1).selectExpr(
        s"array(id + $big, $big, 3L) AS qa", "array(2L, 2L, 5L) AS qb")
        .selectExpr(s"$fold AS dot")
      val viaK = legacyDf()
      assert(planOf(viaK).contains("int_dot"),
        s"legacy-mode fold did not rewrite:\n${planOf(viaK)}")
      val kv = viaK.collect()(0).getLong(0)
      spark.conf.set(key, "org.apache.spark.sql.graft.RewriteIntDotFold")
      val fv = try {
        val raw = legacyDf()
        assert(!planOf(raw).contains("int_dot"), planOf(raw))
        raw.collect()(0).getLong(0)
      } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      assert(kv === fv, s"legacy wrap values diverged: kernel $kv vs fold $fv")
      // 2^62·2 wraps to Long.MinValue twice; MinValue+MinValue wraps to
      // 0; +15 — wrapped arithmetic, not an error
      assert(kv === 15L)
    } finally prevAnsi.fold(spark.conf.unset(ansiKey))(
      spark.conf.set(ansiKey, _))

    // guards: a non-dot zip function, a TRY-mode multiply, and a non-0L
    // zero must all keep the declarative fold
    Seq(
      "aggregate(zip_with(qa, qb, (x, y) -> x * x), 0L, (acc, v) -> acc + v)",
      "aggregate(zip_with(qa, qb, (x, y) -> try_multiply(x, y)), 0L, " +
        "(acc, v) -> acc + v)",
      "aggregate(zip_with(qa, qb, (x, y) -> x * y), 1L, (acc, v) -> acc + v)"
    ).foreach { spelled =>
      val p = planOf(base.selectExpr(s"$spelled AS r"))
      assert(!p.contains("int_dot"), s"guard failed for $spelled:\n$p")
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
