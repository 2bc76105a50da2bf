package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Property-fuzz for the two injected optimizer rules
  * (`RewriteSortedIntersectCount`, `RewriteIntDotFold`): their
  * soundness guards were hand-proven; this suite machine-checks them
  * on ≥1000 seeded-random expression trees per rule, asserting the two
  * halves of the contract separately:
  *
  *  - SOUNDNESS (every case, all families): evaluation with the rule
  *    active equals evaluation with the rule excluded
  *    (`spark.sql.optimizer.excludedRules`) — if a rewrite fires, it
  *    is value-invisible; if it doesn't, trivially so.
  *  - NON-VACUITY + GUARD PRECISION (designed families): batches built
  *    entirely from guard-eligible spellings must fire the kernel for
  *    EVERY case (fire count == case count in the optimized plan), and
  *    batches built entirely from near-miss spellings (descending
  *    sorts, raw arrays, nullable elements, int elements, `x * x`,
  *    nonzero seeds, `acc - v`, `try_*` eval modes, non-identity
  *    finish lambdas) must fire for NONE.
  *
  * Cases run in batches of one multi-column projection per session so
  * 1000 cases cost ~70 Spark jobs, not ~2000; the seed is fixed, so a
  * failure names a reproducible batch. LEGACY and ANSI sessions both
  * run the designed families (the dot kernel's two eval arms);
  * `legacySizeOfNull` and ANSI-overflow error parity get deterministic
  * probes. */
class RulesPropertySpec extends SparkSpec {

  private val BatchSize = 30

  private val bothRules =
    "org.apache.spark.sql.graft.RewriteSortedIntersectCount," +
      "org.apache.spark.sql.graft.RewriteIntDotFold"

  /** 24 deterministic rows with the column menu the generators draw
    * from: non-nullable longs (i, j), a nullable long (nl), non-null
    * long arrays (arr1 len 3, arr2 len 2), a nullable-ELEMENT array
    * (arrN), and a sometimes-NULL array (arrOpt). */
  private def baseDf(s: SparkSession): DataFrame =
    s.range(0, 24).selectExpr(
      "id AS i",
      "(id & 7) - 3 AS j", // &-arithmetic: non-nullable (unlike %)
      "CAST(CASE WHEN id % 5 = 0 THEN NULL ELSE id % 4 END AS BIGINT) AS nl",
      "array(id & 3, (id & 7) - 1, 2L) AS arr1", // containsNull = false
      "array(id & 3, 0L) AS arr2",
      "array(CAST(CASE WHEN id % 3 = 0 THEN NULL ELSE id % 6 END AS BIGINT)," +
        " 1L) AS arrN",
      "CASE WHEN id % 6 = 0 THEN NULL" +
        " ELSE array(id & 3, 5L) END AS arrOpt") // nullable ARRAY, clean elems

  private def mkSession(ansi: Boolean, excluded: Boolean): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.ansi.enabled", ansi.toString)
    // Spark 4 ships spark.sql.legacy.sizeOfNull=true but neutralizes it
    // while ANSI is on (the default). Turning ANSI off for the LEGACY
    // arithmetic batches would therefore silently flip size() into its
    // -1-legacy mode and park every intersect case behind the
    // legacySizeOfNull guard (observed: 0/30 eligible fires). Pin the
    // modern size semantics; the dedicated probe below tests the legacy
    // flag on purpose.
    s.conf.set("spark.sql.legacy.sizeOfNull", "false")
    s.conf.set("spark.sql.debug.maxToStringFields", "4000")
    if (excluded) s.conf.set("spark.sql.optimizer.excludedRules", bothRules)
    s
  }

  /** Run one batch of expression strings through an on/off session
    * pair; returns the kernel-fire count of the on-session plan
    * (counted on the plan TREE by prettyName — immune to the
    * maxToStringFields truncation a 30-column projection string hits).
    * Soundness (on ≡ off row-for-row) is asserted here for every
    * batch regardless of family. */
  private def runBatch(name: String, exprs: Seq[String], ansi: Boolean,
      kernel: String): Int = {
    val cols = "i" +: exprs.zipWithIndex.map { case (e, k) => s"($e) AS c$k" }
    def rows(s: SparkSession) =
      baseDf(s).selectExpr(cols: _*).orderBy("i").collect().map(_.toSeq)
    val on = mkSession(ansi, excluded = false)
    val off = mkSession(ansi, excluded = true)
    val dfOn = baseDf(on).selectExpr(cols: _*)
    val fires = dfOn.queryExecution.optimizedPlan.map { node =>
      node.expressions.map(_.collect {
        case e if e.prettyName == kernel => e
      }.size).sum
    }.sum
    val a = rows(on)
    val b = rows(off)
    (a zip b).zipWithIndex.foreach { case ((ra, rb), r) =>
      assert(ra === rb,
        s"$name row $r diverged under the rule: on=$ra off=$rb\n" +
          s"exprs=${exprs.mkString(" | ")}")
    }
    fires
  }

  // ---- RewriteSortedIntersectCount generators ----------------------------

  /** Non-nullable long scalar element spellings. */
  private def cleanElem(r: scala.util.Random): String =
    Seq("2L", "0L", "5L", "-1L", "i & 3", "j", "(i & 7) + 1")(r.nextInt(7))

  /** A guard-ELIGIBLE side: ascending sort_array over non-nullable
    * longs, with at least one column reference so nothing folds away. */
  private def eligibleSide(r: scala.util.Random): String =
    r.nextInt(3) match {
      case 0 =>
        val elems = r.shuffle(
          Seq.fill(r.nextInt(3))(cleanElem(r)) :+
            Seq("i & 3", "j")(r.nextInt(2)))
        s"sort_array(array(${elems.mkString(", ")}), true)"
      case 1 =>
        val elems = r.shuffle(Seq.fill(1 + r.nextInt(3))(cleanElem(r)) :+ "j")
        s"sort_array(array(${elems.mkString(", ")}))" // 1-arg = ascending
      case _ => s"sort_array(${Seq("arr1", "arr2")(r.nextInt(2))}, true)"
    }

  /** A guard-VIOLATING side (each pick is a single near-miss). */
  private def rejectSide(r: scala.util.Random): String =
    r.nextInt(5) match {
      case 0 => s"sort_array(array(${cleanElem(r)}, j), false)" // descending
      case 1 => s"array(${cleanElem(r)}, j)"                    // unsorted raw
      case 2 => s"sort_array(array(nl, ${cleanElem(r)}), true)" // nullable elem
      case 3 => "sort_array(array(CAST(i & 3 AS INT), 3), true)" // int elems
      case _ => "sort_array(arrN, true)"                  // nullable-elem col
    }

  private def intersectCase(l: String, rgt: String): String =
    s"size(array_intersect($l, $rgt))"

  /** Anything-goes side for the soundness-only family. */
  private def wildSide(r: scala.util.Random): String =
    r.nextInt(7) match {
      case 0 => eligibleSide(r)
      case 1 => rejectSide(r)
      case 2 => "sort_array(array(1L, 4L, 4L, 9L), true)" // all-literal side
      case 3 => "CAST(NULL AS ARRAY<BIGINT>)"             // NULL array
      case 4 => "sort_array(arrOpt, true)"                // sometimes-NULL
      case 5 => s"array_union(arr1, arr2)"                // un-sorted derived
      case _ => s"sort_array(array_union(arr1, array(${cleanElem(r)})), true)"
    }

  // ---- RewriteIntDotFold generators --------------------------------------

  private def dotArr(r: scala.util.Random): String =
    Seq("arr1", "arr2", "arrN", "arrOpt",
      "slice(arr1, 1, CAST(i & 1 AS INT) + 1)")(r.nextInt(5))

  private def dotCase(a: String, b: String, mul: String, zero: String,
      add: String, finish: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> $mul), $zero, " +
      s"(acc, v) -> $add$finish)"

  /** Guard-eligible dot spellings: canonical fold, operand order free,
    * optional explicit identity finish; nullable elements and length
    * mismatches are deliberately IN (the kernel reproduces their NULL
    * poisoning). */
  private def eligibleDot(r: scala.util.Random): String =
    dotCase(dotArr(r), dotArr(r),
      Seq("x * y", "y * x")(r.nextInt(2)), "0L",
      Seq("acc + v", "v + acc")(r.nextInt(2)),
      Seq("", ", s -> s")(r.nextInt(2)))

  /** Near-miss dot spellings: exactly one guard violation each. */
  private def rejectDot(r: scala.util.Random): String = {
    val (a, b) = (dotArr(r), dotArr(r))
    r.nextInt(7) match {
      case 0 => dotCase(a, b, "x * x", "0L", "acc + v", "")   // wrong operand
      case 1 => dotCase(a, b, "x + y", "0L", "acc + v", "")   // not a product
      case 2 => dotCase(a, b, "x * y", "1L", "acc + v", "")   // nonzero seed
      case 3 => dotCase(a, b, "x * y", "0L", "acc - v", "")   // not a sum
      // + 1L, not + 0L: the optimizer folds x + 0 to x BEFORE this rule,
      // which makes a + 0L spelling genuinely eligible (observed firing)
      case 4 => dotCase(a, b, "x * y", "0L", "acc + v + 1L", "") // 3-term add
      case 5 => dotCase(a, b, "x * y", "0L", "acc + v", ", s -> s + 1L")
      case _ => dotCase(a, b, "try_multiply(x, y)", "0L",
        "try_add(acc, v)", "") // TRY eval mode never rewrites
    }
  }

  private def wildDot(r: scala.util.Random): String =
    r.nextInt(4) match {
      case 0 => eligibleDot(r)
      case 1 => rejectDot(r)
      case 2 => s"(${eligibleDot(r)}) + i" // nested in arithmetic
      case _ => dotCase("array(1L, 2L, 3L)", "array(4L, 5L, 6L)",
        "x * y", "0L", "acc + v", "") // all-literal: folds away upstream
    }

  // ---- the fuzz loops ----------------------------------------------------

  private def fuzz(rule: String, kernel: String, ansi: Boolean,
      batches: Int, seedBase: Int,
      eligible: scala.util.Random => String,
      reject: scala.util.Random => String,
      wild: scala.util.Random => String): Int = {
    var cases = 0
    (0 until batches).foreach { bi =>
      val r = new scala.util.Random(seedBase + bi)
      val mode = bi % 3
      val exprs = Vector.fill(BatchSize)(mode match {
        case 0 => eligible(r)
        case 1 => reject(r)
        case _ => wild(r)
      })
      cases += exprs.size
      val fires = runBatch(s"$rule/${if (ansi) "ansi" else "legacy"}/b$bi",
        exprs, ansi, kernel)
      if (mode == 0) assert(fires === exprs.size,
        s"$rule batch $bi: only $fires/${exprs.size} eligible cases " +
          s"fired\n${exprs.mkString("\n")}")
      if (mode == 1) assert(fires === 0,
        s"$rule batch $bi: $fires near-miss cases fired" +
          s"\n${exprs.mkString("\n")}")
    }
    cases
  }

  test("RewriteSortedIntersectCount: >=1000 random trees — eligible " +
      "spellings all fire, near-misses never fire, values are " +
      "rule-invariant in LEGACY and ANSI modes") {
    var n = 0
    Seq(false, true).foreach { ansi =>
      n += fuzz("intersect", "sorted_intersect_count", ansi,
        batches = if (ansi) 9 else 27,
        seedBase = if (ansi) 2300 else 1300,
        eligible = r => intersectCase(eligibleSide(r), eligibleSide(r)),
        reject = r => {
          // at least one violating side (one is enough to refuse)
          val bad = rejectSide(r)
          val other =
            if (r.nextBoolean()) eligibleSide(r) else rejectSide(r)
          if (r.nextBoolean()) intersectCase(bad, other)
          else intersectCase(other, bad)
        },
        wild = r => intersectCase(wildSide(r), wildSide(r)))
    }
    assert(n >= 1000, s"only $n cases generated")
  }

  test("RewriteIntDotFold: >=1000 random trees — canonical folds all " +
      "fire, near-miss lambdas/seeds/finishes/TRY modes never fire, " +
      "values are rule-invariant in LEGACY and ANSI modes") {
    var n = 0
    Seq(false, true).foreach { ansi =>
      n += fuzz("dot", "int_dot", ansi,
        batches = if (ansi) 9 else 27,
        seedBase = if (ansi) 4300 else 3300,
        eligible = eligibleDot,
        reject = rejectDot,
        wild = wildDot)
    }
    assert(n >= 1000, s"only $n cases generated")
  }

  test("legacySizeOfNull refuses the intersect rewrite (deterministic " +
      "probe: the guard is conf-sensitive, values still rule-invariant)") {
    def legacySession(excluded: Boolean): SparkSession = {
      val s = mkSession(ansi = false, excluded = excluded)
      s.conf.set("spark.sql.legacy.sizeOfNull", "true")
      s
    }
    val c = "size(array_intersect(sort_array(array(i & 3, 2L), true), " +
      "sort_array(arr1, true)))"
    val on = legacySession(excluded = false)
    val dfOn = baseDf(on).selectExpr("i", s"$c AS c0")
    val fires = dfOn.queryExecution.optimizedPlan.map { node =>
      node.expressions.map(_.collect {
        case e if e.prettyName == "sorted_intersect_count" => e
      }.size).sum
    }.sum
    assert(fires === 0, "legacy size-of-null must refuse the rewrite")
    val a = dfOn.orderBy("i").collect().map(_.toSeq)
    val b = baseDf(legacySession(excluded = true))
      .selectExpr("i", s"$c AS c0").orderBy("i").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }

  test("ANSI overflow error parity (deterministic probe): the rewritten " +
      "dot fold and the interpreted fold both raise ARITHMETIC_OVERFLOW") {
    val c = "aggregate(zip_with(array(9223372036854775807L, i), " +
      "array(2L, 1L), (x, y) -> x * y), 0L, (acc, v) -> acc + v)"
    def errOf(excluded: Boolean): String = {
      val s = mkSession(ansi = true, excluded = excluded)
      val e = intercept[Exception](
        baseDf(s).selectExpr(s"$c AS c0").collect())
      Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .take(6).map(t => Option(t.getMessage).getOrElse(""))
        .find(_.contains("ARITHMETIC_OVERFLOW"))
        .getOrElse(fail(s"no ARITHMETIC_OVERFLOW in: ${e.getMessage}"))
      "ARITHMETIC_OVERFLOW"
    }
    assert(errOf(excluded = false) === errOf(excluded = true))
  }
}
