package graft

import org.apache.spark.sql.functions._
import graft.queries.Core
import graft.tables.Tables

class CoreQueriesSpec extends SparkSpec {

  test("every registered query runs and q-with-oracle returns rows") {
    // legitimately empty at sf0.001: q22 has no duplicate docs; q39 has
    // ≤1 supplier per nation (none above own-nation average)
    val mayBeEmpty = Set("q22_exact_dedup", "q39_corr_subquery")
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      if (SparkEntry.oracleSql.contains(name) && !mayBeEmpty(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("q01 groups by (returnflag, linestatus) with exact sums") {
    val rows = Core.q01Pricing(spark, sf).collect()
    assert(rows.length === rows.map(r => (r.getString(0), r.getString(1))).distinct.length)
    // exact decimal sum: total qty across groups == direct sum
    val total = rows.map(_.getAs[Double]("sum_qty")).sum
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .agg(sum(col("l_quantity"))).collect()(0).getDouble(0)
    assert(math.abs(total - direct) < 1e-6)
  }

  test("q02 top-k is ordered desc and bounded") {
    val rows = Core.q02TopOrders(spark, sf).collect()
    assert(rows.length === 5)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted.reverse))
  }

  test("q03 HAVING keeps only groups with count > 1") {
    Core.q03StatsHaving(spark, sf).collect()
      .foreach(r => assert(r.getAs[Long]("cnt") > 1))
  }

  test("q06 window emits at most 2 rows per customer, ranked") {
    val byCust = Core.q06WindowTopN(spark, sf).collect()
      .groupBy(_.getAs[Long]("o_custkey"))
    byCust.values.foreach { rs =>
      assert(rs.length <= 2)
      assert(rs.map(_.getAs[Long]("rnk")).sorted.sameElements(1L to rs.length))
    }
  }

  test("q10 rollup contains the grand-total row and per-flag subtotals") {
    val rows = Core.q10Rollup(spark, sf).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getString(1) == "ALL")
    assert(grand.length === 1)
    val n = Tables.lineitem(spark, sf).count()
    assert(grand(0).getAs[Long]("n") === n)
  }

  test("q67 incremental top-k equals the from-scratch top-k") {
    import org.apache.spark.sql.functions.col
    val incremental = graft.queries.Advanced.q67IncrementalTopK(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val scratch = graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), col("value"))
      .orderBy(col("value").desc, col("event_id")).limit(100)
      .collect().zipWithIndex
      .map { case (r, i) => (r.getLong(0), r.getDouble(1), i + 1L) }
    assert(incremental.sameElements(scratch))
  }

  test("q68 triangle census matches brute force over the pair graph") {
    val row = graft.ext.Dedup.dupTriangles(spark, sf).collect()(0)
    val pairs = graft.ext.Dedup.dedupClusterPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edgeSet = pairs.toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val tris = (for {
      (a, b) <- pairs; c <- nodes if b < c
      if edgeSet.contains((b, c)) && edgeSet.contains((a, c))
    } yield 1).size.toLong
    assert(row.getLong(0) === nodes.length.toLong)
    assert(row.getLong(1) === pairs.length.toLong)
    assert(row.getLong(2) === tris)
  }

  test("q73 funnel stages are monotonically non-increasing") {
    val r = graft.queries.Advanced.q73Funnel(spark, sf).collect()(0)
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel must narrow: $v >= $c >= $p")
    assert(v > 0)
  }

  test("q74 retention: offset-0 row per cohort covers every cohort user") {
    val rows = graft.queries.Advanced.q74Retention(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (cohort, rs) =>
      val atZero = rs.find(_._2 == 0L).map(_._3).getOrElse(0L)
      // week-0 activity defines the cohort, so offset 0 is its max row
      assert(atZero > 0 && rs.forall(_._3 <= atZero),
        s"cohort $cohort: offset-0 must dominate")
    }
  }

  test("q131 SCD2: intervals chain per user, versions partition all events") {
    val rows = graft.queries.Advanced.q131Scd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getLong(5),
        r.getBoolean(6)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions are 1..k dense
      assert(sorted.map(_._2).toSeq === (1L to sorted.length.toLong),
        s"user $uid: versions must be dense from 1")
      // exactly one current version, and it is the last
      assert(sorted.count(_._7) === 1 && sorted.last._7,
        s"user $uid: exactly the last version is current")
      // valid_to of version i equals valid_from of version i+1 (chained)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5.contains(b._4), s"user $uid: intervals must chain")
          assert(a._3 !== b._3, s"user $uid: adjacent versions same tier")
        case _ =>
      }
    }
    // observation counts partition the event set
    val nEvents = Tables.events(spark, sf).count()
    assert(rows.map(_._6).sum === nEvents, "n_obs must partition all events")
  }

  test("q133 CDC merge: last-writer-wins state matches a per-key replay") {
    val got = graft.queries.Advanced.q133CdcMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val replay = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (uid, es) =>
        val last = es.maxBy(e => (e._2.getTime, e._3))
        (uid, last._2, last._4)
      }
      .filter(_._3 != "error")
    assert(got.toSet === replay.toSet,
      "aggregated state must equal the driver-side changelog replay")
    // deleted keys (last op = error) are genuinely absent
    val deleted = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2)), r.getString(3)))
      .groupBy(_._1).filter { case (_, es) => es.maxBy(_._2)._3 == "error" }
    assert(deleted.keySet.intersect(got.map(_._1).toSet).isEmpty,
      "keys whose last change is a delete must not appear")
  }

  test("q138 gap fill: grid dense per user, observed hours exact, fills carry last") {
    val rows = graft.queries.Advanced.q138GapFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_._2.getTime)
      // dense hourly grid: consecutive rows exactly 1h apart
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2.getTime - a._2.getTime === 3600000L,
            s"user $uid: grid must be dense hourly")
        case _ =>
      }
      assert(sorted.head._4, s"user $uid: first grid hour must be observed")
      // forward fill: every unobserved hour repeats the previous value
      sorted.sliding(2).foreach {
        case Array(a, b) if !b._4 =>
          assert(b._3 === a._3, s"user $uid: fill must carry last value")
        case _ =>
      }
    }
    // at least one gap actually exercised the fill path
    assert(rows.exists(!_._4), "fixture has no silent hours — fill untested")
  }

  test("q137 file packing: files partition the corpus in order within budget") {
    val rows = graft.ext.Layout.filePacking(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length > 1, "target must produce multiple files at this SF")
    val sorted = rows.sortBy(_._1)
    // file ids dense from 0; doc ranges chain without gaps or overlap
    assert(sorted.map(_._1).toSeq === (0L until sorted.length.toLong))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(b._4 === a._5 + 1,
        s"file ${b._1}: doc ranges must chain contiguously")
      case _ =>
    }
    val total = graft.tables.Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_chars"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1))).collect()(0)
    assert(sorted.map(_._3).sum === total.getLong(0), "bytes must partition")
    assert(sorted.map(_._2).sum === total.getLong(1), "docs must partition")
    // exact boundary law of the exclusive-cumsum div: file i+1 opens only
    // once the running total has crossed (i+1)·target, so every non-final
    // file's cumulative bytes meet the budget line exactly when it closes
    val prefix = sorted.map(_._3).scanLeft(0L)(_ + _).drop(1)
    sorted.init.zipWithIndex.foreach { case (_, i) =>
      assert(prefix(i) >= (i + 1).toLong * graft.ext.Layout.PackTargetBytes,
        s"file $i closed before reaching its byte budget")
    }
  }

  test("q143 sequence patterns: counts match a driver-side regex replay") {
    val got = graft.queries.Advanced.q143SeqPattern(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === graft.queries.Advanced.SeqPatterns.map(_._1).toSet)
    // replay: build each user's initials string and scan with Java regex
    val seqs = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), (r.getTimestamp(1).getTime, r.getLong(2)),
        r.getString(3).substring(0, 1)))
      .groupBy(_._1)
      .map { case (u, es) => u -> es.sortBy(_._2).map(_._3).mkString }
    graft.queries.Advanced.SeqPatterns.foreach { case (name, pat) =>
      val rx = pat.r
      val matches = seqs.values.map(s => rx.findAllIn(s).length)
      val expect = (matches.count(_ > 0).toLong, matches.sum.toLong)
      assert(got(name) === expect, s"pattern $name diverges from replay")
    }
    // non-degenerate fixture: some pattern hits, some users never match
    assert(got.values.exists(_._1 > 0L), "no pattern fires at all")
    assert(got("signup_to_purchase")._2 >= got("signup_to_purchase")._1,
      "match count below user count")
  }

  test("q144 attribution: models conserve conversions and credit mass") {
    val rows = graft.queries.Advanced.q144Attribution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val nPurchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    // first-touch and last-touch each assign every purchase exactly once
    assert(rows.map(_._2).sum === nPurchases, "first-touch loses conversions")
    assert(rows.map(_._3).sum === nPurchases, "last-touch loses conversions")
    // linear credit mass: 1e6 per purchase minus only the integer-division
    // remainders (< n per attributed purchase) — bounded loss, never gain
    val lin = rows.map(_._4).sum
    assert(lin <= nPurchases * 1000000L, "linear credit overshoots")
    assert(lin > nPurchases * 900000L, "linear credit lost more than remainders")
    // only touch types and (direct) may carry credit
    val legal = Set("view", "click", "signup", "(direct)")
    assert(rows.map(_._1).forall(legal), s"illegal credited type in $rows")
    // the fixture exercises both attributed and direct conversions
    assert(rows.exists(r => r._1 == "(direct)" && r._2 > 0L) &&
      rows.exists(r => r._1 != "(direct)" && r._2 > 0L),
      "fixture lacks either direct or attributed purchases")
  }

  test("q146 change point: the peak equals a driver-side CUSUM replay") {
    val got = graft.queries.Advanced.q146ChangePoint(spark, sf).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    val events = Tables.events(spark, sf)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime))
    val dayMs = 86400000L
    events.groupBy(_._1).foreach { case (tpe, es) =>
      val counts = es.groupBy(_._2).map { case (d, xs) => d -> xs.length.toLong }
      val (d0, d1) = (counts.keys.min, counts.keys.max)
      val days = d0 to d1 by dayMs
      val t = counts.values.sum
      val dCnt = days.length.toLong
      var c = 0L
      val walk = days.map { d =>
        c += counts.getOrElse(d, 0L) * dCnt - t; (d, c)
      }
      val peak = walk.minBy { case (d, v) => (-math.abs(v), d) }
      val row = got.find(_._1 == tpe).get
      assert(row._2.getTime === peak._1, s"$tpe peak day diverges")
      assert(row._3 === peak._2, s"$tpe peak cusum diverges")
      assert(row._4 === dCnt && row._5 === t, s"$tpe span stats diverge")
    }
    // walk must actually deviate somewhere (flat walk ⇒ vacuous detector)
    assert(got.exists(_._3 != 0L), "all CUSUM peaks are zero")
  }

  test("q147 TWAP: bounded by observed extremes and exact on a replay") {
    val got = graft.queries.Advanced.q147Twap(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(got.nonEmpty)
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(1)
        val micros = math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
        (r.getLong(0), (micros, r.getLong(2)),
          math.floor(r.getDouble(3) * 100 + 0.5).toLong)
      }
    events.groupBy(_._1).filter(_._2.length > 1).foreach { case (u, es) =>
      val sorted = es.sortBy(_._2)
      val span = sorted.last._2._1 - sorted.head._2._1
      val wsum = sorted.sliding(2).map {
        case Array(a, b) => a._3 * (b._2._1 - a._2._1)
        case _ => 0L
      }.sum
      val row = got.find(_._1 == u).get
      assert(row._3 === span && row._4 === wsum, s"user $u sums diverge")
      assert(row._5 === wsum.toDouble / span.toDouble, s"user $u twap")
      val cents = sorted.map(_._3)
      assert(row._5 >= cents.min.toDouble - 1e-9 &&
        row._5 <= cents.max.toDouble + 1e-9, s"user $u twap out of range")
    }
    // single-event users are excluded, not divided by zero
    val single = events.groupBy(_._1).filter(_._2.length == 1).keySet
    assert(single.intersect(got.map(_._1).toSet).isEmpty)
  }

  test("q148 ANALYZE stats: counts match direct per-column queries") {
    val got = graft.queries.Advanced.q148AnalyzeStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.keySet === graft.queries.Advanced.AnalyzeColumns.toSet)
    graft.queries.Advanced.AnalyzeColumns.foreach { case (t, c) =>
      val df = Tables.load(spark, sf, t)
      val expect = (df.count(),
        df.filter(col(c).isNull).count(),
        df.filter(col(c).isNotNull).select(col(c)).distinct().count())
      assert(got((t, c)) === expect, s"$t.$c stats diverge")
      assert(got((t, c))._3 <= got((t, c))._1, s"$t.$c ndv exceeds rows")
    }
  }

  test("q149 PIT join: every purchase matches exactly one validity interval") {
    val rows = graft.queries.Advanced.q149PitJoin(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // SCD2 intervals partition each user's timeline from their first event,
    // and a purchase IS an event, so every purchase joins exactly once
    val nPurchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_._2).sum === nPurchases,
      "temporal join must match each purchase exactly once")
    // a purchase's tier at its own time is its own observed tier: the
    // roll-up must equal grouping purchases by their own value tier
    val direct = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(floor(col("value") / 50.0).cast("int").as("tier"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    rows.foreach { case (tier, n, _) =>
      assert(direct(tier) === n, s"tier $tier diverges from direct grouping")
    }
  }

  test("q150 unpivot: pivot→stack is the identity on long-form counts") {
    val rows = graft.queries.Advanced.q150Unpivot(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val direct = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows === direct, "unpivot is not the pivot inverse")
    assert(rows.values.sum === Tables.orders(spark, sf).count())
  }

  test("q151 item similarity: metrics agree with q110 supports and bounds") {
    val rows = graft.queries.Advanced.q151ItemSimilarity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    // same pair universe and supports as q110
    val supports = graft.queries.Advanced.q110ItemsetPairs(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(rows.map(r => (r._1, r._2)).toSet === supports.keySet)
    rows.foreach { case (ta, tb, cab, ca, cb, n, cos, lift) =>
      assert(supports((ta, tb)) === cab, s"($ta,$tb) support diverges")
      assert(cab <= math.min(ca, cb), s"($ta,$tb) support exceeds margin")
      assert(ca <= n && cb <= n)
      assert(cos > 0.0 && cos <= 1.0, s"($ta,$tb) cosine out of range")
      assert(cos === cab.toDouble / math.sqrt((ca * cb).toDouble))
      assert(lift === (cab * n).toDouble / (ca * cb).toDouble)
    }
    // a meaningful fixture has both positively and negatively associated
    // pairs (lift straddles 1)
    assert(rows.exists(_._8 > 1.0) || rows.exists(_._8 < 1.0))
  }

  test("q152 conversion latency: quartiles and rate match a replay") {
    val r = graft.queries.Advanced.q152ConversionLatency(spark, sf)
      .collect()
    assert(r.length === 1)
    val row = r.head
    val (nS, nC) = (row.getLong(0), row.getLong(1))
    assert(nC <= nS && nC > 0)
    assert(row.getDouble(2) === nC.toDouble / nS)
    // replay: first signup → first subsequent purchase per user
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val byUser = evs.groupBy(_._1)
    val lats = byUser.flatMap { case (_, es) =>
      val s0 = es.filter(_._2 == "signup").map(_._3).sorted.headOption
      s0.flatMap { s =>
        es.filter(e => e._2 == "purchase" && e._3 >= s).map(_._3)
          .sorted.headOption.map(_ - s)
      }
    }.toArray.sorted
    assert(lats.length.toLong === nC)
    def q(p: Double): Double = {
      val h = (lats.length - 1) * p
      val lo = math.floor(h).toInt; val hi = math.ceil(h).toInt
      (1 - (h - lo)) * lats(lo) + (h - lo) * lats(hi)
    }
    assert(row.getDouble(3) === q(0.25) && row.getDouble(4) === q(0.5) &&
      row.getDouble(5) === q(0.75), "quartiles diverge from replay")
    assert(lats.forall(_ >= 0L))
  }

  test("unionByName aligns schemas by name, not position") {
    import SparkSpec.spark.implicits._
    val a = Seq((1L, "x")).toDF("id", "tag")
    val b = Seq(("y", 2L)).toDF("tag", "id") // reversed column order
    val u = a.unionByName(b).orderBy("id").collect()
    assert(u.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "x"), (2L, "y")))
  }

  test("sortWithinPartitions orders locally without a global exchange") {
    val df = Tables.lineitem(spark, sf)
      .repartition(4, col("l_returnflag"))
      .sortWithinPartitions(col("l_quantity"))
    // no range-exchange (global sort) in the plan — only the hash repartition
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"), plan)
    // each partition is locally sorted
    import SparkSpec.spark.implicits._
    val ok = df.select(col("l_quantity"))
      .mapPartitions { it =>
        val xs = it.map(_.getDouble(0)).toArray
        Iterator.single(xs.sameElements(xs.sorted))
      }.collect()
    assert(ok.forall(identity))
  }

  test("q16 sessions partition all events") {
    val total = Core.q16Sessionize(spark, sf)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("q16 session gaps respect the 30-minute rule") {
    val sess = Core.q16Sessionize(spark, sf)
      .orderBy(col("user_id"), col("session_idx")).collect()
    sess.groupBy(_.getAs[Long]("user_id")).values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("session_idx"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gap = b.getAs[java.sql.Timestamp]("session_start").getTime -
            a.getAs[java.sql.Timestamp]("session_end").getTime
          assert(gap > 30 * 60 * 1000L,
            s"consecutive sessions closer than 30min for user ${a.get(0)}")
        case _ =>
      }
    }
  }

  test("q105: variant-typed extraction agrees with the string-JSON path") {
    import org.apache.spark.sql.functions._
    val viaVariant = graft.queries.Advanced.q105Variant(spark, sf)
      .select("event_type", "n", "k_sum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaString = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), sum(col("k")).as("k_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaVariant === viaString,
      "variant binary path diverges from get_json_object")
  }

  test("q171: Welch z replays driver-side from exact sufficient statistics") {
    val perUser = Tables.events(spark, sf)
      .selectExpr("user_id",
        "case when event_type = 'purchase' " +
          "then cast(floor(value * 100) as long) else 0L end as c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, rs) => u -> rs.map(_._2).sum }
    def bucket(u: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val hex = h.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 1000
    }
    val (a, b) = perUser.partition { case (u, _) => bucket(u) < 500 }
    def stats(xs: Iterable[Long]) =
      (xs.size.toLong, xs.sum, xs.map(x => x * x).sum)
    val (na, sa, ssa) = stats(a.values)
    val (nb, sb, ssb) = stats(b.values)
    def mean(s0: Long, n: Long) = s0.toDouble / n.toDouble
    def vr(s0: Long, ss: Long, n: Long) =
      (ss.toDouble - s0.toDouble * s0.toDouble / n.toDouble) / (n - 1).toDouble
    val z = (mean(sa, na) - mean(sb, nb)) /
      math.sqrt(vr(sa, ssa, na) / na.toDouble + vr(sb, ssb, nb) / nb.toDouble)
    val r = graft.queries.Advanced.q171AbTest(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((na, sa, nb, sb)))
    assert(r.getDouble(4) === mean(sa, na) && r.getDouble(5) === mean(sb, nb))
    assert(r.getDouble(6) === z, "z-statistic diverges from driver replay")
    // the experiment fixture must be non-degenerate: both arms populated,
    // finite z (nonzero variance)
    assert(na > 1 && nb > 1 && !z.isNaN && !z.isInfinite)
  }

  test("q172: CUPED moments and coefficients replay driver-side") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as us",
        "cast(floor(value * 100) as long) as cents").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val perUser = ev.groupBy(_._1).map { case (u, rs) =>
      val p = rs.filter(e => e._2 == "purchase")
      (u, p.filter(_._3 < mid).map(_._4).sum, p.filter(_._3 >= mid).map(_._4).sum)
    }.toSeq
    val n = perUser.size.toLong
    val (s1, s2) = (perUser.map(_._2).sum, perUser.map(_._3).sum)
    val s11 = perUser.map(t => t._2 * t._2).sum
    val s12 = perUser.map(t => t._2 * t._3).sum
    val s22 = perUser.map(t => t._3 * t._3).sum
    val nm1 = (n - 1).toDouble
    val cov = (s12.toDouble - s1.toDouble * s2.toDouble / n.toDouble) / nm1
    val varp = (s11.toDouble - s1.toDouble * s1.toDouble / n.toDouble) / nm1
    val varq = (s22.toDouble - s2.toDouble * s2.toDouble / n.toDouble) / nm1
    val r = graft.queries.Advanced.q172Cuped(spark, sf).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) === ((n, s1, s2, s11, s12, s22)))
    assert(r.getDouble(6) === cov / varp, "theta diverges")
    assert(r.getDouble(7) === (cov * cov) / (varp * varq), "rho2 diverges")
    // CUPED is only worth running when pre predicts post at all, and
    // rho2 must be a valid squared correlation
    val rho2 = r.getDouble(7)
    assert(rho2 > 0.0 && rho2 <= 1.0, s"rho2 $rho2 out of range")
  }

  test("q175: features see only the pre-window, labels only the post-window") {
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as us",
        "cast(floor(value * 100) as long) as cents",
        "cast(to_date(ts) as string) as d").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val mid = (ev.map(_._3).min + ev.map(_._3).max) / 2
    val expect = ev.groupBy(_._1).flatMap { case (u, rs) =>
      val pre = rs.filter(_._3 < mid)
      if (pre.isEmpty) None else Some(u -> ((
        pre.length.toLong,
        pre.count(_._2 == "purchase").toLong,
        pre.filter(_._2 == "purchase").map(_._4).sum,
        pre.map(_._5).distinct.length.toLong,
        mid - pre.map(_._3).max,
        if (rs.exists(e => e._3 >= mid &&
          e._3 < mid + (ev.map(_._3).max - ev.map(_._3).min) / 16 &&
          e._2 == "purchase")) 1L else 0L)))
    }
    val rows = graft.queries.Advanced.q175TrainLabels(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(rows.keySet === expect.keySet,
      "observed-user set diverges (unobserved users must be excluded)")
    expect.foreach { case (u, e) => assert(rows(u) === e, s"user $u") }
    // the label must be learnable: both classes present, and features
    // must be non-degenerate (recency positive, activity positive)
    assert(rows.values.exists(_._6 == 1L) && rows.values.exists(_._6 == 0L),
      "single-class label — fixture degenerate")
    rows.values.foreach { t => assert(t._5 > 0 && t._1 > 0) }
  }

  test("q177: daily SRM replays driver-side; arms close over daily actives") {
    def bucket(u: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) % 1000
    }
    val act = Tables.events(spark, sf)
      .selectExpr("cast(to_date(ts) as string) as d", "user_id")
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = act.groupBy(_._1).map { case (d, us) =>
      val na = us.count(u => bucket(u._2) < 500).toLong
      d -> ((na, us.length - na,
        ((na - (us.length - na)) * (na - (us.length - na))).toDouble /
          us.length))
    }
    val rows = graft.queries.Advanced.q177SrmCheck(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (d, e) => assert(rows(d) === e, s"day $d") }
    // a healthy 50/50 split: chi2 must stay small on most days (3.84 is
    // the 5% critical value; the fixture is genuinely balanced)
    assert(rows.values.count(_._3 < 3.84) * 2 > rows.size,
      "majority of days flag SRM — assignment hash broken?")
  }

  test("q179: Poisson-bootstrap replicates replay driver-side bit-exactly") {
    def bucket(s: String, m: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) % m
    }
    def pois(b: Long): Long =
      if (b < 3679) 0L else if (b < 7358) 1L else if (b < 9197) 2L
      else if (b < 9810) 3L else if (b < 9963) 4L else 5L
    val perUser = Tables.events(spark, sf)
      .selectExpr("user_id",
        "cast(case when event_type = 'purchase' " +
          "then cast(floor(value * 100) as long) else 0 end as long) as c")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.sum("c").as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expect = (0 until 32).map { rep =>
      val ws = perUser.map { case (u, x) =>
        val w = pois(bucket(s"$u:$rep", 10000L)); (w, w * x)
      }
      val nEff = ws.map(_._1).sum
      val tot = ws.map(_._2).sum
      rep.toLong -> ((nEff, tot, tot.toDouble / nEff.toDouble))
    }.toMap
    val rows = graft.queries.Advanced.q179BootstrapCi(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
    assert(rows.length === 32)
    rows.foreach { case (rep, (n, t, m, _)) =>
      assert(expect(rep) === ((n, t, m)), s"rep $rep")
    }
    // rk is a permutation of 1..32 consistent with the (mean, rep) order
    assert(rows.map(_._2._4).sorted.sameElements(1L to 32L))
    val byRk = rows.sortBy(_._2._4).map(r => (r._2._3, r._1))
    assert(byRk.sameElements(byRk.sortBy(identity)),
      "rank column disagrees with the (mean, rep) order")
    // the bootstrap must show genuine spread: the CI selection (ranks 2
    // and 31) is vacuous if all replicate means collapse
    assert(rows.map(_._2._3).distinct.length > 16,
      "replicate means collapsed — weight derivation broken?")
  }

  test("q199: estimate formula replays; PK-FK joins are estimated exactly") {
    val rows = graft.queries.Advanced.q199CardinalityAudit(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(rows.keySet ===
      graft.queries.Advanced.CardJoins.map(_._1).toSet)
    rows.foreach { case (name, (nl, nr, dl, dr, est, actual, ppm)) =>
      assert(est === nl * nr / math.max(dl, dr), s"$name est formula")
      assert(ppm === (est - actual) * 1000000L / actual, s"$name ppm formula")
      assert(actual > 0, s"$name join is empty — audit vacuous")
    }
    // on a PK-FK join whose FK side references only existing keys, the
    // containment rule is EXACT: est == actual == |FK side|
    for (j <- Seq("orders_customer", "lineitem_part", "customer_nation")) {
      val (nl, _, _, _, est, actual, ppm) = rows(j)
      assert(est === actual && actual === nl && ppm === 0L, s"$j not exact")
    }
    // the Zipf-ish self-join must show the uniformity assumption failing
    assert(rows("events_events")._7 != 0L,
      "skewed self-join estimated exactly — the audit can't demonstrate drift")
  }

  test("q200: OLS moments replay driver-side; fit is exact on a planted line") {
    val rows = graft.queries.Advanced.q200GroupTrend(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mxy, mxx, myy) = (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))
      val slope = r.getDouble(5); val r2 = r.getDouble(7)
      assert(mxx > 0 && myy >= 0 && n >= 2)
      assert(slope === mxy.toDouble / mxx)
      assert(r2 === (mxy.toDouble * mxy) / (mxx.toDouble * myy))
      assert(r2 >= 0.0 && r2 <= 1.0 + 1e-12, s"r2 out of range: $r2")
    }
    // exactness witness: replay one group's daily sums driver-side
    val daily = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), dayofmonth(col("ts")).cast("long").as("x"),
        expr("bigint(round(value * 100))").as("c"))
      .groupBy(col("event_type"), col("x"))
      .agg(sum(col("c")).as("y")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val et = rows.head.getString(0)
    val pts = daily.filter(_._1 == et).map(t => (t._2, t._3))
    val n = pts.length.toLong
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxy = pts.map(t => t._1 * t._2).sum
    val sxx = pts.map(t => t._1 * t._1).sum
    assert(rows.head.getLong(2) === n * sxy - sx * sy, "m_xy replay")
    assert(rows.head.getLong(3) === n * sxx - sx * sx, "m_xx replay")
  }

  test("q204: association invariants hold; pairs are canonical and complete") {
    val rows = graft.queries.Advanced.q204BasketLift(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, na, nb, nab, ns, lift) =>
      assert(a < b, "pair not canonical (a < b)")
      assert(nab >= 1 && nab <= math.min(na, nb), s"($a,$b) support bounds")
      assert(na <= ns && nb <= ns)
      assert(lift === (nab * ns).toDouble / (na * nb), s"($a,$b) lift formula")
    }
    // every pair of types that ever co-occurs appears exactly once
    assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length)
  }

  test("q206: EWMA recurrence replays driver-side; alerts use the prior baseline") {
    val rows = graft.queries.Advanced.q206EwmaMonitor(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (t, series0) =>
      val series = series0.sortBy(_._2)
      var s = series.head._3 // s_1 = n_1
      assert(series.head._4 === s && !series.head._5, s"$t day 1")
      series.tail.foreach { case (_, d, n, ewma, alert) =>
        val expectAlert = n * graft.queries.Advanced.EwmaSpikeDen >
          s * graft.queries.Advanced.EwmaSpikeNum
        assert(alert === expectAlert, s"$t day $d alert vs baseline $s")
        s = (n + (graft.queries.Advanced.EwmaDen - 1) * s) /
          graft.queries.Advanced.EwmaDen
        assert(ewma === s, s"$t day $d ewma")
      }
    }
  }

  test("q207: two-phase running max equals the naive arrival walk; drops monotone") {
    import graft.queries.Advanced
    val rows = Advanced.q207WatermarkAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1) === Advanced.WatermarkHorizonsSec)
    // driver replay: jittered arrival order, naive running max
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map { r =>
        val id = r.getLong(0); val us = r.getLong(1)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val j = java.lang.Long.parseLong(md.substring(0, 8), 16) %
          (2 * Advanced.ArrivalJitterUs) - Advanced.ArrivalJitterUs
        (us + j, id, us)
      }.sortBy(t => (t._1, t._2))
    var hi = Long.MinValue
    val lates = ev.map { case (_, _, us) =>
      hi = math.max(hi, us); hi - us
    }
    rows.foreach { case (h, n, dropped, share) =>
      assert(n === ev.length.toLong)
      assert(dropped === lates.count(_ > h * 1000000L).toLong, s"horizon $h")
      assert(share === dropped.toDouble / n)
    }
    // longer horizon can only drop fewer; the audit must be non-vacuous
    assert(rows.map(_._3).sameElements(rows.map(_._3).sorted.reverse))
    assert(rows.head._3 > 0, "no event is ever late — audit vacuous")
  }

  test("q208: encoding costs replay driver-side; unique keys stay plain") {
    val rows = graft.queries.Advanced.q208EncodingAdvisor(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    assert(rows.keySet ===
      graft.queries.Advanced.EncodingColumns.map(t => (t._1, t._2)).toSet)
    // replay one string column exactly
    val flags = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_returnflag")).collect().map(_.getString(0))
    val (n, ndv) = (flags.length.toLong, flags.distinct.length.toLong)
    val plain = flags.map(_.length.toLong).sum
    val bits = math.ceil(math.log(ndv.toDouble) / math.log(2)).toLong
    val dict = flags.distinct.map(_.length.toLong).sum + (n * bits + 7) / 8
    assert(rows(("lineitem", "l_returnflag")) === ((n, ndv, plain, dict, true)))
    rows.foreach { case (k, (nn, nd, pb, db, rec)) =>
      assert(nd <= nn && pb > 0 && db > 0)
      assert(rec === (db < pb), s"$k recommendation inconsistent")
    }
    // a unique key gains nothing from a dictionary
    assert(!rows(("orders", "o_orderkey"))._5,
      "dictionary recommended for a unique key")
    assert(rows(("events", "event_type"))._5,
      "dictionary NOT recommended for a 5-value string column")
  }

  test("q210: KS statistic replays driver-side; verdict is the exact rational rule") {
    import graft.queries.Advanced
    val rows = Advanced.q210KsDrift(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))).toMap
    assert(rows.nonEmpty)
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"), expr("bigint(round(value * 100))").as("c"),
        (dayofmonth(col("ts")) <= 15).as("h1")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    rows.foreach { case (t, (n1, n2, a, d, reject)) =>
      val g = ev.filter(_._1 == t)
      val s1 = g.filter(_._3).map(_._2)
      val s2 = g.filterNot(_._3).map(_._2)
      assert(n1 === s1.length.toLong && n2 === s2.length.toLong)
      val support = (s1 ++ s2).distinct.sorted
      val expA = support.map { v =>
        math.abs(s1.count(_ <= v).toLong * n2 - s2.count(_ <= v).toLong * n1)
      }.max
      assert(a === expA, s"$t KS numerator")
      assert(d === a * 1000000L / (n1 * n2))
      assert(reject === (a * a >
        Advanced.KsCrit2Num * (n1 + n2) * n1 * n2 / Advanced.KsCrit2Den))
      assert(d >= 0 && d <= 1000000L)
    }
    // both halves come from one generator: the test must NOT reject
    assert(rows.values.forall(!_._5), "false positive on identical dists")
  }

  test("q213: chi-square replays driver-side in the same fold order") {
    import graft.queries.Advanced
    val Seq(row) = Advanced.q213Chi2Independence(spark, sf).collect().toSeq
    val (n, nCells, dof, chi2, crit, reject) = (row.getLong(0),
      row.getLong(1), row.getLong(2), row.getDouble(3), row.getDouble(4),
      row.getBoolean(5))
    val ev = graft.tables.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("datediff(to_date(ts), to_date('1970-01-01')) % 7").as("wd"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val cells = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rm = ev.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cm = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val nn = ev.length.toLong
    assert(n === nn && nCells === cells.size.toLong)
    // Chi2Crit24 is the 24-dof critical value: the fixture must occupy
    // the full 5-type × 7-weekday table for the literal to apply, and
    // dof is now DERIVED from the margins — so a vocabulary change
    // fails here, not silently in the verdict.
    assert(nCells === 35L, "fixture contingency table no longer 5x7")
    assert(dof === 24L, "derived dof disagrees with the crit_05 literal")
    // identical fold order: cells sorted by (type, weekday)
    var acc = 0.0
    cells.toSeq.sortBy(_._1).foreach { case ((t, wd), o) =>
      val num = o * nn - rm(t) * cm(wd)
      acc += (num.toDouble * num) / (nn.toDouble * rm(t) * cm(wd))
    }
    assert(chi2 === acc, "fold-order replay mismatch")
    assert(reject === (chi2 > crit))
    // the uniform generator must not fake a weekday dependence
    assert(!reject, s"false positive: chi2 $chi2 vs $crit")
    assert(chi2 > 5.0, "statistic collapsed — margins wiring?")
  }
}
