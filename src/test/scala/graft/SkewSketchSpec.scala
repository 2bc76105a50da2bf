package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.queries.Sketches
import graft.tables.Tables

class SkewSketchSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of big-side rows share key 1 — the classic hot key
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong % 7 else 1L, i))
      .toDF("k", "v")
    val small = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() === plain.count())
    assert(plain.exceptAll(salted.select(plain.columns.map(col).toIndexedSeq: _*))
      .count() === 0)
  }

  test("q36: exact columns match recount; estimate flags all true") {
    val rows = Sketches.q36Approx(spark, sf).collect()
    assert(rows.length === 3)
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_suppkey")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val (p, s) = exact(r.getString(0))
      assert(r.getLong(2) === p && r.getLong(3) === s, r.toString)
      assert(r.getBoolean(4), s"parts estimate outside 5%: $r")
      assert(r.getBoolean(5), s"supps estimate outside 5%: $r")
      assert(r.getBoolean(6), s"median estimate outside 5%: $r")
    }
  }

  test("q37: exact column matches recount; merged-sketch flag all true") {
    val rows = Sketches.q37HllSketch(spark, sf).collect()
    assert(rows.length === 3)
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)), r.toString)
      assert(r.getBoolean(2), s"merged HLL estimate outside 5%: $r")
    }
  }

  test("q123: CMS never underestimates; exact count column is exact") {
    val rows = Sketches.q123CmsHeavyHitters(spark, sf).collect()
    assert(rows.length === 20)
    val exact = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === exact(r.getString(0)), r.toString)
      // one-sided error: est >= exact, always — THE CMS contract
      assert(r.getLong(3) >= r.getLong(2), s"CMS underestimated: $r")
      assert(r.getLong(4) === r.getLong(3) - r.getLong(2))
    }
    // width < vocabulary forces collisions: some probes overestimate,
    // and depth-4 row isolation keeps others exact — both branches live
    assert(rows.exists(_.getLong(4) > 0), "no collision — sketch degenerate")
    assert(rows.exists(_.getLong(4) === 0), "every probe collided everywhere")
  }

  test("q165: estimates carry their certified bound; exact arm is the true order statistic") {
    val cents = Tables.events(spark, sf)
      .selectExpr("cast(floor(value * 100) as long) as c", "event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (c, id) => (c, id) }.map(_._1)
    val n = cents.length.toLong
    val w = (cents.max - cents.min) / Sketches.QsBuckets + 1
    val rows = Sketches.q165QuantileSketch(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (p, t, est, bound, exact, within) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(t === (p * n + 99) / 100)
      assert(exact === cents((t - 1).toInt), s"p$p exact order statistic")
      assert(bound === w - 1, s"p$p bound must be one bucket width")
      // the theorem: the true quantile lies inside the picked bucket
      assert(est <= exact && exact <= est + bound, s"p$p outside bucket")
      assert(within === 1L)
    }
    // the sketch must actually be approximate somewhere (est < exact for
    // at least one probe) or the bucket-edge estimate degenerated
    assert(rows.exists(r => r.getLong(2) < r.getLong(4)),
      "every estimate exact — bucket width 1? corpus degenerate?")
  }

  test("q187: AMS sketch replays driver-side; median lane lands near F2") {
    // estimator j's sign = bit j of md5(shingle): hex nibble (j div 4),
    // bit (j mod 4) — one digest supplies all 32 draws (mirrors q187)
    def sign(j: Long, sh: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(sh.getBytes("UTF-8")).map(x => f"${x & 0xff}%02x").mkString
      val nib = Integer.parseInt(hex.charAt((j / 4).toInt).toString, 16)
      if (((nib >> (j % 4).toInt) & 1) == 0) 1L else -1L
    }
    val dfs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val w = r.getString(1).split(" ")
        if (w.length < 3) Nil
        else w.sliding(3).map(_.mkString(" ")).toSeq.distinct
          .map(sh => (r.getLong(0), sh))
      }
      .groupBy(_._2).map { case (sh, occ) => sh -> occ.length.toLong }
    val exact = dfs.values.map(d => d * d).sum
    val xs = (0L until 32L).map { j =>
      j -> dfs.map { case (sh, d) => d * sign(j, sh) }.sum
    }
    val gmeans = xs.groupBy(_._1 / 8).map { case (g, js) =>
      g -> js.map { case (_, x) => x * x }.sum / 8
    }
    val sorted = gmeans.toSeq.sortBy { case (g, e) => (e, g) }.map(_._2)
    val medEst = (sorted(1) + sorted(2)) / 2
    val expect = (gmeans.map { case (g, e) => g.toLong -> e } +
      (-1L -> medEst)).map { case (g, e) =>
        g -> ((e, exact, math.abs(e - exact) * 1000000L / exact))
      }
    val rows = Sketches.q187AmsF2(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (g, e) => assert(rows(g) === e, s"grp $g") }
    // the sketch's whole claim: the median lane estimates F2 — within
    // 50% on this corpus (deterministic given the fixed signs), where a
    // single estimator can be arbitrarily off
    assert(rows(-1L)._3 < 500000L,
      s"median-of-means off by ${rows(-1L)._3} ppm")
  }

  test("q195: KMV sketch replays driver-side; theta algebra is consistent") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.q195KmvTheta(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows.keySet === Set("src0", "src1", "union", "intersect"))
    assert(rows.values.forall(_._3), s"a within flag is false: $rows")
    // driver replay: distinct 5-gram hashes per source from first principles
    val docs = graft.tables.Tables.documents(spark, sf)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def h52(sgl: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(sgl.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 13), 16)
    }
    def hashes(src: String): Set[Long] = docs.filter(_._1 == src).flatMap {
      case (_, text) =>
        val w = text.split(" ", -1)
        if (w.length < 5) Seq.empty
        else (0 to w.length - 5).map(i => h52(w.slice(i, i + 5).mkString(" ")))
    }.toSet
    val (ha, hb) = (hashes("src0"), hashes("src1"))
    def est(s: Set[Long]): Long = {
      val mins = s.toSeq.sorted.take(Sketches.KmvK)
      if (mins.size < Sketches.KmvK) mins.size.toLong
      else (Sketches.KmvK - 1).toLong * Sketches.KmvSpace / mins.last
    }
    assert(rows("src0")._1 === ha.size.toLong)
    assert(rows("src1")._1 === hb.size.toLong)
    assert(rows("union")._1 === (ha ++ hb).size.toLong)
    assert(rows("intersect")._1 === (ha intersect hb).size.toLong)
    assert(rows("src0")._2 === est(ha))
    assert(rows("src1")._2 === est(hb))
    // merged sketch == sketch of union (k-min of k-mins property)
    val merged = (ha.toSeq.sorted.take(Sketches.KmvK) ++
      hb.toSeq.sorted.take(Sketches.KmvK)).toSet
    assert(rows("union")._2 === est(merged))
    assert(est(merged) === est(ha ++ hb),
      "merging sketches must equal sketching the union")
  }

  test("q205: rolling distinct replays driver-side; every estimate in envelope") {
    import org.apache.spark.sql.functions._
    val rows = Sketches.q205RollingDistinct(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3), s"an estimate escaped 5%: ${rows.mkString(",")}")
    // EPOCH days, matching the query's fixed key (dayofmonth conflated
    // months — see q205's comment)
    val du = graft.tables.Tables.events(spark, sf)
      .select(expr("datediff(to_date(ts), to_date('1970-01-01'))")
        .cast("long").as("d"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val minDay = du.map(_._1).min
    rows.foreach { case (day, exact, _) =>
      assert(day >= minDay + Sketches.RollDays - 1)
      val expect = du.filter(t => t._1 > day - Sketches.RollDays &&
        t._1 <= day).map(_._2).distinct.length.toLong
      assert(exact === expect, s"day $day exact rolling distinct")
    }
  }
}
