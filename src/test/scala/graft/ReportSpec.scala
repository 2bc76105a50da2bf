package graft

import org.apache.spark.sql.functions._
import graft.ext.Report
import graft.queries.Advanced
import graft.tables.Tables

/** Invariants for the reporting operators (q101–q103) beyond the
  * value-exact oracle: card totals reconcile with the corpus, the bitmap
  * count IS the exact distinct count, and the lateral decorrelation
  * equals the window spelling. */
class ReportSpec extends SparkSpec {
  import SparkSpec.{spark, sf}

  test("q101: card totals reconcile with whole-corpus counts") {
    val rows = Report.sourceReport(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    assert(rows.map(_.getLong(1)).sum == docs.count(), "n_docs mismatch")
    val totalTokens = docs
      .agg(sum(size(split(col("text"), " ")).cast("long"))).head.getLong(0)
    assert(rows.map(_.getLong(2)).sum == totalTokens, "n_tokens mismatch")
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(6), "types cannot exceed instances")
      assert(r.getLong(3) <= r.getLong(1) && r.getLong(4) <= r.getLong(1))
    }
  }

  test("q103: bitmap popcount equals exact countDistinct of the buckets") {
    val bitmap = Report.bitmapDistinct(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val exact = Tables.documents(spark, sf)
      .select(col("source"), graft.ext.Text.md5Bucket(col("text"),
        Report.BitmapBuckets).as("bucket"))
      .groupBy(col("source"))
      .agg(countDistinct(col("bucket")).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bitmap === exact,
      "bitmap distinct diverges from countDistinct — the exactness claim")
  }

  test("q104: predicted candidate pairs equals the join actually run") {
    val predicted = Report.selfJoinSize(spark, sf).head.getLong(1)
    val idx = graft.ext.Text.shingleIndexOf(Tables.documents(spark, sf))
    val actual = idx.select(col("doc_id").as("a"), col("shingle"))
      .join(idx.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b"))
      .count()
    assert(predicted == actual,
      s"predicted $predicted != actual self-join output $actual")
  }

  test("q102: lateral subquery equals the window top-N formulation") {
    import org.apache.spark.sql.expressions.Window
    val lateral = Advanced.q102LateralTopN(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val counts = Tables.nation(spark, sf)
      .join(Tables.customer(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
    val w = Window.partitionBy(col("n_regionkey")).orderBy(col("n_name"))
    val windowed = counts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .join(Tables.region(spark, sf),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("r_name"), col("n_name"), col("n_customers"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(lateral === windowed, "lateral decorrelation diverges from window")
  }

  test("q141: anonymity classes partition the corpus and flags fire correctly") {
    val rows = graft.ext.Report.kAnonymity(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    // classes are distinct and partition every non-null-text document
    assert(rows.map(t => (t._1, t._2, t._3)).distinct.length === rows.length)
    val n = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).count()
    assert(rows.map(_._4).sum === n, "class sizes must partition the corpus")
    rows.foreach { case (_, _, _, k, l, kv, lv) =>
      assert(l <= k, "distinct sensitive values cannot exceed class size")
      assert(kv === (k < graft.ext.Report.AnonK), "k flag wrong")
      assert(lv === (l < graft.ext.Report.AnonL), "l flag wrong")
    }
    // the audit is only meaningful if both outcomes occur on the fixture
    assert(rows.exists(_._6) || rows.exists(_._7), "no violations — vacuous")
    assert(rows.exists(r => !r._6 && !r._7), "everything violates — vacuous")
  }

  test("q168: coverage arithmetic closes over corpus and index totals") {
    val nDocs = Tables.documents(spark, sf).count()
    val nVecs = Tables.embeddings(spark, sf).count()
    val rows = Report.indexCoverage(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val (orph, srcs) = rows.partition(_._1 == "_orphans")
    assert(orph.length === 1)
    srcs.foreach { case (src, n, ix, un) =>
      assert(ix + un === n, s"$src: indexed+unindexed != n_docs")
      assert(ix >= 0 && un >= 0)
    }
    assert(srcs.map(_._2).sum === nDocs, "source rows must cover the corpus")
    // every vector is either matched to a doc or an orphan
    assert(srcs.map(_._3).sum + orph.head._2 === nVecs,
      "indexed + orphans must cover the vector index")
  }

  test("q209: seeded Laplace noise replays driver-side; scale matches ε") {
    import org.apache.spark.sql.functions._
    val rows = graft.ext.Report.dpRelease(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (t, d, n, noisy, err) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$t|$d".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.substring(0, 13), 16)
      val u = (h + 0.5) / (1L << 52).toDouble
      val lap = -math.signum(u - 0.5) * math.log(1.0 - 2.0 * math.abs(u - 0.5))
      assert(noisy === n + math.round(lap), s"cell ($t,$d) noise replay")
      assert(err === math.abs(noisy - n))
    }
    // Laplace(1): E|noise| = 1 — the empirical mean must sit near it,
    // and both signs must occur (a one-sided bug halves the protection)
    val meanAbs = rows.map(_._5).sum.toDouble / rows.length
    assert(meanAbs > 0.4 && meanAbs < 2.5, s"noise scale off: $meanAbs")
    assert(rows.exists(r => r._4 > r._3) && rows.exists(r => r._4 < r._3),
      "noise never goes one of the directions")
  }

  test("q249: median/MAD/outlier-count equal a driver-side replay, and " +
      "the fence is robust (outliers are a small minority per type)") {
    def lowerMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(((s.size + 1) / 2 - 1).max(0))
    }
    val rows = Tables.events(spark, sf)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val expected = rows.groupBy(_._1).map { case (t, vs0) =>
      val vs = vs0.map(_._2).toSeq
      val med = lowerMedian(vs)
      val dev = vs.map(v => math.abs(v - med))
      val mad = lowerMedian(dev)
      t -> (vs.size.toLong, med, mad,
        dev.count(_ > Report.MadK * mad).toLong)
    }
    val got = Report.robustOutliers(spark, sf).collect().map { r =>
      r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Double]("med"),
        r.getAs[Double]("mad"), r.getAs[Long]("n_outliers"))
    }.toMap
    assert(got === expected)
    got.foreach { case (t, (n, _, mad, out)) =>
      assert(mad > 0, s"$t: degenerate MAD")
      assert(out < n / 4, s"$t: fence flags $out of $n — not robust")
    }
  }
}
