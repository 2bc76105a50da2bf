package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions.col
import graft.ext.Dedup
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import graft.ops.Det

/** Property-style tests over scalacheck generators (no scalatestplus
  * bridge in the offline deps — generators sampled with fixed seeds, so
  * runs are deterministic). */
class PropertySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g(Gen.Parameters.default, Seed(seed)).get

  private val wordGen = Gen.oneOf((1 to 40).map(i => s"tok$i"))
  private val docGen: Gen[String] =
    Gen.chooseNum(20, 80).flatMap(n => Gen.listOfN(n, wordGen))
      .map(_.mkString(" "))

  test("minhash estimate tracks true shingle Jaccard (±0.3)") {
    (1 to 8).foreach { i =>
      val doc = sample(docGen, i)
      val edits = sample(Gen.chooseNum(0, 10), i + 100)
      val words = doc.split(" ")
      val mutated = words.zipWithIndex.map { case (w, j) =>
        if (j < edits) s"mut$j" else w
      }.mkString(" ")
      def sh(s: String) = {
        val w = s.split(" ")
        (1 to math.max(w.length - 2, 1)).map { k =>
          Seq(w(k - 1), w(math.min(k, w.length - 1)),
            w(math.min(k + 1, w.length - 1))).mkString(" ")
        }.toSet
      }
      val (a, b) = (sh(doc), sh(mutated))
      val trueJ = (a & b).size.toDouble / (a | b).size
      val docs = Seq((0L, doc), (1L, mutated)).toDF("doc_id", "text")
      val est = Dedup.minhashPairsOf(docs, 0.0).collect()
        .headOption.map(_.getAs[Double]("est_jaccard")).getOrElse(0.0)
      // banding can miss low-similarity pairs; assert only where a band
      // collision is overwhelmingly likely
      if (trueJ >= 0.4)
        assert(math.abs(est - trueJ) <= 0.3,
          s"seed $i: est $est vs true $trueJ (edits=$edits)")
    }
  }

  test("simhash: identical text → identical fingerprint") {
    (1 to 8).foreach { i =>
      val doc = sample(docGen, i)
      val fps = Seq((0L, doc), (1L, doc)).toDF("doc_id", "text")
        .select(simhash64(col("text"))).collect().map(_.getLong(0))
      assert(fps(0) === fps(1), s"seed $i")
    }
  }

  test("cosine_sim is symmetric and in [-1, 1]") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-5.0f, 5.0f))
      .suchThat(_.exists(_ != 0.0f))
    (1 to 10).foreach { i =>
      val a = sample(vecGen, i).toArray
      val b = sample(vecGen, i + 1000).toArray
      val r = Seq((a, b)).toDF("a", "b")
        .select(cosine_sim(col("a"), col("b")).as("ab"),
          cosine_sim(col("b"), col("a")).as("ba")).collect()(0)
      val (ab, ba) = (r.getDouble(0), r.getDouble(1))
      assert(ab === ba, s"seed $i")
      assert(ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9, s"seed $i: $ab")
    }
  }

  test("int8 quantization preserves cosine similarity (>0.99 to original)") {
    // dequantized vectors must stay nearly parallel to the originals —
    // the fidelity contract behind storing embeddings at ¼ the bytes
    val e = graft.tables.Tables.embeddings(spark, sf).limit(50)
    val q = graft.ext.Similarity.quantizeInt8(spark, sf)
      .limit(50).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(",").map(_.toFloat))
      .toMap
    val orig = e.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    q.foreach { case (id, dq) =>
      val o = orig(id)
      var dot = 0.0; var n1 = 0.0; var n2 = 0.0
      o.indices.foreach { i =>
        dot += o(i) * dq(i); n1 += o(i) * o(i); n2 += dq(i) * dq(i)
      }
      val cos = dot / math.sqrt(n1 * n2)
      assert(cos > 0.99, s"vec $id: quantized cosine $cos")
    }
  }

  test("connected components: both paths equal brute-force reachability on random graphs") {
    val edgeGen = for {
      n <- Gen.chooseNum(5, 30)
      m <- Gen.chooseNum(1, 40)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0L, n.toLong)
        b <- Gen.chooseNum(0L, n.toLong) if b != a
      } yield (math.min(a, b), math.max(a, b)))
    } yield es.distinct
    (1 to 6).foreach { i =>
      val edges = sample(edgeGen, 9000 + i)
      // brute-force oracle: iterate min-label to a fixpoint in plain Scala
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var lbl = nodes.map(x => x -> x).toMap
      var changed = true
      while (changed) {
        changed = false
        edges.foreach { case (a, b) =>
          val m = math.min(lbl(a), lbl(b))
          if (lbl(a) != m || lbl(b) != m) {
            lbl += a -> m; lbl += b -> m; changed = true
          }
        }
      }
      val df = edges.toDF("a_id", "b_id")
      val viaDriver = Dedup.connectedComponents(df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val viaDist = Dedup.connectedComponents(df, driverLimit = -1L).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(viaDriver === lbl, s"seed $i driver path diverged")
      assert(viaDist === lbl, s"seed $i distributed path diverged")
    }
  }

  test("skyline equals brute-force dominance filter on random points") {
    val ptsGen = for {
      n <- Gen.chooseNum(10, 80)
      ps <- Gen.listOfN(n, for {
        x <- Gen.chooseNum(0, 30); y <- Gen.chooseNum(0, 30)
      } yield (x.toDouble, y.toDouble))
    } yield ps.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
    (1 to 6).foreach { i =>
      val pts = sample(ptsGen, 7000 + i)
      def dom(b: (Long, Double, Double), a: (Long, Double, Double)) =
        b._2 <= a._2 && b._3 <= a._3 && (b._2 < a._2 || b._3 < a._3)
      val expected = pts.filterNot(a => pts.exists(b => dom(b, a)))
        .map(_._1).toSet
      val df = pts.toDF("k", "x", "y").repartition(5)
      val got = graft.ops.Skyline.skyline2dKeys(df, "k", "x", "y")
        .collect().map(_.getLong(0)).toSet
      assert(got === expected, s"seed $i")
      // guard=0 forces the anti-correlated sort-sweep fallback: both
      // global dominance paths must agree (the dual-path rule)
      val gotSweep = graft.ops.Skyline
        .skyline2dKeys(df, "k", "x", "y", broadcastGuard = 0L)
        .collect().map(_.getLong(0)).toSet
      assert(gotSweep === expected, s"seed $i sweep-fallback path diverged")
    }
  }

  test("q98 prefix filter is complete on random mutated corpora") {
    // the PPJoin completeness THEOREM, exercised generatively: on random
    // corpora with planted mutations, prefix-filtered output must equal
    // the brute-force all-pairs Jaccard join exactly — both directions
    (1 to 3).foreach { round =>
      val docs = (1 to 30).map { i =>
        val base = sample(docGen, round * 1000 + i)
        if (i % 3 == 0) {
          // mutate a previous doc lightly → likely J >= 0.6 pair
          val w = sample(docGen, round * 1000 + i - 1).split(" ")
          w.updated(0, "mutA").updated(1, "mutB").mkString(" ")
        } else base
      }.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.prefixFilterJoinOf(df)
        .select(col("a_id"), col("b_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def shingles(s: String): Set[String] = {
        val w = s.split(" ")
        (1 to math.max(w.length - 2, 1)).map { k =>
          Seq(w(k - 1), w(math.min(k, w.length - 1)),
            w(math.min(k + 1, w.length - 1))).mkString(" ")
        }.toSet
      }
      val sh = docs.map { case (id, t) => (id, shingles(t)) }
      val brute = (for {
        (ai, as) <- sh; (bi, bs) <- sh if ai < bi
        inter = (as & bs).size
        uni = as.size + bs.size - inter
        if inter * Dedup.PfJacDen >= uni * Dedup.PfJacNum
      } yield (ai, bi)).toSet
      assert(got == brute,
        s"round $round: prefix filter missed ${brute -- got} / extra ${got -- brute}")
    }
  }

  test("q94 Morton interleave is a bijection on the 4-bit grid (production expr)") {
    // run the PRODUCTION zorderStatsOf on the full 16×16 grid (min 0,
    // max 15 → bucket width 1, so buckets ARE coordinates): a correct
    // interleave yields exactly 16 ranges × 16 rows, each an aligned
    // 4×4 tile (min==tile corner, max==corner+3 on both axes)
    val grid = (for { x <- 0L until 16L; y <- 0L until 16L } yield (x, y))
      .toDF("x", "y")
    val rows = graft.ext.Layout.zorderStatsOf(grid).collect()
    assert(rows.length == 16, s"${rows.length} z-ranges, expected 16")
    assert(rows.map(_.getLong(1)).forall(_ == 16L),
      "a z-range does not hold exactly one 4x4 tile — not a bijection")
    rows.foreach { r =>
      val zr = r.getLong(0)
      val xt = (((zr >> 2) & 1) * 2 + (zr & 1)) * 4
      val yt = (((zr >> 3) & 1) * 2 + ((zr >> 1) & 1)) * 4
      assert(r.getLong(2) == xt && r.getLong(3) == xt + 3 &&
        r.getLong(4) == yt && r.getLong(5) == yt + 3,
        s"z_range $zr is not the aligned tile at ($xt, $yt)")
    }
  }

  test("q96 shard roll-up is the min-semilattice of its member shards") {
    // Every position of shard (A ∪ B)'s signature is the min over both
    // members' minima, so it must EQUAL A's value or B's value there —
    // hence agreement(AB, A) + agreement(AB, B) >= 32 (positions where
    // both achieve the min count twice, never zero). Random corpora.
    (1 to 3).foreach { round =>
      val a = (1 to 6).map(i => sample(docGen, round * 100 + i))
      val b = (1 to 6).map(i => sample(docGen, round * 100 + 50 + i))
      val df = (a.map(("A", _)) ++ b.map(("B", _)) ++
        (a ++ b).map(("AB", _))).toDF("source", "text")
      val rows = Dedup.shardSimilarityOf(df).collect().map(r =>
        ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      def agree(x: String, y: String): Long =
        rows.getOrElse((x, y), rows((y, x)))
      assert(agree("AB", "A") + agree("AB", "B") >= 32,
        s"round $round: union shard's minima achieved by neither member")
    }
  }

  test("sorted_intersect_count equals size(array_intersect) on random arrays") {
    // the q98 verify kernel must be value-invisible vs the built-in it
    // replaces — including DUPLICATE elements (counted once, set
    // semantics) and empty arrays; arrays arrive value-sorted as in q98
    import org.apache.spark.sql.functions._
    val arrGen = Gen.chooseNum(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 20L))).map(_.sorted)
    val pairs = (1 to 40).map(i =>
      (sample(arrGen, i.toLong), sample(arrGen, i + 1000L)))
    import org.apache.spark.sql.graft.{Shim, SortedIntersectCount}
    val df = pairs.toDF("a", "b")
      .withColumn("fast", Shim.column(SortedIntersectCount(
        Shim.expression(col("a")), Shim.expression(col("b")))))
      .withColumn("ref", size(array_intersect(col("a"), col("b"))).cast("long"))
    val bad = df.filter(col("fast") =!= col("ref")).collect()
    assert(bad.isEmpty, s"kernel diverges from array_intersect: ${bad.toSeq}")
  }

  test("int_dot rewrite is value-invisible on random arrays (nulls, " +
      "length mismatches, either eval mode)") {
    // RewriteIntDotFold must be a pure plan upgrade: for every input the
    // declarative fold (rule EXCLUDED) and the kernel (rule ACTIVE)
    // agree, including null elements (poison → NULL) and mismatched
    // lengths (zip_with null padding → NULL); values small enough that
    // ANSI never throws, so both spellings complete
    import org.apache.spark.sql.functions._
    val elemGen: Gen[Option[Long]] = Gen.frequency(
      9 -> Gen.chooseNum(-1000L, 1000L).map(Some(_)),
      1 -> Gen.const(None))
    val arrGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, elemGen))
    val pairs = (1 to 50).map(i =>
      (sample(arrGen, i.toLong), sample(arrGen, i + 5000L)))
    val df = pairs.toDF("qa", "qb").localCheckpoint() // pin the input
    val fold = "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, " +
      "(acc, v) -> acc + v) AS dot"
    def run(excludeRule: Boolean): Seq[Option[Long]] = {
      val key = "spark.sql.optimizer.excludedRules"
      val prev = spark.conf.getOption(key)
      if (excludeRule)
        spark.conf.set(key, "org.apache.spark.sql.graft.RewriteIntDotFold")
      try {
        val out = df.selectExpr("monotonically_increasing_id() AS i", fold)
        val p = out.queryExecution.optimizedPlan.toString
        if (excludeRule) assert(!p.contains("int_dot"), p)
        else assert(p.contains("int_dot"), p)
        out.orderBy(col("i")).collect()
          .map(r => if (r.isNullAt(1)) None else Some(r.getLong(1))).toSeq
      } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
    }
    assert(run(excludeRule = false) === run(excludeRule = true))
  }

  test("Det.dstddev matches built-in stddev_samp within 1e-9 relative") {
    val li = graft.tables.Tables.lineitem(spark, sf)
    val rows = li.groupBy(col("l_returnflag"))
      .agg(Det.dstddev(col("l_quantity")).as("det"),
        org.apache.spark.sql.functions.stddev_samp(col("l_quantity")).as("ref"))
      .collect()
    rows.foreach { r =>
      val (det, ref) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(det - ref) / ref < 1e-9, s"$det vs $ref")
    }
  }

  test("q136 FastSS: neighborhood intersection ⟺ lev ≤ 1 on random strings") {
    // the completeness theorem behind q136, checked against a reference
    // Levenshtein on adversarially small alphabets (max collision odds)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def neighborhood(s: String): Set[String] =
      (0 until s.length).map(i => s.take(i) + s.drop(i + 1)).toSet + s
    val strGen = for {
      n <- Gen.chooseNum(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    (1 to 300).foreach { i =>
      val a = sample(strGen, i)
      val b = sample(strGen, i + 7919)
      val candidate = (neighborhood(a) & neighborhood(b)).nonEmpty
      val close = lev(a, b) <= 1
      // completeness: close pairs ALWAYS intersect (zero false negatives)
      assert(!close || candidate, s"FastSS missed close pair ($a, $b)")
      // and the verify step exists precisely because the converse fails;
      // when it fires, distance is still bounded (deletion variants are
      // within 1 edit of their source, so intersecting strings are ≤ 2)
      if (candidate) assert(lev(a, b) <= 2, s"absurd candidate ($a, $b)")
    }
  }

  test("AVI codec: random videos round-trip; random corruption never " +
      "decodes silently") {
    import graft.ext.Avi
    val frameGen: Gen[Array[Int]] =
      Gen.listOfN(Avi.Side * Avi.Side, Gen.chooseNum(0, 255)).map(_.toArray)
    val videoGen: Gen[Array[Array[Int]]] =
      Gen.chooseNum(1, 30).flatMap(n => Gen.listOfN(n, frameGen))
        .map(_.toArray)
    (1 to 25).foreach { i =>
      val vid = sample(videoGen, i)
      val bytes = Avi.encode(vid)
      val back = Avi.decode(bytes)
      assert(back.length === vid.length, s"seed $i: frame count")
      vid.indices.foreach(f =>
        assert(back(f).toSeq === vid(f).toSeq, s"seed $i frame $f"))
      // single-byte corruption: either the decoder REJECTS the
      // container, or the flip landed in a don't-care field (reserved
      // words, rate/quality hints — skipped by convention) and the
      // decoded PIXELS are untouched. What must never happen is a
      // silent pixel change: any movi channel flip breaks the B=G=R
      // invariant, every structural field is validated.
      val at = sample(Gen.chooseNum(0, bytes.length - 1), i + 31)
      val flip = sample(Gen.chooseNum(1, 255), i + 63).toByte
      val bad = bytes.clone(); bad(at) = (bad(at) ^ flip).toByte
      try {
        val decoded = Avi.decode(bad)
        assert(decoded.length === vid.length &&
          vid.indices.forall(f => decoded(f).toSeq == vid(f).toSeq),
          s"seed $i: corruption at $at (xor $flip) silently CHANGED " +
            "decoded pixels — a structural field is going unvalidated")
      } catch { case _: IllegalArgumentException => () /* rejected: ok */ }
    }
  }

  test("q227/q228 banded prefix equals the naive cumulative on random score tables") {
    import graft.ext.Model
    val rowGen = for {
      grp <- Gen.oneOf("a", "b", "c")
      // scores straddle many bands, including negatives and band edges
      score <- Gen.oneOf(Gen.chooseNum(-5L, 5L)
        .map(_ * Model.AucBandWidth), // exact band boundaries
        Gen.chooseNum(-12000000L, 12000000L))
      pos <- Gen.chooseNum(0L, 5L)
      neg <- Gen.chooseNum(0L, 5L)
    } yield (grp, score, pos, neg)
    (1 to 6).foreach { i =>
      val n = sample(Gen.chooseNum(5, 60), i)
      val raw = sample(Gen.listOfN(n, rowGen), i + 17)
        // one row per (grp, score) — cumBefore's input contract
        .groupBy(r => (r._1, r._2)).toSeq
        .map { case ((g, s), v) =>
          (g, s, v.map(_._3).sum, v.map(_._4).sum) }
      val got = Model.cumBefore(
          raw.toDF("grp", "score", "pos", "neg"))
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(4), r.getLong(5))).toMap
      // naive replay: per grp, ascending-score running sums strictly below
      raw.groupBy(_._1).foreach { case (g, rows) =>
        var (cp, cn) = (0L, 0L)
        rows.sortBy(_._2).foreach { case (_, s, p, ng) =>
          assert(got((g, s)) === ((cp, cn)),
            s"seed $i grp $g score $s: banded ${got((g, s))} vs naive ($cp,$cn)")
          cp += p; cn += ng
        }
      }
      assert(got.size === raw.size, s"seed $i: row count drift")
    }
  }

  test("SnapTable model check: random op sequences match an in-memory " +
      "model at every version, including time travel and WAP") {
    import graft.io.SnapTable
    val rnd = new scala.util.Random(42) // deterministic
    (1 to 3).foreach { run =>
      val d = java.nio.file.Files
        .createTempDirectory(s"graft_snap_model_$run").toString
      var nextId = 100L * run
      def rows(n: Int): Seq[(Long, Long)] =
        (0 until n).map { _ => nextId += 1; (nextId, rnd.nextInt(50).toLong) }
      // the model: committed history as one row-set per version
      val history = scala.collection.mutable.ArrayBuffer
        .empty[Set[(Long, Long)]]
      val first = rows(4).toSet
      SnapTable.create(first.toSeq.toDF("id", "v"), d)
      history += first
      (1 to 14).foreach { _ =>
        val cur = history.last
        rnd.nextInt(7) match {
          case 0 => // append
            val add = rows(1 + rnd.nextInt(3)).toSet
            SnapTable.append(add.toSeq.toDF("id", "v"), d)
            history += cur ++ add
          case 1 => // copy-on-write delete by value predicate
            val cut = rnd.nextInt(50).toLong
            SnapTable.deleteWhere(spark, d, col("v") < cut)
            history += cur.filterNot(_._2 < cut)
          case 2 => // merge: update a random live key + insert a new one
            val upd = cur.toSeq.sortBy(_._1)
              .lift(rnd.nextInt(math.max(cur.size, 1)))
              .map { case (id, _) => (id, 999L) }.toSeq
            val ins = rows(1)
            SnapTable.merge((upd ++ ins).toDF("id", "v"), d, "id")
            history += cur.filterNot(r => upd.exists(_._1 == r._1)) ++
              upd ++ ins
          case 3 => // optimize: value-invisible rewrite
            SnapTable.optimize(spark, d, targetFiles = 2)
            history += cur
          case 4 => // WAP: stage two batches, publish one, discard one
            val keep = rows(2).toSet
            val drop = rows(2).toSet
            val kId = SnapTable.stage(keep.toSeq.toDF("id", "v"), d)
            val dId = SnapTable.stage(drop.toSeq.toDF("id", "v"), d)
            assert(SnapTable.read(spark, d).count() === cur.size.toLong,
              s"run $run: staging leaked into reads")
            SnapTable.discard(spark, d, dId)
            assert(SnapTable.publish(spark, d, kId).isDefined)
            history += cur ++ keep
          case 5 => // stale-base merge REBASES over a key-disjoint append
            val base = history.size
            val appended = rows(2).toSet
            val upd = cur.toSeq.sortBy(_._1)
              .lift(rnd.nextInt(math.max(cur.size, 1)))
              .map { case (id, _) => (id, 777L) }.toSeq
            val ins = rows(1)
            SnapTable.append(appended.toSeq.toDF("id", "v"), d)
            history += cur ++ appended
            SnapTable.mergeFrom((upd ++ ins).toDF("id", "v"), d, "id", base)
            history += history.last
              .filterNot(r => upd.exists(_._1 == r._1)) ++ upd ++ ins
          case 6 => // key-CLASHING interleave refuses; a retry against the
            // current snapshot then succeeds
            val base = history.size
            val clash = rows(1)
            val upd2 = clash.map { case (id, _) => (id, 555L) }
            SnapTable.append(clash.toDF("id", "v"), d)
            history += cur ++ clash
            intercept[SnapTable.ConcurrentWriteException] {
              SnapTable.mergeFrom(upd2.toDF("id", "v"), d, "id", base)
            }
            SnapTable.merge(upd2.toDF("id", "v"), d, "id")
            history += history.last
              .filterNot(r => clash.exists(_._1 == r._1)) ++ upd2
        }
        val got = SnapTable.read(spark, d).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === history.last,
          s"run $run v${history.size}: table diverged from model")
      }
      // every retained version still time-travels to its model state
      history.zipWithIndex.foreach { case (expected, i) =>
        val got = SnapTable.read(spark, d, Some(i + 1)).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(got === expected, s"run $run: time travel to v${i + 1}")
      }
    }
  }
}
