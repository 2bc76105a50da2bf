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
}
