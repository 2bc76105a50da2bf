package graft

import graft.ext.Similarity

class SimilaritySpec extends SparkSpec {

  test("brute-force kNN: 3 neighbors per query, no self-matches") {
    val rows = Similarity.knnBruteForce(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.size === 10)
    byQ.foreach { case (q, rs) =>
      assert(rs.length === 3)
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
      assert(rs.map(_.getAs[Long]("rnk")).sorted.sameElements(Array(1L, 2L, 3L)))
    }
  }

  test("top-k aggregator formulation equals window formulation exactly") {
    val agg = Similarity.knnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val win = Similarity.knnBruteForceWindow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(agg === win)
  }

  test("LSH kNN structure: ≤3 neighbors per query, no self-matches") {
    val rows = Similarity.knnLsh(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
  }

  test("IVF kNN: structure valid and recall beats random scanning") {
    val exact = Similarity.knnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.knnIvf(spark, sf).collect()
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
    val approx = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"IVF recall@3 (nprobe=4/16) = $recall%.2f")
    assert(recall > 0.25, f"recall $recall too low — IVF probing broken?")
  }

  test("LSH recall against brute force is nontrivial") {
    val exact = Similarity.knnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.knnLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"LSH recall@3 = $recall%.2f")
    assert(recall > 0.1, f"recall $recall too low — LSH bucketing broken?")
  }

  test("IVF broadcast-probe path (k=128): structure valid, recall holds") {
    val exact = Similarity.knnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.knnIvf(spark, sf, k = 128, nprobe = 32).collect()
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.forall(_.getAs[Long]("neighbor_id") != q))
    }
    val approx = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"IVF recall@3 (nprobe=32/128, broadcast probe) = $recall%.2f")
    assert(recall > 0.25, f"recall $recall too low — broadcast probe broken?")
  }

  test("IVF with a binding sample cap still recalls (fixed-size fit)") {
    val exact = Similarity.knnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.knnIvf(spark, sf, sampleCap = 64).collect()
    val approx = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(f"IVF recall@3 (64-vector training sample) = $recall%.2f")
    assert(recall > 0.25, f"recall $recall too low — capped fit broken?")
  }

  test("q44 recall flags: every query recovers ≥1 exact neighbor") {
    val rows = Similarity.q44IvfRecall(spark, sf).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("recall_ok"), s"query ${r.getLong(0)} missed all 3")
      assert(r.getAs[String]("exact_top3").split(",").length === 3)
    }
  }

  test("nearest-centroid assignment covers every vector; diagonal dominates") {
    val rows = Similarity.nearestCentroid(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val nVec = graft.tables.Tables.embeddings(spark, sf).count()
    assert(total === nVec, "every embedding must be assigned exactly once")
    // the synthetic labels are only loosely clustered (~0.37 measured),
    // but a working assignment must beat random (0.1 for 10 labels) by a
    // wide margin
    val diag = rows.filter(r => r.getLong(0) == r.getLong(1))
      .map(_.getLong(2)).sum
    info(f"prototype-classification accuracy = ${diag.toDouble / total}%.2f")
    assert(diag.toDouble / total > 0.2, "centroid assignment broken?")
  }

  test("embedding diversity equals the brute-force mean pairwise dot") {
    val rows = Similarity.embeddingDiversity(spark, sf).collect()
    // brute force: quantize on the driver, average all ordered pairs
    val qs = Similarity.quantizedVectors(
        graft.tables.Tables.embeddings(spark, sf))
      .join(graft.tables.Tables.embeddings(spark, sf)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("label")), Seq("vec_id"))
      .collect()
      .map(r => (r.getAs[Int]("label"), r.getSeq[Long](1).toArray))
    rows.foreach { r =>
      val (label, n, got) = (r.getLong(0), r.getLong(1), r.getDouble(4))
      val vs = qs.filter(_._1 == label).map(_._2)
      assert(vs.length.toLong === n)
      val pairSum = (for {
        i <- vs.indices; j <- vs.indices if i != j
      } yield vs(i).zip(vs(j)).map { case (a, b) => a * b }.sum).sum
      val expected = pairSum.toDouble / (n * (n - 1))
      assert(math.abs(got - expected) < 1e-9, s"label $label: $got vs $expected")
    }
  }

  test("q49 LSH near-dup is a subset of exact q42 with decent recall") {
    val exact = graft.queries.Subqueries.q42EmbeddingNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.nearDupLsh(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((lsh -- exact).isEmpty,
      "LSH emitted a pair failing the exact predicate")
    val recall = (exact & lsh).size.toDouble / exact.size
    info(f"near-dup LSH recall = $recall%.2f (${lsh.size}/${exact.size} pairs)")
    assert(recall > 0.5, f"recall $recall too low")
  }

  test("PQ encode: every vector gets one code per subspace, codes non-degenerate") {
    import org.apache.spark.sql.functions._
    val codes = Similarity.pqEncode(SparkSpec.spark, SparkSpec.sf)
    val perVec = codes.groupBy("vec_id").count()
      .filter(col("count") =!= Similarity.PqM).count()
    assert(perVec === 0, s"vectors without exactly ${Similarity.PqM} codes")
    // a broken distance (constant 0) would assign everything the lowest
    // code id and still satisfy the structure check above
    val distinctCodes = codes.select("code").distinct().count()
    assert(distinctCodes > 1, "all subvectors encoded to one code")
  }

  test("semantic dedup: the representative is a member of its own cluster") {
    import org.apache.spark.sql.functions._
    val reps = Similarity.semanticDedup(SparkSpec.spark, SparkSpec.sf)
    val members = graft.ext.Dedup.connectedComponents(
        Similarity.nearDupLshPairs(SparkSpec.spark, SparkSpec.sf))
      .select(col("doc_id").as("keep_vec_id"), col("cluster_id"))
    val orphans = reps.join(members, Seq("cluster_id", "keep_vec_id"),
      "left_anti").count()
    assert(orphans === 0, "a representative is not in its cluster")
    assert(reps.filter(col("n_members") < 2).count() === 0,
      "pair-derived clusters must have ≥2 members")
    assert(reps.count() > 0, "no clusters at all — dedup path untested")
  }

  test("q97 IVF-PQ: valid structure and nontrivial recall vs exact kNN") {
    val ivf = Similarity.ivfPqSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.knnBruteForce(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.forall { case (q, n) => q != n }, "self-match in results")
    // the harness embeddings are STRUCTURELESS random unit vectors — the
    // exact top-3 sit at noise-level cosine (~0.3), where the Hamming-1
    // probe's geometric ceiling is ~50%; this floor guards the machinery,
    // the planted test below guards the case ANN exists for
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF-PQ recall $recall below floor")
  }

  test("q97 IVF-PQ: planted near-duplicates are found at rank 1") {
    import org.apache.spark.sql.functions._
    import SparkSpec.spark.implicits._
    val base = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").orderBy("vec_id")
      .as[(Long, Array[Float])].collect()
    // plant: for each query id q<10, a copy at id q+10000 with one
    // component nudged — cosine ≈ 0.999, the case IVF-PQ exists for
    val planted = base.take(10).map { case (id, e) =>
      val c = e.clone(); c(0) = c(0) + 0.02f
      (id + 10000L, c)
    }
    val df = (base ++ planted).toSeq.toDF("vec_id", "embedding")
    val hits = Similarity.ivfPqSearchOf(df).collect()
      .filter(r => r.getLong(2) == 1L) // rank-1 hits
      .count(r => r.getLong(1) == r.getLong(0) + 10000L)
    assert(hits >= 8, s"only $hits/10 planted near-dups found at rank 1")
  }

  test("q115: parallel releases drift 1.0, anti-parallel -1.0, exactly") {
    import SparkSpec.spark.implicits._
    import org.apache.spark.sql.functions.col
    // find vec_ids on each side of the release split (same md5 bucket
    // rule the production query uses)
    val ids = (1L to 200L).toDF("vec_id")
      .select(col("vec_id"),
        (graft.ext.Text.md5Bucket1000(col("vec_id")) >=
          graft.ext.Corpus.IngestOldMax).as("is_new"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val allOld = ids.filterNot(_._2).map(_._1)
    val allNew = ids.filter(_._2).map(_._1)
    assert(allOld.length >= 12 && allNew.length >= 8, "split not represented")
    val v = Array.tabulate(64)(i => (0.1f * ((i % 7) + 1)))
    val neg = v.map(-_)
    // label 1: both releases share direction v; label 2 (disjoint ids):
    // the new release flips sign
    val planted = (
      allOld.take(6).map(id => (id, v, 1)) ++
      allNew.take(4).map(id => (id, v, 1)) ++
      allOld.slice(6, 12).map(id => (id, v, 2)) ++
      allNew.slice(4, 8).map(id => (id, neg, 2))
    ).toSeq.toDF("vec_id", "embedding", "label")
    val out = Similarity.centroidDriftOf(planted).collect()
      .map(r => r.getInt(0) -> r).toMap
    assert(out(1).getLong(1) === 6L && out(1).getLong(2) === 4L)
    assert(out(1).getDouble(6) === 1.0,
      s"parallel releases must drift exactly 1.0, got ${out(1).getDouble(6)}")
    assert(out(2).getDouble(6) === -1.0,
      s"anti-parallel releases must drift exactly -1.0, got ${out(2).getDouble(6)}")
  }

  test("q117: recall audit sums per-query hits into the macro row") {
    val rows = Similarity.annRecall(spark, sf).collect()
    val (total, perQ) = rows.partition(_.getLong(0) == -1L)
    assert(total.length === 1 && perQ.length === 10)
    perQ.foreach { r =>
      assert(r.getLong(1) === 3L, "k must be 3 per probe query")
      assert(r.getDouble(3) === r.getLong(2).toDouble / 3.0)
    }
    val t = total.head
    assert(t.getLong(1) === 30L)
    assert(t.getLong(2) === perQ.map(_.getLong(2)).sum,
      "macro hits must equal the sum of per-query hits")
    // random unit vectors at dim 64: LSH recall is genuinely partial —
    // both the hit and the miss branch of the audit must fire
    assert(t.getLong(2) >= 1L && t.getLong(2) <= 29L,
      s"degenerate recall ${t.getLong(2)}/30 — audit branches not exercised")
  }

  test("q154: IVF-PQ serving recall audit is consistent and non-degenerate") {
    val rows = Similarity.ivfPqRecall(spark, sf).collect()
    val (total, perQ) = rows.partition(_.getLong(0) == -1L)
    assert(total.length === 1 && perQ.length === 10)
    perQ.foreach { r =>
      assert(r.getLong(1) === 3L, "k must be 3 per probe query")
      assert(r.getDouble(3) === r.getLong(2).toDouble / 3.0)
    }
    val t = total.head
    assert(t.getLong(1) === 30L)
    assert(t.getLong(2) === perQ.map(_.getLong(2)).sum,
      "macro hits must equal the sum of per-query hits")
    // the 5/16 multi-probe + 8-code PQ must find SOMETHING but is lossy
    // by design on random vectors — both audit branches must fire
    assert(t.getLong(2) >= 1L && t.getLong(2) <= 29L,
      s"degenerate recall ${t.getLong(2)}/30 — audit branches not exercised")
  }

  test("q139: hard negatives cross labels and carry the exact integer dot") {
    val rows = Similarity.hardNegatives(SparkSpec.spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // one row per anchor, and the negative is genuinely another label
    assert(rows.map(_._1).distinct.length === rows.length)
    rows.foreach { case (v, la, n, lb, _) =>
      assert(v != n, s"anchor $v: negative is itself")
      assert(la != lb, s"anchor $v: not a cross-label negative")
    }
    // the reported dot is the exact integer dot of the quantized vectors
    val q = Similarity.quantizedVectors(
      graft.tables.Tables.embeddings(SparkSpec.spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    rows.take(25).foreach { case (v, _, n, _, dot) =>
      val expect = q(v).zip(q(n)).map { case (a, b) => a * b }.sum
      assert(dot === expect, s"anchor $v: dot is not the exact quantized product")
    }
    // buckets at these plane counts give most anchors a cross-label mate
    val nVec = q.size
    assert(rows.length * 10 >= nVec * 5,
      s"only ${rows.length}/$nVec anchors mined — bucket geometry degenerate")
  }

  test("q142: PCA-projection ANN equals a driver-side replay of cut + rerank") {
    val got = Similarity.pcaAnnTopK(SparkSpec.spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty && got.map(_._1).distinct.length === 10)
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq === Seq(1L, 2L, 3L), s"probe $q ranks")
    }
    // replay: same loading vector (from q134's output), same quantization
    val v = Similarity.pcaTopComponent(SparkSpec.spark, sf).collect()
      .sortBy(_.getLong(0)).map(_.getLong(1))
    val qv = graft.tables.Tables.embeddings(SparkSpec.spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * Similarity.PcaScale + 0.5).toLong).toArray)
      .toMap
    val proj = qv.map { case (id, q) =>
      id -> q.indices.map(i => q(i) * v(i)).sum }
    val expect = (0L until 10L).flatMap { p =>
      val cand = proj.keys.filter(_ != p).toSeq
        .sortBy(id => (math.abs(proj(id) - proj(p)), id)).take(Similarity.PcaCand)
      cand.map(id => (id, qv(p).zip(qv(id)).map { case (a, b) => a * b }.sum))
        .sortBy { case (id, dot) => (-dot, id) }.take(3).zipWithIndex
        .map { case ((id, _), i) => (p, id, i + 1L) }
    }.toSet
    assert(got.toSet === expect, "engine result diverges from the replay")
  }

  test("q134: power iterate converges to an eigendirection of the exact Gram") {
    val rows = Similarity.pcaTopComponent(SparkSpec.spark, sf).collect()
    assert(rows.length === 64)
    assert(rows.map(_.getLong(0)).toSeq === (0L until 64L))
    val v = rows.map(_.getLong(1))
    assert(v.exists(_ != 0L), "iterate must be nonzero")
    assert(v.map(math.abs).max === 512L, "renorm must cap ||v||inf at PcaVCap")
    // Rayleigh quotient of a PSD Gram is nonnegative and here positive
    val (num, den) = (rows.head.getLong(2), rows.head.getLong(3))
    assert(den > 0L && num > 0L)
    assert(rows.head.getDouble(4) === num.toDouble / den)
    // exact-integer convergence check: w = G v must be near-parallel to v,
    // i.e. cos^2(v, w) = (v·w)^2 / (v·v)(w·w) >= 0.98 after PcaRounds
    val emb = graft.tables.Tables.embeddings(SparkSpec.spark, sf)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        math.floor(x.toDouble * Similarity.PcaScale + 0.5).toLong).toArray)
    val g = Array.ofDim[Long](64, 64)
    emb.foreach { q =>
      var j = 0
      while (j < 64) { var k = 0
        while (k < 64) { g(j)(k) += q(j) * q(k); k += 1 }; j += 1 } }
    val w = Array.tabulate(64)(j => (0 until 64).map(k => g(j)(k) * v(k)).sum)
    val vw = v.indices.map(i => BigInt(v(i)) * BigInt(w(i))).sum
    val vv = v.map(x => BigInt(x) * BigInt(x)).sum
    val ww = w.map(x => BigInt(x) * BigInt(x)).sum
    assert(vw * vw * 100 >= vv * ww * 98,
      s"cos^2 below 0.98 after ${Similarity.PcaRounds} rounds")
    // and the Rayleigh columns are exactly v·w / v·v of that same Gram
    assert(BigInt(num) === vw && BigInt(den) === vv)
  }

  test("q156 truncation recall matches an in-JVM recompute of both arms") {
    // independent oracle: quantize per q54's convention, rank by exact
    // integer dots (full vs TruncDim prefix), recount the hits
    val emb = graft.tables.Tables.embeddings(SparkSpec.spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val quant = emb.map { case (id, v) =>
      val ss = v.map(x => x * x).sum
      id -> v.map(x => math.floor(x / math.sqrt(ss) * 127 + 0.5).toLong)
    }.toMap
    def top3(dims: Int): Map[Long, Set[Long]] =
      quant.keys.filter(_ < 10).map { q =>
        val qa = quant(q)
        q -> quant.keys.filter(_ != q).toSeq
          .map(n => n -> (0 until dims).map(d => qa(d) * quant(n)(d)).sum)
          .sortBy { case (n, dot) => (-dot, n) }.take(3).map(_._1).toSet
      }.toMap
    val exact = top3(64)
    val trunc = top3(Similarity.TruncDim)
    val rows = Similarity.truncRecall(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    exact.foreach { case (q, ex) =>
      val (k, hits) = rows(q)
      assert(k === 3L)
      assert(hits === (ex & trunc(q)).size.toLong, s"query $q hit count")
    }
    val (kAll, hitsAll) = rows(-1L)
    assert(kAll === 3L * exact.size)
    assert(hitsAll === exact.map { case (q, ex) =>
      (ex & trunc(q)).size }.sum.toLong)
  }

  /** The near-dup graph both q160 and q161 walk, replayed driver-side:
    * symmetric adjacency from the production LSH pair feed. */
  private def replayAdjacency(): Map[Long, Seq[Long]] = {
    val ab = Similarity.nearDupLshPairs(SparkSpec.spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    ab.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (u, vs) => u -> vs.map(_._2).toSeq }
  }

  test("q160: integer-PageRank recurrence matches a driver-side replay") {
    val adj = replayAdjacency()
    val n = graft.tables.Tables.embeddings(SparkSpec.spark, sf).count()
    val ids = graft.tables.Tables.embeddings(SparkSpec.spark, sf)
      .select("vec_id").collect().map(_.getLong(0))
    val pr0 = Similarity.PrScale / n
    val tele = (pr0 * 15) / 100
    var pr: Map[Long, Long] = ids.map(_ -> pr0).toMap
    for (_ <- 1 to Similarity.PrRounds) {
      val inflow = ids.map { v =>
        v -> adj.getOrElse(v, Seq.empty)
          .map(u => pr(u) / adj(u).length).sum
      }.toMap
      pr = ids.map(v => v -> (tele + (85 * inflow(v)) / 100)).toMap
    }
    val rows = Similarity.graphCentrality(spark, sf).collect()
    assert(rows.length === n)
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("deg") === adj.getOrElse(id, Seq.empty).length.toLong)
      assert(r.getAs[Long]("pr") === pr(id), s"node $id rank")
    }
    // mass conservation (integer floors only leak downward) and the
    // isolated-node law: no in-edges -> rank is exactly the teleport mass
    assert(rows.map(_.getAs[Long]("pr")).sum <= Similarity.PrScale)
    val isolated = rows.filter(_.getAs[Long]("deg") == 0L)
    assert(isolated.nonEmpty, "graph unexpectedly dense — no isolated nodes")
    isolated.foreach(r => assert(r.getAs[Long]("pr") === tele))
    // connected nodes must not all tie with isolated ones
    assert(rows.exists(_.getAs[Long]("pr") > tele))
  }

  test("q161: label propagation matches a driver-side replay of 3 rounds") {
    val adj = replayAdjacency()
    val truth = graft.tables.Tables.embeddings(SparkSpec.spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val seeds = truth.keys.filter(_ % Similarity.LpSeedMod == 0)
      .map(v => v -> truth(v)).toMap
    var cur = seeds
    for (_ <- 1 to Similarity.LpRounds) {
      val assigned = truth.keys.filter(_ % Similarity.LpSeedMod != 0).flatMap { v =>
        val votes = adj.getOrElse(v, Seq.empty).flatMap(cur.get)
          .groupBy(identity).map { case (l, ls) => l -> ls.size }
        if (votes.isEmpty) None
        else Some(v -> votes.maxBy { case (l, c) => c * 1024L + (1023 - l) }._1)
      }.toMap
      cur = seeds ++ assigned
    }
    val rows = Similarity.labelPropagation(spark, sf).collect()
    assert(rows.length === truth.size)
    var propagated = 0
    rows.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      val status = r.getAs[String]("status")
      val lab = Option(r.getAs[java.lang.Long]("label_out")).map(_.toLong)
      if (id % Similarity.LpSeedMod == 0) {
        assert(status === "seed")
        assert(lab === Some(truth(id)), s"seed $id must keep its true label")
        assert(r.getAs[Long]("correct") === 1L)
      } else {
        assert(cur.get(id) === lab, s"node $id label")
        if (lab.isDefined) {
          propagated += 1
          assert(status === "propagated")
          assert(r.getAs[Long]("correct") ===
            (if (lab.contains(truth(id))) 1L else 0L))
        } else {
          assert(status === "unlabeled")
          assert(r.isNullAt(r.fieldIndex("correct")))
        }
      }
    }
    assert(propagated > 0, "propagation never reached a non-seed node")
    info(s"propagated $propagated non-seed nodes")
  }

  test("q163: walks match a driver-side replay and only traverse real edges") {
    val adj = replayAdjacency()
    def weight(cur: Long, step: Int, nbr: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$cur#$step#$nbr".getBytes("UTF-8"))
      val hex = h.take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) * 1048576L + nbr
    }
    val rows = Similarity.walkCorpus(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byStart = rows.groupBy(_._1)
    assert(byStart.keySet === adj.keySet, "one walk per connected node")
    byStart.foreach { case (start, rs) =>
      val walk = rs.sortBy(_._2).map(_._3)
      assert(rs.map(_._2).sorted.toSeq ===
        (0L to Similarity.WalkLen.toLong).toSeq, s"walk $start positions")
      assert(walk.head === start)
      walk.sliding(2).zipWithIndex.foreach { case (Array(cur, nxt), i) =>
        assert(adj(cur).contains(nxt), s"walk $start hop $i not an edge")
        assert(nxt === adj(cur).maxBy(n => weight(cur, i + 1, n)),
          s"walk $start hop $i picked the wrong neighbor")
      }
    }
    // the hash choice must actually vary by step: at least one walk
    // must NOT just bounce between two nodes for its whole length
    assert(byStart.values.exists(rs => rs.map(_._3).distinct.length > 2),
      "every walk degenerated to a 2-cycle — step not folded into the key?")
  }

  test("q173: modularity contributions replay driver-side and close exactly") {
    val adj = replayAdjacency()
    val m = adj.values.map(_.size).sum / 2
    val labels = Similarity.labelPropagation(spark, sf).collect().map { r =>
      r.getAs[Long]("vec_id") ->
        Option(r.getAs[java.lang.Long]("label_out")).map(_.toLong)
    }.toMap
    val labeled = labels.collect { case (v, Some(l)) => v -> l }
    val expect = labeled.values.toSet.map { (c: Long) =>
      val members = labeled.filter(_._2 == c).keySet
      val k = members.toSeq.map(v => adj.getOrElse(v, Seq.empty).size.toLong).sum
      val w2 = members.toSeq.map(v =>
        adj.getOrElse(v, Seq.empty).count(members)).sum.toLong
      c -> ((members.size.toLong, k, w2, 2L * m * w2 - k * k))
    }.toMap
    val rows = Similarity.modularityAudit(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    expect.foreach { case (c, e) => assert(rows(c) === e, s"community $c") }
    // the singleton rest row: no within edges, contribution −Σ deg²
    val unl = labels.collect { case (v, None) => v }.toSeq
    val restDeg = unl.map(v => adj.getOrElse(v, Seq.empty).size.toLong)
    assert(rows(-2L) === ((unl.size.toLong, restDeg.sum, 0L,
      -restDeg.map(d => d * d).sum)))
    // closure laws: all nodes accounted for, degree mass = 2m, and the
    // assembled Q is a valid modularity
    val (tn, tk, tw, tq) = rows(-1L)
    assert(tn === labels.size.toLong)
    assert(tk === 2L * m, "total degree mass must be 2m")
    assert(tw % 2 === 0 && tw <= 2L * m)
    val q = tq.toDouble / (4.0 * m * m)
    info(f"modularity Q = $q%.3f over ${expect.size} label communities")
    assert(q >= -1.0 && q <= 1.0)
    assert(tq === rows.filter(_._1 >= -2L).collect {
      case (c, t) if c != -1L => t._4 }.sum, "total must equal the parts")
  }

  test("q183: centroid-outlier worklist replays in-JVM, ranked and exact") {
    val emb = graft.tables.Tables.embeddings(SparkSpec.spark, sf)
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val quant = emb.flatMap { case (id, v, lab) =>
      val ss = v.map(x => x * x).sum
      if (ss > 0)
        Some((id, lab, v.map(x => math.floor(x / math.sqrt(ss) * 127 + 0.5)
          .toLong)))
      else None
    }
    val byLab = quant.groupBy(_._2)
    val expect = quant.map { case (id, lab, q) =>
      val members = byLab(lab)
      val n = members.length.toLong
      val sums = (0 until 64).map(d => members.map(_._3(d)).sum)
      val n2d2 = (0 until 64).map(d =>
        (n * q(d) - sums(d)) * (n * q(d) - sums(d))).sum
      (id, lab.toLong, n, n2d2, n2d2.toDouble / (n * n).toDouble)
    }.sortBy { case (id, _, _, _, sc) => (-sc, id) }.take(20)
    val rows = Similarity.centroidOutliers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong,
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(rows.length === 20)
    rows.zip(expect).zipWithIndex.foreach {
      case (((rk, id, lab, n, d, sc), (eid, elab, en, ed, esc)), i) =>
        assert(rk === i + 1L, s"rank at row $i")
        assert((id, lab, n, d, sc) === ((eid, elab, en, ed, esc)),
          s"row $i")
    }
    // worklist must carry genuine signal: distances vary and the top
    // outlier is strictly farther than the 20th
    assert(rows.head._6 > rows.last._6, "flat worklist — no outliers?")
  }

  test("q211: negative draws replay driver-side; no self-pairs; lattice complete") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.negativeSampling(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    val n = graft.tables.Tables.documents(spark, sf).count()
    val anchors = (0L until n by Similarity.NegAnchorStride).toSeq
    assert(rows.length === anchors.length * Similarity.NegK,
      "anchor × j lattice incomplete")
    rows.foreach { case (a, j, neg, _, _) =>
      assert(a % Similarity.NegAnchorStride === 0L)
      assert(j >= 1 && j <= Similarity.NegK)
      assert(neg != a, "self-pair survived the fix-up")
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$a|$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val draw = java.lang.Long.parseLong(md.substring(0, 13), 16) % n
      val expect = if (draw == a) (draw + 1) % n else draw
      assert(neg === expect, s"draw replay for ($a, $j)")
    }
    // the flags must be live signals, not constants
    assert(rows.exists(_._4) || rows.length < 20,
      "no same-source negative in a 20-source corpus — flag wiring?")
    assert(rows.count(_._4) < rows.length / 2, "same-source flag inverted?")
  }

  test("q42 guard: refuses the all-pairs crossJoin past the pair bound") {
    import SparkSpec.spark.implicits._
    // 30 vectors → predicted pairs = 30·29/2 = 435
    val e = Seq.tabulate(30)(i =>
        (i.toLong, Array.fill(4)(i.toFloat)))
      .toDF("vec_id", "embedding")
    val ex = intercept[IllegalStateException] {
      graft.queries.Subqueries.q42EmbeddingNearDupGuardedOf(e, bound = 100L)
        .count()
    }
    // the refusal must name the scalable q49 twin
    assert(ex.getMessage.contains("q49"), ex.getMessage)
    assert(ex.getMessage.contains("435"), ex.getMessage)
    // under the bound the guard is invisible: parallel vectors all match
    val ok = graft.queries.Subqueries
      .q42EmbeddingNearDupGuardedOf(e, bound = 1000L)
    assert(ok.count() > 0)
  }

  test("q232: filtered ANN returns only same-label neighbors, ranked, " +
      "no self-matches, ≤3 per probe") {
    val labels = graft.tables.Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    val rows = Similarity.filteredAnn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (q, lab, n) = (r.getLong(0), r.getInt(1), r.getLong(2))
      assert(lab === labels(q), "emitted label must be the probe's")
      assert(labels(n) === lab, "neighbor label must equal probe label")
      assert(n !== q, "self-match")
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getLong(3)).sorted.toSeq ===
        (1L to rs.length.toLong).toSeq, "ranks must be dense from 1")
    }
  }

  test("q233: post-filter survivors are a PREFIX of the true filtered " +
      "ranking and the audit counts reconcile") {
    val audit = Similarity.postFilterAudit(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(audit.size === 10, "one audit row per probe")
    audit.values.foreach { case (nTrue, nPost, nMissed) =>
      assert(nTrue <= 3 && nPost <= nTrue,
        "post-filter can never return MORE same-label results than truth")
      assert(nMissed === nTrue - nPost,
        "survivors must be a subset of the true filtered top-k")
    }
    // the audit must be measuring something: at fixture scale the naive
    // filter-after-search spelling loses at least one true neighbor
    assert(audit.values.map(_._3).sum > 0,
      "no loss anywhere — audit vacuous at this scale")
  }

  test("q234: semantic decontamination respects the eval/train split and " +
      "reports only true cosine hits") {
    val e = graft.tables.Tables.embeddings(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val rows = Similarity.semanticDecontam(spark, sf).collect()
    assert(rows.nonEmpty, "no semantic contamination at fixture scale")
    rows.foreach { r =>
      val (t, n, fe) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(t >= Similarity.SemEvalMax, "eval vector reported as train")
      assert(fe < Similarity.SemEvalMax, "train vector reported as eval hit")
      assert(n >= 1L)
      // no false positives: the reported first hit really clears 0.35
      assert(cos(e(t), e(fe)) >= 0.35 - 1e-12,
        s"train $t / eval $fe below the threshold")
    }
    // brute-force upper bound: LSH can only MISS true pairs, never add
    val trueHits = for {
      (t, tv) <- e.toSeq if t >= Similarity.SemEvalMax
      (ev, evv) <- e.toSeq if ev < Similarity.SemEvalMax
      if cos(tv, evv) >= 0.35
    } yield (t, ev)
    val byTrain = trueHits.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(1) <= byTrain.getOrElse(r.getLong(0), 0L),
        s"train ${r.getLong(0)}: more hits than brute-force truth")
    }
  }

  test("q235: mutual pairs are exactly the symmetric closure of the " +
      "top-k relation, hub edges drop") {
    val topk = Similarity.lshTopKAll(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val mutual = Similarity.mutualKnn(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
    assert(mutual.nonEmpty, "no mutual neighbors at fixture scale")
    // every emitted pair must be in BOTH top-k lists with the right ranks
    mutual.foreach { case ((a, b), (rab, rba)) =>
      assert(a < b, "pair not canonically oriented")
      assert(topk.get((a, b)).contains(rab), s"rnk_ab wrong for ($a,$b)")
      assert(topk.get((b, a)).contains(rba), s"rnk_ba wrong for ($a,$b)")
    }
    // completeness: every reciprocated top-k edge appears
    val expected = topk.keys.filter { case (q, n) =>
      q < n && topk.contains((n, q))
    }.toSet
    assert(mutual.map(_._1).toSet === expected,
      "mutual set diverges from the reciprocated-edge replay")
    // the filter bites: some one-directional edges exist and are dropped
    assert(expected.size < topk.size / 2,
      "every edge reciprocated — hub suppression vacuous here")
  }
}
