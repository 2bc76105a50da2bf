package graft

import graft.ext.Dedup
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions.col

class DedupSpec extends SparkSpec {

  test("q107: matrix cells partition the capped pair set exactly") {
    val matrixTotal = graft.ext.Dedup.sourceDupMatrix(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_pairs")).head.getLong(0)
    val pairTotal = graft.ext.Text.ngramJaccardCapped(spark, sf).count()
    assert(matrixTotal == pairTotal,
      s"matrix counts $matrixTotal pairs but the feed has $pairTotal")
  }

  test("q98: prefix filter finds EXACTLY the brute-force Jaccard>=0.6 pairs") {
    import org.apache.spark.sql.functions._
    // completeness is the algorithm's whole claim (unlike q24's estimate
    // or q51's cap): prefix-filtered == exhaustive all-pairs, both ways
    val docs = graft.tables.Tables.documents(spark, sf)
    val sh = docs.select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"),
        graft.ext.Dedup.shinglesFromWords(col("w")).as("sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("sh").as("ta"))
    val b = sh.select(col("doc_id").as("b_id"), col("sh").as("tb"))
    val brute = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("inter",
        size(array_intersect(col("ta"), col("tb"))).cast("long"))
      .withColumn("uni",
        (size(col("ta")) + size(col("tb"))).cast("long") - col("inter"))
      .filter(col("inter") * graft.ext.Dedup.PfJacDen >=
        col("uni") * graft.ext.Dedup.PfJacNum)
      .select(col("a_id"), col("b_id"), col("inter"), col("uni"))
    val got = graft.ext.Dedup.prefixFilterJoin(spark, sf)
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty,
      "prefix-filtered join diverges from brute force")
    assert(got.count() > 0, "no similar pairs at all — join untested")
  }
  import SparkSpec.spark.implicits._

  // 60-word base doc; nearDup differs in 2 words; unrelated shares none
  private val base = (1 to 60).map(i => s"w${i % 30}").mkString(" ")
  private val nearDup = base.replace("w5", "x5")
  private val unrelated = (1 to 60).map(i => s"z$i").mkString(" ")

  private def docs = Seq(
    (0L, base), (1L, nearDup), (2L, unrelated)
  ).toDF("doc_id", "text")

  test("minhash finds the planted near-dup pair and nothing else") {
    val pairs = Dedup.minhashPairsOf(docs, 0.3).collect()
    assert(pairs.length === 1)
    assert(pairs(0).getLong(0) === 0L && pairs(0).getLong(1) === 1L)
    val est = pairs(0).getAs[Double]("est_jaccard")
    assert(est > 0.3 && est <= 1.0)
  }

  test("minhash estimate is exact 1.0 for identical docs") {
    val d = Seq((0L, base), (1L, base)).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsOf(d, 0.9).collect()
    assert(pairs.length === 1)
    assert(pairs(0).getAs[Double]("est_jaccard") === 1.0)
  }

  test("simhash pairs the near-dup, not the unrelated doc") {
    val pairs = Dedup.simhashPairsOf(docs, maxDist = 16).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)))
  }

  test("simhash is deterministic and order-insensitive to partitioning") {
    val fp1 = docs.repartition(4).select(simhash64(col("text"))).collect()
      .map(_.getLong(0)).sorted
    val fp2 = docs.coalesce(1).select(simhash64(col("text"))).collect()
      .map(_.getLong(0)).sorted
    assert(fp1.sameElements(fp2))
  }

  test("rolling_hash distinguishes different texts, stable for same") {
    val hs = docs.select(rolling_hash(col("text"))).collect().map(_.getLong(0))
    assert(hs.distinct.length === 3)
    val hs2 = docs.select(rolling_hash(col("text"))).collect().map(_.getLong(0))
    assert(hs.sameElements(hs2))
  }

  test("connected components: chains collapse to one cluster, min id wins") {
    // 1-2-3-4-5 is a 4-hop chain (multiple propagation rounds); 10-11
    // is a separate component
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a_id", "b_id")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L)
    // driver union-find fast path
    val cc = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc === expected)
    // distributed label-propagation path (forced via driverLimit = 0)
    val ccDist = Dedup.connectedComponents(pairs, driverLimit = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ccDist === expected)
  }

  test("q112: multi-drop incremental merge equals from-scratch CC each release") {
    // full pair universe: {1,2,3} and {4,5} are clusters among the base
    // docs; drop 1 (docs 6,7) extends {4,5} and starts {6? no — 7~6};
    // drop 2 (doc 0) BRIDGES {1,2,3} and {4,...} through 3~0~5 — the
    // hard case, where one new doc merges two existing clusters and
    // every member of both must relabel to the joint min (0)
    val base = Seq((1L, 2L), (2L, 3L), (4L, 5L))
    val drop1 = Seq((5L, 6L), (6L, 7L))
    val drop2 = Seq((3L, 0L), (0L, 5L))
    def cc(ps: Seq[(Long, Long)]) =
      Dedup.connectedComponents(ps.toDF("a_id", "b_id")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stored0 = Dedup.connectedComponents(base.toDF("a_id", "b_id"))
    val rel1 = Dedup.incrementalClusterMerge(stored0, drop1.toDF("a_id", "b_id"))
    val got1 = rel1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got1 === cc(base ++ drop1), "release 1 diverges from recompute")
    // second drop seeds from release 1's MERGED labels, not from scratch
    val rel2 = Dedup.incrementalClusterMerge(rel1, drop2.toDF("a_id", "b_id"))
    val got2 = rel2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 === cc(base ++ drop1 ++ drop2),
      "release 2 diverges from recompute")
    // the bridge really merged: everything except the untouched pair is 0
    assert(got2 === Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      5L -> 0L, 6L -> 0L, 7L -> 0L))
  }

  test("q112: registered query equals q57's from-scratch clustering") {
    val inc = Dedup.incrementalClusters(spark, sf)
    val full = Dedup.dedupClusters(spark, sf)
    assert(inc.exceptAll(full).isEmpty && full.exceptAll(inc).isEmpty,
      "incremental maintenance is not value-invisible")
    assert(inc.count() > 0)
  }

  test("distributed CC fails loudly when the round cap is hit unconverged") {
    // diameter-10 chain, round cap 3: returning the half-propagated labels
    // would be silently wrong, so the loop must throw instead
    val chain = (0L until 10L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, driverLimit = -1L, maxRounds = 3)
    }
    assert(ex.getMessage.contains("not converged"))
  }

  test("distributed CC long-path stress: a diameter-20 chain converges " +
      "in O(diameter) rounds, and the converged-AT-cap confirm round " +
      "accepts instead of refusing") {
    // label 0 propagates exactly one hop per min-label round, so a
    // 0-1-...-20 chain needs 20 improving rounds — far past the 2-3
    // rounds the real dup-graph fixtures converge in; a side component
    // proves labels don't bleed across components on the way
    val deep = ((0L until 20L).map(i => (i, i + 1)) ++
      Seq((100L, 101L))).toDF("a_id", "b_id")
    val expected = ((0L to 20L).map(_ -> 0L) ++
      Seq(100L -> 100L, 101L -> 100L)).toMap
    // headroom case: cap comfortably above the diameter
    val got = Dedup.connectedComponents(deep, driverLimit = -1L,
      maxRounds = 25).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected, "deep chain mislabeled under a loose cap")
    // CONVERGED-AT-CAP: the loop exits on the very round that applied
    // the last improvement (round 20 of maxRounds = 20, changed > 0) —
    // the one-round confirm pass must accept the converged labels, not
    // throw the refusal meant for genuinely-unconverged graphs
    val atCap = Dedup.connectedComponents(deep, driverLimit = -1L,
      maxRounds = 20).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(atCap === expected, "converged-at-cap labels drifted")
    // one deeper link flips the same cap into the refusal: the bound is
    // tight, not approximate
    val deeper = (deep.as[(Long, Long)].collect().toSeq :+ (21L, 22L)
      :+ (20L, 21L)).toDF("a_id", "b_id")
    val ex = intercept[IllegalStateException] {
      Dedup.connectedComponents(deeper, driverLimit = -1L, maxRounds = 20)
    }
    assert(ex.getMessage.contains("maxRounds=20"), ex.getMessage)
  }

  test("link prior: the hub of a star outranks the leaves, exactly") {
    // star 1-{2,3,4,5}: hand-computed 1-round values — hub receives the
    // leaves' whole ranks (4·10^6), leaves receive a quarter share each;
    // after round 1: hub = 150000 + (4e6·85)//100 = 3550000,
    // leaf = 150000 + (250000·85)//100 = 362500. Rounds 2-3 keep the
    // hub strictly on top; all leaves stay identical by symmetry.
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
      .toDF("a_id", "b_id")
    val ranks = Dedup.linkPriorOf(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ranks(1L)._1 === 4L) // hub degree
    val leafRanks = Seq(2L, 3L, 4L, 5L).map(ranks(_)._2).distinct
    assert(leafRanks.size === 1, s"leaves diverged: $ranks")
    assert(ranks(1L)._2 > leafRanks.head, s"hub not on top: $ranks")
  }

  test("link prior: integer ranks conserve total mass within div truncation") {
    // Σ ranks stays within N·(Scale·15//100 drift + per-node div loss) of
    // N·Scale — the guarantee that makes the long-arithmetic bound in the
    // scaladoc (N·Scale·85) real rather than aspirational
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (2L, 4L))
      .toDF("a_id", "b_id")
    val rs = Dedup.linkPriorOf(pairs).collect().map(_.getLong(2))
    val n = rs.length
    assert(rs.sum <= n * Dedup.PrScale,
      s"rank mass grew past N*Scale: ${rs.sum} > ${n * Dedup.PrScale}")
    assert(rs.sum > (n * Dedup.PrScale * 9) / 10,
      s"rank mass collapsed: ${rs.sum}")
  }

  test("q57 driver path and q58 distributed path agree on real corpus pairs") {
    val viaDriver = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLabelProp = Dedup.dedupClustersDistributed(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver === viaLabelProp)
    assert(viaDriver.nonEmpty)
  }

  test("cluster keep-best keeps the longest member of every cluster") {
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val nTok = graft.tables.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val rows = Dedup.clusterKeepBest(spark, sf).collect()
    assert(rows.length === byCluster.size)
    rows.foreach { r =>
      val (cid, keep, n) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val members = byCluster(cid)
      assert(n === members.length.toLong)
      // keep = argmax by (n_tok desc, doc_id asc) over the cluster
      val expected = members.map(d => (-nTok(d), d)).min._2
      assert(keep === expected, s"cluster $cid kept $keep, expected $expected")
    }
  }

  test("leak-free split: no near-dup cluster straddles the train/eval boundary") {
    val splits = Dedup.leakFreeSplit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(splits.length.toLong ===
      graft.tables.Tables.documents(spark, sf).count())
    // the leakage-free property: every cluster wholly on one side
    splits.groupBy(_._2).foreach { case (key, members) =>
      assert(members.map(_._3).distinct.length === 1,
        s"split key $key straddles train/eval")
    }
    // clustered docs use their cluster id as the key
    splits.foreach { case (doc, key, _) =>
      assert(key === clusters.getOrElse(doc, doc))
    }
    val sides = splits.map(_._3).distinct.sorted
    assert(sides.sameElements(Array("eval", "train")), "both splits present")
  }

  test("one-pass portable minhash equals the declarative built-in pipeline") {
    val corpus = graft.tables.Tables.documents(spark, sf)
    val fast = Dedup.portableSignaturesFast(corpus).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val slow = Dedup.portableSignatures(corpus).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fast === slow)
  }

  test("one-pass portable_simhash equals the declarative built-in pipeline") {
    // the oracle contract: the fast expression must compute EXACTLY what
    // the md5/conv/aggregate built-in formulation (and thus the generated
    // DuckDB SQL) computes — on real corpus docs, not just synthetics
    val corpus = graft.tables.Tables.documents(spark, sf)
    val fast = Dedup.portableSimhashFingerprints(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.portableSimhashDeclarative(corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast === slow)
  }

  test("q178: cluster decontam lanes replay driver-side and close exactly") {
    // driver replay from raw text + the q57 clustering: recompute the
    // high-precision direct tier (>=30 shared eval 5-grams), spread the
    // taint through clusters, and compare every lane count
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def grams5(t: String): Set[String] = {
      val w = t.split(" ")
      if (w.length < 5) Set.empty
      else w.sliding(5).map(_.mkString(" ")).toSet
    }
    val evalSh = docs.filter(_._1 < 50L).flatMap(d => grams5(d._3)).toSet
    val direct = docs.filter(_._1 >= 50L)
      .filter(d => grams5(d._3).count(evalSh.contains) >= 30).map(_._1).toSet
    val ck = docs.map(d => d._1 -> clusters.getOrElse(d._1, d._1)).toMap
    val tainted = (docs.filter(_._1 < 50L).map(d => ck(d._1)) ++
      direct.toSeq.map(ck)).toSet
    val expect = docs.filter(_._1 >= 50L).groupBy(_._2).map { case (src, ds) =>
      val nDirect = ds.count(d => direct(d._1))
      val nSpread = ds.count(d => !direct(d._1) && tainted(ck(d._1)))
      src -> ((ds.length.toLong, nDirect.toLong, nSpread.toLong,
        (ds.length - nDirect - nSpread).toLong))
    }
    val rows = Dedup.clusterDecontam(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (src, e) => assert(rows(src) === e, s"source $src") }
    // lanes must close over n_train, and BOTH contamination tiers must
    // fire on this corpus or the two-tier design is untested
    rows.values.foreach { case (t, d, sp, k) => assert(d + sp + k === t) }
    assert(rows.values.map(_._2).sum > 0, "no direct (verbatim) flags")
    assert(rows.values.map(_._3).sum > 0,
      "no spread flags — the cluster expansion is vacuous on this corpus")
  }

  test("q182: survivorship audit replays driver-side and closes on ALL") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clustered = Dedup.dedupClusters(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val winners = Dedup.clusterKeepBest(spark, sf).collect()
      .map(_.getLong(1)).toSet
    def kept(id: Long): Boolean = !clustered(id) || winners(id)
    val bySrc = docs.groupBy(_._2).map { case (src, ds) =>
      val k = ds.count(d => kept(d._1)).toLong
      src -> ((ds.length.toLong, k, k.toDouble / ds.length))
    }
    val expect = bySrc + ("ALL" -> {
      val k = docs.count(d => kept(d._1)).toLong
      (docs.length.toLong, k, k.toDouble / docs.length)
    })
    val rows = Dedup.survivorshipAudit(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (src, e) => assert(rows(src) === e, s"source $src") }
    // the ALL row must close over the per-source rows, and dedup must
    // actually have dropped documents or the audit is vacuous
    val perSrc = rows.filter(_._1 != "ALL").values
    assert(rows("ALL")._1 === perSrc.map(_._1).sum)
    assert(rows("ALL")._2 === perSrc.map(_._2).sum)
    assert(rows("ALL")._2 < rows("ALL")._1, "nothing dropped — vacuous")
  }

  test("q184: Hamilton quotas replay driver-side and conserve the budget") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val clustered = Dedup.dedupClusters(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val winners = Dedup.clusterKeepBest(spark, sf).collect()
      .map(_.getLong(1)).toSet
    def kept(id: Long): Boolean = !clustered(id) || winners(id)
    val per = docs.groupBy(_._2).toSeq.map { case (src, ds) =>
      (src, ds.length.toLong, ds.count(d => kept(d._1)).toLong)
    }
    val t = per.map(_._2).sum; val b = per.map(_._3).sum
    val base = per.map { case (src, nd, nk) =>
      (src, nd, nk, b * nd / t, (b * nd) % t) }
    val leftover = b - base.map(_._4).sum
    val order = base.sortBy { case (src, _, _, _, rem) => (-rem, src) }
      .map(_._1).zipWithIndex.toMap
    val expect = base.map { case (src, nd, nk, bs, _) =>
      val quota = bs + (if (order(src) < leftover) 1L else 0L)
      val rep = if (nk == 0) None else Some(quota * 1000 / nk)
      src -> ((nd, nk, quota, rep, rep.map(_ > 4000L)))
    }.toMap
    val rows = Dedup.rebalanceQuota(spark, sf).collect().map { r =>
      val rep = if (r.isNullAt(4)) None else Some(r.getLong(4))
      val ov = if (r.isNullAt(5)) None else Some(r.getBoolean(5))
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), rep, ov))
    }.toMap
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (src, e) => assert(rows(src) === e, s"source $src") }
    // the apportionment theorem: quotas sum EXACTLY to the budget, and
    // each quota is within 1 of the exact proportional share
    assert(rows.values.map(_._3).sum === b, "quota sum != budget")
    rows.foreach { case (src, (nd, _, q, _, _)) =>
      val exact = b.toDouble * nd / t
      assert(q >= exact.floor - 1e-9 && q <= exact.ceil + 1e-9,
        s"$src quota $q outside [floor, ceil] of $exact")
    }
  }

  test("q185: fold-leak audit replays driver-side; cluster scheme leaks zero") {
    def bucket(x: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) % 5
    }
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docIds = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0))
    val pairs = Dedup.dedupClusterPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def foldC(id: Long) = bucket(clusters.getOrElse(id, id))
    def foldD(id: Long) = bucket(id)
    val expect = scala.collection.mutable.Map[(String, Long), (Long, Long)]()
    for (sch <- Seq("cluster_key", "doc_key"); f <- 0L until 5L)
      expect((sch, f)) = (0L, 0L)
    docIds.foreach { id =>
      val (c, d) = (foldC(id), foldD(id))
      expect(("cluster_key", c)) =
        (expect(("cluster_key", c))._1 + 1, expect(("cluster_key", c))._2)
      expect(("doc_key", d)) =
        (expect(("doc_key", d))._1 + 1, expect(("doc_key", d))._2)
    }
    pairs.foreach { case (a, b) =>
      Seq(("cluster_key", foldC(a), foldC(b)),
          ("doc_key", foldD(a), foldD(b))).foreach { case (sch, fa, fb) =>
        if (fa != fb) Seq(fa, fb).foreach { f =>
          expect((sch, f)) = (expect((sch, f))._1, expect((sch, f))._2 + 1)
        }
      }
    }
    val rows = Dedup.foldLeakAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (k, e) => assert(rows(k) === e, s"$k") }
    // the theorem: cluster-keyed folds CANNOT leak (pair endpoints share
    // a cluster, hence a fold key); the naive doc-keyed folds must leak
    // on this corpus or the comparison carries no signal
    assert(rows.filter(_._1._1 == "cluster_key").values
      .forall(_._2 == 0L), "cluster-keyed fold leaked a near-dup pair")
    assert(rows.filter(_._1._1 == "doc_key").values.map(_._2).sum > 0,
      "doc-keyed folds leak nothing — comparison vacuous")
    // every doc lands in exactly one fold per scheme
    Seq("cluster_key", "doc_key").foreach { sch =>
      assert(rows.filter(_._1._1 == sch).values.map(_._1).sum ===
        docIds.length.toLong, s"$sch fold counts don't partition")
    }
  }

  test("q190: quality-survival interaction replays driver-side") {
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val w = r.getString(1).split(" ")
        (r.getLong(0), w.distinct.length.toLong * 1000L / w.length)
      }
    val clustered = Dedup.dedupClusters(spark, sf).collect()
      .map(_.getLong(0)).toSet
    val winners = Dedup.clusterKeepBest(spark, sf).collect()
      .map(_.getLong(1)).toSet
    def kept(id: Long): Boolean = !clustered(id) || winners(id)
    val sorted = docs.map(_._2).sorted
    def qc(p: Double): Double = {
      val h = (sorted.length - 1) * p
      val lo = h.toInt
      if (lo + 1 > sorted.length - 1) sorted(lo).toDouble
      else sorted(lo) * (1 - (h - lo)) + sorted(lo + 1) * (h - lo)
    }
    val (t25, t50, t75) = (qc(0.25), qc(0.5), qc(0.75))
    val expect = docs.groupBy { case (_, sc) =>
      1L + (if (sc > t25) 1L else 0L) + (if (sc > t50) 1L else 0L) +
        (if (sc > t75) 1L else 0L)
    }.map { case (q, ds) =>
      val k = ds.count(d => kept(d._1)).toLong
      q -> ((ds.length.toLong, k, k.toDouble / ds.length))
    }
    val rows = Dedup.qualitySurvival(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows.keySet === expect.keySet)
    expect.foreach { case (q, e) => assert(rows(q) === e, s"quartile $q") }
    // quartiles partition the corpus and each holds a real share of it
    assert(rows.values.map(_._1).sum === docs.length.toLong)
    assert(rows.keySet === Set(1L, 2L, 3L, 4L), "a quartile is empty")
    rows.values.foreach { case (n, k, _) => assert(k <= n) }
  }

  test("q140: calibration buckets are sane and the estimator orders truth") {
    val rows = graft.ext.Dedup.minhashCalibration(SparkSpec.spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (est, n, si, su, ej, mj) =>
      assert(est >= 0L && est <= 32L)
      assert(n > 0L && si >= 0L && su >= si,
        s"bucket $est: union smaller than intersection")
      assert(ej === est.toDouble / 32.0)
      assert(mj >= 0.0 && mj <= 1.0)
    }
    // banding admits a pair only via a fully-matching band
    assert(rows.forall(_._1 >= 4L), "candidate with no complete band")
    // calibration range: both a perfect-estimate bucket (exact dups) and
    // an imperfect one must appear, else the audit is vacuous
    assert(rows.exists(_._1 === 32L), "no exact-signature bucket")
    assert(rows.exists(_._1 < 32L), "only exact dups — no calibration signal")
    // the estimator must order ground truth at the extremes
    val lo = rows.minBy(_._1); val hi = rows.maxBy(_._1)
    assert(hi._6 >= lo._6,
      s"micro-Jaccard not ordered: est=${lo._1} → ${lo._6}, est=${hi._1} → ${hi._6}")
  }

  test("q212: positive pairs are exactly the clusters' anchor-member edges") {
    import org.apache.spark.sql.functions._
    val pairs = graft.ext.Dedup.positivePairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val clusters = graft.ext.Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val srcs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = clusters.groupBy(_._2).values.filter(_.length >= 2)
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        ids.tail.map(m => (ids.head, m, ids.length.toLong,
          srcs(ids.head) != srcs(m)))
      }.toSet
    assert(pairs.toSet === expect, "pair set diverges from cluster replay")
    assert(pairs.nonEmpty, "no near-dup clusters — pair mining vacuous")
    pairs.foreach { case (a, p, sz, _) =>
      assert(a < p, "anchor must be the min-id member")
      assert(sz >= 2)
    }
  }

  test("q231: weights are 1/cluster-size, every cluster's weights sum to " +
      "exactly 1, and singletons keep weight 1") {
    val w = Dedup.dedupWeights(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nDocs = graft.tables.Tables.documents(spark, sf).count()
    assert(w.length.toLong === nDocs, "one weight row per document")
    w.foreach { case (_, n, wt) =>
      assert(n >= 1L)
      assert(wt === 1.0 / n, "weight must be exactly 1/n_copies")
    }
    // replay against the clustering: members carry the cluster size,
    // non-members carry 1 — and each cluster contributes Σ 1/n = 1
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val size = clusters.groupBy(_._2).map { case (c, ms) => (c, ms.length) }
    val byDoc = clusters.map { case (d, c) => (d, size(c).toLong) }.toMap
    w.foreach { case (d, n, _) =>
      assert(n === byDoc.getOrElse(d, 1L), s"doc $d: n_copies mismatch")
    }
    assert(byDoc.nonEmpty, "no clusters — weighting vacuous")
    val perCluster = clusters.groupBy(_._2).values.map(ms =>
      ms.map(m => 1.0 / byDoc(m._1)).sum)
    perCluster.foreach(s => assert(math.abs(s - 1.0) < 1e-9,
      "cluster weights must sum to 1"))
  }

  test("NULL-text docs band nowhere: no shared empty bucket, the gate " +
      "accepts them, and portable pairs/signatures match their oracles") {
    import SparkSpec.spark.implicits._
    // two NULL-text docs in the corpus, one in the batch: without the
    // NULL-signature filter in bandedOf they would all share a "" band
    // signature in every band — the corpus pair would collide in all 8
    // bands and the batch doc would gate as near_dup with 8 hits, where
    // the oracle (text IS NOT NULL) says accepted with 0
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, null.asInstanceOf[String]),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val bands = Dedup.corpusBandIndexOf(corpus)
    assert(bands.filter(col("band_sig") === "").count() === 0L,
      "NULL signatures leaked empty band signatures into the index")
    assert(bands.filter(col("doc_id").isin(2L, 3L)).count() === 0L,
      "signature-less docs must emit no band rows")
    val batch = Seq((10L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val gate = Dedup.minhashGateOf(batch, bands).collect()
    assert(gate.length === 1 && gate(0).getString(2) === "accepted" &&
      gate(0).getLong(1) === 0L,
      s"NULL-text batch doc must gate as accepted/0 hits: ${gate.toSeq}")
  }
}
