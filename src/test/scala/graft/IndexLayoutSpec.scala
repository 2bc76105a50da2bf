package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Index, Layout, Linkage}
import graft.tables.Tables

/** Invariants for the round-6 indexing/layout/linkage operators
  * (q91–q96) that the value-exact oracle alone can't pin: blocking
  * recall, posting-cap semantics, the in-row-vs-window equivalence, the
  * Z-order tile-tightness property, the minimal-prefix vocabulary
  * contract, and the shard-signature semilattice. */
class IndexLayoutSpec extends SparkSpec {
  import SparkSpec.{spark, sf}

  // ---- q91 -----------------------------------------------------------------

  test("q91: blocked fuzzy join finds EXACTLY the unblocked lev<=2 pairs") {
    // recall check for the blocking key: on this dictionary, no pair
    // within the edit threshold straddles blocks, so blocked == all-pairs
    val dict = Tables.part(spark, sf).select(col("p_name")).distinct()
    val full = dict.as("a").crossJoin(dict.as("b"))
      .filter(col("a.p_name") < col("b.p_name"))
      .filter(levenshtein(col("a.p_name"), col("b.p_name")) <= Linkage.MaxEdit)
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"))
    val blocked = Linkage.fuzzyLinkage(spark, sf)
      .select(col("name_a"), col("name_b"))
    assert(blocked.exceptAll(full).isEmpty && full.exceptAll(blocked).isEmpty,
      "blocked join diverges from the exhaustive comparison")
    assert(blocked.count() > 0, "no fuzzy matches at all — threshold untested")
  }

  // ---- q136 ----------------------------------------------------------------

  test("q136: deletion neighborhoods find EXACTLY the exhaustive lev<=1 pairs") {
    val dict = Tables.part(spark, sf).select(col("p_name")).distinct()
    val full = dict.as("a").crossJoin(dict.as("b"))
      .filter(col("a.p_name") < col("b.p_name"))
      .filter(levenshtein(col("a.p_name"), col("b.p_name")) <= 1)
      .select(col("a.p_name").as("name_a"), col("b.p_name").as("name_b"))
    val fastss = Linkage.fastssJoin(spark, sf).select("name_a", "name_b")
    assert(fastss.exceptAll(full).isEmpty && full.exceptAll(fastss).isEmpty,
      "FastSS candidate set diverges from the exhaustive lev<=1 comparison")
    assert(fastss.count() > 0, "no distance-1 pairs — completeness untested")
    // the completeness theorem on adversarial micro-cases: substitution,
    // deletion, transposition (must be excluded), distance-2 (excluded)
    import SparkSpec.spark.implicits._
    val probe = Seq("abc", "axc", "ab", "bac", "xyc", "abcd")
      .toDF("p_name").withColumn("p_partkey", lit(1L))
    val vdict = probe.groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .select(col("p_name"), col("n_parts"),
        explode(array_distinct(transform(
          sequence(lit(0), length(col("p_name"))),
          i => when(i === length(col("p_name")), col("p_name"))
            .otherwise(concat(
              substring(col("p_name"), lit(1), i),
              substring(col("p_name"), i + 2, length(col("p_name"))))))))
          .as("variant"))
    val got = vdict.as("a").join(vdict.as("b"), "variant")
      .filter(col("a.p_name") < col("b.p_name"))
      .select(col("a.p_name"), col("b.p_name")).distinct()
      .filter(levenshtein(col("a.p_name"), col("b.p_name")) <= 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.contains(("abc", "axc")), "substitution pair missed")
    assert(got.contains(("ab", "abc")), "deletion pair missed")
    assert(got.contains(("abc", "abcd")), "insertion pair missed")
    assert(!got.contains(("abc", "bac")), "transposition (lev 2) leaked")
    assert(!got.contains(("abc", "xyc")), "distance-2 pair leaked")
  }

  // ---- q145 ----------------------------------------------------------------

  test("q145: entity ids are a transitive closure of the q91 pair graph") {
    val rows = Linkage.entityIds(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // every dictionary name labeled exactly once
    val dictN = Tables.part(spark, sf).select("p_name").distinct().count()
    assert(rows.length.toLong === dictN)
    assert(rows.map(_._1).distinct.length === rows.length)
    // entity stats consistent: sizes partition names, parts partition rows
    val byEnt = rows.groupBy(_._2)
    byEnt.foreach { case (eid, ms) =>
      assert(ms.forall(_._3 === ms.length.toLong), s"entity $eid size wrong")
      assert(ms.map(_._5).sum === ms.head._4, s"entity $eid parts wrong")
    }
    assert(rows.map(_._5).sum === Tables.part(spark, sf).count())
    // transitive closure: every q91 pair is co-entity, and some entity
    // has >= 3 members only if chained pairs exist (closure actually ran)
    val pairSets = Linkage.fuzzyLinkage(spark, sf)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val ent = rows.map(r => r._1 -> r._2).toMap
    pairSets.foreach { case (a, b) =>
      assert(ent(a) === ent(b), s"pair ($a, $b) split across entities")
    }
    assert(rows.exists(_._3 > 1L), "no multi-member entity — closure vacuous")
  }

  // ---- q92 -----------------------------------------------------------------

  test("q92: df is exact and postings are the capped ascending prefix") {
    val idx = Index.invertedIndex(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val truth = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
        .as("term"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).sorted) }
    assert(idx.nonEmpty)
    idx.foreach { r =>
      val (term, df, nEmitted, csv) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3))
      val ids = truth(term)
      assert(df == ids.length, s"$term: df $df != ${ids.length}")
      assert(nEmitted == math.min(df, Index.PostingsCap.toLong))
      val emitted = csv.split(",").map(_.toLong).toSeq
      assert(emitted == ids.take(Index.PostingsCap).toSeq,
        s"$term: postings are not the ascending prefix")
    }
    assert(idx.exists(_.getLong(1) > Index.PostingsCap),
      "no term exceeds the cap — truncation path untested")
  }

  // ---- q93 -----------------------------------------------------------------

  test("q93: in-row pair generation equals the lag/lead window spelling") {
    // the scale-shape claim: the registered query never windows the token
    // table; this asserts it computes the same relation as the naive
    // window formulation it replaces
    val docs = Tables.documents(spark, sf)
      .filter(size(split(col("text"), " ")) >= 2)
    val toks = docs
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("pos", "w1")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val expected = (1 to Index.MaxSkip).map { off =>
      toks.withColumn("w2", lead(col("w1"), off).over(w))
        .filter(col("w2").isNotNull)
        .select(col("w1"), col("w2"))
    }.reduce(_ unionAll _)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= Index.MinSupport)
    val got = Index.skipgramPairs(spark, sf)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "in-row skip-gram counts diverge from the window formulation")
    assert(got.count() > 0)
  }

  test("q93: 2-token docs survive the per-offset guard (no sequence(1,0))") {
    // regression pin: for a 2-token doc at offset 2, an unguarded
    // sequence(1, size-off) is sequence(1, 0) = DESCENDING [1, 0] and
    // element_at(w, 0) throws at runtime; the guard must emit nothing
    // for offsets past the doc's length instead
    import SparkSpec.spark.implicits._
    val docs = (Seq.fill(Index.MinSupport.toInt)("a b") ++
      Seq.fill(Index.MinSupport.toInt)("c d e")).toDF("text")
    val got = Index.skipgramPairsOf(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // "a b" docs own exactly one offset-1 pair; "c d e" adds (c,d),(d,e)
    // at offset 1 and (c,e) at offset 2 — all at support = MinSupport
    assert(got.toSet == Set(
      ("a", "b", Index.MinSupport), ("c", "d", Index.MinSupport),
      ("c", "e", Index.MinSupport), ("d", "e", Index.MinSupport)))
  }

  // ---- q94 -----------------------------------------------------------------

  test("q94: every z-range is a tight tile (spread <= 3 on both axes)") {
    val rows = Layout.zorderStats(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= Layout.RangeSize)
    rows.foreach { r =>
      val (zr, minx, maxx, miny, maxy) =
        (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(maxx - minx <= 3, s"z_range $zr: x spread ${maxx - minx} > 3")
      assert(maxy - miny <= 3, s"z_range $zr: y spread ${maxy - miny} > 3")
      // ranges are aligned 4x4 tiles: zr's even bits are x's high bits,
      // odd bits y's (bit 0 of zr = z bit 4 = x bit 2, etc.)
      val xTile = (((zr >> 2) & 1) * 2 + (zr & 1)) * 4
      val yTile = (((zr >> 3) & 1) * 2 + ((zr >> 1) & 1)) * 4
      assert(minx >= xTile && maxx < xTile + 4, s"z_range $zr: x outside tile")
      assert(miny >= yTile && maxy < yTile + 4, s"z_range $zr: y outside tile")
    }
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.orders(spark, sf).count(),
      "z-range stats do not partition the table")
  }

  // ---- q95 -----------------------------------------------------------------

  test("q95: vocabulary is the MINIMAL ranked prefix reaching 90% mass") {
    val rows = Index.vocabInduction(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.head.getLong(4)
    // ranks are the contiguous prefix 1..V
    assert(rows.map(_.getLong(0)).toSeq == (1L to rows.length).toSeq)
    // every kept term was needed: mass BEFORE it was under the target
    rows.foreach { r =>
      assert((r.getLong(3) - r.getLong(2)) * Index.CoverageDen <
        total * Index.CoverageNum, s"rank ${r.getLong(0)} kept but not needed")
    }
    // and the prefix suffices: the last kept term reaches the target
    assert(rows.last.getLong(3) * Index.CoverageDen >=
      total * Index.CoverageNum, "kept prefix does not reach 90% coverage")
  }

  test("q95: two-phase range-shard ranking equals the naive global window") {
    // the scale-shape claim: the registered query never sorts the whole
    // term table in one partition; this proves the sharded ranks, running
    // mass, and total are bit-equal to the single-window formulation
    val counts = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val ord = Window.orderBy(col("cnt").desc, col("term"))
    val naive = counts
      .withColumn("rank", row_number().over(ord).cast("long"))
      .withColumn("cum_cnt", sum(col("cnt")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total_cnt", sum(col("cnt")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("term"), col("cnt"), col("rank"), col("cum_cnt"),
        col("total_cnt"))
    val fast = Index.vocabRankOf(counts)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty,
      "two-phase vocabulary ranking diverges from the global window")
  }

  // ---- q96 -----------------------------------------------------------------

  test("q96: identical shards estimate Jaccard 1.0; disjoint shards near 0") {
    import SparkSpec.spark.implicits._
    val base = Tables.documents(spark, sf).select("doc_id", "text")
      .orderBy("doc_id").as[(Long, String)].collect().take(40)
    val planted = (
      base.take(20).map { case (_, t) => ("sA", t) } ++
      base.take(20).map { case (_, t) => ("sB", t) } ++ // sB == sA
      base.drop(20).map { case (_, t) => ("sC", t) }    // sC disjoint docs
    ).toSeq.toDF("source", "text")
    val sim = Dedup.shardSimilarityOf(planted).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(sim(("sA", "sB")) == 32L, "identical shards must agree on all minima")
    assert(sim(("sA", "sC")) < 32L, "distinct shards should not fully agree")
  }

  test("q96: a source whose docs are ALL NULL-text vanishes (both engines)") {
    // engine-divergence pin: PortableMinHash of NULL text is a NULL
    // signature and posexplode drops the row — the oracle's words CTE
    // filters text IS NOT NULL to match, so both engines drop the source
    import SparkSpec.spark.implicits._
    val planted = (
      Seq(("sA", "x y z w v"), ("sB", "x y z w v")) ++
      Seq(("sNull", null: String), ("sNull", null: String))
    ).toDF("source", "text")
    val srcs = Dedup.shardSimilarityOf(planted).collect()
      .flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    assert(srcs == Set("sA", "sB"), s"NULL-text source leaked into: $srcs")
  }

  test("q96: covers all source pairs with agreement in [0, 32]") {
    val rows = Dedup.shardSimilarity(spark, sf).collect()
    val nSrc = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.length == nSrc * (nSrc - 1) / 2, "missing source pairs")
    rows.foreach { r =>
      val n = r.getLong(2)
      assert(n >= 0 && n <= 32)
      assert(r.getDouble(3) == n.toDouble / 32)
    }
  }

  // ---- q118 ----------------------------------------------------------------

  test("q118: valid rankings; rare-term idf dominates the dup query") {
    val rows = Index.bm25TopK(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
      val ordered = rs.sortBy(_.getLong(1)).map(_.getDouble(3))
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b },
        "scores must be non-increasing in rank")
      assert(ordered.forall(_ > 0.0))
    }
    // 'dup' has df ≈ N/20: its rational idf ≈ 39 crushes the common
    // terms' ≈ 0.3, so every top-5 doc for query 0 must contain 'dup'
    val dupDocs = Tables.documents(spark, sf)
      .filter(col("text").contains("dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val top0 = byQ(0L).map(_.getLong(2))
    assert(top0.forall(dupDocs.contains),
      "idf discrimination failed: a dup-free doc outranked dup docs")
    // and the rare-term query's scores dwarf the common-term queries'
    assert(byQ(0L).map(_.getDouble(3)).min >
      byQ(1L).map(_.getDouble(3)).max * 5)
  }

  // ---- q119 ----------------------------------------------------------------

  test("q119: coverage is monotone in k and saturates past the vocab") {
    val rows = Index.coverageCurve(spark, sf).collect()
    val langs = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select("lang").distinct().count()
    assert(rows.length === langs * Index.CoverageCurveKs.length)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val byK = rs.sortBy(_.getLong(1))
      val cov = byK.map(_.getDouble(4))
      assert(cov.zip(cov.tail).forall { case (a, b) => a <= b },
        s"$lang: coverage not monotone in k")
      assert(cov.head > 0.0 && cov.head < 1.0,
        s"$lang: k=1 coverage degenerate (${cov.head})")
      // the fixture vocabulary has 31 terms, so k=32 covers everything
      assert(byK.last.getDouble(4) === 1.0 &&
        byK.last.getLong(2) === byK.last.getLong(3),
        s"$lang: k=32 must saturate at total mass")
      assert(rs.forall(r => r.getDouble(4) ==
        r.getLong(2).toDouble / r.getLong(3)))
    }
  }

  test("q162: rendezvous moves ONLY docs the new shards win; mod moves most") {
    val rows = Layout.reshardAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = Tables.documents(spark, sf).count()
    for (scheme <- Seq("rendezvous", "mod")) {
      val rs = rows.filter(_._1 == scheme)
      assert(rs.map(_._3).sum === total, s"$scheme must partition the corpus")
      assert(rs.map(_._2).toSet.subsetOf((0L until Layout.ShardsNew).toSet))
    }
    // the minimal-disruption theorem: an argmax over a SUPERSET of shards
    // changes iff a new shard wins — so old shards keep every doc, and
    // every doc on a new shard just moved there
    rows.filter(_._1 == "rendezvous").foreach { case (_, shard, docs, moved) =>
      if (shard < Layout.ShardsOld) assert(moved === 0L,
        s"rendezvous shard $shard must keep its docs on scale-out")
      else assert(moved === docs,
        s"rendezvous shard $shard holds only newly-moved docs")
    }
    val rvMoved = rows.filter(_._1 == "rendezvous").map(_._4).sum
    val modMoved = rows.filter(_._1 == "mod").map(_._4).sum
    // expected movement: ~2/10 for rendezvous vs ~80% for mod
    assert(rvMoved < total / 2 && modMoved > total / 2,
      s"rendezvous $rvMoved vs mod $modMoved of $total")
    info(s"moved: rendezvous $rvMoved, mod $modMoved of $total docs")
  }

  test("q166: manifest hashes replay driver-side and are tamper-evident") {
    def md5hex(s0: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s0.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val docs = Tables.documents(spark, sf)
      .selectExpr("doc_id", "md5(text) as fp", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byShard = docs.groupBy(_._1 / Layout.ManifestShard)
    val rows = Layout.releaseManifest(spark, sf).collect()
    val shardRows = rows.filter(_.getString(0) == "shard")
    val Array(rootRow) = rows.filter(_.getString(0) == "root")
    assert(shardRows.map(_.getLong(2)).sum === docs.length.toLong)
    assert(rootRow.getLong(2) === docs.length.toLong)
    val expectShard = byShard.map { case (sh, ds) =>
      sh -> md5hex(ds.sortBy(_._1).map(_._2).mkString)
    }
    shardRows.foreach { r =>
      assert(expectShard(r.getLong(1)) === r.getString(4),
        s"shard ${r.getLong(1)} hash")
    }
    val expectRoot = md5hex(expectShard.toSeq.sortBy(_._1).map(_._2).mkString)
    assert(rootRow.getString(4) === expectRoot)
    // tamper evidence: flipping ONE doc fingerprint must change its
    // shard hash and therefore the root
    val (sh0, ds0) = byShard.head
    val tampered = md5hex(ds0.sortBy(_._1).map(d =>
      if (d == ds0.head) md5hex("tampered") else d._2).mkString)
    assert(tampered !== expectShard(sh0), "tamper did not change the hash")
  }

  test("q167: phrase hits replay driver-side; absent phrase reports zero") {
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
    val expect = Index.PhraseProbes.map { ph =>
      val Array(w1, w2) = ph.split(" ")
      val perDoc = texts.map { case (_, t) =>
        val ws = t.split(" ", -1)
        ws.indices.dropRight(1).count(i => ws(i) == w1 && ws(i + 1) == w2)
      }
      ph -> ((perDoc.count(_ > 0).toLong, perDoc.map(_.toLong).sum))
    }.toMap
    val rows = Index.phraseSearch(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet === Index.PhraseProbes.toSet)
    expect.foreach { case (ph, e) =>
      assert(rows(ph) === e, s"phrase '$ph' counts")
    }
    assert(rows("petabyte engine") === ((0L, 0L)),
      "absent phrase must report zero, not vanish")
    assert(rows.values.exists { case (d, o) => o > d },
      "no phrase repeats within a doc — adjacency join under-counting?")
  }

  test("q176: bloom positives replay driver-side; no false negatives ever") {
    def h(i: Int, id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16) %
        Layout.BloomBits
    }
    val docs = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val byFile = docs.groupBy(_ / Layout.BloomFileDocs)
    val blooms = byFile.map { case (f, ids) =>
      f -> ids.flatMap(id => (0 until Layout.BloomHashes).map(h(_, id))).toSet
    }
    val rows = Layout.bloomSkipAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getAs[java.lang.Long]("true_file")).map(_.toLong),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq === Layout.BloomProbeIds.sorted)
    rows.foreach { case (p, present, tf, nFiles, nPos, nFp) =>
      assert(nFiles === byFile.size.toLong)
      val probeBits = (0 until Layout.BloomHashes).map(h(_, p)).toSet
      val positives = blooms.count { case (_, bits) =>
        probeBits.subsetOf(bits) }
      assert(nPos === positives.toLong, s"probe $p positive-file count")
      if (docs.contains(p)) {
        assert(present === 1L && tf === Some(p / Layout.BloomFileDocs))
        // Bloom's contract: the true file is ALWAYS positive
        assert(probeBits.subsetOf(blooms(p / Layout.BloomFileDocs)),
          s"probe $p: false negative — bloom broken")
        assert(nFp === nPos - 1)
      } else {
        assert(present === 0L && tf.isEmpty && nFp === nPos)
      }
    }
    info(s"false positives across probes: ${rows.map(_._6).sum} " +
      s"over ${byFile.size} files × ${rows.length} probes")
  }

  test("q196: Z-order prunes at least as well as linear on every non-x-only probe") {
    val rows = graft.ext.Layout.pruneAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val probes = graft.ext.Layout.PruneProbes.map(_._1).toSet
    assert(rows.map(_._2).toSet === probes)
    // n_files counts OCCUPIED files: ≤ 2^Bits, uniform within a layout
    assert(rows.forall(r => r._3 >= 1 &&
      r._3 <= graft.ext.Layout.RangeSize.toLong))
    rows.groupBy(_._1).values.foreach(g =>
      assert(g.map(_._3).distinct.size == 1, "file count varies per probe"))
    val z = rows.filter(_._1 == "zorder").map(r => r._2 -> ((r._4, r._5))).toMap
    val l = rows.filter(_._1 == "linear").map(r => r._2 -> ((r._4, r._5))).toMap
    // probe 1 is the x-band where a pure-x sort is optimal; everywhere
    // else the Z layout must scan no MORE files, and on the aligned 2-D
    // tiles (probes 3-5) it must scan strictly FEWER
    probes.filter(_ != 1L).foreach { p =>
      assert(z(p)._1 <= l(p)._1, s"probe $p: zorder scans more files")
    }
    Seq(3L, 4L, 5L).foreach { p =>
      assert(z(p)._1 < l(p)._1, s"probe $p: Z should strictly win a 2-D tile")
    }
    // a scanned file always contains at least the probe's matching rows:
    // rows_scanned can never be below files_scanned (nonempty files)
    rows.foreach { case (lay, p, _, fs, rs) =>
      assert(rs >= fs, s"$lay probe $p: scanned rows < scanned files")
    }
  }
}
