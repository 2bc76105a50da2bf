package graft

import org.apache.spark.sql.functions._
import graft.ext.{Corpus, Text}
import graft.tables.Tables

/** Corpus-hygiene operators: the Bloom decontamination path and the
  * two-phase global numbering (q84/q85 semantics the oracle alone can't
  * pin — sketch-path equivalence and the permutation contract). */
class CorpusSpec extends SparkSpec {
  import SparkSpec.{spark, sf}

  test("q130: two-phase interleave equals the naive global window on " +
    "unequal sources") {
    import SparkSpec.spark.implicits._
    // unequal source sizes (the harness corpus is degenerate: all equal)
    val docs = ((1L to 50L).map(i => (i, "big")) ++
      (51L to 63L).map(i => (i, "mid")) ++
      (64L to 66L).map(i => (i, "tiny")))
      .toDF("doc_id", "source")
    val got = Corpus.interleaveOf(docs).collect()
    val w = org.apache.spark.sql.expressions.Window
    val naive = docs
      .withColumn("src_rank", row_number().over(
        w.partitionBy(col("source")).orderBy(col("doc_id"))).cast("long"))
      .withColumn("src_cnt", count(lit(1)).over(
        w.partitionBy(col("source"))))
      .withColumn("ikey", (col("src_rank") - lit(0.5)) / col("src_cnt"))
      .withColumn("pos", row_number().over(
        w.orderBy(col("ikey"), col("source"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("source"), col("src_rank"), col("src_cnt"),
        col("ikey"), col("pos"))
      .orderBy(col("pos")).collect()
    assert(got.toSeq === naive.toSeq)
    // positions are a permutation of 1..N
    assert(got.map(_.getLong(5)).toSeq === (1L to 66L).toSeq)
    // uniform spread: each source's consecutive positions are never more
    // than ~2·N/cnt apart (a source-block concatenation would show N-cnt)
    got.groupBy(_.getString(1)).foreach { case (_, rs) =>
      val ps = rs.map(_.getLong(5)).sorted
      val cnt = rs.length
      val maxGap = (ps.head +: ps.sliding(2).collect {
        case Array(a, b) => b - a }.toSeq).max
      assert(maxGap <= 2L * 66L / cnt + 1,
        s"uneven interleave: gaps ${ps.mkString(",")}")
    }
  }

  test("q84: bloom prefilter + exact confirm equals the exact-set plan") {
    // The Bloom stage must be invisible: no false negatives exist, and
    // the confirm join removes the false positives — so the sketch path
    // must produce byte-identical rows to the q59-style exact broadcast
    // formulation at the same eval split.
    val docs = Tables.documents(spark, sf)
    val sh = Text.ngramIndexOf(docs, 5)
    val evalSh = sh.filter(col("doc_id") < Corpus.BloomEvalMax)
      .select(col("shingle")).distinct()
    val shared = sh.filter(col("doc_id") >= Corpus.BloomEvalMax)
      .join(broadcast(evalSh), Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    val exact = docs.filter(col("doc_id") >= Corpus.BloomEvalMax)
      .select(col("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) >= Corpus.BloomMinShingles)
          .as("contaminated"))
    val bloomed = Corpus.bloomDecontamination(spark, sf)
    assert(bloomed.exceptAll(exact).isEmpty && exact.exceptAll(bloomed).isEmpty,
      "bloom path diverged from the exact formulation")
  }

  test("q84: at least one document shares shingles with the eval set") {
    // guards against a vacuously-green oracle (all n_shared = 0 would
    // pass the hash check without exercising the bloom or the confirm)
    val n = Corpus.bloomDecontamination(spark, sf)
      .filter(col("n_shared") > 0).count()
    assert(n > 0, "no overlap at all — the decontamination path is untested")
  }

  test("q85: global ids are exactly the permutation 1..N in (shard, doc_id) order") {
    val rows = Corpus.globalIds(spark, sf).collect()
    val n = rows.length
    assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to n).toSeq,
      "global_id is not a 1..N permutation")
    val inOrder = rows.sortBy(r => (r.getLong(1), r.getLong(0)))
    assert(inOrder.map(_.getLong(2)).toSeq == (1L to n).toSeq,
      "ids do not follow the (shard, doc_id) ordering contract")
  }

  test("q89: every reconciliation status occurs and statuses partition the union") {
    val rows = Corpus.snapshotDiff(spark, sf).collect()
    val byStatus = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // a gate/fingerprint bug typically silences one status (e.g. a fp
    // construction mismatch turns every 'unchanged' into 'changed')
    for (st <- Seq("added", "removed", "changed", "unchanged"))
      assert(byStatus.getOrElse(st, 0) > 0, s"no '$st' rows: $byStatus")
    assert(byStatus("unchanged") > byStatus("changed"),
      s"most docs have no boilerplate — 'changed' should be the minority: $byStatus")
    assert(rows.map(_.getLong(0)).distinct.length === rows.length,
      "a doc_id appears twice in the diff")
  }

  test("q85: sharding actually spreads the corpus (no empty-offset degenerate)") {
    // the two-phase plan only beats a global sort if rows land on many
    // shards; a broken hash (all rows on one shard) would still pass the
    // permutation test while silently recreating the single-partition sort
    val df = Corpus.globalIds(spark, sf)
    val shards = df.select(col("shard")).distinct().count()
    assert(shards > Corpus.IdShards / 2,
      s"only $shards of ${Corpus.IdShards} shards used — hash is degenerate")
    assert(df.filter(col("shard") < 0 || col("shard") >= Corpus.IdShards)
      .isEmpty, "shard outside [0, IdShards)")
  }

  test("q99: gate covers the whole batch and every status fires") {
    val rows = Corpus.ingestGate(spark, sf).collect()
    val batchSize = Tables.documents(spark, sf)
      .filter(graft.ext.Text.md5Bucket1000(col("doc_id")) >=
        Corpus.IngestOldMax)
      .count()
    assert(rows.length == batchSize, "gate dropped or invented batch rows")
    val statuses = rows.map(_.getString(3)).toSet
    assert(statuses == Set("too_short", "near_dup", "accepted"),
      s"vacuous gate: only $statuses fired")
    // precedence: any too_short row must be short regardless of overlap
    rows.filter(_.getString(3) == "too_short").foreach { r =>
      assert(r.getLong(1) < Corpus.IngestMinTok)
    }
    rows.filter(_.getString(3) == "near_dup").foreach { r =>
      assert(r.getLong(1) >= Corpus.IngestMinTok &&
        r.getLong(2) >= Corpus.IngestMinShared)
    }
    rows.filter(_.getString(3) == "accepted").foreach { r =>
      assert(r.getLong(1) >= Corpus.IngestMinTok &&
        r.getLong(2) < Corpus.IngestMinShared)
    }
  }

  test("q116: target-only bigrams score above 1, offtarget-only below") {
    import SparkSpec.spark.implicits._
    // phrase P lives only in en (target) docs, phrase Q only in de docs;
    // probes 100/101 carry purely P/Q features, so their smoothed
    // target/raw ratio means land on opposite sides of 1
    val P = "pp qq rr ss tt uu"
    val Q = "kk ll mm nn oo ww"
    // 200 docs per phrase so the real counts dominate the +B=512
    // smoothing (with counts ≪ B, add-1 smoothing pulls every λ to ~1)
    val docs = (
      (1L to 200L).map(i => (i, P, "en")) ++
      (201L to 400L).map(i => (i, Q, "de")) ++
      Seq((1000L, P, "zh"), (1001L, Q, "zh"))
    ).toDF("doc_id", "text", "lang")
    val out = Corpus.importanceWeightsOf(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1000L) > 1.0, s"target-like probe scored ${out(1000L)}")
    assert(out(1001L) < 1.0, s"offtarget probe scored ${out(1001L)}")
    assert(out(1000L) > out(1001L) * 1.5, "separation too weak to be real")
  }

  test("q120: waterfill exhausts the budget exactly, never over-allocates") {
    val rows = Corpus.waterfillBudget(SparkSpec.spark, sf).collect()
    val caps = rows.map(_.getLong(2))
    val budget = caps.sum * Corpus.WaterfillNum / Corpus.WaterfillDen
    // Σ alloc = budget EXACTLY — the floor+remainder split loses nothing
    assert(rows.map(_.getLong(5)).sum === budget)
    rows.foreach { r =>
      val (cap, saturated, alloc) = (r.getLong(2), r.getBoolean(4), r.getLong(5))
      assert(alloc <= cap, s"${r.getString(0)}/${r.getString(1)} over-allocated")
      assert(!saturated || alloc === cap, "saturated domain must be taken whole")
    }
    // both branches fire on the fixture; unsaturated allocs differ by <= 1
    val (satd, unsat) = rows.partition(_.getBoolean(4))
    assert(satd.nonEmpty && unsat.nonEmpty)
    val ua = unsat.map(_.getLong(5))
    assert(ua.max - ua.min <= 1, "water level must be flat across unsaturated")
    // every saturated capacity sits at or below every unsaturated alloc:
    // that IS the waterfill property
    if (satd.nonEmpty) assert(satd.map(_.getLong(2)).max <= ua.min)
  }

  test("q121: greedy sample respects quotas and is maximal per domain") {
    val alloc = Corpus.waterfillBudget(SparkSpec.spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(4), r.getLong(5))).toMap
    val kept = Corpus.quotaSample(SparkSpec.spark, sf).collect()
      .groupBy(r => (r.getString(1), r.getString(2)))
    kept.foreach { case (dom, rs) =>
      val (cap, saturated, a) = alloc(dom)
      val toks = rs.map(_.getLong(3)).sum
      assert(toks <= a, s"$dom overshot its allocation")
      assert(rs.map(_.getLong(5)).max === toks, "cum_tok must match the sum")
      // saturated domains keep every document (all capacity tokens)
      if (saturated) assert(toks === cap, s"$dom saturated but trimmed")
    }
    // maximality: an unsaturated domain's leftover is < one more document,
    // i.e. the first dropped doc would not have fit — proven by cum_tok of
    // pick_rn+1 exceeding alloc, which the filter already encodes; here we
    // check the two branches are both exercised on the fixture
    val partial = kept.filter { case (dom, rs) =>
      rs.map(_.getLong(3)).sum < alloc(dom)._1 }
    assert(partial.nonEmpty && partial.size < kept.size)
  }

  test("q132: delta-join maintenance equals the full-join recompute and " +
      "the three delta terms partition the join") {
    import org.apache.spark.sql.functions._
    val s = SparkSpec.spark
    val maintained = Corpus.deltaJoinMaintenance(s, sf)
    val direct = graft.tables.Tables.orders(s, sf)
      .join(graft.tables.Tables.customer(s, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        graft.ops.Det.dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))
    assert(maintained.exceptAll(direct).isEmpty &&
      direct.exceptAll(maintained).isEmpty,
      "maintained view must equal the from-scratch recompute")
    // the three terms are disjoint and cover the join: row counts add up
    val full = direct.agg(sum(col("n_orders"))).collect()(0).getLong(0)
    assert(maintained.agg(sum(col("n_orders"))).collect()(0).getLong(0)
      === full, "delta terms must partition the joined row set")
    // both deltas are genuinely non-empty at this SF (else the test is vacuous)
    val oDelta = graft.tables.Tables.orders(s, sf)
      .filter(graft.ext.Text.md5Bucket1000(col("o_orderkey"))
        >= Corpus.IvmOrdersOldMax).count()
    val cDelta = graft.tables.Tables.customer(s, sf)
      .filter(graft.ext.Text.md5Bucket1000(col("c_custkey"))
        >= Corpus.IvmCustOldMax).count()
    assert(oDelta > 0 && cDelta > 0, "fixture deltas must be non-empty")
  }

  test("q122: malformed rows quarantine exactly; parsed rows roundtrip") {
    val docs = graft.tables.Tables.documents(SparkSpec.spark, sf)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val rows = Corpus.jsonIngest(SparkSpec.spark, sf).collect()
    assert(rows.length === docs.size)
    rows.foreach { r =>
      val id = r.getLong(0)
      val ok = r.getBoolean(1)
      assert(ok === (id % Corpus.JsonCorruptMod != 0),
        s"doc $id: quarantine flag wrong")
      if (ok) {
        assert(r.getString(2) === docs(id)._1, s"doc $id lang mismatch")
        assert(r.getLong(4) === docs(id)._2, s"doc $id n_chars mismatch")
        assert(r.getBoolean(6), s"doc $id roundtrip failed")
      } else {
        assert(r.isNullAt(2) && r.isNullAt(4), s"doc $id leaked past quarantine")
        assert(!r.getBoolean(6))
      }
    }
  }

  test("q198: A-ES sample replays driver-side and is length-biased") {
    import org.apache.spark.sql.functions._
    val rows = graft.ext.Corpus.aesWeightedSample(spark, sf).collect()
      .map(r => (r.getString(r.fieldIndex("source")),
        r.getLong(r.fieldIndex("rank")), r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("n_chars")), r.getLong(r.fieldIndex("kq"))))
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def key(docId: Long, w: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(docId.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(md.substring(0, 13), 16)
      math.floor(1e9 * math.log((h + 1).toDouble / (1L << 52)) / w).toLong
    }
    docs.map(_._1).distinct.foreach { src =>
      val expect = docs.filter(_._1 == src)
        .map { case (_, id, w) => (id, w, key(id, w)) }
        .sortBy { case (id, _, k) => (-k, id) }
        .take(graft.ext.Corpus.AesK)
      val got = rows.filter(_._1 == src).sortBy(_._2)
      assert(got.map(_._3).toSeq === expect.map(_._1).toSeq, s"source $src ids")
      assert(got.map(_._5).toSeq === expect.map(_._3).toSeq, s"source $src keys")
    }
    // Efraimidis–Spirakis property: inclusion prob ∝ weight, so the
    // sampled docs skew long — mean sampled length > corpus mean
    val sampledMean = rows.map(_._4).sum.toDouble / rows.length
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampledMean > corpusMean,
      s"weighted sample not length-biased: $sampledMean <= $corpusMean")
  }

  test("q202: greedy epoch schedule spends exactly the budget, in density order") {
    val rows = graft.ext.Corpus.epochAllocation(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getString(7)))
    val totalSupply = rows.filter(_._3 == 1L).map(_._4).sum
    val budget = totalSupply * graft.ext.Corpus.EpochBudgetNum /
      graft.ext.Corpus.EpochBudgetDen
    assert(rows.map(_._7).sum === budget, "allocation must spend the budget")
    // rows arrive in greedy order: density non-increasing, before = cumsum
    val dens = rows.map(_._5)
    assert(dens.zip(dens.tail).forall { case (a, b) => a >= b })
    var cum = 0L
    rows.foreach { r =>
      assert(r._6 === cum, s"before mismatch at ${(r._1, r._2, r._3)}")
      cum += r._4
    }
    // statuses partition the schedule: full* partial? cut*
    val statuses = rows.map(_._8)
    assert(statuses.count(_ == "partial") <= 1)
    val firstNonFull = statuses.indexWhere(_ != "full")
    if (firstNonFull >= 0)
      assert(statuses.drop(firstNonFull).forall(_ != "full"),
        "a full allocation after the boundary — not a greedy prefix")
    // an epoch never outranks an earlier epoch of its own domain
    rows.groupBy(r => (r._1, r._2)).values.foreach { g =>
      val byOrder = g.map(_._3)
      assert(byOrder.sameElements(byOrder.sorted),
        "later epoch scheduled before an earlier one")
    }
    // the budget regime must actually exercise repeats AND cuts
    assert(rows.exists(r => r._3 >= 2 && r._8 == "full"),
      "no repeated epoch was funded — budget regime wrong")
    assert(statuses.contains("cut"))
  }
}
