package graft

import graft.ext.{Index, Retrieval, Similarity}
import graft.tables.Tables

class RetrievalSpec extends SparkSpec {

  test("q155 structure: per-query fused list, contiguous ranks, no self-hit") {
    val rows = Retrieval.hybridRrf(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (q, rs) =>
      assert(rs.length <= Retrieval.FuseK)
      assert(rs.map(_.getAs[Long]("rnk")).sorted.toSeq ===
        (1 to rs.length).map(_.toLong))
      // the vector arm excludes the probe vector itself; the lexical arm
      // may legitimately retrieve the probe doc, but a fused self-hit
      // with a vec_rnk would mean the exclusion leaked
      rs.filter(_.getAs[Long]("doc_id") == q)
        .foreach(r => assert(r.isNullAt(r.fieldIndex("vec_rnk"))))
    }
  }

  test("q155 fused score is exactly the two-term RRF of the emitted ranks") {
    val rows = Retrieval.hybridRrf(spark, sf).collect()
    rows.foreach { r =>
      def term(f: String): Double =
        if (r.isNullAt(r.fieldIndex(f))) 0.0
        else 1.0 / (Retrieval.RrfK + r.getAs[Long](f))
      assert(r.getAs[Double]("rrf") === term("lex_rnk") + term("vec_rnk"))
      assert(!(r.isNullAt(r.fieldIndex("lex_rnk")) &&
        r.isNullAt(r.fieldIndex("vec_rnk"))))
    }
    // fused order is (rrf desc, doc_id) within each query
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val (ra, rb) = (a.getAs[Double]("rrf"), b.getAs[Double]("rrf"))
          assert(ra > rb ||
            (ra == rb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
        case _ =>
      }
    }
  }

  test("q155 lexical arm agrees with q118's ranked list") {
    val lex = Index.bm25TopK(spark, sf).collect()
      .filter(_.getAs[Long]("rnk") <= Retrieval.FuseK)
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("rnk")).toMap
    val fusedLex = Retrieval.hybridRrf(spark, sf).collect()
      .filter(r => !r.isNullAt(r.fieldIndex("lex_rnk")))
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("lex_rnk")).toMap
    // every fused row claiming a lexical rank must carry q118's rank
    fusedLex.foreach { case (k, v) => assert(lex.get(k).contains(v)) }
    // and every arm hit that survives fusion is in the fused output:
    // a doc in BOTH arms outranks (or ties into) the budget by
    // construction, so the top of the lex arm can only be displaced by
    // double-counted docs — spot-check rank-1 lex docs always survive
    lex.collect { case ((q, d), 1L) => (q, d) }.foreach { k =>
      assert(fusedLex.contains(k) ||
        // unless it won via vec too and carries both ranks — still present
        Retrieval.hybridRrf(spark, sf).collect().exists(r =>
          r.getAs[Long]("query_id") == k._1 &&
            r.getAs[Long]("doc_id") == k._2))
    }
  }

  test("q158: served hybrid obeys the RRF law; vector arm is LSH-served") {
    val rows = Retrieval.hybridLshServe(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      def term(f: String): Double =
        if (r.isNullAt(r.fieldIndex(f))) 0.0
        else 1.0 / (Retrieval.RrfK + r.getAs[Long](f))
      assert(r.getAs[Double]("rrf") === term("lex_rnk") + term("vec_rnk"))
    }
    // every vec-armed fused doc must come from the q18-served lists —
    // the arm is the bucket-bounded production path, not an exact scan
    val lsh = Similarity.knnLshServe(
        Similarity.lshIndexOf(Tables.embeddings(spark, sf)), Retrieval.FuseK)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.filter(r => !r.isNullAt(r.fieldIndex("vec_rnk"))).foreach { r =>
      assert(lsh((r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))))
    }
  }

  test("q170: packing replays the greedy budget walk over the BM25 shortlist") {
    val shortlist = Index.bm25TopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val dl = Tables.documents(spark, sf)
      .selectExpr("doc_id", "cast(size(split(text, ' ')) as long) as dl")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = shortlist.groupBy(_._1).toSeq.flatMap { case (q, rs) =>
      var cum = 0L
      rs.sortBy(_._2).toSeq.flatMap { case (_, rnk, doc) =>
        val keep = cum < Retrieval.PackBudgetTokens
        cum += dl(doc)
        if (keep) Some((q, rnk, doc, dl(doc))) else None
      }
    }.toSet
    val rows = Retrieval.contextPack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.map(t => (t._1, t._2, t._3, t._4)).toSet === expect)
    // cum_tok is the inclusive running total per query
    rows.groupBy(_._1).foreach { case (q, rs) =>
      var cum = 0L
      rs.sortBy(_._2).foreach { r => cum += r._4
        assert(r._5 === cum, s"query $q rank ${r._2} running total") }
      assert(rs.nonEmpty, s"query $q packed nothing")
    }
    // the budget must actually bite somewhere, and packing must keep >1
    val kept = rows.groupBy(_._1).view.mapValues(_.length)
    assert(kept.values.exists(_ < Index.Bm25K), "budget never dropped a doc")
    assert(kept.values.exists(_ > 1), "packing degenerate — one doc per query")
  }

  test("q174: MRR audit replays from the fused list and exact truth") {
    val emb = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val quant = emb.map { case (id, v) =>
      val ss = v.map(x => x * x).sum
      id -> v.map(x => math.floor(x / math.sqrt(ss) * 127 + 0.5).toLong)
    }.toMap
    val fused = Retrieval.hybridRrf(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val queries = fused.map(_._1).distinct
    val rows = Retrieval.mrrAudit(spark, sf).collect()
      .map(r => (r.getLong(0),
        Option(r.getAs[java.lang.Long]("first_hit")).map(_.toLong),
        r.getLong(2))).toList
    queries.foreach { q =>
      val qa = quant(q)
      val truth = quant.keys.filter(_ != q).toSeq
        .map(n => n -> (0 until 64).map(d => qa(d) * quant(n)(d)).sum)
        .sortBy { case (n, dot) => (-dot, n) }
        .take(Retrieval.MrrTruthK).map(_._1).toSet
      val hit = fused.filter(_._1 == q).sortBy(_._2)
        .find(t => truth(t._3)).map(_._2)
      val Some((_, fh, rr)) = rows.find(_._1 == q)
      assert(fh === hit, s"query $q first-hit rank")
      assert(rr === hit.map(60L / _).getOrElse(0L), s"query $q rr")
    }
    val Some((_, _, totalRr)) = rows.find(_._1 == -1L)
    assert(totalRr === rows.filter(_._1 >= 0).map(_._3).sum)
    assert(totalRr > 0, "hybrid never surfaced a true neighbor — audit vacuous")
    rows.filter(_._1 >= 0).foreach { case (_, _, rr) =>
      assert(Set(0L, 12L, 15L, 20L, 30L, 60L)(rr), s"invalid rr_x60 $rr")
    }
  }

  test("q194: DCG bounded by IDCG; IDCG matches the closed form; total row sums") {
    val rows = Retrieval.ndcgAudit(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(r.fieldIndex("ndcg")))).toList
    val per = rows.filter(_._1 >= 0)
    assert(per.nonEmpty)
    // with a full MrrTruthK truth list, IDCG = Σ (M+1-r)·W(r)
    val idcgFull = (1 to Retrieval.MrrTruthK)
      .map(r => (Retrieval.MrrTruthK + 1 - r) * Retrieval.NdcgW(r - 1)).sum
    per.foreach { case (q, dcg, idcg, ndcg) =>
      assert(idcg === idcgFull, s"query $q idcg")
      assert(dcg >= 0 && dcg <= idcg, s"query $q dcg out of [0, idcg]")
      assert(ndcg === dcg.toDouble / idcg, s"query $q ndcg")
    }
    val Some((_, tDcg, tIdcg, _)) = rows.find(_._1 == -1L)
    assert(tDcg === per.map(_._2).sum)
    assert(tIdcg === per.map(_._3).sum)
    assert(tDcg > 0, "hybrid never surfaced graded truth — audit vacuous")
    // embedded discount weights are the frozen ⌊1e6/log2(i+1)⌋ table
    assert(Retrieval.NdcgW === Seq(1000000L, 630929L, 500000L, 430676L, 386852L))
  }

  test("q223: planted near-dups are suppressed, unembedded docs survive, " +
      "ranks re-densify") {
    import SparkSpec.spark.implicits._
    // shortlist for one query: ranks 1..5; docs 11/12 identical vectors
    // (dot = 127² · 64-dim normalized ≈ 16129 ≥ threshold), doc 13
    // orthogonal, doc 14 = copy of 13, doc 15 has NO embedding row
    val sl = Seq((100L, 1L, 11L), (100L, 2L, 12L), (100L, 3L, 13L),
      (100L, 4L, 14L), (100L, 5L, 15L)).toDF("query_id", "rnk", "doc_id")
    def unit(axis: Int): Array[Long] =
      Array.tabulate(64)(i => if (i == axis) 127L else 0L)
    val quant = Seq((11L, unit(0)), (12L, unit(0)), (13L, unit(1)),
      (14L, unit(1))).toDF("vec_id", "q")
    val out = Retrieval.serveSuppressOf(sl, quant).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // 12 suppressed by 11; 14 suppressed by 13; 15 survives (no vector)
    assert(out.toSeq === Seq((1L, 11L, 1L), (2L, 13L, 3L), (3L, 15L, 5L)))
    // and the registered query stays sane on the fixture: dense ranks,
    // never more results than the fused list
    val full = Retrieval.serveSuppress(spark, sf).collect()
    assert(full.nonEmpty)
    val byQ = full.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq ===
        (1L to rows.length).toSeq, s"query $q ranks not dense")
      assert(rows.length <= Retrieval.FuseK)
    }
  }
}
