package graft

import graft.ext.{Graph, Similarity}

/** Cross-checks the iterative traversals (q242–q244) against driver-side
  * reference computations over the SAME collected edge set — independent
  * of the Spark join/iteration machinery they exercise. */
class GraphSpec extends SparkSpec {

  // the mutual-kNN pair set, collected once (sf0.001: 500 vectors)
  private lazy val pairs: Array[(Long, Long, Long)] =
    Similarity.mutualKnn(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("rnk_ab") + r.getAs[Long]("rnk_ba")))

  private lazy val adj: Map[Long, Seq[(Long, Long)]] =
    (pairs.map(p => (p._1, (p._2, p._3))) ++
      pairs.map(p => (p._2, (p._1, p._3))))
      .groupBy(_._1).map { case (v, es) => v -> es.map(_._2).toSeq }

  private lazy val seeds: Set[Long] =
    SparkSpec.spark.read.parquet(s"$sf/embeddings.parquet")
      .where(s"label = ${Graph.SeedLabel}")
      .collect().map(_.getAs[Long]("vec_id")).toSet

  test("q242 BFS hops equal a driver-side reference BFS") {
    val expected = scala.collection.mutable.Map[Long, Long]()
    seeds.foreach(expected(_) = 0L)
    var frontier = seeds
    for (h <- 1L to Graph.MaxHops.toLong) {
      frontier = frontier.flatMap(v => adj.getOrElse(v, Nil).map(_._1))
        .filterNot(expected.contains)
      frontier.foreach(expected(_) = h)
    }
    val got = Graph.bfsHops(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("hops")).toMap
    assert(got === expected.toMap)
  }

  test("q242 output is vec_id-sorted with seeds at hop 0") {
    val rows = Graph.bfsHops(spark, sf).collect()
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.sameElements(ids.sorted), "output must be vec_id-ordered")
    rows.foreach { r =>
      val isSeed = r.getAs[Int]("label") == Graph.SeedLabel
      assert((r.getAs[Long]("hops") == 0L) === isSeed,
        s"hop 0 iff seed-labeled: $r")
    }
  }

  test("q243 degree-oriented triangles equal naive enumeration") {
    val edgeSet = pairs.map(p => (p._1, p._2)).toSet
    val naive = (for {
      (a, b) <- edgeSet
      (b2, c) <- edgeSet if b2 == b
      if edgeSet.contains((a, c))
    } yield (a, b, c)).toSet
    val got = Graph.triangles(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
        r.getAs[Long]("c_id"))).toSet
    assert(got === naive)
    assert(naive.nonEmpty, "fixture should contain at least one triangle")
    naive.foreach { case (a, b, c) => assert(a < b && b < c) }
  }

  test("q244 cheapest ≤4-hop costs equal driver-side Bellman-Ford") {
    val expected = scala.collection.mutable.Map[Long, Long]()
    seeds.foreach(expected(_) = 0L)
    for (_ <- 1 to Graph.MaxHops) {
      val relaxed = expected.toSeq.flatMap { case (v, c) =>
        adj.getOrElse(v, Nil).map { case (u, w) => u -> (c + w) }
      }
      relaxed.foreach { case (u, c) =>
        if (c < expected.getOrElse(u, Long.MaxValue)) expected(u) = c
      }
    }
    val got = Graph.cheapestPaths(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cost")).toMap
    assert(got === expected.toMap)
  }

  test("q247 integer PageRank equals a driver-side reference run") {
    val allNodes = SparkSpec.spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(_.getAs[Long]("vec_id"))
    val deg = adj.map { case (v, es) => v -> es.size.toLong }
    var mass = allNodes.map(_ -> Graph.PrMass).toMap
    for (_ <- 1 to Graph.PrIters) {
      val incoming = scala.collection.mutable.Map[Long, Long]()
      mass.foreach { case (u, m) =>
        adj.getOrElse(u, Nil).foreach { case (v, _) =>
          incoming(v) = incoming.getOrElse(v, 0L) + m * 85 / (100 * deg(u))
        }
      }
      mass = allNodes
        .map(v => v -> (Graph.PrMass * 15 / 100 + incoming.getOrElse(v, 0L)))
        .toMap
    }
    val got = Graph.pagerank(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("mass")).toMap
    assert(got === mass)
    // well-connected nodes must rise above isolated ones (pure teleport)
    val isolated = allNodes.filterNot(adj.contains).toSet
    assert(isolated.forall(v =>
      got(v) === Graph.PrMass * 15 / 100), "isolated nodes keep teleport mass")
    assert(got.exists(_._2 > Graph.PrMass),
      "no node accumulated rank — propagation broken?")
  }

  test("q244 reaches exactly the q242 node set, cost bounded by 10·hops") {
    val hops = Graph.bfsHops(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("hops")).toMap
    val cost = Graph.cheapestPaths(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cost")).toMap
    assert(cost.keySet === hops.keySet,
      "same bound, same graph → same reachable set")
    cost.foreach { case (v, c) =>
      // the min-hop path is one candidate walk; each edge costs 2..10
      assert(c >= 2 * hops(v) && c <= 10 * hops(v),
        s"vec $v: cost $c vs hops ${hops(v)}")
    }
  }
}
