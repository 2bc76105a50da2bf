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
}
