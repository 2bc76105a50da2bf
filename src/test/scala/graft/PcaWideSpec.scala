package graft

import graft.ext.Similarity

/** Locks the decimal(38,0) "wide" PCA spelling — the fallback the
  * q134/q142 chain self-selects past [[Similarity.PcaInt64SafeRows]]:
  *
  *  - bit-equivalence with the int64 spelling on a corpus where both
  *    fit (the harness corpora);
  *  - exactness on a synthetic large-magnitude corpus whose Gram
  *    products EXCEED int64, checked against a driver-side BigInt
  *    recomputation of the full quantize → Gram → renormalized
  *    power-iteration recurrence. On that corpus the narrow spelling
  *    dies in ANSI ARITHMETIC_OVERFLOW (or, without ANSI, wraps to
  *    garbage) — the row-count gate is load-bearing, not decorative. */
class PcaWideSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def vmap(v: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    v.collect().map(r => r.getAs[Number]("k").longValue ->
      r.getAs[Number]("v").longValue).toMap

  test("wide PCA spelling ≡ int64 spelling where both fit (sf0.001)") {
    val emb = graft.tables.Tables.embeddings(spark, sf)
    val (_, vn, _) = Similarity.buildPcaParts(emb, 64, wide = false)
    val (_, vw, _) = Similarity.buildPcaParts(emb, 64, wide = true)
    val n = vmap(vn)
    assert(n.size === 64)
    assert(n === vmap(vw))
  }

  test("past-int64 corpus: wide matches BigInt recurrence; narrow cannot") {
    val dim = 4
    // whole numbers < 2^24 so float → double → ×scale is exact; the
    // quantized values are ~1e10, so a single Gram product is ~1e20 —
    // past Long.MaxValue (9.2e18) on the very first multiplication
    val vecs: Seq[Array[Float]] = Seq(
      Array(12000000f, -7000000f, 3000000f, 15000000f),
      Array(-5000000f, 11000000f, 8000000f, -2000000f),
      Array(9000000f, 4000000f, -13000000f, 6000000f),
      Array(1000000f, -16000000f, 2000000f, 10000000f),
      Array(-8000000f, 5000000f, 14000000f, -3000000f))
    val emb = vecs.zipWithIndex.map { case (a, i) => (i.toLong, a) }
      .toDF("vec_id", "embedding")
    // driver-side BigInt model of the identical recurrence
    val q = vecs.map(_.map(x =>
      BigInt(math.floor(x.toDouble * Similarity.PcaScale + 0.5).toLong)))
    val gram = Array.tabulate(dim, dim)((j, k) =>
      vecs.indices.map(i => q(i)(j) * q(i)(k)).sum)
    var v = Array.fill(dim)(BigInt(Similarity.PcaVCap))
    for (_ <- 1 to Similarity.PcaRounds) {
      val w = Array.tabulate(dim)(j =>
        (0 until dim).map(k => gram(j)(k) * v(k)).sum)
      val m = w.map(_.abs).max.max(BigInt(1))
      v = w.map(x => (if (x < 0) BigInt(-1) else BigInt(1)) *
        ((x.abs * Similarity.PcaVCap) / m))
    }
    val expected = v.zipWithIndex.map { case (x, k) => k.toLong -> x.toLong }
      .toMap
    val (_, vw, _) = Similarity.buildPcaParts(emb, dim, wide = true)
    assert(vmap(vw) === expected)
    // the narrow spelling on the same corpus: ANSI overflow, or (without
    // ANSI) silent wraparound that cannot reproduce the exact iterate
    val narrow =
      try {
        val (_, vn, _) = Similarity.buildPcaParts(emb, dim, wide = false)
        Some(vmap(vn))
      } catch { case _: Throwable => None }
    assert(narrow.forall(_ != expected),
      "int64 spelling should not survive a past-int64 corpus")
  }
}
