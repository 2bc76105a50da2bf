package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VectorFunctions.cosine_sim
import graft.tables.Tables

/** Similarity search over the `embeddings` table (`array<float>`, 64-dim) —
  * north-star extension (no counterpart in the reference; SURVEY.md §7.4).
  *
  * Two tiers:
  *  - [[knnBruteForce]]: exact top-k, O(Q·N) scored pairs. The baseline and
  *    the oracle-checkable path. Scales by broadcasting the (small) query
  *    set and streaming the candidate scan — no shuffle of the big side
  *    until the per-query top-k reduction.
  *  - [[knnLsh]]: sign-random-projection LSH (Charikar SimHash family):
  *    L hash tables × b hyperplane bits; candidates = same bucket in any
  *    table. At 100 TB this turns O(Q·N) into O(Q·N/2^b·L) with recall
  *    tunable via (L, b). The bucket join is a plain equi-join Spark
  *    shuffles/broadcasts like any other — no custom operator needed.
  */
object Similarity {

  private val Dim = 64

  /** Deterministic Gaussian hyperplanes (fixed seed — results must be
    * reproducible across runs and engines). */
  private def hyperplanes(tables: Int, bits: Int): Array[Array[Array[Float]]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(tables, bits, Dim)(rnd.nextGaussian().toFloat)
  }

  /** Bit-signature column: for one table's hyperplanes, pack sign bits of
    * dot(embedding, plane_j) into an int. Pure built-in expressions
    * (aggregate over zip_with) → codegen'd, no UDF. */
  private def signature(emb: org.apache.spark.sql.Column,
      planes: Array[Array[Float]]): org.apache.spark.sql.Column = {
    planes.zipWithIndex.map { case (p, j) =>
      val dot = aggregate(
        zip_with(emb, lit(p), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v)
      when(dot >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** q17 — exact kNN: top-3 cosine neighbors for query vectors vec_id<10.
    * Output is integer-only (ids + rank) so float ULP differences between
    * engines cannot affect the hash compare.
    *
    * Top-k via [[graft.functions.TopK]] partial aggregation: each map task
    * reduces its candidates to ≤k per query BEFORE the shuffle, so the
    * exchange carries O(Q·k·partitions) rows — not the O(Q·N) a
    * row_number window would shuffle ([[knnBruteForceWindow]] keeps the
    * window formulation for comparison). */
  def knnBruteForce(s: SparkSession, dir: String): DataFrame = {
    val top = scoredPairs(s, dir)
      .groupBy(col("query_id"))
      .agg(graft.functions.TopK.top_k(3)(col("neighbor_id"), col("cos"))
        .as("top"))
    top.select(col("query_id"),
        posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Window-ranking formulation of q17 (shuffles all scored pairs);
    * retained as the semantic baseline the aggregator is tested against. */
  def knnBruteForceWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scoredPairs(s, dir)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  private def scoredPairs(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine_sim(col("q_emb"), col("embedding")).as("cos"))
  }

  val knnBruteForceSql: String =
    """WITH q AS (
      |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
      |  FROM embeddings WHERE vec_id < 10),
      |s AS (
      |  SELECT query_id, e.vec_id AS neighbor_id,
      |    list_cosine_similarity(qe, CAST(e.embedding AS DOUBLE[])) AS cos
      |  FROM q CROSS JOIN embeddings e WHERE e.vec_id <> query_id),
      |r AS (
      |  SELECT query_id, neighbor_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rnk
      |  FROM s)
      |SELECT query_id, neighbor_id, rnk FROM r WHERE rnk <= 3
      |ORDER BY query_id, rnk""".stripMargin

  /** q18 — LSH-bucketed approximate kNN (the scale path; no SQL oracle —
    * verified against [[knnBruteForce]] recall in SimilaritySpec).
    * L=4 tables × b=6 bits: each vector lands in 4 buckets; query and
    * candidate meet if they share any bucket. */
  def knnLsh(s: SparkSession, dir: String,
      tables: Int = 4, bits: Int = 6, k: Int = 3): DataFrame = {
    val planes = hyperplanes(tables, bits)
    val e = Tables.embeddings(s, dir)

    // explode each vector into (table_idx, bucket) rows — L rows per vector
    val bucketed = e.select(
      col("vec_id"), col("embedding"),
      posexplode(array(planes.zipWithIndex.map { case (tp, t) =>
        signature(col("embedding"), tp)
      }: _*)).as(Seq("tbl", "bucket")))

    val q = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("tbl"), col("bucket"))
    val cand = bucketed.select(col("vec_id").as("neighbor_id"),
      col("embedding"), col("tbl"), col("bucket"))

    val pairs = q.join(cand, Seq("tbl", "bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("q_emb"),
        col("embedding"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = pairs.select(col("query_id"), col("neighbor_id"),
      cosine_sim(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** q44 — IVF-style ANN: k-means coarse quantizer (spark-mllib, fixed
    * seed), vectors inverted-listed by nearest centroid, queries probe the
    * `nprobe` nearest centroids and exact-rerank only those lists.
    * At 100 TB: centroids are trained on a sample, the assignment pass is
    * one map over the data, and the search touches ~nprobe/k of the
    * corpus — the standard IVF trade (recall vs fraction scanned).
    * No SQL oracle (k-means is engine-specific); SimilaritySpec bounds
    * recall against [[knnBruteForce]]. */
  def knnIvf(s: SparkSession, dir: String,
      k: Int = 16, nprobe: Int = 4, topK: Int = 3): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.embeddings(s, dir)
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(k).setSeed(42L).setMaxIter(10)
      .fit(e.select(col("features")))
    val assigned = model.transform(e)
      .select(col("vec_id"), col("embedding"),
        col("prediction").as("centroid"))

    // queries probe their nprobe nearest centroids (distance to centroid
    // computed driver-side: k centroids is tiny by construction)
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    val probeUdf = udf { (emb: Seq[Float]) =>
      centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0; var j = 0
        while (j < c.length) {
          val diff = c(j) - emb(j); d += diff * diff; j += 1
        }
        (d, i)
      }.sortBy(_._1).take(nprobe).map(_._2)
    }
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(probeUdf(col("embedding"))).as("centroid"))

    val pairs = q.join(assigned, Seq("centroid"))
      .filter(col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine_sim(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= topK)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
      .orderBy(col("query_id"), col("rnk"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q17_knn_brute"  -> (knnBruteForce _),
    "q18_knn_lsh"    -> ((s: SparkSession, d: String) => knnLsh(s, d)),
    "q44_knn_ivf"    -> ((s: SparkSession, d: String) => knnIvf(s, d)))

  val oracles: Map[String, String] = Map(
    "q17_knn_brute" -> knnBruteForceSql)
}
