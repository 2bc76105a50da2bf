package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Shim, SimHash}
import graft.tables.Tables

/** Near-duplicate detection — north-star extension (SURVEY.md §7.4).
  *
  * Three sketch families, all avoiding the O(N²) all-pairs comparison that
  * is impossible at 100 TB:
  *
  *  - MinHash + LSH banding ([[minhashPairs]]): estimate word-shingle
  *    Jaccard from P permutation-minima; band the signature so only
  *    documents agreeing on a full band become candidate pairs. All
  *    built-in codegen'd expressions (xxhash64 + transform + array_min) —
  *    the signature never leaves Tungsten rows.
  *  - SimHash ([[simhashPairs]]): 64-bit fingerprint (custom one-pass
  *    Expression), Hamming-distance candidates via the 4×16-bit chunk
  *    pigeonhole trick (distance ≤3 ⇒ some chunk equal) — candidate join
  *    is again an equi-join on a small key.
  *  - Exact dedup is [[Text.exactDedup]] (md5 groupBy).
  *
  * Spark's own MinHashLSH (mllib) requires sparse ML vectors; operating
  * directly on token arrays with SQL expressions keeps everything inside
  * whole-stage codegen and off the driver.
  */
object Dedup {

  /** Fixed random affine permutations for MinHash (deterministic seed). */
  private val P = 32 // signature length
  private val Bands = 8 // 8 bands × 4 rows
  private val Rows = P / Bands
  /** 31-bit Mersenne prime domain: with a,h < 2^31, a*h+b < 2^62 — no
    * 64-bit overflow under ANSI mode (Spark 4 default). */
  private val MersennePrime = (1L << 31) - 1
  private val perms: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(1234567)
    Array.fill(P)((math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
      math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** Word 3-gram shingles from a materialized words-array column
    * (distinct). Texts shorter than 3 words fall back to one truncated
    * shingle. Takes the ARRAY column, not text: referencing a split()
    * expression inside the lambda would re-split the string per element
    * (O(L²) per document). */
  private[ext] def shinglesFromWords(w: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(w) - 2, lit(1))),
      i => concat_ws(" ",
        element_at(w, i),
        element_at(w, least(i + 1, size(w))),
        element_at(w, least(i + 2, size(w))))))

  /** MinHash signature array from a column of PRE-HASHED shingles
    * (`array<long>` in [0, p)): for permutation (a,b), min over
    * pmod(a*h+b, p). Keeping the expensive parts (split, shingle
    * construction, xxhash64) in separate materialized projections means
    * each runs ONCE per document; the 32 permutations are then pure
    * arithmetic over an in-memory long array. (Composing everything into
    * one expression tree instead re-evaluates split() per element per
    * permutation — measured 300× slower at sf0.1.) */
  def minhashSignature(hashedShingles: Column): Column =
    array(perms.map { case (a, b) =>
      array_min(transform(hashedShingles, h =>
        pmod(lit(a) * h + lit(b), lit(MersennePrime))))
    }: _*)

  /** doc_id + signature, with words/shingles/hashes staged as separate
    * projections so each is computed once. */
  def signatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), shinglesFromWords(col("w")).as("sh"))
      .select(col("doc_id"), transform(col("sh"),
        s => pmod(xxhash64(s), lit(MersennePrime))).as("hs"))
      .select(col("doc_id"), minhashSignature(col("hs")).as("sig"))

  /** Candidate near-dup pairs with MinHash-estimated Jaccard ≥ minEst.
    * est is k/P (exact rational in double) → deterministic output. */
  def minhashPairsOf(docs: DataFrame, minEst: Double): DataFrame = {
    val sig = signatures(docs)
    // band rows: (band_idx, band_signature=concat of Rows minhashes)
    val banded = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until Bands).map { bnd =>
        concat_ws("_", (0 until Rows).map(r =>
          element_at(col("sig"), bnd * Rows + r + 1)): _*)
      }: _*)).as(Seq("band", "band_sig")))
    val a = banded.select(col("doc_id").as("a_id"), col("sig").as("a_sig"),
      col("band"), col("band_sig"))
    val b = banded.select(col("doc_id").as("b_id"), col("sig").as("b_sig"),
      col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("a_sig"), col("b_sig"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        (aggregate(zip_with(col("a_sig"), col("b_sig"),
          (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast("double") / P).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
      .orderBy(col("a_id"), col("b_id"))
  }

  /** q24 — MinHash near-dup pairs over the corpus. */
  def minhashPairs(s: SparkSession, dir: String): DataFrame =
    minhashPairsOf(Tables.documents(s, dir), 0.5)

  /** Engine-portable MinHash signature: shingle hash = first 8 hex chars
    * of md5 parsed as an integer — identical in Spark
    * (`conv(substr(md5(s),1,8),16,10)`) and DuckDB
    * (`('0x'||substr(md5(s),1,8))::BIGINT`) — then the same affine
    * permutations. Lets the driver's DuckDB oracle verify the ENTIRE
    * minhash computation, not just row counts (q48). The xxhash64 variant
    * above stays the production path (no md5 string cost). */
  def portableSignatures(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), shinglesFromWords(col("w")).as("sh"))
      .select(col("doc_id"), transform(col("sh"), s =>
        pmod(conv(substring(md5(s), 1, 8), 16, 10).cast("long"),
          lit(MersennePrime))).as("hs"))
      .select(col("doc_id"), minhashSignature(col("hs")).as("sig"))

  /** q48 — portable minhash signatures, flattened to CSV for exact
    * cross-engine comparison. */
  def minhashPortable(s: SparkSession, dir: String): DataFrame =
    portableSignatures(Tables.documents(s, dir))
      .select(col("doc_id"),
        array_join(transform(col("sig"), x => x.cast("string")), ",")
          .as("sig_csv"))
      .orderBy(col("doc_id"))

  /** The DuckDB spelling of [[minhashPortable]], generated from the same
    * permutation constants so both engines compute identical signatures. */
  def minhashPortableSql: String = {
    val p = MersennePrime
    val mins = perms.map { case (a, b) =>
      s"list_min(list_transform(hs, h -> ($a * h + $b) % $p))"
    }.mkString(",\n    ")
    s"""WITH words AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, greatest(len(w) - 2, 1) + 1),
       |    i -> w[i] || ' ' || w[least(i + 1, len(w))] || ' ' ||
       |         w[least(i + 2, len(w))])) AS shingles
       |  FROM words),
       |hashed AS (
       |  SELECT doc_id, list_transform(shingles,
       |    s -> ('0x' || substr(md5(s), 1, 8))::BIGINT % $p) AS hs
       |  FROM sh)
       |SELECT doc_id, array_to_string([
       |    $mins
       |  ], ',') AS sig_csv
       |FROM hashed
       |ORDER BY doc_id""".stripMargin
  }

  def simhash64(c: Column): Column = Shim.column(SimHash(Shim.expression(c)))

  /** q25 — SimHash near-dup pairs: Hamming distance ≤ maxDist, candidates
    * via 16-bit chunk equality (pigeonhole: dist ≤ 3 ⇒ ≥1 of 4 chunks
    * equal). */
  def simhashPairsOf(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val fp = docs.select(col("doc_id"), simhash64(col("text")).as("fp"))
    val chunked = fp.select(col("doc_id"), col("fp"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("fp"), c * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("chunk", "chunk_val")))
    val a = chunked.select(col("doc_id").as("a_id"), col("fp").as("a_fp"),
      col("chunk"), col("chunk_val"))
    val b = chunked.select(col("doc_id").as("b_id"), col("fp").as("b_fp"),
      col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).cast("long")
          .as("hamming"))
      .filter(col("hamming") <= maxDist)
      .orderBy(col("a_id"), col("b_id"))
  }

  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    simhashPairsOf(Tables.documents(s, dir))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_minhash_pairs" -> (minhashPairs _),
    "q25_simhash_pairs" -> (simhashPairs _),
    "q48_minhash_portable" -> (minhashPortable _))

  /** q24/q25 use Spark-native hashes (xxhash64 / custom FNV) with no
    * DuckDB equivalent → rows-only there; q48 is the md5-portable variant
    * whose full signature computation the oracle verifies. Planted
    * near-duplicates in DedupSpec cover pair semantics. */
  val oracles: Map[String, String] = Map(
    "q48_minhash_portable" -> minhashPortableSql)
}
