package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Corpus reporting operators: the per-shard "dataset card" relation a
  * pipeline publishes with every release, and bitmap-index distinct
  * counting — north-star extensions (no counterpart in the reference's
  * 3-query surface).
  */
object Report {

  /** Short-document threshold shared with the q99 ingest gate. */
  private val ShortTok = Corpus.IngestMinTok

  /** q101 — per-source dataset card: the one relation a data consumer
    * reads before mixing sources — volume (docs, tokens), quality
    * (short-doc count), language mix (English doc count), and lexical
    * diversity (distinct 3-gram types, total 3-gram instances, and the
    * type-token ratio — q64's signal, here as one column of the card).
    * Every column is an exact integer except the single final ratio
    * division, so the whole card is engine-exact.
    *
    * Scale shape: one corpus scan feeds BOTH halves — the per-source
    * integer counts partial-agg map-side into #sources rows, and the
    * diversity half runs q64's two-phase distinct ((source, shingle)
    * pre-aggregation, never a countDistinct Expand). The join at the end
    * is #sources × #sources — dataset cards are always tiny relations
    * over huge inputs. */
  def sourceReport(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir)
      .select(col("source"), col("lang"), split(col("text"), " ").as("w"))
      .localCheckpoint(eager = false) // one scan feeds counts + diversity
    val base = d.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(size(col("w")).cast("long")).as("n_tokens"),
      sum(when(size(col("w")) < ShortTok, 1L).otherwise(0L)).as("n_short"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
    val grams = d.filter(size(col("w")) >= 3)
      .select(col("source"), explode(Text.ngramsCol(col("w"), 3)).as("sh"))
      .groupBy(col("source"), col("sh"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("n_grams"))
    base.join(grams, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_short"),
        col("n_en"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        (coalesce(col("n_types"), lit(0L)).cast("double") /
          coalesce(col("n_grams"), lit(1L))).as("type_token_ratio"))
      .orderBy(col("source"))
  }

  /** DuckDB spelling of [[sourceReport]]: same token split, same 3-gram
    * construction, same two-phase distinct, same single division. */
  val sourceReportSql: String =
    s"""WITH d AS (
       |  SELECT source, lang, string_split(text, ' ') AS w FROM documents),
       |base AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(len(w)) AS BIGINT) AS n_tokens,
       |    CAST(sum(CASE WHEN len(w) < $ShortTok THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_short,
       |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_en
       |  FROM d GROUP BY 1),
       |g AS (
       |  SELECT source, unnest(list_transform(range(1, len(w) - 1),
       |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS sh
       |  FROM d WHERE len(w) >= 3),
       |pre AS (
       |  SELECT source, sh, CAST(count(*) AS BIGINT) AS cnt
       |  FROM g GROUP BY 1, 2),
       |gd AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_types,
       |    CAST(sum(cnt) AS BIGINT) AS n_grams
       |  FROM pre GROUP BY 1)
       |SELECT b.source, n_docs, n_tokens, n_short, n_en,
       |  coalesce(n_types, 0) AS n_types,
       |  coalesce(n_grams, 0) AS n_grams,
       |  CAST(coalesce(n_types, 0) AS DOUBLE) / coalesce(n_grams, 1)
       |    AS type_token_ratio
       |FROM base b LEFT JOIN gd USING (source)
       |ORDER BY source""".stripMargin

  // ---- q103: bitmap-index distinct counting --------------------------------

  /** Bitmap domain: content hashes land in [0, BitmapBuckets). */
  val BitmapBuckets = 4096L
  private val WordBits = 32L

  /** q103 — EXACT distinct counting via bitmap indexes: per source, hash
    * every document's content into a [[BitmapBuckets]]-bucket domain,
    * OR the per-bucket bits into 32-bit words, and count set bits — the
    * Druid/ClickHouse bitmap-index pattern, relationally.
    *
    * Why this matters at 100 TB: a plain `countDistinct` shuffles every
    * distinct VALUE; the HLL sketch (q37) fixes memory but is
    * approximate. The bitmap is BOTH exact (within the hashed domain)
    * and fixed-size: per group the whole aggregation state is
    * [[BitmapBuckets]]/32 words (512 B here), the merge operator is
    * bitwise OR — a semilattice, so partial aggregation is lossless and
    * map-side combine reduces each partition to ≤ #groups·128 rows
    * regardless of row count. (32-bit words, not 64: `1 << 63` overflows
    * a signed BIGINT in ANSI SQL on both engines.) */
  def bitmapDistinct(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("source"),
        Text.md5Bucket(col("text"), BitmapBuckets).as("bucket"))
      .groupBy(col("source"), expr(s"bucket div $WordBits").as("widx"))
      .agg(expr(s"bit_or(shiftleft(1L, cast(bucket % $WordBits as int)))")
        .as("word"))
      .groupBy(col("source"))
      .agg(sum(bit_count(col("word")).cast("long")).as("n_distinct_buckets"))
      .orderBy(col("source"))

  /** DuckDB spelling of [[bitmapDistinct]]: same hash, same words, same
    * popcount. */
  val bitmapDistinctSql: String =
    s"""WITH b AS (
       |  SELECT source,
       |    ('0x' || substr(md5(text), 1, 8))::BIGINT % $BitmapBuckets
       |      AS bucket
       |  FROM documents),
       |words AS (
       |  SELECT source, bucket // $WordBits AS widx,
       |    bit_or(CAST(1 AS BIGINT) << CAST(bucket % $WordBits AS INT))
       |      AS word
       |  FROM b GROUP BY 1, 2)
       |SELECT source, CAST(sum(bit_count(word)) AS BIGINT)
       |  AS n_distinct_buckets
       |FROM words GROUP BY source
       |ORDER BY source""".stripMargin

  // ---- q104: self-join size prediction --------------------------------------

  /** q104 — predict the shingle self-join's output size WITHOUT running
    * it: per-shingle document frequencies, then Σ df·(df−1)/2 — the exact
    * candidate-pair count the q23 inverted-index self-join would
    * generate, plus the hottest shingle. This is the planning query every
    * similarity-join run starts with: it decides between the uncapped
    * (q23), df-capped (q51), and prefix-filtered (q98) strategies BEFORE
    * any quadratic work happens (this round's q98 sizing was literally
    * this query, run by hand).
    *
    * Scale shape: the df counts partial-agg map-side; the final aggregate
    * reduces to ONE row, and the hot-shingle argmax is min/max(struct) —
    * partial-aggregated, no window, no sort. df·(df−1) stays in long
    * headroom to df ≈ 3.0·10⁹ (√Long.MaxValue), and the SUM across many
    * hot shingles overflows earlier still — ANSI mode fails loudly
    * rather than wrapping; widen the arithmetic to decimal(38,0) for
    * corpora anywhere near that regime. */
  def selfJoinSize(s: SparkSession, dir: String): DataFrame =
    Text.shingleIndexOf(Tables.documents(s, dir))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .agg(count(lit(1)).as("n_shingles"),
        expr("sum(df * (df - 1) div 2)").as("candidate_pairs"),
        max(col("df")).as("max_df"),
        max(struct(col("df"), col("shingle"))).getField("shingle")
          .as("hot_shingle"))

  /** DuckDB spelling of [[selfJoinSize]]: same 3-gram index, same exact
    * pair arithmetic, same (df, shingle) argmax tie-break. */
  val selfJoinSizeSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, shingle FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
       |      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
       |    FROM w WHERE len(w) >= 3)),
       |df AS (
       |  SELECT shingle, CAST(count(*) AS BIGINT) AS df FROM sh GROUP BY 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(df * (df - 1) // 2) AS BIGINT) AS candidate_pairs,
       |  max(df) AS max_df,
       |  (SELECT shingle FROM df ORDER BY df DESC, shingle DESC LIMIT 1)
       |    AS hot_shingle
       |FROM df""".stripMargin

  // ---- q108: declarative data-quality rule suite ----------------------------

  /** q108 — data-quality rule evaluation (the Deequ/dbt-test shape): a
    * declarative rule set — range checks, referential integrity via
    * anti-joins, key uniqueness — evaluated in one submission, emitting
    * per-rule violation counts plus a deterministic sample key (the
    * minimum violating key; NULL when the rule holds). Two rules fire on
    * this corpus by design (negative account balances; the quantity-cap
    * warn), so both the pass and fail paths are oracle-exercised.
    *
    * Scale shape: each rule is an independent aggregate over its own
    * scan — counts partial-agg map-side, FK checks are keyed anti-joins
    * (broadcast when the parent side is small), uniqueness is a
    * group-HAVING; the union of 1-row results is free. At 100 TB the
    * rules share scans via the usual multi-aggregate trick if submitted
    * together — Catalyst already merges the three `orders` scans here
    * under one exchange reuse. */
  def qualityRules(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    val customer = Tables.customer(s, dir)
    def rule(name: String, violations: DataFrame, key: String): DataFrame =
      violations.agg(count(lit(1)).as("n_violations"),
        min(col(key)).as("sample_key"))
        .select(lit(name).as("rule"), col("n_violations"), col("sample_key"))
    rule("customer_acctbal_nonnegative",
        customer.filter(col("c_acctbal") < 0), "c_custkey")
      .unionAll(rule("lineitem_orderkey_fk",
        lineitem.join(orders, col("l_orderkey") === col("o_orderkey"),
          "left_anti"), "l_orderkey"))
      .unionAll(rule("lineitem_quantity_cap",
        lineitem.filter(col("l_quantity") > 45), "l_orderkey"))
      .unionAll(rule("orders_custkey_fk",
        orders.join(customer, col("o_custkey") === col("c_custkey"),
          "left_anti"), "o_orderkey"))
      .unionAll(rule("orders_orderkey_unique",
        orders.groupBy(col("o_orderkey")).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1), "o_orderkey"))
      .orderBy(col("rule"))
  }

  /** DuckDB spelling of [[qualityRules]]: the same rules as UNION ALL of
    * scalar aggregates. */
  val qualityRulesSql: String =
    """SELECT 'customer_acctbal_nonnegative' AS rule,
      |  CAST(count(*) AS BIGINT) AS n_violations,
      |  min(c_custkey) AS sample_key
      |FROM customer WHERE c_acctbal < 0
      |UNION ALL
      |SELECT 'lineitem_orderkey_fk', CAST(count(*) AS BIGINT),
      |  min(l_orderkey)
      |FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
      |UNION ALL
      |SELECT 'lineitem_quantity_cap', CAST(count(*) AS BIGINT),
      |  min(l_orderkey)
      |FROM lineitem WHERE l_quantity > 45
      |UNION ALL
      |SELECT 'orders_custkey_fk', CAST(count(*) AS BIGINT),
      |  min(o_orderkey)
      |FROM orders o ANTI JOIN customer c ON o.o_custkey = c.c_custkey
      |UNION ALL
      |SELECT 'orders_orderkey_unique', CAST(count(*) AS BIGINT),
      |  min(o_orderkey)
      |FROM (SELECT o_orderkey FROM orders
      |      GROUP BY o_orderkey HAVING count(*) > 1) t
      |ORDER BY rule""".stripMargin

  // ---- q141: k-anonymity / l-diversity audit -------------------------------

  /** q141 anonymity thresholds (Sweeney's k, Machanavajjhala's l) and the
    * size-bucket width that coarsens `n_chars` into a quasi-identifier. */
  final val AnonK = 5L
  final val AnonL = 2L
  final val AnonSizeBucket = 64L

  /** q141 — k-anonymity / l-diversity audit over the corpus metadata: a
    * release's quasi-identifier classes are the (lang, source,
    * size-bucket) combinations; a class with fewer than [[AnonK]]
    * members re-identifies its documents, and one whose members all
    * share the same sensitive value (distinct values < [[AnonL]], here
    * the document's leading token as the sensitive proxy) leaks it even
    * at k. The audit every dataset-release/data-governance pass runs
    * before publishing per-slice metadata.
    *
    * Scale shape: ONE groupBy over the quasi-identifier triple — count +
    * countDistinct partial-aggregate map-side; the class relation is
    * |langs|·|sources|·|buckets| rows regardless of corpus size, and
    * the violation flags are integer predicates on it. */
  def kAnonymity(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .filter(col("text").isNotNull)
      .select(col("lang"), col("source"),
        expr(s"n_chars div $AnonSizeBucket").as("size_bucket"),
        split(col("text"), " ").getItem(0).as("sensitive"))
      .groupBy(col("lang"), col("source"), col("size_bucket"))
      .agg(count(lit(1)).as("k"),
        countDistinct(col("sensitive")).as("l"))
      .select(col("lang"), col("source"), col("size_bucket"),
        col("k"), col("l"),
        (col("k") < AnonK).as("k_violating"),
        (col("l") < AnonL).as("l_violating"))
      .orderBy(col("lang"), col("source"), col("size_bucket"))

  val kAnonymitySql: String =
    s"""SELECT lang, source, n_chars // $AnonSizeBucket AS size_bucket,
       |  CAST(count(*) AS BIGINT) AS k,
       |  CAST(count(DISTINCT string_split(text, ' ')[1]) AS BIGINT) AS l,
       |  count(*) < $AnonK AS k_violating,
       |  count(DISTINCT string_split(text, ' ')[1]) < $AnonL AS l_violating
       |FROM documents WHERE text IS NOT NULL
       |GROUP BY 1, 2, 3
       |ORDER BY lang, source, size_bucket""".stripMargin

  // ---- q168: embedding-index coverage audit -------------------------------

  /** q168 — corpus↔index coverage audit: per source, how many documents
    * have an embedding in the vector index (doc_id ≡ vec_id, the id
    * convention the hybrid retrieval family q155/q158 serves by), how
    * many are UNINDEXED (invisible to every ANN/semantic-dedup path),
    * plus one `_orphans` row counting index entries whose document is
    * gone — stale vectors that waste probe candidates and can leak
    * deleted content back out of a serving index. This is the freshness
    * gate between the corpus and its derived index artifacts (q153's
    * persisted index, the streaming maintainers' carried state): run it
    * per release, alert on unindexed>0 or orphans>0.
    *
    * Scale shape: two id-keyed anti/semi joins (the q07 shape) — ids
    * only through the shuffle, payloads never move; output bounded by
    * #sources + 1. */
  def indexCoverage(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    val vecs = Tables.embeddings(s, dir).select(col("vec_id"))
    val flagged = docs
      .join(vecs.select(col("vec_id").as("doc_id"), lit(1L).as("ix")),
        Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("ix"), lit(0L))).as("indexed"))
      .select(col("source"), col("n_docs"), col("indexed"),
        (col("n_docs") - col("indexed")).as("unindexed"))
    val orphans = vecs.select(col("vec_id").as("doc_id"))
      .join(docs.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n"))
      .select(lit("_orphans").as("source"), col("n").as("n_docs"),
        lit(0L).as("indexed"), col("n").as("unindexed"))
    flagged.union(orphans).orderBy(col("source"))
  }

  val indexCoverageSql: String =
    """WITH f AS (
      |  SELECT d.source,
      |    CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END AS ix
      |  FROM documents d LEFT JOIN embeddings e ON e.vec_id = d.doc_id)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(ix) AS BIGINT) AS indexed,
      |  CAST(COUNT(*) - SUM(ix) AS BIGINT) AS unindexed
      |FROM f GROUP BY source
      |UNION ALL
      |SELECT '_orphans', CAST(COUNT(*) AS BIGINT),
      |  CAST(0 AS BIGINT), CAST(COUNT(*) AS BIGINT)
      |FROM embeddings e
      |WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)
      |ORDER BY source""".stripMargin

  // ---- q209: differential-privacy noisy-count release ---------------------

  /** DP noise scale b = sensitivity/ε = 1/[[DpEpsilonInv]]⁻¹ = 1 for
    * ε = 1 counting releases (one event moves any count by exactly 1). */
  final val DpEpsilonInv = 1L

  /** q209 — ε-differentially-private release of the per-(type, day)
    * event counts: each cell is published as n + Laplace(b = 1/ε)
    * noise, the true count kept ONLY as this audit's error column
    * (production releases the noisy column alone; together with q141's
    * k-anonymity and q159's PII scrub this completes the
    * privacy-release family). The Laplace draw is the inverse-CDF
    * transform −b·sgn(u−½)·ln(1−2|u−½|) of a DETERMINISTIC md5-derived
    * uniform keyed by the released CELL, so the audit is replayable
    * and the release never changes under retries (a true RNG would
    * make every rerun a fresh ε-spend). The half-offset (h+½)/2⁵²
    * keeps u off ½ exactly, so the log argument is never 0.
    *
    * PRIVACY CAVEAT — this exact spelling is NOT ε-DP as published:
    * the seed is md5 of the PUBLIC cell key (event_type|day), so any
    * reader can recompute the noise and subtract it exactly. Seeding
    * from public data is deliberate HERE so the DuckDB oracle can
    * replay the draw bit-for-bit; a production deployment MUST mix a
    * secret salt into the seed (md5(secret || cell)), which preserves
    * the re-publication-consistency property while making the noise
    * unpredictable to readers. As checked in, this query is a
    * deterministic noise-calibration audit, not a privacy mechanism.
    *
    * Scale shape: one partial-agg pass to the released grain; the
    * noise is an in-row expression — no extra exchange, no collect. */
  def dpRelease(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .groupBy(col("event_type"), dayofmonth(col("ts")).cast("long").as("day"))
      .agg(count(lit(1)).as("true_n"))
    cells
      .withColumn("u", expr(
        "(bigint(conv(substring(md5(concat(event_type, '|', string(day))), " +
          "1, 13), 16, 10)) + 0.5d) / 4503599627370496.0d"))
      .withColumn("lap", expr(
        s"-signum(u - 0.5d) * ln(1.0d - 2.0d * abs(u - 0.5d)) / $DpEpsilonInv"))
      .select(col("event_type"), col("day"), col("true_n"),
        (col("true_n") + expr("bigint(round(lap))")).as("noisy_n"))
      .withColumn("abs_err", abs(col("noisy_n") - col("true_n")))
      .orderBy(col("event_type"), col("day"))
  }

  /** DuckDB spelling: same cell-keyed uniform, same inverse-CDF chain. */
  val dpReleaseSql: String =
    s"""WITH cells AS (
       |  SELECT event_type, CAST(day(ts) AS BIGINT) AS day,
       |    CAST(count(*) AS BIGINT) AS true_n
       |  FROM events GROUP BY 1, 2),
       |seeded AS (
       |  SELECT *,
       |    (('0x' || substr(md5(event_type || '|' || CAST(day AS VARCHAR)),
       |      1, 13))::BIGINT + 0.5) / 4503599627370496.0 AS u
       |  FROM cells),
       |noised AS (
       |  SELECT event_type, day, true_n,
       |    true_n + CAST(round(-sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))
       |      / $DpEpsilonInv) AS BIGINT) AS noisy_n
       |  FROM seeded)
       |SELECT event_type, day, true_n, noisy_n,
       |  abs(noisy_n - true_n) AS abs_err
       |FROM noised ORDER BY event_type, day""".stripMargin

  // ---- q249: robust outlier stats (median / MAD) ---------------------------

  /** MAD multiplier for the outlier fence: |x − med| > 3·MAD is the
    * conventional "definitely anomalous" cut (≈4.5σ if the data were
    * normal), robust to the outliers themselves — unlike mean/stddev
    * fences, which the anomalies being hunted inflate until they hide
    * themselves. */
  final val MadK = 3.0

  /** (event_type, value, c) — the audit's MERGEABLE state: counts add
    * under union, so a streaming maintainer carries this relation
    * instead of raw events and every derived statistic below recomputes
    * from ≤|value-domain| rows
    * ([[graft.streaming.EventStreams.maintainRobustStats]]). */
  private[graft] def valueCounts(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"), col("value"))
      .agg(count(lit(1)).as("c"))

  /** Lower median of `valCol` per `key` from a pre-grouped
    * (key, value, c) relation — the SCALABLE exact shape: the grouping
    * is partial-aggregable (one small exchange), and the cumulative
    * window orders DISTINCT values per key, never rows (5 event types
    * over raw rows would be 5 giant window partitions — the q197
    * cliff); value cardinality is what bounds the state. Regime note:
    * exact medians are only scale-sane while values compress under
    * grouping; near-continuous measures at 100 TB should use the
    * mergeable quantile sketches (q195) — this is the exact twin for
    * auditable fences. Lower (element-picked) median, not interpolated:
    * picking an EXISTING value needs no arithmetic, so both engines
    * select bit-identical doubles. */
  private def lowerMedianOfCounts(g: DataFrame, key: String,
      valCol: String, as: String): DataFrame = {
    val byVal = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key)).orderBy(col(valCol))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy(col(key))
    g.select(col(key), col(valCol),
        sum(col("c")).over(byVal).as("cum"),
        sum(col("c")).over(all).as("n"))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .groupBy(col(key))
      .agg(min(col(valCol)).as(as))
  }

  /** The q249 report from a (event_type, value, c) counts relation —
    * shared verbatim by the batch query and the streaming maintainer,
    * so the maintainer's per-wave output equals the batch recompute BY
    * CONSTRUCTION. */
  private[graft] def robustFromCounts(counts: DataFrame): DataFrame = {
    // no checkpoint here: the streaming maintainer passes an ALREADY
    // checkpointed state relation every wave (a second copy per
    // micro-batch would pile up in the block manager); the batch entry
    // point below adds its own barrier
    val cnts = counts
    val med = lowerMedianOfCounts(cnts, "event_type", "value", "med")
    val dev = cnts.join(med, Seq("event_type"))
      .select(col("event_type"), col("med"),
        abs(col("value") - col("med")).as("dev"), col("c"))
      .localCheckpoint(eager = false) // feeds the MAD pass AND the fence
    val devCounts = dev.groupBy(col("event_type"), col("dev"))
      .agg(sum(col("c")).as("c"))
    val mad = lowerMedianOfCounts(devCounts, "event_type", "dev", "mad")
    dev.join(mad, Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(sum(col("c")).as("n"),
        min(col("med")).as("med"),
        min(col("mad")).as("mad"),
        sum(when(col("dev") > lit(MadK) * col("mad"), col("c"))
          .otherwise(lit(0L))).as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** q249 — per-event-type ROBUST outlier stats: lower median of value,
    * MAD (lower median of |value − med|), and the count beyond the
    * med ± [[MadK]]·MAD fence — the data-quality screen that survives
    * its own anomalies. All selections pick existing doubles and the
    * only arithmetic is one IEEE subtract/abs/multiply, identical in
    * both engines, so the audit is hash-exact despite double columns. */
  def robustOutliers(s: SparkSession, dir: String): DataFrame =
    robustFromCounts(valueCounts(Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value")))
      // barrier: the counts feed the median pass AND the dev join
      .localCheckpoint(eager = false))

  val robustOutliersSql: String =
    s"""WITH ev AS (
       |  SELECT event_type, value FROM events WHERE value IS NOT NULL),
       |g1 AS (
       |  SELECT event_type, value, count(*) AS c FROM ev GROUP BY 1, 2),
       |t1 AS (
       |  SELECT event_type, value,
       |    sum(c) OVER (PARTITION BY event_type ORDER BY value) AS cum,
       |    sum(c) OVER (PARTITION BY event_type) AS n
       |  FROM g1),
       |med AS (
       |  SELECT event_type, min(value) AS med FROM t1
       |  WHERE cum >= (n + 1) // 2 GROUP BY 1),
       |dev AS (
       |  SELECT e.event_type, e.value, abs(e.value - m.med) AS dv,
       |    m.med
       |  FROM ev e JOIN med m USING (event_type)),
       |g2 AS (
       |  SELECT event_type, dv, count(*) AS c FROM dev GROUP BY 1, 2),
       |t2 AS (
       |  SELECT event_type, dv,
       |    sum(c) OVER (PARTITION BY event_type ORDER BY dv) AS cum,
       |    sum(c) OVER (PARTITION BY event_type) AS n
       |  FROM g2),
       |mad AS (
       |  SELECT event_type, min(dv) AS mad FROM t2
       |  WHERE cum >= (n + 1) // 2 GROUP BY 1)
       |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
       |  min(d.med) AS med, min(a.mad) AS mad,
       |  CAST(sum(CASE WHEN d.dv > $MadK * a.mad THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_outliers
       |FROM dev d JOIN mad a USING (event_type)
       |GROUP BY d.event_type
       |ORDER BY d.event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q249_robust_outliers" -> (robustOutliers _),
    "q209_dp_release" -> (dpRelease _),
    "q168_index_coverage" -> (indexCoverage _),
    "q141_k_anonymity" -> (kAnonymity _),
    "q101_source_report" -> (sourceReport _),
    "q103_bitmap_distinct" -> (bitmapDistinct _),
    "q104_selfjoin_size" -> (selfJoinSize _),
    "q108_quality_rules" -> (qualityRules _))

  val oracles: Map[String, String] = Map(
    "q249_robust_outliers" -> robustOutliersSql,
    "q209_dp_release" -> dpReleaseSql,
    "q168_index_coverage" -> indexCoverageSql,
    "q141_k_anonymity" -> kAnonymitySql,
    "q101_source_report" -> sourceReportSql,
    "q103_bitmap_distinct" -> bitmapDistinctSql,
    "q104_selfjoin_size" -> selfJoinSizeSql,
    "q108_quality_rules" -> qualityRulesSql)
}
