package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Corpus-hygiene operators: intra-document repetition scoring and
  * corpus-level boilerplate span removal — the two quality passes an LLM
  * training pipeline runs between exact dedup (q22) and near-dup removal
  * (q23/q24/q49). North-star extensions (no counterpart in the
  * reference's 3-query surface).
  *
  * Determinism rules as in [[Text]]: exact integer counts, one double
  * division at the end, md5 fingerprints instead of shuffling text.
  */
object Corpus {

  private def tokens(c: Column): Column = split(c, " ")

  // ---- q78: intra-document repetition scoring -----------------------------

  /** q78 — Gopher-style repetition signals per document: duplicate-word
    * fraction (1 − type/token ratio) and the most-frequent-bigram share,
    * with integer-predicate repetition flags (>60% duplicate words; top
    * bigram >12.5% of bigram slots — flag thresholds compare exact ints,
    * never a rounded double, so the flag bit is engine-exact).
    *
    * Scale shape: the per-doc word stats are array-native inside one scan
    * (no explode); only the top-bigram pass explodes, and its
    * (doc_id, bigram) counts partial-aggregate map-side before the
    * exchange — the exchange carries one row per DISTINCT bigram per doc,
    * not one per token. A 100 TB corpus shuffles id+count pairs only. */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val w = tokens(col("text"))
    val base = docs.select(col("doc_id"),
      size(w).cast("long").as("n_tok"),
      size(array_distinct(w)).cast("long").as("n_distinct"))
    val topBigram = docs
      .select(col("doc_id"), w.as("w"))
      // barrier: CollapseProject otherwise inlines split() into the
      // bigram lambda's element_at calls — O(L²) re-split per element
      .localCheckpoint(eager = false)
      .filter(size(col("w")) >= 2)
      // the ONE bigram constructor (Text.ngramsCol) — q116 and the
      // shingle family use the same builder, so gram semantics can
      // never drift between queries
      .select(col("doc_id"),
        explode(Text.ngramsCol(col("w"), 2)).as("bg"))
      .groupBy(col("doc_id"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("top_bigram_cnt"))
    base.join(topBigram, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"), col("n_distinct"),
        ((col("n_tok") - col("n_distinct")).cast("double") / col("n_tok"))
          .as("dup_word_frac"),
        coalesce(col("top_bigram_cnt"), lit(0L)).as("top_bigram_cnt"),
        ((col("n_tok") - col("n_distinct")) * 5 > col("n_tok") * 3)
          .as("rep_words"),
        (coalesce(col("top_bigram_cnt"), lit(0L)) * 8 > col("n_tok") - 1)
          .as("rep_bigram"))
      .orderBy(col("doc_id"))
  }

  val repetitionSql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |base AS (
      |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok,
      |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
      |  FROM w),
      |bg AS (
      |  SELECT doc_id, unnest(list_transform(range(1, len(w)),
      |    i -> w[i] || ' ' || w[i+1])) AS bg
      |  FROM w WHERE len(w) >= 2),
      |topb AS (
      |  SELECT doc_id, max(c) AS top_bigram_cnt FROM (
      |    SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2)
      |  GROUP BY doc_id)
      |SELECT b.doc_id, n_tok, n_distinct,
      |  CAST(n_tok - n_distinct AS DOUBLE) / n_tok AS dup_word_frac,
      |  CAST(coalesce(top_bigram_cnt, 0) AS BIGINT) AS top_bigram_cnt,
      |  (n_tok - n_distinct) * 5 > n_tok * 3 AS rep_words,
      |  coalesce(top_bigram_cnt, 0) * 8 > n_tok - 1 AS rep_bigram
      |FROM base b LEFT JOIN topb USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin

  // ---- q79: corpus-level boilerplate span removal -------------------------

  /** A word 5-gram is "boilerplate" when it appears in at least this many
    * distinct documents. */
  val BoilerplateDf = 2
  private val GramN = 5

  /** q79 — boilerplate scrub (the exact-substring-dedup pass of
    * RefinedWeb-style pipelines, word-granular): find every word 5-gram
    * shared by ≥ [[BoilerplateDf]] documents, mark all token positions any
    * such gram covers, and emit each document's scrubbed form — kept-token
    * count and the md5 fingerprint of the remaining tokens (fingerprint,
    * not text: the reassembly shuffle carries ids + words, and the output
    * carries 16 bytes/doc).
    *
    * Scale shape, stage by stage:
    *  - gram df counts: distinct (doc, gram) partial-aggregates map-side;
    *    the shuffle key is the gram hash, never the text;
    *  - hot-gram filter: a semi-join of gram OCCURRENCES against the hot
    *    set — an equi-join on the gram key (broadcast when small, shuffle
    *    when boilerplate is pervasive; Spark/AQE picks at runtime);
    *  - coverage: each hot occurrence explodes to its ≤5 covered
    *    positions, collapsed to ONE sorted position-array row per
    *    affected doc — output ∝ boilerplate volume, not corpus size;
    *  - scrub: one doc_id equi-join of the corpus against that (small)
    *    coverage relation, then the removal happens INSIDE the row —
    *    `array_except(positions, covered)` + element_at reassembly.
    * The corpus itself is never exploded to word granularity and never
    * reshuffled: the only corpus-wide movement is the final presentation
    * sort. (A per-position anti-join formulation — the obvious spelling —
    * shuffles every token of every document twice; at 100 TB that is the
    * whole corpus through the wire, replaced here by boilerplate-bounded
    * shuffles only.) */
  def boilerplateScrub(s: SparkSession, dir: String): DataFrame =
    scrubbed(s, dir).orderBy(col("doc_id"))

  /** [[boilerplateScrub]] without the presentation sort — the feed for
    * q89's reconciliation join. */
  private[graft] def scrubbed(s: SparkSession, dir: String): DataFrame = {
    // words feeds grams and the final scrub — 2 consumers
    val words = graft.ops.Par.fan(Tables.documents(s, dir))
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("n_tok"))
      .localCheckpoint(eager = false)
    // (doc_id, s, gram): 1-based start position of each 5-gram occurrence
    val grams = words.filter(size(col("w")) >= GramN)
      .select(col("doc_id"), posexplode(transform(
        sequence(lit(1), size(col("w")) - (GramN - 1)),
        i => concat_ws(" ", (0 until GramN).map(o =>
          element_at(col("w"), i + o)): _*))).as(Seq("p0", "gram")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("s"), col("gram"))
      .localCheckpoint(eager = false) // feeds df counts AND the semi-join
    val hot = grams.select(col("doc_id"), col("gram")).distinct()
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= BoilerplateDf)
      .select(col("gram"))
    // one row per doc with boilerplate: the sorted set of covered positions
    // (collect_set dedups overlapping gram spans — no pre-distinct shuffle)
    val covered = grams.join(hot, Seq("gram"), "left_semi")
      .select(col("doc_id"), explode(sequence(col("s"),
        col("s") + (GramN - 1))).as("p"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("p"))).as("cov"))
    val keptPos = array_except(
      sequence(lit(1L), col("n_tok")),
      coalesce(col("cov"), array().cast("array<long>")))
    // NULL-text guards mirror the oracle's `coalesce(kept_tok, 0)` /
    // `coalesce(scrub_fp, md5(''))`: a NULL text makes kp NULL here while
    // the SQL side's kept CTE simply has no row — both must land on
    // (0, md5('')) or the value hash diverges on the first NULL document
    words.join(covered, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"), col("w"), keptPos.as("kp"))
      .select(col("doc_id"), col("n_tok"),
        coalesce(size(col("kp")).cast("long"), lit(0L)).as("kept_tok"),
        (col("n_tok") - coalesce(size(col("kp")).cast("long"), lit(0L)))
          .as("n_scrubbed"),
        coalesce(md5(array_join(transform(col("kp"),
          p => element_at(col("w"), p.cast("int"))), " ")), md5(lit("")))
          .as("scrub_fp"))
  }

  /** The scrub CTE chain ending in
    * `scrub(doc_id, n_tok, kept_tok, n_scrubbed, scrub_fp)` — shared by
    * the q79 oracle and q89's reconciliation oracle. */
  private def scrubSqlCtes: String =
    s"""w AS (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS s,
       |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] ||
       |      ' ' || w[i+4] AS gram
       |  FROM w, unnest(range(1, len(w) - 3)) AS t(i)
       |  WHERE len(w) >= 5),
       |hot AS (
       |  SELECT gram FROM (
       |    SELECT gram, count(*) AS df FROM (
       |      SELECT DISTINCT doc_id, gram FROM g) GROUP BY gram)
       |  WHERE df >= $BoilerplateDf),
       |cov AS (
       |  SELECT DISTINCT doc_id, p FROM (
       |    SELECT g.doc_id, u.p FROM g JOIN hot USING (gram),
       |      unnest(range(g.s, g.s + 5)) AS u(p))),
       |pos AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS p, w[i] AS word
       |  FROM w, unnest(range(1, len(w) + 1)) AS t(i)),
       |kept AS (
       |  SELECT pos.doc_id, count(*) AS kept_tok,
       |    md5(string_agg(word, ' ' ORDER BY p)) AS scrub_fp
       |  FROM pos ANTI JOIN cov USING (doc_id, p)
       |  GROUP BY pos.doc_id),
       |scrub AS (
       |  SELECT w.doc_id, n_tok,
       |    coalesce(kept_tok, 0) AS kept_tok,
       |    n_tok - coalesce(kept_tok, 0) AS n_scrubbed,
       |    coalesce(scrub_fp, md5('')) AS scrub_fp
       |  FROM w LEFT JOIN kept USING (doc_id))""".stripMargin

  val boilerplateScrubSql: String =
    s"""WITH $scrubSqlCtes
       |SELECT doc_id, n_tok, kept_tok, n_scrubbed, scrub_fp FROM scrub
       |ORDER BY doc_id""".stripMargin

  // ---- q84: bloom-prefiltered decontamination -----------------------------

  /** Documents below this id play the "held-out eval set" role (a larger
    * set than q59's, so the two decontamination paths are distinct
    * registry entries). */
  val BloomEvalMax = 100L
  val BloomMinShingles = 2
  val BloomFpp = 0.01

  /** q84 — decontamination with a Bloom-filter prefilter: the production
    * path when the eval set's exact shingle set is too large to broadcast
    * (q59's plan). A Bloom filter over the eval 5-grams is ~10 bits per
    * element regardless of string length, so it broadcasts at eval-set
    * sizes where the exact string set cannot; the corpus-side index is
    * prefiltered executor-locally and only the surviving candidates —
    * true overlaps + the fpp·N false positives — reach the exact-confirm
    * equi-join. The confirm join is deliberately NOT broadcast-hinted:
    * at scale it is a keyed shuffle of the (tiny) candidate set; AQE
    * upgrades it to broadcast when the local data allows.
    *
    * Correctness is EXACT, not approximate: Bloom filters have no false
    * negatives, and the confirm join removes the false positives — so the
    * oracle is the plain exact SQL, and a green hash proves the sketch
    * path end-to-end. The filter itself is built with
    * `df.stat.bloomFilter` — a driver-side sketch whose size is set by
    * (expectedNumItems, fpp), NOT by corpus size. */
  def bloomDecontamination(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val sh = Text.ngramIndexOf(docs, 5)
    val evalSh = sh.filter(col("doc_id") < BloomEvalMax)
      .select(col("shingle")).distinct()
      .localCheckpoint(eager = false) // feeds the bloom build AND the confirm
    val bloom = evalSh.stat.bloomFilter(
      "shingle", math.max(evalSh.count(), 1L), BloomFpp)
    val bloomB = s.sparkContext.broadcast(bloom)
    // non-codegen UDF is acceptable here BY DESIGN: it is a prefilter on
    // the already-exploded index, and the exact confirm restores exactness
    val mightContain = udf((x: String) =>
      x != null && bloomB.value.mightContainString(x))
    val candidates = sh.filter(col("doc_id") >= BloomEvalMax)
      .filter(mightContain(col("shingle")))
    val shared = candidates.join(evalSh, Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    docs.filter(col("doc_id") >= BloomEvalMax)
      .select(col("doc_id"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) >= BloomMinShingles)
          .as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Exact decontamination SQL (q59's generator at this query's eval
    * split): the Bloom stage must be INVISIBLE in the result — prefilter
    * plus exact confirm ≡ exact join. */
  val bloomDecontaminationSql: String =
    Text.decontaminationSqlFor(BloomEvalMax, BloomMinShingles)

  // ---- q85: stable global sequence ids ------------------------------------

  /** Shard count for the two-phase global numbering — the offset relation
    * is exactly this many rows at ANY corpus size. */
  val IdShards = 64L

  /** q85 — stable global sequence ids (the `zipWithIndex` a training
    * pipeline needs for example numbering, done relationally): a global
    * `row_number() OVER (ORDER BY …)` plans as a SINGLE-partition sort —
    * the one-executor bottleneck that cannot work at 100 TB. The scalable
    * shape is two-phase: (1) shard every row by a content hash and number
    * rows per shard (parallel windows), (2) compute per-shard offsets with
    * a prefix sum over the [[IdShards]]-row count relation (constant-size
    * — ITS single-partition window is 64 rows, not the corpus) and add.
    * The md5 shard key makes ids reproducible across engines, runs, and
    * partitionings; the oracle recomputes the same numbering with the
    * naive global window, proving the two-phase ids identical. */
  def globalIds(s: SparkSession, dir: String): DataFrame = {
    val shard = Text.md5Bucket(col("doc_id"), IdShards)
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), shard.as("shard"))
      .localCheckpoint(eager = false) // feeds per-shard ranks AND offsets
    val rn = row_number().over(
      Window.partitionBy(col("shard")).orderBy(col("doc_id")))
    val offsets = docs.groupBy(col("shard")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("shard"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("shard"), col("off"))
    docs.withColumn("rn", rn)
      .join(broadcast(offsets), Seq("shard"))
      .select(col("doc_id"), col("shard"),
        (col("off") + col("rn")).as("global_id"))
      .orderBy(col("doc_id"))
  }

  /** The naive global-window spelling — fine in DuckDB at oracle SF,
    * and exactly the ordering contract the two-phase plan implements. */
  val globalIdsSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |      % $IdShards AS shard
       |  FROM documents)
       |SELECT doc_id, shard,
       |  CAST(row_number() OVER (ORDER BY shard, doc_id) AS BIGINT)
       |    AS global_id
       |FROM d
       |ORDER BY doc_id""".stripMargin

  // ---- q89: snapshot reconciliation (release-over-release diff) -----------

  /** New-release quality gate: scrubbed docs keeping fewer tokens than
    * this are dropped from the release. */
  val DiffMinKept = 10L

  /** q89 — corpus release reconciliation: FULL OUTER join of the previous
    * release (a deterministic 90% of the raw corpus — simulating the
    * docs the last crawl had) against the new release (the q79-scrubbed
    * corpus under a kept-token quality gate), emitting per-document
    * added / removed / changed / unchanged status — the snapshot-diff /
    * CDC audit a pipeline publishes release-over-release so consumers can
    * retrain incrementally instead of re-ingesting 100 TB.
    *
    * "Changed" compares content FINGERPRINTS (16 bytes/doc), never text:
    * the old side hashes the token-rejoined document with exactly the
    * same construction the scrub fingerprint uses, so unscrubbed docs
    * compare equal by value, not by convention. Scale shape: one keyed
    * shuffle per side into the full-outer join (the standard
    * sort-merge reconciliation at any N); the scrub feed's shuffles are
    * boilerplate-bounded (q79). */
  def snapshotDiff(s: SparkSession, dir: String): DataFrame = {
    // presence is tested via explicit markers, NOT fingerprint nullness:
    // a present-but-NULL fingerprint (e.g. a NULL-text doc) must compare
    // like the oracle's `o.doc_id IS NULL` key test, not like absence
    val oldSnap = Tables.documents(s, dir)
      // IngestOldMax IS this release split ("the q89 release
      // convention" q99/q109 reference) — one constant, not four
      // desynchronizable literals
      .filter(Text.md5Bucket1000(col("doc_id")) < IngestOldMax)
      .select(col("doc_id"),
        md5(array_join(tokens(col("text")), " ")).as("fp"),
        lit(true).as("in_old"))
    val newSnap = scrubbed(s, dir)
      .filter(col("kept_tok") >= DiffMinKept)
      .select(col("doc_id"), col("scrub_fp"), lit(true).as("in_new"))
    oldSnap.join(newSnap, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(col("fp") === col("scrub_fp"), "unchanged")
          .otherwise("changed").as("status"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB spelling of [[snapshotDiff]]: the shared scrub CTEs, the same
    * md5 bucket, the same fingerprint construction. */
  def snapshotDiffSql: String =
    s"""WITH $scrubSqlCtes,
       |snap_old AS (
       |  SELECT doc_id,
       |    md5(array_to_string(string_split(text, ' '), ' ')) AS fp
       |  FROM documents
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |        % 1000 < $IngestOldMax),
       |snap_new AS (
       |  SELECT doc_id, scrub_fp FROM scrub
       |  WHERE kept_tok >= $DiffMinKept)
       |SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
       |  CASE WHEN o.doc_id IS NULL THEN 'added'
       |       WHEN n.doc_id IS NULL THEN 'removed'
       |       WHEN o.fp = n.scrub_fp THEN 'unchanged'
       |       ELSE 'changed' END AS status
       |FROM snap_old o FULL OUTER JOIN snap_new n ON o.doc_id = n.doc_id
       |ORDER BY doc_id""".stripMargin

  // ---- q99: incremental-ingest admission gate ------------------------------

  /** Existing-corpus share of the md5-1000 bucket space (the q89 release
    * convention): buckets < 900 are already ingested, ≥ 900 arrive as the
    * incremental batch. */
  // final + literal → compile-time constants, inlined at reference sites:
  // other modules read these while building their oracle-SQL vals, and a
  // non-constant val is 0 mid-initialization when object init cycles
  // (Similarity → Corpus → … → Dedup.oracles observed exactly that)
  final val IngestOldMax = 900
  /** Quality gate: incoming docs below this token count are rejected. */
  final val IngestMinTok = 20L
  /** Near-dup gate: sharing ≥ this many distinct word-5-grams with the
    * existing corpus rejects the incoming doc. */
  val IngestMinShared = 3L

  /** q99 — incremental-ingest admission gate: the per-batch decision a
    * pipeline runs on every new crawl drop so it never re-processes the
    * corpus it already has. Each incoming document (md5 bucket ≥
    * [[IngestOldMax]]) is gated in precedence order: `too_short` (token
    * count < [[IngestMinTok]] — the cheap in-row check runs first),
    * `near_dup` (shares ≥ [[IngestMinShared]] distinct word-5-grams with
    * the EXISTING corpus — q59's overlap semantics pointed at ingest),
    * else `accepted`. Output carries the evidence (n_tok, n_shared), not
    * just the verdict.
    *
    * Scale shape: the batch is small next to the corpus, and the corpus
    * side contributes ONLY its distinct-shingle relation through an
    * equi-join keyed by shingle — per-doc overlap counts partial-agg
    * map-side; the corpus text itself never moves or reshuffles. At
    * 100 TB the corpus shingle index is what a pipeline PERSISTS between
    * drops (it grows by accepted docs only), and the q84 Bloom prefilter
    * composes in front of this exact join unchanged when even the index
    * side is too hot to shuffle. */
  def ingestGate(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bucket = Text.md5Bucket1000(col("doc_id"))
    val corpusShingles = Text.ngramIndexOf(
        docs.filter(bucket < IngestOldMax), 5)
      .select(col("shingle")).distinct()
    ingestGateOf(docs.filter(bucket >= IngestOldMax), corpusShingles)
      .orderBy(col("doc_id"))
  }

  /** The gate core over explicit relations: an incoming (doc_id, text)
    * batch against the existing corpus's distinct-shingle index. Split
    * out so the STREAMING twin (graft.streaming.DocStreams) can run the
    * identical logic per micro-batch inside foreachBatch — incremental
    * ingestion is naturally a stream of crawl drops. */
  def ingestGateOf(batch: DataFrame, corpusShingles: DataFrame): DataFrame = {
    val shared = Text.ngramIndexOf(batch, 5)
      .join(corpusShingles, Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
    batch
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tok"))
      .join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        when(col("n_tok") < IngestMinTok, "too_short")
          .when(coalesce(col("n_shared"), lit(0L)) >= IngestMinShared,
            "near_dup")
          .otherwise("accepted").as("status"))
  }

  /** DuckDB spelling of [[ingestGate]]: same bucket split, same shingle
    * construction, same precedence. */
  val ingestGateSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, text,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
       |      % 1000 AS bucket,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, bucket, shingle FROM (
       |    SELECT doc_id, bucket,
       |      unnest(list_transform(range(1, len(string_split(text,' ')) - 3),
       |        i -> string_split(text,' ')[i] || ' ' ||
       |             string_split(text,' ')[i+1] || ' ' ||
       |             string_split(text,' ')[i+2] || ' ' ||
       |             string_split(text,' ')[i+3] || ' ' ||
       |             string_split(text,' ')[i+4])) AS shingle
       |    FROM b
       |    WHERE len(string_split(text,' ')) >= 5)),
       |ex AS (SELECT DISTINCT shingle FROM sh WHERE bucket < $IngestOldMax),
       |shared AS (
       |  SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM sh s JOIN ex USING (shingle)
       |  WHERE s.bucket >= $IngestOldMax
       |  GROUP BY 1)
       |SELECT b.doc_id, b.n_tok, coalesce(n_shared, 0) AS n_shared,
       |  CASE WHEN b.n_tok < $IngestMinTok THEN 'too_short'
       |       WHEN coalesce(n_shared, 0) >= $IngestMinShared THEN 'near_dup'
       |       ELSE 'accepted' END AS status
       |FROM b LEFT JOIN shared USING (doc_id)
       |WHERE b.bucket >= $IngestOldMax
       |ORDER BY b.doc_id""".stripMargin

  // ---- q109: delta-maintained aggregates ----------------------------------

  /** q109 — incremental aggregate maintenance: the per-source stats
    * relation maintained as (previous release's aggregate) ⊕ (delta
    * batch's aggregate), where ⊕ is a full-outer merge over the group
    * key with sums added and counts added — never a recompute over the
    * already-aggregated 90%. The query registers the MERGED result; the
    * oracle computes the same relation from the full corpus in one pass,
    * so the maintenance algebra must be value-invisible (sums/counts are
    * a commutative monoid — the same property that makes partial
    * aggregation correct makes release-over-release maintenance
    * correct).
    *
    * Scale shape: at 100 TB the "old" side is a persisted #sources-row
    * relation read back in milliseconds; only the delta batch is
    * scanned. The merge is a join of two #sources-row relations. This
    * completes the incremental family: q67 (top-k refresh), q89
    * (snapshot diff), q99 (ingest gate), q109 (stats maintenance). */
  def deltaAggMaintenance(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bucket = Text.md5Bucket1000(col("doc_id"))
    def aggOf(part: DataFrame): DataFrame = part
      .select(col("source"), size(tokens(col("text"))).cast("long").as("nt"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("n_tokens"))
    val old = aggOf(docs.filter(bucket < IngestOldMax))
      .withColumnsRenamed(Map("n_docs" -> "od", "n_tokens" -> "ot"))
    val delta = aggOf(docs.filter(bucket >= IngestOldMax))
      .withColumnsRenamed(Map("n_docs" -> "dd", "n_tokens" -> "dt"))
    old.join(delta, Seq("source"), "full_outer")
      .select(col("source"),
        (coalesce(col("od"), lit(0L)) + coalesce(col("dd"), lit(0L)))
          .as("n_docs"),
        (coalesce(col("ot"), lit(0L)) + coalesce(col("dt"), lit(0L)))
          .as("n_tokens"))
      .orderBy(col("source"))
  }

  /** The oracle recomputes from scratch — maintenance must be invisible. */
  val deltaAggMaintenanceSql: String =
    """SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |FROM documents
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---- q116: hashed-n-gram importance weights (DSIR shape) ----------------

  /** Hashed feature space for [[importanceWeights]] (DSIR uses 2¹⁶;
    * compile-time constant — read while building oracle SQL). */
  final val DsirBuckets = 512L

  /** q116 — data-selection importance weights, the DSIR shape (Xie et
    * al., "Data Selection for Language Models via Importance
    * Resampling"): score every document by how target-like its hashed
    * bigram features are, where the target distribution is the `en`
    * slice and the raw distribution is the whole corpus. Feature
    * probabilities are add-1-smoothed counts over [[DsirBuckets]]
    * hashed buckets; each feature's weight is the target/raw
    * likelihood ratio λ_f = ((tc_f+1)·(S+B)) / ((T+B)·(sc_f+1)), and a
    * document scores the per-occurrence mean Σ n_f·λ_f / Σ n_f.
    *
    * DSIR proper multiplies feature probabilities (sums logs); the
    * RATIO-MEAN spelling here keeps the oracle engine-exact — ln() is
    * not correctly rounded everywhere (q52's rule), whereas each λ_f is
    * one IEEE division of two exact BIGINT products and the per-doc sum
    * folds in fixed bucket order. Int64 headroom: (tc+1)·(S+B) tops out
    * at ~occurrences², safe to ~3·10⁹ token occurrences — past that
    * widen the products to decimal(38,0) (the q104 note's remedy).
    *
    * Scale shape: one explode into (doc, bucket) partial counts; the
    * λ table is exactly B rows (constant — B is the FEATURE SPACE, not
    * the vocabulary) and broadcasts; the per-doc fold is array-native.
    * Nothing corpus-sized shuffles twice. */
  def importanceWeights(s: SparkSession, dir: String): DataFrame =
    importanceWeightsOf(Tables.documents(s, dir))

  /** [[importanceWeights]] over any (doc_id, text, lang) frame — split
    * out so the spec can plant target-only and offtarget-only docs. */
  def importanceWeightsOf(docs: DataFrame): DataFrame = {
    val f = graft.ops.Par.fan(docs.filter(col("text").isNotNull))
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("w"))
      // barrier: CollapseProject would inline split() into the gram
      // lambda (O(L²) re-split per element)
      .localCheckpoint(eager = false)
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(Text.ngramsCol(col("w"), 2)).as("gram"))
      .select(col("doc_id"), col("lang"),
        Text.md5Bucket(col("gram"), DsirBuckets).as("b"))
      .localCheckpoint(eager = false) // feeds n, tgt, raw AND the totals
    val n = f.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("n"))
    val tgt = f.filter(col("lang") === "en")
      .groupBy(col("b")).agg(count(lit(1)).as("tc"))
    val raw = f.groupBy(col("b")).agg(count(lit(1)).as("sc"))
    val tot = f.agg(
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("t"),
      count(lit(1)).as("s"))
    val lam = raw.join(tgt, Seq("b"), "left").crossJoin(broadcast(tot))
      .select(col("b"),
        (((coalesce(col("tc"), lit(0L)) + 1L) * (col("s") + DsirBuckets))
          .cast("double") /
          ((col("t") + DsirBuckets) * (col("sc") + 1L))).as("lam"))
    n.join(broadcast(lam), Seq("b"))
      .select(col("doc_id"), col("b"), col("n"),
        (col("n") * col("lam")).as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feat"), sum(col("n")).as("n_tot"),
        sort_array(collect_list(struct(col("b"), col("term")))).as("arr"))
      .select(col("doc_id"), col("n_feat"), col("n_tot"),
        (aggregate(transform(col("arr"), x => x.getField("term")),
          lit(0.0), (acc, x) => acc + x) / col("n_tot")).as("score"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB spelling of [[importanceWeights]]: same hashed buckets, same
    * smoothed integer products, same fixed-order fold. */
  val importanceWeightsSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents
       |  WHERE text IS NOT NULL),
       |g AS (
       |  SELECT doc_id, lang, unnest(list_transform(range(1, len(w)),
       |    i -> w[i] || ' ' || w[i+1])) AS gram
       |  FROM w WHERE len(w) >= 2),
       |f AS (
       |  SELECT doc_id, lang,
       |    ('0x' || substr(md5(gram), 1, 8))::BIGINT % $DsirBuckets AS b
       |  FROM g),
       |n AS (SELECT doc_id, b, count(*) AS n FROM f GROUP BY 1, 2),
       |tgt AS (SELECT b, count(*) AS tc FROM f WHERE lang = 'en' GROUP BY 1),
       |raw AS (SELECT b, count(*) AS sc FROM f GROUP BY 1),
       |tot AS (SELECT (SELECT count(*) FROM f WHERE lang = 'en') AS t,
       |               (SELECT count(*) FROM f) AS s),
       |lam AS (
       |  SELECT r.b,
       |    CAST((coalesce(tc, 0) + 1) * (s + $DsirBuckets) AS DOUBLE) /
       |      ((t + $DsirBuckets) * (sc + 1)) AS lam
       |  FROM raw r LEFT JOIN tgt USING (b) CROSS JOIN tot),
       |terms AS (
       |  SELECT n.doc_id, n.b, n.n, n.n * lam AS term FROM n JOIN lam USING (b))
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feat,
       |  CAST(sum(n) AS BIGINT) AS n_tot,
       |  list_reduce(list_prepend(0.0, list_transform(
       |    list_sort(list({'b': b, 'term': term})), x -> x.term)),
       |    (acc, x) -> acc + x) / sum(n) AS score
       |FROM terms GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ---- q120: token-budget waterfill allocation ----------------------------

  /** Training-token budget as a fraction of total corpus tokens
    * (exact integer arithmetic; compile-time constants — read while
    * building oracle SQL). */
  final val WaterfillNum = 3L
  final val WaterfillDen = 5L

  /** q120 — token-budget waterfill across (source, lang) domains: given
    * a global training-token budget of [[WaterfillNum]]/[[WaterfillDen]]
    * of the corpus, allocate per-domain quotas by waterfilling — every
    * domain whose capacity sits below the water level is taken whole
    * (saturated), and the remaining budget splits evenly across the
    * rest. This is the mixture-construction step between q101's dataset
    * card and q90's exact-quota sampler: the allocation it emits is
    * exactly the quota vector a per-domain sampler consumes.
    *
    * Entirely integer: with domains sorted by capacity (md5 tie-break),
    * f(j) = pfx_j + cap_j·(n−j) is nondecreasing, so the saturated
    * count s = #{j : f(j) ≤ budget}; the unsaturated level is spelled
    * floor + remainder (first `rem mod nu` ranks get +1) instead of a
    * rational, so Σ alloc = budget EXACTLY and the oracle hash cannot
    * see an ULP. The only IEEE op is the terminal `share` division.
    *
    * Scale shape: ONE corpus scan partial-aggregates to per-domain
    * capacities; everything after runs on #sources·#langs rows — the
    * unpartitioned windows are bounded by the domain count by
    * construction (domains are data sources, not vocabulary), and the
    * two scalar passes broadcast. */
  def waterfillBudget(s: SparkSession, dir: String): DataFrame = {
    val caps = Tables.documents(s, dir).filter(col("text").isNotNull)
      .groupBy(col("source"), col("lang"))
      .agg(sum(size(tokens(col("text")))).as("cap"))
    val ord = Window.orderBy(col("cap"), col("tid"))
    val r = caps
      .withColumn("tid", conv(substring(
        md5(concat_ws("|", col("source"), col("lang"))), 1, 15), 16, 10)
        .cast("long"))
      .withColumn("rnk", row_number().over(ord).cast("long"))
      .withColumn("pfx", sum(col("cap")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // feeds the scalar saturation pass AND the final allocation
      .localCheckpoint(eager = false)
    val b = r.agg(
      expr(s"sum(cap) * $WaterfillNum div $WaterfillDen").as("budget"),
      count(lit(1)).as("n"))
    val satRow = col("pfx") + col("cap") * (col("n") - col("rnk")) <=
      col("budget")
    val scal = r.crossJoin(broadcast(b)).agg(
      max(col("budget")).as("budget"), max(col("n")).as("n"),
      sum(when(satRow, 1L).otherwise(0L)).as("sat"),
      max(when(satRow, col("pfx")).otherwise(lit(0L))).as("pfx_s"))
    r.crossJoin(broadcast(scal))
      .withColumn("rem", col("budget") - col("pfx_s"))
      .withColumn("nu", col("n") - col("sat"))
      .select(col("source"), col("lang"), col("cap"), col("rnk"),
        (col("rnk") <= col("sat")).as("saturated"),
        when(col("rnk") <= col("sat"), col("cap"))
          .otherwise(expr("rem div nu") +
            when(col("rnk") - col("sat") <= pmod(col("rem"), col("nu")),
              1L).otherwise(0L)).as("alloc"),
        col("budget"))
      .withColumn("share", col("alloc").cast("double") / col("budget"))
      .drop("budget")
      .orderBy(col("rnk"))
  }

  /** THE waterfill CTE chain (caps → budget → rank/prefix → saturation
    * point), shared by the q120 and q121 oracles — the scrubSqlCtes
    * discipline applied here so the allocation arithmetic can never
    * drift between the two spellings. */
  private val waterfillSqlCtes: String =
    s"""caps AS (
       |  SELECT source, lang,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS cap
       |  FROM documents WHERE text IS NOT NULL GROUP BY 1, 2),
       |b AS (SELECT CAST(sum(cap) * $WaterfillNum AS BIGINT) // $WaterfillDen
       |        AS budget, CAST(count(*) AS BIGINT) AS n FROM caps),
       |r AS (SELECT source, lang, cap,
       |    CAST(row_number() OVER ord AS BIGINT) AS rnk,
       |    CAST(sum(cap) OVER (ord ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
       |  FROM caps WINDOW ord AS (ORDER BY cap,
       |    ('0x' || substr(md5(source || '|' || lang), 1, 15))::BIGINT)),
       |s AS (SELECT
       |    CAST(count(*) FILTER (
       |      WHERE pfx + cap*(n-rnk) <= budget) AS BIGINT) AS sat,
       |    coalesce(max(pfx) FILTER (
       |      WHERE pfx + cap*(n-rnk) <= budget), 0) AS pfx_s
       |  FROM r, b)""".stripMargin

  /** The per-rank allocation CASE (floor + largest-remainder split) —
    * ONE spelling, wrapped by each consumer's outer cast. */
  private val waterfillAllocCase: String =
    """CASE WHEN rnk <= sat THEN cap
      |    ELSE (budget - pfx_s) // (n - sat) +
      |      CASE WHEN rnk - sat <= (budget - pfx_s) % (n - sat)
      |           THEN 1 ELSE 0 END
      |  END""".stripMargin

  /** DuckDB spelling of [[waterfillBudget]]: same ranking, same integer
    * saturation predicate, same floor+remainder split. */
  val waterfillBudgetSql: String =
    s"""WITH $waterfillSqlCtes
       |SELECT source, lang, cap, rnk, rnk <= sat AS saturated,
       |  CAST($waterfillAllocCase AS BIGINT) AS alloc,
       |  CAST($waterfillAllocCase AS DOUBLE) / budget AS share
       |FROM r, b, s ORDER BY rnk""".stripMargin

  // ---- q121: greedy quota sample consuming the waterfill ------------------

  /** q121 — the sampler that CONSUMES [[waterfillBudget]]: within each
    * (source, lang) domain, take documents in content-keyed hash order
    * (replan-stable, q90's rule) greedily while the running token count
    * stays inside the domain's waterfill allocation. Emits the kept
    * documents with their pick rank and cumulative tokens — the actual
    * training-mixture manifest a 100 TB pipeline writes after q120
    * decides the quotas.
    *
    * Greedy semantics: a document is kept iff the cumulative count
    * INCLUDING it is ≤ alloc, so a saturated domain (alloc = capacity)
    * keeps everything and an unsaturated one under-fills by less than
    * one document — maximal under the keep-whole-documents constraint.
    *
    * Scale shape: the per-domain window is PARTITIONED by domain (never
    * a global sort); the allocation table is #domains rows and
    * broadcasts onto the doc scan. One shuffle by domain key total. */
  def quotaSample(s: SparkSession, dir: String): DataFrame = {
    val alloc = waterfillBudget(s, dir)
      .select(col("source"), col("lang"), col("alloc"))
    val w = Window.partitionBy(col("source"), col("lang"))
      .orderBy(col("pick_key"))
    Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"), col("lang"),
        size(tokens(col("text"))).cast("long").as("n_tok"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("pick_key"))
      .withColumn("pick_rn", row_number().over(w).cast("long"))
      .withColumn("cum_tok", sum(col("n_tok")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .join(broadcast(alloc), Seq("source", "lang"))
      .filter(col("cum_tok") <= col("alloc"))
      .select(col("doc_id"), col("source"), col("lang"), col("n_tok"),
        col("pick_rn"), col("cum_tok"), col("alloc"))
      .orderBy(col("source"), col("lang"), col("pick_rn"))
  }

  /** DuckDB spelling of [[quotaSample]]: the full [[waterfillBudgetSql]]
    * allocation pipeline as CTEs + the same per-domain greedy cumsum. */
  val quotaSampleSql: String =
    s"""WITH $waterfillSqlCtes,
       |alloc AS (SELECT source, lang,
       |    CAST($waterfillAllocCase AS BIGINT) AS alloc
       |  FROM r, b, s),
       |d AS (SELECT doc_id, source, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST(row_number() OVER w AS BIGINT) AS pick_rn,
       |    CAST(sum(len(string_split(text, ' '))) OVER
       |      (w ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
       |  FROM documents WHERE text IS NOT NULL
       |  WINDOW w AS (PARTITION BY source, lang ORDER BY
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT))
       |SELECT doc_id, d.source, d.lang, n_tok, pick_rn, cum_tok, alloc
       |FROM d JOIN alloc USING (source, lang)
       |WHERE cum_tok <= alloc
       |ORDER BY d.source, d.lang, pick_rn""".stripMargin

  // ---- q122: typed JSON document ingest with malformed quarantine ---------

  /** Every doc_id ≡ 0 (mod this) gets its serialized form truncated —
    * the deterministic stand-in for transport corruption. */
  final val JsonCorruptMod = 7L

  /** q122 — the JSONL ingest codec: crawl drops arrive as JSON lines,
    * and the first pipeline stage is a TYPED parse (`from_json` with an
    * explicit schema — one tokenizer pass into typed columns, unlike
    * q33's per-path `get_json_object` re-parse) plus a quarantine lane
    * for malformed rows. Each document is serialized to a nested JSON
    * line in-engine (the driver supplies only parquet; byte-identical
    * construction in both engines makes the codec oracle-checkable),
    * rows hitting [[JsonCorruptMod]] are truncated mid-object, and the
    * parse emits: the quarantine flag (whole-struct NULL on malformed —
    * Spark's PERMISSIVE mode and the oracle's `json_valid` guard agree
    * by construction), nested-path fields, a typed BIGINT, an array
    * element, and the roundtrip check against the source column.
    *
    * Scale shape: pure per-row map — no shuffle but the presentation
    * sort; the parse is one codegen'd JsonToStructs per row. At 100 TB
    * this runs as the scan-attached projection of the ingest job, and
    * the quarantine flag is the split predicate for the dead-letter
    * sink. */
  def jsonIngest(s: SparkSession, dir: String): DataFrame = {
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, meta STRUCT<lang:STRING, source:STRING>, " +
        "n_chars BIGINT, tags ARRAY<STRING>")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        concat(
          lit("{\"doc_id\":"), col("doc_id"),
          lit(",\"meta\":{\"lang\":\""), col("lang"),
          lit("\",\"source\":\""), col("source"),
          lit("\"},\"n_chars\":"), col("n_chars"),
          lit(",\"tags\":[\""), col("lang"), lit("\",\""), col("source"),
          lit("\"]}")).as("js0"))
      .withColumn("js",
        when(pmod(col("doc_id"), lit(JsonCorruptMod)) === 0,
          expr("substring(js0, 1, length(js0) - 1)")).otherwise(col("js0")))
      .select(col("doc_id"), col("lang"),
        from_json(col("js"), schema).as("p"))
      .select(col("doc_id"),
        col("p.doc_id").isNotNull.as("parse_ok"),
        col("p.meta.lang").as("lang_js"),
        col("p.meta.source").as("source_js"),
        col("p.n_chars").as("n_chars_js"),
        element_at(col("p.tags"), 2).as("tag1"),
        (col("p.meta.lang") <=> col("lang")).as("roundtrip_ok"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB spelling of [[jsonIngest]]: byte-identical serialization,
    * `json_valid` quarantine (≡ Spark's whole-struct-NULL on malformed),
    * same paths. */
  val jsonIngestSql: String =
    s"""WITH built AS (
       |  SELECT doc_id, lang,
       |    '{"doc_id":' || doc_id || ',"meta":{"lang":"' || lang ||
       |    '","source":"' || source || '"},"n_chars":' || n_chars ||
       |    ',"tags":["' || lang || '","' || source || '"]}' AS js0
       |  FROM documents),
       |c AS (SELECT doc_id, lang,
       |    CASE WHEN doc_id % $JsonCorruptMod = 0
       |         THEN substr(js0, 1, length(js0) - 1) ELSE js0 END AS raw
       |  FROM built),
       |v AS (SELECT doc_id, lang,
       |    CASE WHEN json_valid(raw) THEN raw END AS js FROM c)
       |SELECT doc_id, js IS NOT NULL AS parse_ok,
       |  json_extract_string(js, '$$.meta.lang') AS lang_js,
       |  json_extract_string(js, '$$.meta.source') AS source_js,
       |  CAST(json_extract(js, '$$.n_chars') AS BIGINT) AS n_chars_js,
       |  json_extract_string(js, '$$.tags[1]') AS tag1,
       |  json_extract_string(js, '$$.meta.lang') IS NOT DISTINCT FROM lang
       |    AS roundtrip_ok
       |FROM v ORDER BY doc_id""".stripMargin

  // ---- q130: interleaved training-order schedule ---------------------------

  /** Range-shard count for both numbering phases of [[interleave]] —
    * each offset relation is bounded by this (× #sources for phase A)
    * at ANY corpus size. */
  val InterleaveShards = 64

  /** q130 — deterministic interleaved training order (the epoch
    * scheduler): every doc gets a global position such that each
    * source's docs spread uniformly through the epoch — source s with
    * cnt_s docs occupies positions ≈ (i−½)·N/cnt_s — via the classic
    * fractional-position key `(rank_in_source − ½)/cnt_s`, totally
    * ordered by (key, source, doc_id). Training-order interleave is
    * what keeps a mixture's gradient stream stationary; a source-block
    * concatenation (all of src0, then src1 …) is the failure mode.
    *
    * Scale shape — NO global sort and NO per-source single partition,
    * at either phase:
    *  - phase A (rank within source): range-repartition by (source,
    *    doc_id), rank per (part, source) in parallel windows, then add
    *    per-(source, part) offsets — the offset relation is ≤
    *    shards·#sources rows and its prefix sum partitions BY source,
    *    so a 10-source 100 TB corpus never funnels a source through
    *    one task (the grouped generalization of q85/q95's numbering).
    *  - phase B (global position): range-repartition by the interleave
    *    key, rank per part, add ≤[[InterleaveShards]]-row offsets.
    * The key is one IEEE division of exact integers (identical in both
    * engines); ties across equal-size sources break on (source,
    * doc_id) deterministically. */
  def interleave(s: SparkSession, dir: String): DataFrame =
    interleaveOf(Tables.documents(s, dir).select(col("doc_id"), col("source")))

  /** [[interleave]] over any (doc_id, source) frame — split out so
    * CorpusSpec can prove the two-phase positions equal the naive
    * global-window spelling on UNEQUAL source sizes (the harness corpus
    * is degenerate: all sources equal-sized). */
  private[graft] def interleaveOf(docs: DataFrame): DataFrame = {
    // phase A: rank within source, range-sharded
    val shardedA = docs
      .repartitionByRange(InterleaveShards, col("source"), col("doc_id"))
      .withColumn("part", spark_partition_id().cast("long"))
      .localCheckpoint(eager = false) // freezes part for ranks AND offsets
    val rnA = row_number().over(
      Window.partitionBy(col("part"), col("source")).orderBy(col("doc_id")))
    val offA = shardedA.groupBy(col("source"), col("part"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.partitionBy(col("source")).orderBy(col("part"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("src_cnt", sum(col("cnt")).over(
        Window.partitionBy(col("source"))
          .rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
      .select(col("source"), col("part"), col("off"), col("src_cnt"))
    val ranked = shardedA.withColumn("rn", rnA.cast("long"))
      .join(broadcast(offA), Seq("source", "part"))
      .select(col("doc_id"), col("source"),
        (col("off") + col("rn")).as("src_rank"), col("src_cnt"))
      .withColumn("ikey",
        (col("src_rank") - lit(0.5)) / col("src_cnt"))
    // phase B: global position over the interleave key, range-sharded
    val shardedB = ranked
      .repartitionByRange(InterleaveShards,
        col("ikey"), col("source"), col("doc_id"))
      .withColumn("part", spark_partition_id().cast("long"))
      .localCheckpoint(eager = false)
    val rnB = row_number().over(Window.partitionBy(col("part"))
      .orderBy(col("ikey"), col("source"), col("doc_id")))
    val offB = shardedB.groupBy(col("part")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(
        Window.orderBy(col("part"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("part"), col("off"))
    shardedB.withColumn("rn", rnB.cast("long"))
      .join(broadcast(offB), Seq("part"))
      .select(col("doc_id"), col("source"), col("src_rank"), col("src_cnt"),
        col("ikey"), (col("off") + col("rn")).as("pos"))
      .orderBy(col("pos"))
  }

  /** The naive global-window spelling — the ordering contract the
    * two-phase plan implements exactly. */
  val interleaveSql: String =
    """WITH r AS (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id)
      |      AS BIGINT) AS src_rank,
      |    CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS src_cnt
      |  FROM documents),
      |k AS (SELECT *, (src_rank - 0.5)/src_cnt AS ikey FROM r)
      |SELECT doc_id, source, src_rank, src_cnt, ikey,
      |  CAST(row_number() OVER (ORDER BY ikey, source, doc_id) AS BIGINT)
      |    AS pos
      |FROM k ORDER BY pos""".stripMargin

  // ---- q132: delta-join incremental view maintenance ----------------------

  /** Per-mille md5-bucket split points partitioning each join side into
    * its stored base and its delta batch (content-keyed, replan-stable —
    * the q53 convention). */
  final val IvmOrdersOldMax = 900L
  final val IvmCustOldMax   = 950L

  /** q132 — incremental maintenance of a JOIN view (the classical
    * delta-join algebra): the revenue-by-segment view over
    * orders ⋈ customer, maintained as
    *
    *   V_new = V_old ∪ (ΔA ⋈ B_new) ∪ (A_old ⋈ ΔB)
    *
    * where ΔA is the new order batch (10% of orders by md5 bucket) and
    * ΔB the new customer batch (5% of customers) — the identity
    * (A+ΔA)⋈(B+ΔB) = A⋈B + ΔA⋈(B+ΔB) + A⋈ΔB, each term an equi-join
    * that never touches the full×full product again. q109 maintains an
    * AGGREGATE incrementally; this maintains a JOIN — together they are
    * the two halves of incremental view maintenance (every SPJA view
    * composes them). The oracle recomputes the view from the full
    * tables in one pass, so the maintenance algebra must be
    * value-invisible, q109's discipline.
    *
    * Scale shape: at 100 TB V_old is a persisted #segments-row
    * aggregate read back in milliseconds (recomputed here because a
    * query takes no stored state — q77's honesty note) and only the
    * delta terms run: ΔA ⋈ B_new keys on the join column with the small
    * delta driving, A_old ⋈ ΔB turns a 5% customer drop into a
    * broadcast-able probe. The three terms union BEFORE one partial
    * aggregation, so nothing shuffles twice and the exchange carries
    * ≤3·#segments partial rows per partition. */
  def deltaJoinMaintenance(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_totalprice"),
        (Text.md5Bucket1000(col("o_orderkey")) < IvmOrdersOldMax).as("o_old"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"),
        (Text.md5Bucket1000(col("c_custkey")) < IvmCustOldMax).as("c_old"))
    def term(a: DataFrame, b: DataFrame): DataFrame = a
      .join(b, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice"))
    term(orders.filter(col("o_old")), cust.filter(col("c_old")))
      .unionAll(term(orders.filter(!col("o_old")), cust))
      .unionAll(term(orders.filter(col("o_old")), cust.filter(!col("c_old"))))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        graft.ops.Det.dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("c_mktsegment"))
  }

  /** The oracle recomputes the view from the FULL join — q109's
    * "maintenance must be invisible" rule applied to the join delta. */
  val deltaJoinMaintenanceSql: String =
    s"""SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
       |  ${graft.ops.Det.sqlSum("o_totalprice")} AS revenue
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY c_mktsegment
       |ORDER BY c_mktsegment""".stripMargin

  // ---- q202: repeat-epoch allocation (data-constrained regime) ------------

  /** Marginal value of a domain's e-th epoch, in milli-units: fresh
    * tokens are worth 1000, each repeat decays to 60% of the previous
    * pass (the diminishing-returns shape of repeated training data —
    * Muennighoff et al. 2023 find value decays geometrically and is
    * roughly gone past ~4 epochs, hence the 4-epoch cap). */
  val EpochValueMilli: Seq[Long] = Seq(1000L, 600L, 360L, 216L)
  /** Token budget as a fraction of total unique supply: 7/4 — more than
    * one epoch of everything (the data-CONSTRAINED regime q120 doesn't
    * model), less than two, so the greedy boundary genuinely bites. */
  final val EpochBudgetNum = 7L
  final val EpochBudgetDen = 4L

  /** q202 — how to spend a token budget LARGER than the corpus: each
    * (source, lang) domain offers up to ${EpochValueMilli.size} epochs
    * of its unique supply s_i; epoch e of domain i has value density
    * q_i · w_e (domain quality q_i = mean doc chars, in-corpus proxy;
    * w = [[EpochValueMilli]]). Greedy by (density desc, source, lang,
    * epoch) — optimal for this separable concave objective — with
    * q137's boundary rule: the item straddling the budget is truncated
    * to the remaining tokens, everything after is cut. Output: one row
    * per (domain, epoch) with its allocation and status. q120 answers
    * the over-supplied regime (budget < corpus: WHICH tokens); this
    * answers the under-supplied one (budget > corpus: how many REPEATS
    * each domain earns before its value decays away).
    *
    * Scale shape: domain stats are one partial-agg pass over the
    * corpus; the schedule itself lives on ≤|domains|·4 rows — the
    * single-partition window is bounded by the DOMAIN count, never the
    * corpus (the q165-histogram argument). All integer arithmetic. */
  def epochAllocation(s: SparkSession, dir: String): DataFrame = {
    val dom = Tables.documents(s, dir).filter(col("text").isNotNull)
      .groupBy(col("source"), col("lang"))
      .agg(sum(size(tokens(col("text")))).as("supply"),
        expr("sum(n_chars) div count(1)").as("quality"))
      .localCheckpoint(eager = false) // feeds items AND the budget scalar
    val budget = dom.agg(
      expr(s"sum(supply) * $EpochBudgetNum div $EpochBudgetDen").as("b"))
    val w = EpochValueMilli.zipWithIndex
      .map { case (v, i) => s"($v, ${i + 1})" }.mkString(", ")
    val items = dom.crossJoin(
        s.sql(s"SELECT bigint(col2) AS epoch, bigint(col1) AS w " +
          s"FROM (VALUES $w)"))
      .select(col("source"), col("lang"), col("epoch"), col("supply"),
        (col("quality") * col("w")).as("density"))
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("density").desc, col("source"), col("lang"), col("epoch"))
    items
      .withColumn("before", coalesce(sum(col("supply")).over(
        ord.rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(budget))
      .select(col("source"), col("lang"), col("epoch"), col("supply"),
        col("density"), col("before"),
        greatest(lit(0L), least(col("supply"), col("b") - col("before")))
          .as("alloc_tokens"))
      .withColumn("status",
        when(col("alloc_tokens") === col("supply"), "full")
          .when(col("alloc_tokens") > 0, "partial").otherwise("cut"))
      .orderBy(col("density").desc, col("source"), col("lang"), col("epoch"))
  }

  /** DuckDB spelling: same stats, same item lattice, same greedy
    * exclusive-cumsum boundary arithmetic. */
  val epochAllocationSql: String = {
    val w = EpochValueMilli.zipWithIndex
      .map { case (v, i) => s"(${i + 1}, $v)" }.mkString(", ")
    s"""WITH dom AS (
       |  SELECT source, lang,
       |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS supply,
       |    CAST(sum(n_chars) // count(*) AS BIGINT) AS quality
       |  FROM documents WHERE text IS NOT NULL
       |  GROUP BY source, lang),
       |b AS (
       |  SELECT sum(supply) * $EpochBudgetNum // $EpochBudgetDen AS b
       |  FROM dom),
       |ep(epoch, w) AS (VALUES $w),
       |items AS (
       |  SELECT source, lang, CAST(epoch AS BIGINT) AS epoch, supply,
       |    quality * w AS density
       |  FROM dom CROSS JOIN ep),
       |ranked AS (
       |  SELECT *, COALESCE(SUM(supply) OVER (
       |    ORDER BY density DESC, source, lang, epoch
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
       |  FROM items)
       |SELECT source, lang, epoch, supply, CAST(density AS BIGINT)
       |    AS density,
       |  CAST(before AS BIGINT) AS before,
       |  CAST(greatest(0, least(supply, b.b - before)) AS BIGINT)
       |    AS alloc_tokens,
       |  CASE WHEN greatest(0, least(supply, b.b - before)) = supply
       |      THEN 'full'
       |    WHEN greatest(0, least(supply, b.b - before)) > 0 THEN 'partial'
       |    ELSE 'cut' END AS status
       |FROM ranked, b
       |ORDER BY density DESC, source, lang, epoch""".stripMargin
  }

  // ---- q198: A-ES weighted sampling without replacement -------------------

  /** Samples per source. */
  final val AesK = 5
  /** Quantization scale for the exponential keys (nano-units). */
  final val AesScale = 1000000000L

  /** q198 — deterministic weighted sampling WITHOUT replacement, per
    * source, inclusion probability ∝ n_chars: the Efraimidis–Spirakis
    * A-ES scheme (IPL 2006). Each doc gets key uᵢ^(1/wᵢ) for uniform
    * uᵢ; the k largest keys ARE a weighted sample without replacement.
    * Sampling by ln(uᵢ)/wᵢ (monotone in the key) with uᵢ derived from
    * the doc's md5 makes the draw a pure function of the data — the
    * property a 100 TB curation pipeline needs so retries, re-shards
    * and audits all see the SAME sample (q90's quota sampler draws
    * uniformly; this is its weighted generalization).
    *
    * Keys are floor-quantized to integer nano-units (the q125-129
    * µ-nat discipline): uᵢ = (h+1)/2⁵² is a dyadic rational whose ln
    * both engines round identically in practice, and after floor the
    * comparison/output space is exact int64. Ordered contract: the
    * per-source rank is the deliverable (SparkEntry.ordered).
    *
    * Scale shape: one scan; the TopK partial aggregation bounds the
    * exchange to O(k·sources·partitions) — no window over the corpus,
    * no global sort; the id→weight hydration join broadcasts the
    * k·sources sampled ids. */
  def aesWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .localCheckpoint(eager = false) // feeds keys AND hydration
    val keyed = docs.select(col("source"), col("doc_id"),
      expr(s"""bigint(floor($AesScale * ln(
         |  (bigint(conv(substring(md5(string(doc_id)), 1, 13), 16, 10))
         |    + 1) / 4503599627370496.0) / n_chars))""".stripMargin).as("kq"))
    val top = keyed.groupBy(col("source"))
      .agg(graft.functions.TopK.top_k(AesK)(col("doc_id"),
        col("kq").cast("double")).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("p", "st")))
      .select(col("source"), (col("p") + 1).cast("long").as("rank"),
        col("st.id").as("doc_id"), col("st.score").cast("long").as("kq"))
    // broadcast the SAMPLED side (k·#sources rows), never the corpus
    // projection: at 100 TB broadcast(docs) would collect the whole
    // documents (doc_id, n_chars) relation onto the driver — the exact
    // cliff this family's scale discipline exists to avoid
    docs.select(col("doc_id"), col("n_chars"))
      .join(broadcast(top), Seq("doc_id"))
      .select(col("source"), col("rank"), col("doc_id"), col("n_chars"),
        col("kq"))
      .orderBy(col("source"), col("rank"))
  }

  /** DuckDB spelling: same hash-uniform, same quantized key, a ranked
    * window over the same total order. */
  val aesWeightedSampleSql: String =
    s"""WITH k AS (
       |  SELECT source, doc_id, n_chars,
       |    CAST(floor($AesScale * ln(
       |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
       |        + 1) / 4503599627370496.0) / n_chars) AS BIGINT) AS kq
       |  FROM documents),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY source
       |    ORDER BY kq DESC, doc_id) AS rn
       |  FROM k)
       |SELECT source, CAST(rn AS BIGINT) AS rank, doc_id, n_chars, kq
       |FROM r WHERE rn <= $AesK
       |ORDER BY source, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q202_epoch_allocation" -> (epochAllocation _),
    "q198_weighted_sample" -> (aesWeightedSample _),
    "q132_delta_join" -> (deltaJoinMaintenance _),
    "q130_interleave" -> (interleave _),
    "q122_json_ingest" -> (jsonIngest _),
    "q121_budget_sample" -> (quotaSample _),
    "q120_waterfill_budget" -> (waterfillBudget _),
    "q116_importance_weights" -> (importanceWeights _),
    "q109_delta_agg" -> (deltaAggMaintenance _),
    "q99_ingest_gate" -> (ingestGate _),
    "q78_repetition" -> (repetition _),
    "q79_boilerplate_scrub" -> (boilerplateScrub _),
    "q84_bloom_decontam" -> (bloomDecontamination _),
    "q85_global_ids" -> (globalIds _),
    "q89_snapshot_diff" -> (snapshotDiff _))

  val oracles: Map[String, String] = Map(
    "q202_epoch_allocation" -> epochAllocationSql,
    "q198_weighted_sample" -> aesWeightedSampleSql,
    "q132_delta_join" -> deltaJoinMaintenanceSql,
    "q130_interleave" -> interleaveSql,
    "q122_json_ingest" -> jsonIngestSql,
    "q121_budget_sample" -> quotaSampleSql,
    "q120_waterfill_budget" -> waterfillBudgetSql,
    "q116_importance_weights" -> importanceWeightsSql,
    "q109_delta_agg" -> deltaAggMaintenanceSql,
    "q99_ingest_gate" -> ingestGateSql,
    "q78_repetition" -> repetitionSql,
    "q79_boilerplate_scrub" -> boilerplateScrubSql,
    "q84_bloom_decontam" -> bloomDecontaminationSql,
    "q85_global_ids" -> globalIdsSql,
    "q89_snapshot_diff" -> snapshotDiffSql)
}
