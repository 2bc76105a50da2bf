package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        i => concat_ws(" ", element_at(col("w"), i),
          element_at(col("w"), i + 1)))).as("bg"))
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
    *    positions — output ∝ boilerplate volume, not corpus size;
    *  - reassembly: anti-join word positions against covered positions on
    *    (doc, pos), then one per-doc sort-and-hash aggregation.
    * Every stage is a keyed shuffle with partial aggregation; nothing is
    * driver-side and nothing is quadratic. */
  def boilerplateScrub(s: SparkSession, dir: String): DataFrame = {
    // words feeds grams, word positions, and the per-doc base — 3 consumers
    val words = Tables.documents(s, dir)
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
    val covered = grams.join(hot, Seq("gram"), "left_semi")
      .select(col("doc_id"), explode(sequence(col("s"),
        col("s") + (GramN - 1))).as("p"))
      .distinct()
    val kept = words
      .select(col("doc_id"), posexplode(col("w")).as(Seq("p0", "word")))
      .select(col("doc_id"), (col("p0") + 1).cast("long").as("p"), col("word"))
      .join(covered, Seq("doc_id", "p"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("kept_tok"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("p"), col("word")))),
          x => x.getField("word")), " ")).as("scrub_fp"))
    words.select(col("doc_id"), col("n_tok"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tok"),
        coalesce(col("kept_tok"), lit(0L)).as("kept_tok"),
        (col("n_tok") - coalesce(col("kept_tok"), lit(0L))).as("n_scrubbed"),
        coalesce(col("scrub_fp"), md5(lit(""))).as("scrub_fp"))
      .orderBy(col("doc_id"))
  }

  val boilerplateScrubSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS w,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS s,
       |    w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
       |      || ' ' || w[i+4] AS gram
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
       |  GROUP BY pos.doc_id)
       |SELECT w.doc_id, n_tok,
       |  coalesce(kept_tok, 0) AS kept_tok,
       |  n_tok - coalesce(kept_tok, 0) AS n_scrubbed,
       |  coalesce(scrub_fp, md5('')) AS scrub_fp
       |FROM w LEFT JOIN kept USING (doc_id)
       |ORDER BY w.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q78_repetition" -> (repetition _),
    "q79_boilerplate_scrub" -> (boilerplateScrub _))

  val oracles: Map[String, String] = Map(
    "q78_repetition" -> repetitionSql,
    "q79_boilerplate_scrub" -> boilerplateScrubSql)
}
