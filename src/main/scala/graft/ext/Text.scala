package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Text-analysis operators over the `documents` table — north-star
  * extension (SURVEY.md §7.4; no counterpart in the reference).
  *
  * Design rules for 100 TB:
  *  - tokenization happens inside codegen'd built-ins (`split`, `size`,
  *    `filter`, `transform`) — no Scala UDFs in the hot path;
  *  - per-group ratios aggregate exact integer counts first and divide
  *    once at the end (deterministic double division), never summing
  *    per-row doubles (order-dependent);
  *  - explode-based term frequency shuffles (word, 1) pairs — partial
  *    aggregation collapses them map-side before the exchange.
  */
object Text {

  private def tokens(c: Column): Column = split(c, " ")

  /** q19 — per-language token statistics. */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("n_tok"),
        col("n_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        (sum(col("n_tok")).cast("double") / count(lit(1))).as("avg_tokens"),
        (sum(col("n_chars")).cast("double") / sum(col("n_tok")))
          .as("chars_per_token"))
      .orderBy(col("lang"))

  val tokenStatsSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)
      |    AS avg_tokens,
      |  CAST(sum(n_chars) AS DOUBLE) / sum(len(string_split(text, ' ')))
      |    AS chars_per_token
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** q20 — global term frequency via explode: top-20 words. */
  def termFrequency(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(20)

  val termFrequencySql: String =
    """SELECT word, count(*) AS freq
      |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |GROUP BY word
      |ORDER BY freq DESC, word
      |LIMIT 20""".stripMargin

  /** q21 — per-source quality scoring: stopword ratio, type-token ratio,
    * mean token length; flag count of low-quality docs
    * (short or stopword-heavy). Integer counts aggregated exactly, one
    * double division at the end. */
  def qualityStats(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val stop = filter(toks, t => t.isin("the", "a"))
    val docs = Tables.documents(s, dir).select(
      col("source"),
      size(toks).cast("long").as("n_tok"),
      size(stop).cast("long").as("n_stop"),
      size(array_distinct(toks)).cast("long").as("n_distinct"),
      col("n_chars"))
    docs.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        (sum(col("n_stop")).cast("double") / sum(col("n_tok")))
          .as("stopword_ratio"),
        (sum(col("n_distinct")).cast("double") / sum(col("n_tok")))
          .as("type_token_ratio"),
        sum(when(col("n_tok") < 20 ||
          col("n_stop") * 4 > col("n_tok"), 1L).otherwise(0L))
          .as("n_low_quality"))
      .orderBy(col("source"))
  }

  val qualityStatsSql: String =
    """WITH d AS (
      |  SELECT source,
      |    len(string_split(text, ' ')) AS n_tok,
      |    len(list_filter(string_split(text, ' '),
      |        t -> t IN ('the', 'a'))) AS n_stop,
      |    len(list_distinct(string_split(text, ' '))) AS n_distinct
      |  FROM documents)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(n_stop) AS DOUBLE) / sum(n_tok) AS stopword_ratio,
      |  CAST(sum(n_distinct) AS DOUBLE) / sum(n_tok) AS type_token_ratio,
      |  CAST(sum(CASE WHEN n_tok < 20 OR n_stop * 4 > n_tok
      |      THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality
      |FROM d
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** q22 — content fingerprinting + exact dedup: md5 fingerprint per doc,
    * keep the lowest doc_id per fingerprint, report group size.
    * (Both engines produce identical md5 hex.) At scale this is the
    * standard exact-dedup: one shuffle on the 128-bit fingerprint, never
    * on the document text itself. */
  def exactDedup(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), md5(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("keep_doc_id"))

  val exactDedupSql: String =
    """SELECT md5(text) AS fp, min(doc_id) AS keep_doc_id,
      |  count(*) AS n_copies
      |FROM documents
      |GROUP BY md5(text)
      |ORDER BY keep_doc_id""".stripMargin

  /** q23 — word-3-gram Jaccard near-dup pairs.
    * shingle → inverted index (explode) → self-join on shingle →
    * intersection counts → Jaccard from exact int counts.
    * The standard scalable formulation: the self-join is on the shingle
    * key (pre-filtered to distinct doc-shingle pairs), so cost is
    * sum over shingles of df², not N². */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    // words staged as their own projection: referencing split() inside the
    // shingle lambda would re-split the text per element (O(L²)/doc)
    val shingles = array_distinct(transform(
      sequence(lit(1), size(col("w")) - 2),
      i => concat_ws(" ", element_at(col("w"), i),
        element_at(col("w"), i + 1), element_at(col("w"), i + 2))))
    // cached: the shingle relation feeds three consumers (two join sides
    // + per-doc counts); without cache Spark recomputes the explode 3×
    val sh = Tables.documents(s, dir)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(shingles).as("shingle"))
      .cache()
    val cnt = sh.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"))
    val a = sh.select(col("doc_id").as("a_id"), col("shingle"))
    val b = sh.select(col("doc_id").as("b_id"), col("shingle"))
    val inter = a.join(b, Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(cnt.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("n_sh", "a_sh"), Seq("a_id"))
      .join(cnt.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("n_sh", "b_sh"), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (col("n_inter").cast("double") /
          (col("a_sh") + col("b_sh") - col("n_inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.12)
      .orderBy(col("a_id"), col("b_id"))
  }

  val ngramJaccardSql: String =
    """WITH sh AS (
      |  SELECT DISTINCT doc_id, shingle FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(1, len(string_split(text,' ')) - 1),
      |        i -> string_split(text,' ')[i] || ' ' ||
      |             string_split(text,' ')[i+1] || ' ' ||
      |             string_split(text,' ')[i+2])) AS shingle
      |    FROM documents
      |    WHERE len(string_split(text,' ')) >= 3)),
      |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_inter
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT a_id, b_id,
      |  CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) AS jaccard
      |FROM inter
      |JOIN cnt ca ON ca.doc_id = a_id
      |JOIN cnt cb ON cb.doc_id = b_id
      |WHERE CAST(n_inter AS DOUBLE) / (ca.n_sh + cb.n_sh - n_inter) >= 0.12
      |ORDER BY a_id, b_id""".stripMargin

  /** q43 — BPE-ish regex token counting: subword-flavored segmentation
    * (letter runs, digit runs, single punctuation — the GPT-2 pre-tokenizer
    * shape) via regexp_extract_all. Same RE2-compatible pattern runs in
    * both engines. */
  def regexTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]', 0)"))
          .cast("long").as("n_tok"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_subword_tokens"),
        max(col("n_tok")).as("max_subword_tokens"))
      .orderBy(col("lang"))

  val regexTokensSql: String =
    """SELECT lang, count(*) AS n_docs,
      |  CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
      |    AS total_subword_tokens,
      |  CAST(max(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT)
      |    AS max_subword_tokens
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  /** q46 — document fingerprints via the custom rolling-hash and SimHash
    * expressions (rows-only: the hashes are Spark-native; determinism is
    * covered by DedupSpec/PropertySpec). */
  def fingerprints(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{rolling_hash, simhash64}
    Tables.documents(s, dir)
      .select(col("doc_id"), rolling_hash(col("text")).as("roll_fp"),
        simhash64(col("text")).as("sim_fp"))
      .orderBy(col("doc_id"))
  }

  /** q47 — heuristic language-ID vs the labeled lang column: confusion
    * counts (rows-only: LangId is a custom expression). On this synthetic
    * corpus the text is English-ish for every label, so the value is the
    * operator mechanics, not accuracy. */
  def langIdConfusion(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.lang_id
    Tables.documents(s, dir)
      .select(col("lang").as("labeled"), lang_id(col("text")).as("predicted"))
      .groupBy(col("labeled"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("labeled"), col("predicted"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_fingerprints"  -> (fingerprints _),
    "q47_langid"        -> (langIdConfusion _),
    "q43_regex_tokens"  -> (regexTokens _),
    "q19_token_stats"   -> (tokenStats _),
    "q20_term_freq"     -> (termFrequency _),
    "q21_quality_stats" -> (qualityStats _),
    "q22_exact_dedup"   -> (exactDedup _),
    "q23_ngram_jaccard" -> (ngramJaccard _))

  val oracles: Map[String, String] = Map(
    "q43_regex_tokens"  -> regexTokensSql,
    "q19_token_stats"   -> tokenStatsSql,
    "q20_term_freq"     -> termFrequencySql,
    "q21_quality_stats" -> qualityStatsSql,
    "q22_exact_dedup"   -> exactDedupSql,
    "q23_ngram_jaccard" -> ngramJaccardSql)
}
