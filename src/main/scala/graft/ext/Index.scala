package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Corpus indexing operators: inverted-index construction, skip-gram
  * co-occurrence counting, and tokenizer-vocabulary induction — the
  * index/statistics artifacts an LLM-data pipeline derives FROM the
  * curated corpus (vs [[Text]]/[[Corpus]], which filter it). North-star
  * extensions (no counterpart in the reference's 3-query surface).
  *
  * Determinism rules as elsewhere: exact integer counts, sorted array
  * joins for list-valued output, at most one double division at the end.
  */
object Index {

  private def tokens(c: Column): Column = split(c, " ")

  // ---- q92: capped inverted index -----------------------------------------

  /** Max doc ids materialized per posting list. */
  val PostingsCap = 64

  /** q92 — inverted-index construction with capped posting lists: for
    * every term, its exact document frequency plus the first
    * [[PostingsCap]] doc ids (ascending) of its posting list.
    *
    * Scale shape: per-doc DISTINCT terms come from one in-row
    * `array_distinct` (no pre-explode dedup shuffle); the (term, doc_id)
    * explosion partial-aggregates map-side into per-term partials. The
    * CAP is the load-bearing scale decision: a hot term in a 100 TB
    * corpus has a posting list of billions — materializing it whole makes
    * one reducer row of gigabytes (the classic index-build straggler).
    * Real engines segment or impact-order hot postings; here the
    * truncation happens INSIDE the aggregation — the bounded
    * [[graft.functions.TopK]] aggregator (score = −doc_id, so it keeps
    * the lowest ids) caps every partial buffer AND the merged state at
    * ≤ cap·slack entries, so the hot term's reducer row is bounded by
    * construction, not trimmed after the fact — while `df` stays exact,
    * so selectivity estimation still has the true count. */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"),
        graft.functions.TopK.top_k(PostingsCap)(
          col("doc_id"), -col("doc_id").cast("double")).as("top"))
      .select(col("term"), col("df"),
        least(col("df"), lit(PostingsCap.toLong)).as("n_emitted"),
        array_join(transform(col("top.id"), x => x.cast("string")), ",")
          .as("postings_csv"))
      .orderBy(col("term"))

  /** DuckDB spelling of [[invertedIndex]]: same distinct-terms explode,
    * same ascending-doc-id truncation. */
  val invertedIndexSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(text, chr(32))))
       |    AS term
       |  FROM documents),
       |p AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df,
       |    list_sort(list(doc_id)) AS ids
       |  FROM t GROUP BY term)
       |SELECT term, df, least(df, $PostingsCap) AS n_emitted,
       |  array_to_string(ids[1:$PostingsCap], ',') AS postings_csv
       |FROM p ORDER BY term""".stripMargin

  // ---- q93: skip-gram co-occurrence ---------------------------------------

  /** Max token offset for a co-occurrence (word2vec-style context
    * window: offsets 1..MaxSkip). */
  val MaxSkip = 2
  /** Minimum pair count to keep (support threshold). */
  val MinSupport = 10L

  /** q93 — skip-gram co-occurrence counts: every ordered token pair at
    * offset 1..[[MaxSkip]], counted corpus-wide, kept above
    * [[MinSupport]] — the co-occurrence matrix feeding word-vector
    * training and compound-phrase detection.
    *
    * Scale shape: pairs are generated IN-ROW — `transform` over a
    * position `sequence` per offset, concatenated — so the corpus is
    * never exploded to token granularity before pairing and never
    * windowed (the lag/lead spelling shuffles every token of every
    * document by doc_id first; at 100 TB that is the whole corpus
    * through the wire). The only exchange carries (pair, partial count),
    * bounded by distinct-pair cardinality ≤ V²·[[MaxSkip]] — vocabulary-
    * squared, independent of corpus size. The support filter then cuts
    * the long tail, exactly like a count-based phrase-table prune. */
  def skipgramPairs(s: SparkSession, dir: String): DataFrame =
    skipgramPairsOf(Tables.documents(s, dir))

  /** [[skipgramPairs]] over any frame with a `text` column — split out so
    * the spec can plant short (2-token) documents, where the per-offset
    * guard below is load-bearing. */
  def skipgramPairsOf(docs: DataFrame): DataFrame = {
    val w = col("w")
    val pairsAtOffsets = flatten(array((1 to MaxSkip).map { off =>
      // guard: sequence(1, 0) is DESCENDING [1, 0] in Spark (default
      // step −1), so an unguarded stop of size−off would evaluate
      // element_at(w, 0) — a runtime error — on docs shorter than
      // off+1 tokens; the branch only runs when stop >= 1
      when(size(w) > off,
        transform(sequence(lit(1), size(w) - off),
          i => concat_ws(" ", element_at(w, i), element_at(w, i + off))))
        .otherwise(array().cast("array<string>"))
    }: _*))
    docs
      .select(tokens(col("text")).as("w"))
      // barrier: CollapseProject otherwise inlines split() into the
      // pair lambdas' element_at calls — O(L²) re-split per element
      .localCheckpoint(eager = false)
      // >= 2, not > MaxSkip: a 2-token doc still owns a valid offset-1
      // pair; offsets past a doc's length yield an empty array via the
      // size(w) > off guard above
      .filter(size(w) >= 2)
      .select(explode(pairsAtOffsets).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= MinSupport)
      .select(element_at(split(col("pair"), " "), 1).as("w1"),
        element_at(split(col("pair"), " "), 2).as("w2"),
        col("cnt"))
      .orderBy(col("w1"), col("w2"))
  }

  /** DuckDB spelling of [[skipgramPairs]]: same in-row pair generation
    * per offset, same support threshold. */
  val skipgramPairsSql: String = {
    val offs = (1 to MaxSkip).map { off =>
      s"""SELECT unnest(list_transform(range(1, greatest(len(w) - $off, 0) + 1),
         |    i -> w[i] || chr(32) || w[i + $off])) AS pair
         |  FROM words""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH words AS (
       |  SELECT string_split(text, chr(32)) AS w FROM documents
       |  WHERE len(string_split(text, chr(32))) >= 2),
       |pairs AS (
       |  $offs),
       |counted AS (
       |  SELECT pair, CAST(count(*) AS BIGINT) AS cnt FROM pairs
       |  GROUP BY pair HAVING count(*) >= $MinSupport)
       |SELECT string_split(pair, chr(32))[1] AS w1,
       |  string_split(pair, chr(32))[2] AS w2, cnt
       |FROM counted ORDER BY w1, w2""".stripMargin
  }

  // ---- q95: tokenizer vocabulary induction --------------------------------

  /** Token-mass coverage target: the vocabulary is the shortest
    * frequency-ranked prefix covering ≥ 90% of all token occurrences. */
  val CoverageNum = 9L
  val CoverageDen = 10L

  /** q95 — tokenizer vocabulary induction: rank terms by corpus token
    * count (ties broken by term), keep the shortest prefix whose
    * cumulative mass reaches 90%, and report each kept term's rank,
    * count, and running cumulative count. The inclusion predicate
    * compares exact integers (`cum_before · 10 < total · 9`), never a
    * rounded double, so the vocabulary boundary is engine-exact.
    *
    * Scale shape: the corpus-wide term counting partial-aggregates
    * map-side (the only corpus-sized stage). Ranking is TWO-PHASE over
    * the aggregated term table (q85's shard/offset shape, adapted to a
    * VALUE order): range-repartition by the ranking key
    * (cnt desc, term), rank and accumulate mass per range shard with
    * PARTITIONED windows, then add per-shard offsets computed by a
    * prefix sum over the [[VocabShards]]-row shard-stats relation —
    * whose single-partition window is constant-size at any vocabulary.
    * No partition ever sorts the whole term table, so web-scale V
    * (10⁸+ terms) spreads across the cluster. Range shards follow the
    * global order by construction, and (cnt, term) is a total order, so
    * the two-phase ranks equal the global window's EXACTLY regardless of
    * where the sampled range boundaries fall (IndexLayoutSpec proves ≡
    * against the naive spelling; the oracle is the naive spelling). */
  def vocabInduction(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(s, dir)
      .select(explode(tokens(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
    vocabRankOf(counts)
      .filter((col("cum_cnt") - col("cnt")) * CoverageDen <
        col("total_cnt") * CoverageNum)
      .select(col("rank"), col("term"), col("cnt"), col("cum_cnt"),
        col("total_cnt"))
      .orderBy(col("rank"))
  }

  /** Shard count for the two-phase vocabulary ranking — the shard-stats
    * relation is at most this many rows at ANY vocabulary size. */
  val VocabShards = 64

  /** The two-phase (rank, cum_cnt, total_cnt) attachment over any
    * (term, cnt) relation — split out so the spec can prove it equals
    * the naive global-window spelling on the same input. */
  private[graft] def vocabRankOf(counts: DataFrame): DataFrame = {
    // phase 1: range shards follow (cnt desc, term); the part id is
    // frozen by the checkpoint (it feeds per-shard windows AND offsets)
    val sharded = counts
      .repartitionByRange(VocabShards, col("cnt").desc, col("term"))
      .withColumn("part", spark_partition_id().cast("long"))
      .localCheckpoint(eager = false)
    val w = Window.partitionBy(col("part"))
      .orderBy(col("cnt").desc, col("term"))
    val ranked = sharded
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum_in", sum(col("cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // phase 2: per-shard offsets — the ONLY unpartitioned windows run
    // over this <= VocabShards-row relation, never the term table
    val prior = Window.orderBy(col("part"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy(col("part"))
      .agg(count(lit(1)).as("n_terms"), sum(col("cnt")).as("mass"))
      .withColumn("rank_off", coalesce(sum(col("n_terms")).over(prior), lit(0L)))
      .withColumn("mass_off", coalesce(sum(col("mass")).over(prior), lit(0L)))
      .withColumn("total", sum(col("mass")).over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .select(col("part"), col("rank_off"), col("mass_off"), col("total"))
    ranked.join(broadcast(offsets), Seq("part"))
      .select(col("term"), col("cnt"),
        (col("rank_off") + col("rn")).as("rank"),
        (col("mass_off") + col("cum_in")).as("cum_cnt"),
        col("total").as("total_cnt"))
  }

  /** DuckDB spelling of [[vocabInduction]]: same ranking, same exact-
    * integer coverage predicate. */
  val vocabInductionSql: String =
    s"""WITH counts AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(string_split(text, chr(32))) AS term
       |    FROM documents)
       |  GROUP BY term),
       |ranked AS (
       |  SELECT term, cnt,
       |    CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT)
       |      AS rank,
       |    sum(cnt) OVER (ORDER BY cnt DESC, term
       |      ROWS UNBOUNDED PRECEDING) AS cum_cnt,
       |    sum(cnt) OVER () AS total
       |  FROM counts)
       |SELECT rank, term, cnt, CAST(cum_cnt AS BIGINT) AS cum_cnt,
       |  CAST(total AS BIGINT) AS total_cnt
       |FROM ranked
       |WHERE (cum_cnt - cnt) * $CoverageDen < total * $CoverageNum
       |ORDER BY rank""".stripMargin

  // ---- q118: BM25 retrieval (rational idf, engine-exact) ------------------

  /** Results per probe query. */
  val Bm25K = 5

  /** Fixed probe workload: (query_id, term) — one rare-term query
    * (`dup` is the planted-duplicate marker, df ≈ N/20) and two
    * common-term queries, so idf discrimination and tf saturation both
    * show up in the ranking. */
  private[graft] val bm25Probes: Seq[(Long, String)] = Seq(
    0L -> "dup", 0L -> "scan",
    1L -> "spark", 1L -> "hash", 1L -> "join",
    2L -> "window", 2L -> "sort")

  /** q118 — BM25 top-[[Bm25K]] retrieval over the corpus for a fixed
    * probe workload, with the standard constants k1=1.2, b=0.75 and the
    * log-free RATIONAL idf `(N − df + ½)/(df + ½)` (Robertson's idf
    * without the ln — the same engine-exactness trade q116 makes: ln is
    * not correctly rounded everywhere, division is). Clearing
    * denominators turns each matched term's contribution into a ratio of
    * two exact BIGINT polynomials,
    *
    *   sc(t,d) = (2(N−df)+1) · 22·tf·S
    *           / [ (2df+1) · (10·S·tf + 3·S + 9·dl·N) ]
    *
    * (S = total token occurrences, dl = |d|; multiply idf by 2/2 and the
    * tf-part by 10S/10S) — ONE IEEE division per term, then a fixed
    * term-order fold per (query, doc). Int64 headroom: both polynomials
    * stay < 2⁵³ while df,N ≲ 10⁶ and tf·S ≲ 10¹¹; past that widen the
    * products to decimal(38,0) and the ratio stays one exact division.
    *
    * Scale shape: tf/df/dl are the standard one-scan partial aggregates;
    * the probe relation and the vocab-sized df table broadcast; ranking
    * is the bounded [[graft.functions.TopK]] partial aggregation — every
    * map task reduces to ≤k candidates per query BEFORE the shuffle, so
    * the exchange carries O(Q·k·partitions), never the matched-doc set
    * (with common terms that set is effectively the corpus). */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val (tfc, lens) = bm25IndexOf(Tables.documents(s, dir))
    bm25ServeFrom(s, tfc, lens)
  }

  /** The q118 index state of a documents frame: the postings relation
    * `tfc(doc_id, term, tf)` and the doc-length relation
    * `lens(doc_id, dl)` — exactly the two tables a search engine
    * persists, and the carried state of the streaming maintainer
    * ([[graft.streaming.DocStreams.maintainBm25Index]]): a drop appends
    * its docs' rows; existing docs are never re-tokenized. */
  private[graft] def bm25IndexOf(docs0: DataFrame): (DataFrame, DataFrame) = {
    val docs = docs0.filter(col("text").isNotNull)
      .select(col("doc_id"), tokens(col("text")).as("w"))
      // barrier: CollapseProject would inline split() into consumers
      .localCheckpoint(eager = false)
    val lens = docs.select(col("doc_id"), size(col("w")).cast("long").as("dl"))
    val tfc = docs.select(col("doc_id"), explode(col("w")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    (tfc, lens)
  }

  /** Serve the fixed [[bm25Probes]] workload from a BM25 index (the
    * [[bm25IndexOf]] relations). The corpus-level statistics (df, N, S)
    * are DERIVED from the index at probe time — one vocab-sized and one
    * 1-row aggregate — so a maintained index needs no separate stats
    * carry and the served ranking equals a from-scratch [[bm25TopK]]
    * over the same docs by construction. */
  private[graft] def bm25ServeFrom(s: SparkSession, tfc: DataFrame,
      lens: DataFrame): DataFrame = {
    import s.implicits._
    val dfc = tfc.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tot = lens.agg(count(lit(1)).as("n"), sum(col("dl")).as("s"))
    val probes = bm25Probes.toDF("query_id", "term")
    val terms = tfc.join(broadcast(probes), Seq("term"))
      .join(broadcast(dfc), Seq("term"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(tot))
      .select(col("query_id"), col("doc_id"), col("term"),
        (((lit(2L) * (col("n") - col("df")) + 1L) * 22L * col("tf") * col("s"))
          .cast("double") /
          ((lit(2L) * col("df") + 1L) *
            (lit(10L) * col("s") * col("tf") + lit(3L) * col("s") +
              lit(9L) * col("dl") * col("n")))).as("sc"))
    val scored = terms
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("term"), col("sc")))).as("arr"))
      .select(col("query_id"), col("doc_id"),
        aggregate(transform(col("arr"), x => x.getField("sc")),
          lit(0.0), (a, x) => a + x).as("score"))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.top_k(Bm25K)(col("doc_id"), col("score"))
        .as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "st")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("st.id").as("doc_id"), col("st.score").as("score"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** The [[bm25TopKSql]] CTE chain up to (and including) the full ranked
    * list `r(query_id, doc_id, score, rnk)` — shared with the q155
    * hybrid-fusion oracle, which consumes the ranked list rather than
    * the top-[[Bm25K]] slice. */
  private[graft] val bm25RankedCtes: String = {
    val values = bm25Probes.zipWithIndex.map { case ((q, t), i) =>
      if (i == 0) s"(CAST($q AS BIGINT), '$t')" else s"($q, '$t')"
    }.mkString(", ")
    s"""d AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE text IS NOT NULL),
       |lens AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM d),
       |tfx AS (SELECT doc_id, unnest(w) AS term FROM d),
       |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tfx GROUP BY 1, 2),
       |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY 1),
       |tot AS (SELECT count(*) AS n, sum(dl) AS s FROM lens),
       |probes(query_id, term) AS (VALUES $values),
       |terms AS (
       |  SELECT p.query_id, t.doc_id, t.term,
       |    CAST((2 * (n - df) + 1) * 22 * tf * s AS DOUBLE) /
       |      ((2 * df + 1) * (10 * s * tf + 3 * s + 9 * dl * n)) AS sc
       |  FROM probes p JOIN tfc t USING (term) JOIN dfc USING (term)
       |  JOIN lens USING (doc_id) CROSS JOIN tot),
       |scored AS (
       |  SELECT query_id, doc_id,
       |    list_reduce(list_prepend(0.0, list_transform(
       |      list_sort(list({'term': term, 'sc': sc})), x -> x.sc)),
       |      (a, b) -> a + b) AS score
       |  FROM terms GROUP BY 1, 2),
       |r AS (
       |  SELECT query_id, doc_id, score, CAST(row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, doc_id) AS BIGINT)
       |    AS rnk
       |  FROM scored)""".stripMargin
  }

  /** DuckDB spelling of [[bm25TopK]]: same integer polynomials, same
    * term-order fold, same (score desc, doc_id) tie-break. */
  val bm25TopKSql: String =
    s"""WITH $bm25RankedCtes
       |SELECT query_id, rnk, doc_id, score FROM r WHERE rnk <= $Bm25K
       |ORDER BY query_id, rnk""".stripMargin

  // ---- q119: token-mass coverage curve ------------------------------------

  /** Curve sample points (k most frequent terms). */
  val CoverageCurveKs: Seq[Long] = Seq(1L, 2L, 4L, 8L, 16L, 32L)

  /** q119 — per-language token-mass coverage curve: for each k in
    * [[CoverageCurveKs]], the fraction of that language's token
    * occurrences covered by its k most frequent terms (ties by term
    * hash). The log-free Zipf diagnostic: how steep each language's
    * head is drives tokenizer-vocabulary and stopword budgets per
    * language — a language whose top-32 terms carry 80% of mass wants a
    * different filter config than one at 20%. Exact integer masses; the
    * terminal division is the only IEEE op.
    *
    * Scale shape: ONE corpus-sized scan partial-aggregates to
    * (lang, term) counts; per-language top-32 selection is the bounded
    * [[graft.functions.TopK]] aggregation (per-partition state ≤ 32·slack
    * entries — never a vocabulary-sized window, the q95 criticism this
    * operator avoids by construction because the curve only needs the
    * head). Everything downstream is O(#langs · 32) rows. Term identity
    * inside TopK is the 60-bit md5 prefix (the registry-wide portable
    * hash): a collision would merge two terms' tie-break, not their
    * counts, and the oracle hashes identically either way. */
  def coverageCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val counts = Tables.documents(s, dir).filter(col("text").isNotNull)
      .select(col("lang"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("cnt"))
      // feeds both the totals and the head selection
      .localCheckpoint(eager = false)
    val totals = counts.groupBy(col("lang")).agg(sum(col("cnt")).as("total_cnt"))
    // head: top-32 counts per language, ranked (cnt desc, hash60 asc) —
    // TopK maximizes score with id-ascending tie-break, so score = cnt
    val head = counts
      .select(col("lang"),
        conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long").as("tid"),
        col("cnt"))
      .groupBy(col("lang"))
      .agg(graft.functions.TopK.top_k(CoverageCurveKs.max.toInt)(
        col("tid"), col("cnt").cast("double")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "st")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rn"),
        col("st.score").cast("long").as("cnt"))
    val ks = CoverageCurveKs.toDF("k")
    head.join(broadcast(ks), col("rn") <= col("k"))
      .groupBy(col("lang"), col("k"))
      .agg(sum(col("cnt")).as("cum_cnt"))
      .join(totals, Seq("lang"))
      .select(col("lang"), col("k"), col("cum_cnt"), col("total_cnt"),
        (col("cum_cnt").cast("double") / col("total_cnt")).as("coverage"))
      .orderBy(col("lang"), col("k"))
  }

  /** DuckDB spelling of [[coverageCurve]]: same per-language ranking
    * (cnt desc, 60-bit md5-prefix tie-break), same curve points. */
  val coverageCurveSql: String = {
    val ks = CoverageCurveKs.zipWithIndex.map { case (k, i) =>
      if (i == 0) s"(CAST($k AS BIGINT))" else s"($k)"
    }.mkString(", ")
    s"""WITH tx AS (
       |  SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
       |  WHERE text IS NOT NULL),
       |c AS (SELECT lang, term, count(*) AS cnt FROM tx GROUP BY 1, 2),
       |tot AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS total_cnt FROM c GROUP BY 1),
       |r AS (SELECT lang, cnt, row_number() OVER (PARTITION BY lang
       |  ORDER BY cnt DESC, ('0x' || substr(md5(term), 1, 15))::BIGINT)
       |  AS rn FROM c),
       |ks(k) AS (VALUES $ks),
       |cum AS (SELECT lang, k, CAST(sum(cnt) AS BIGINT) AS cum_cnt FROM r
       |  JOIN ks ON r.rn <= ks.k GROUP BY 1, 2)
       |SELECT c.lang, k, cum_cnt, total_cnt,
       |  CAST(cum_cnt AS DOUBLE) / total_cnt AS coverage
       |FROM cum c JOIN tot USING (lang) ORDER BY lang, k""".stripMargin
  }

  // ---- q167: positional phrase search -------------------------------------

  /** Fixed probe phrases (q66/q118's fixed-constant fixture discipline);
    * the last one is deliberately ABSENT from the corpus so the
    * zero-hit lane is exercised and visible in the output. */
  val PhraseProbes: Seq[String] =
    Seq("value table", "key scan", "sort table", "petabyte engine")

  /** q167 — exact phrase search over a POSITIONAL postings relation:
    * for each probe phrase, the documents containing its words at
    * ADJACENT positions and the total occurrence count — the phrase
    * operator of a search engine (and the "grep the corpus for this
    * exact string, tokenized" tool a curation team reaches for), which
    * the bag-of-words surfaces (q92's doc-level postings, q118's BM25)
    * cannot answer: they know the words co-occur, not that they touch.
    *
    * Scale shape: the positional explode restricts to PROBE WORDS
    * before any join (`w IN (...)` pushes into the scan projection), so
    * the self-join is df-bounded — exactly the posting-list
    * intersection a search engine runs, spelled as one (doc, pos)
    * equi-join; the zero-hit lane comes from a left join off the
    * constant probe relation, so absent phrases report 0 instead of
    * vanishing. The single count-distinct aggregates two-phase without
    * an Expand (one distinct clause — q36's rule). */
  def phraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = PhraseProbes.flatMap(_.split(" ")).distinct
    val pos = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " "))
        .as(Seq("p", "w")))
      .filter(col("w").isin(words: _*))
      .localCheckpoint(eager = false) // both sides of the adjacency join
    val matches = pos.select(col("doc_id"), col("p"), col("w").as("w1"))
      .join(pos.select(col("doc_id"), (col("p") - 1).as("p"),
        col("w").as("w2")), Seq("doc_id", "p"))
      .select(col("doc_id"), concat_ws(" ", col("w1"), col("w2")).as("phrase"))
      .filter(col("phrase").isin(PhraseProbes: _*))
    val counts = matches.groupBy(col("phrase"))
      .agg(countDistinct(col("doc_id")).as("d"), count(lit(1)).as("o"))
    PhraseProbes.toDF("phrase")
      .join(counts, Seq("phrase"), "left")
      .select(col("phrase"), coalesce(col("d"), lit(0L)).as("n_docs"),
        coalesce(col("o"), lit(0L)).as("n_occurrences"))
      .orderBy(col("phrase"))
  }

  /** DuckDB spelling: q114's positional-unnest idiom, same adjacency
    * join, same probe relation. */
  val phraseSearchSql: String = {
    val words = PhraseProbes.flatMap(_.split(" ")).distinct
      .map(w => s"'$w'").mkString(", ")
    val phrases = PhraseProbes.map(p => s"'$p'").mkString(", ")
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |g AS (
       |  SELECT doc_id, s['p'] AS p, s['w'] AS w FROM (
       |    SELECT doc_id, unnest(list_transform(
       |      range(1, len(ts) + 1), i -> {'p': i, 'w': ts[i]})) AS s
       |    FROM w) t(doc_id, s)),
       |pos AS (SELECT * FROM g WHERE w IN ($words)),
       |m AS (
       |  SELECT a.doc_id, a.w || ' ' || b.w AS phrase
       |  FROM pos a JOIN pos b
       |    ON b.doc_id = a.doc_id AND b.p = a.p + 1
       |  WHERE a.w || ' ' || b.w IN ($phrases)),
       |c AS (
       |  SELECT phrase, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d,
       |    CAST(COUNT(*) AS BIGINT) AS o
       |  FROM m GROUP BY 1),
       |pr AS (SELECT unnest([$phrases]) AS phrase)
       |SELECT pr.phrase, COALESCE(c.d, 0) AS n_docs,
       |  COALESCE(c.o, 0) AS n_occurrences
       |FROM pr LEFT JOIN c USING (phrase)
       |ORDER BY phrase""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q167_phrase_search" -> (phraseSearch _),
    "q119_coverage_curve" -> (coverageCurve _),
    "q118_bm25_topk" -> (bm25TopK _),
    "q92_inverted_index" -> (invertedIndex _),
    "q93_skipgram_pairs" -> (skipgramPairs _),
    "q95_vocab_induction" -> (vocabInduction _))

  val oracles: Map[String, String] = Map(
    "q167_phrase_search" -> phraseSearchSql,
    "q119_coverage_curve" -> coverageCurveSql,
    "q118_bm25_topk" -> bm25TopKSql,
    "q92_inverted_index" -> invertedIndexSql,
    "q93_skipgram_pairs" -> skipgramPairsSql,
    "q95_vocab_induction" -> vocabInductionSql)
}
