package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Record linkage / entity resolution: blocked fuzzy self-join over a
  * deduplicated name dictionary. North-star extension (no counterpart in
  * the reference's 3-query surface — reference: CollegeScorecard.scala
  * has exact-key grouping only).
  *
  * The canonical 100 TB shape for "find records whose names almost
  * match" has three stages, each load-bearing:
  *
  *  1. '''Dictionary dedup first.''' Fuzzy-compare DISTINCT names, never
  *     rows: a 100 TB entity table has billions of rows but a name
  *     dictionary orders of magnitude smaller (64 names across 2 000
  *     parts here; the same ratio holds for real vendor/author/domain
  *     columns). The expensive edit-distance pass must run on the
  *     dictionary, with row volumes re-attached afterwards by count.
  *  2. '''Blocking key.''' A cheap deterministic key (here: the last
  *     name token) partitions the dictionary so the quadratic comparison
  *     runs per block, an equi-join on the key — never an all-pairs
  *     cartesian. With B blocks the candidate count drops from |D|²/2 to
  *     Σ|block|²/2 ≈ |D|²/(2B). Skewed blocks (one giant block) are the
  *     known failure mode; production systems use multiple redundant
  *     blocking keys and cap block size exactly like q51 caps shingle df.
  *  3. '''Exact verify.''' `levenshtein` (codegen'd built-in, not a UDF)
  *     confirms candidates; the threshold-2 matches here are the
  *     adjective typo-pairs ("cold widget" / "old widget").
  */
object Linkage {

  /** Edit-distance threshold for a confirmed link. */
  val MaxEdit = 2

  /** q91 — blocked fuzzy linkage over part names: distinct-name
    * dictionary → last-token blocking → per-block levenshtein ≤
    * [[MaxEdit]] → re-attach per-name part counts. */
  def fuzzyLinkage(s: SparkSession, dir: String): DataFrame = {
    val dict = Tables.part(s, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      .select(col("p_name"), col("n_parts"),
        element_at(split(col("p_name"), " "), -1).as("blk"))
    val a = dict.select(col("blk"), col("p_name").as("name_a"),
      col("n_parts").as("n_a"))
    val b = dict.select(col("blk"), col("p_name").as("name_b"),
      col("n_parts").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .select(col("blk"), col("name_a"), col("name_b"),
        levenshtein(col("name_a"), col("name_b")).as("dist"),
        col("n_a"), col("n_b"))
      .filter(col("dist") <= MaxEdit)
      .orderBy(col("blk"), col("name_a"), col("name_b"))
  }

  /** DuckDB spelling of [[fuzzyLinkage]]: same dictionary, same blocking
    * key, same threshold. (`chr(32)` = space — avoids quoting issues in
    * the driver's SQL transport.) */
  val fuzzyLinkageSql: String =
    s"""WITH dict AS (
       |  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
       |    string_split(p_name, chr(32))[-1] AS blk
       |  FROM part GROUP BY 1, 3)
       |SELECT a.blk, a.p_name AS name_a, b.p_name AS name_b,
       |  CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist,
       |  a.n_parts AS n_a, b.n_parts AS n_b
       |FROM dict a JOIN dict b ON a.blk = b.blk AND a.p_name < b.p_name
       |WHERE levenshtein(a.p_name, b.p_name) <= $MaxEdit
       |ORDER BY a.blk, name_a, name_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q91_fuzzy_linkage" -> (fuzzyLinkage _),
    "q136_fastss_join" -> (fastssJoin _),
    "q145_entity_ids" -> (entityIds _))

  // ---- q136: deletion-neighborhood edit-distance join (FastSS) ------------

  /** q136 — PROVABLY COMPLETE Levenshtein-≤1 self-join via deletion
    * neighborhoods (FastSS, Bocek et al. 2007): every name emits itself
    * plus its |s| single-character deletions; two names are within edit
    * distance 1 IFF their neighborhoods intersect (substitution at i ⇒
    * both drop position i to the same string; insert/delete ⇒ one IS a
    * deletion of the other; equality ⇒ the identity variant). The
    * candidate join is a plain equi-join on the variant string and —
    * unlike q91's last-token blocking, which silently misses pairs whose
    * typo is IN the blocking token — provably loses nothing. levenshtein
    * then discards the false positives the intersection admits (e.g.
    * transpositions).
    *
    * Scale shape: the neighborhood explode is dictionary-sized
    * (|D|·(len+1) short strings), never row-sized — stage-1 dictionary
    * dedup does the 10⁶× volume reduction exactly as in q91; the
    * candidate join keys on variant (no all-pairs, no skew beyond
    * variant df, and a df cap like q51's would bound even that). */
  def fastssJoin(s: SparkSession, dir: String): DataFrame = {
    val dict = Tables.part(s, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      // i == length ⇒ the identity variant; else drop 1-based position i+1
      .select(col("p_name"), col("n_parts"),
        explode(array_distinct(transform(
          sequence(lit(0), length(col("p_name"))),
          i => when(i === length(col("p_name")), col("p_name"))
            .otherwise(concat(
              substring(col("p_name"), lit(1), i),
              substring(col("p_name"), i + 2, length(col("p_name"))))))))
          .as("variant"))
    val a = dict.select(col("variant"), col("p_name").as("name_a"),
      col("n_parts").as("n_a"))
    val b = dict.select(col("variant"), col("p_name").as("name_b"),
      col("n_parts").as("n_b"))
    a.join(b, Seq("variant"))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"))
      .dropDuplicates("name_a", "name_b")
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 1)
      .select(col("name_a"), col("name_b"), col("dist").cast("long"),
        col("n_a"), col("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** The oracle is the exhaustive O(|D|²) levenshtein join — the
    * completeness claim is exactly what it checks. */
  val fastssJoinSql: String =
    """WITH dict AS (
      |  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts
      |  FROM part GROUP BY 1)
      |SELECT a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
      |  a.n_parts AS n_a, b.n_parts AS n_b
      |FROM dict a JOIN dict b ON a.p_name < b.p_name
      |WHERE levenshtein(a.p_name, b.p_name) <= 1
      |ORDER BY name_a, name_b""".stripMargin

  // ---- q145: entity resolution end-to-end ---------------------------------

  /** q145 — entity resolution end-to-end: q91's blocked fuzzy match
    * pairs become a similarity graph whose connected components are the
    * resolved ENTITIES — every name gets a canonical entity_id (the
    * component's minimum name-hash; its own hash for singletons) plus
    * the entity's member count and total row volume. This is the
    * master-data relation a warehouse keeps: q91 stops at pairs, this
    * finishes the job (pairs → transitive closure → canonical ids →
    * volume roll-up), reusing q57's dual-path CC (bounded driver
    * union-find, distributed label propagation beyond).
    *
    * Node ids are the portable 60-bit md5 name hashes (q98's
    * convention, collision risk documented there) so the DuckDB oracle
    * recomputes identical components.
    *
    * Scale shape: everything expensive runs on the DICTIONARY (q91's
    * stage-1 reduction); the CC input is the pair graph (near-match
    * pairs only); the roll-up joins a #names relation to a #entities
    * relation. */
  def entityIds(s: SparkSession, dir: String): DataFrame = {
    val dict = Tables.part(s, dir)
      .groupBy(col("p_name"))
      .agg(count(lit(1)).as("n_parts"))
      .select(col("p_name"), col("n_parts"),
        Dedup.portableTokenHash(col("p_name")).as("nid"))
      .localCheckpoint(eager = false) // feeds pair mapping AND labeling
    val pairs = fuzzyLinkage(s, dir)
      .join(dict.select(col("p_name").as("name_a"), col("nid").as("a_id")),
        Seq("name_a"))
      .join(dict.select(col("p_name").as("name_b"), col("nid").as("b_id")),
        Seq("name_b"))
      .select(col("a_id"), col("b_id"))
    val comp = Dedup.connectedComponents(pairs)
      .withColumnRenamed("doc_id", "nid")
    val labeled = dict.join(comp, Seq("nid"), "left")
      .select(col("p_name"), col("n_parts"),
        coalesce(col("cluster_id"), col("nid")).as("entity_id"))
      .localCheckpoint(eager = false) // feeds the roll-up AND the output
    val ent = labeled.groupBy(col("entity_id"))
      .agg(count(lit(1)).as("entity_size"),
        sum(col("n_parts")).as("entity_parts"))
    labeled.join(ent, Seq("entity_id"))
      .select(col("p_name"), col("entity_id"), col("entity_size"),
        col("entity_parts"), col("n_parts"))
      .orderBy(col("entity_id"), col("p_name"))
  }

  /** DuckDB spelling: same dictionary/blocking/threshold, recursive-CTE
    * transitive closure (q57's oracle pattern), same min-hash canonical
    * ids. */
  val entityIdsSql: String =
    s"""WITH RECURSIVE dict AS (
       |  SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
       |    ('0x' || substr(md5(p_name), 1, 15))::BIGINT AS nid,
       |    string_split(p_name, chr(32))[-1] AS blk
       |  FROM part GROUP BY p_name),
       |pairs AS (
       |  SELECT a.nid AS a_id, b.nid AS b_id
       |  FROM dict a JOIN dict b ON a.blk = b.blk AND a.p_name < b.p_name
       |  WHERE levenshtein(a.p_name, b.p_name) <= $MaxEdit),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM pairs
       |  UNION ALL SELECT b_id, a_id FROM pairs),
       |cc AS (
       |  SELECT src AS node, src AS label FROM edges
       |  UNION
       |  SELECT e.dst AS node, c.label FROM cc c JOIN edges e
       |    ON e.src = c.node),
       |comp AS (
       |  SELECT node, min(label) AS cluster_id FROM cc GROUP BY node),
       |lab AS (
       |  SELECT d.p_name, d.n_parts,
       |    coalesce(c.cluster_id, d.nid) AS entity_id
       |  FROM dict d LEFT JOIN comp c ON c.node = d.nid),
       |ent AS (
       |  SELECT entity_id, CAST(count(*) AS BIGINT) AS entity_size,
       |    CAST(sum(n_parts) AS BIGINT) AS entity_parts
       |  FROM lab GROUP BY 1)
       |SELECT l.p_name, l.entity_id, e.entity_size, e.entity_parts,
       |  l.n_parts
       |FROM lab l JOIN ent e USING (entity_id)
       |ORDER BY entity_id, p_name""".stripMargin

  val oracles: Map[String, String] = Map(
    "q91_fuzzy_linkage" -> fuzzyLinkageSql,
    "q136_fastss_join" -> fastssJoinSql,
    "q145_entity_ids" -> entityIdsSql)
}
