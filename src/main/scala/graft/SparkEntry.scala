package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{Advanced, Core, Sketches, Subqueries}
import graft.ext.{Corpus, Dedup, Index, Layout, Linkage, Model, Multimodal,
  Report, Similarity, Text}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the query registries of each operator-family module. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Core.q01Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Core.queries ++ Advanced.queries ++ Sketches.queries ++
      Subqueries.queries ++ Similarity.queries ++ Text.queries ++
      Dedup.queries ++ Multimodal.queries ++ Corpus.queries ++
      Linkage.queries ++ Index.queries ++ Layout.queries ++
      Model.queries ++ Report.queries

  /** Keys in [[queries]] that are deliberate EXACTNESS BASELINES, not
    * production paths: quadratic all-pairs formulations kept as the
    * oracle/recall reference for their scalable twins. Do not run these
    * raw at scale — use the twin instead:
    *   - q23 (uncapped Σdf² shingle self-join) → q51 df-capped or q98
    *     prefix-filtered; q23 additionally refuses to run when q104's
    *     candidate-pair prediction exceeds [[graft.ext.Text.UncappedPairBound]]
    *   - q42 (embedding crossJoin) → q49 LSH-bucketed near-dup */
  val baselines: Set[String] =
    Set("q23_ngram_jaccard", "q42_embedding_neardup")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Core.oracles ++ Advanced.oracles ++ Sketches.oracles ++
      Subqueries.oracles ++ Similarity.oracles ++ Text.oracles ++
      Dedup.oracles ++ Multimodal.oracles ++ Corpus.oracles ++
      Linkage.oracles ++ Index.oracles ++ Layout.oracles ++
      Model.oracles ++ Report.oracles
}
