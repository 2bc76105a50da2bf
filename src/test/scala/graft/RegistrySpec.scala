package graft

import graft.ext.{Corpus, Dedup, Index, Layout, Linkage, Model, Multimodal,
  Report, Retrieval, Similarity, Text}
import graft.queries.{Advanced, Core, Olap, Sketches, Subqueries}

/** Guards on the driver contract itself: the round-2 invariant is that
  * EVERY registered query is oracle-checked, and module maps are merged
  * with `++`, which would silently drop a query on a duplicate key. */
class RegistrySpec extends SparkSpec {

  test("every registered query has an oracle (no rows-only entries)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle SQL without a query: $orphaned")
  }

  test("no module silently overwrites another module's query key") {
    val perModule = Seq(
      Core.queries, Advanced.queries, Sketches.queries, Subqueries.queries,
      Similarity.queries, Text.queries, Dedup.queries, Multimodal.queries,
      Corpus.queries, Linkage.queries, Index.queries, Layout.queries,
      Model.queries, Report.queries, Retrieval.queries, Olap.queries)
    assert(perModule.map(_.size).sum === SparkEntry.queries.size,
      "duplicate query key across modules (Map ++ dropped one)")
  }

  test("query keys follow the qNN_name convention") {
    val bad = SparkEntry.queries.keySet.filterNot(_.matches("q\\d{2,3}_[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-conforming keys: $bad")
  }

  test("baselines are registered queries and their production twins exist") {
    assert(SparkEntry.baselines.subsetOf(SparkEntry.queries.keySet),
      "baseline flag names an unregistered query")
    // exactly the two deliberate quadratic formulations, nothing else
    assert(SparkEntry.baselines ===
      Set("q23_ngram_jaccard", "q42_embedding_neardup"))
    // each baseline's scalable twin is itself registered
    assert(SparkEntry.queries.contains("q51_jaccard_capped") ||
      SparkEntry.queries.keySet.exists(_.startsWith("q51_")),
      "q23's df-capped twin missing")
    assert(SparkEntry.queries.keySet.exists(_.startsWith("q98_")),
      "q23's prefix-filtered twin missing")
    assert(SparkEntry.queries.keySet.exists(_.startsWith("q49_")),
      "q42's LSH twin missing")
  }

  test("oracle SQL embeds the release-split constant, never a zeroed init") {
    // Cross-module constants read while building oracle-SQL vals must be
    // compile-time constants (final + literal): a plain val reads 0 when
    // object initialization cycles (Similarity → Corpus → Dedup.oracles
    // regressed exactly this way — q113's WHERE became `% 1000 >= 0`).
    for (q <- Seq("q113_minhash_gate", "q99_ingest_gate", "q115_centroid_drift")) {
      assert(SparkEntry.oracleSql(q).contains("900"),
        s"$q oracle lost IngestOldMax=900")
    }
    for ((q, sql) <- SparkEntry.oracleSql)
      assert(!sql.matches("(?s).*% 1000\\s*[<>]=? 0\\b.*"),
        s"$q oracle compares the md5 bucket against 0 — zeroed constant")
  }
}
