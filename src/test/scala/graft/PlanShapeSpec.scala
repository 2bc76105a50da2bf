package graft

import graft.queries.Core
import graft.ext.Similarity
import org.apache.spark.sql.functions._

/** Regression locks on the perf-critical physical-plan shapes — a query
  * can silently keep producing right answers while its plan degrades;
  * these assertions catch that (the .explain audit, automated). */
class PlanShapeSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)

  test("q01: shipdate predicate and column pruning reach the parquet scan") {
    val p = plan(Core.q01Pricing(spark, sf))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    // 6 needed columns only — never the full 11-column lineitem schema
    assert(!p.contains("l_orderkey"), s"scan reads unneeded columns:\n$p")
  }

  test("q02: top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan(Core.q02TopOrders(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q05: dimension chain joins are broadcast, fact side not shuffled for the join") {
    val p = plan(Core.q05RegionStats(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), s"dimension join degraded to SMJ:\n$p")
  }

  test("q17: kNN aggregates partially before the exchange (no window shuffle of all pairs)") {
    val p = plan(Similarity.knnBruteForce(spark, sf))
    assert(p.contains("partial_topkaggregator") || p.contains("ObjectHashAggregate"),
      s"expected partial top-k aggregation:\n$p")
    assert(!p.contains("Window"), s"window ranking reappeared:\n$p")
  }

  test("q155/q156: both retrieval arms reduce via partial TopK, no cartesian") {
    // the vector arms deliberately broadcast the tiny probe set into a
    // nested-loop scan (q17's exact-arm shape); what must NOT appear is
    // an unbroadcast cartesian or a window ranking of all scored pairs
    Seq(graft.ext.Retrieval.hybridRrf(spark, sf),
        graft.ext.Similarity.truncRecall(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(p.contains("partial_topkaggregator") ||
        p.contains("ObjectHashAggregate"),
        s"expected partial top-k aggregation:\n$p")
      assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
    }
    // q156 has no window at all — both arms end in the aggregator; the
    // only Window in q155 is the fusion ranking of the O(Q·2k) fused rows
    assert(!plan(graft.ext.Similarity.truncRecall(spark, sf))
      .contains("Window"), "window ranking reappeared in q156")
  }

  test("q01: hot path stays inside whole-stage codegen") {
    // AQE finalizes the plan only on execution; the executed plan marks
    // codegen stages with "*(n)" prefixes
    val df = Core.q01Pricing(spark, sf)
    df.collect() // runs df's own QueryExecution so AQE finalizes the plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*("),
      s"scan→filter→agg fell out of codegen:\n${p.take(600)}")
  }

  test("q49: near-dup candidate generation never plans a cartesian") {
    val p = plan(Similarity.nearDupLsh(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in production near-dup:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop join appeared:\n$p")
  }

  test("q36: exact distincts avoid the Expand-based multi-distinct plan") {
    val p = plan(graft.queries.Sketches.q36Approx(spark, sf))
    assert(!p.contains("Expand"), s"Expand reappeared (multi-countDistinct regression):\n$p")
  }

  test("q51: hot-shingle removal is a broadcast anti-join, not an index reshuffle") {
    val p = plan(graft.ext.Text.ngramJaccardCapped(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast left-anti for the df-cap:\n$p")
  }

  test("q57/q58: the cluster pair feed keeps the df-cap anti-join, no cartesian") {
    // the lock targets the un-memoized BUILDER — the memoized feed
    // (dedupClusterPairs) is this plan's one-per-session materialization
    val p = plan(graft.ext.Dedup.pairFeedOf(spark, sf))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"df-cap anti-join missing from the cluster pair feed:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in cluster feed:\n$p")
  }

  test("q55: the composed curation pipeline reads documents exactly once") {
    val p = plan(graft.ext.Text.curationPipeline(spark, sf))
    val scans = "FileScan".r.findAllIn(p).length
    assert(scans == 1, s"expected ONE documents scan, found $scans:\n$p")
  }

  test("q59: the eval shingle set joins broadcast — corpus never reshuffles on shingle") {
    val p = plan(graft.ext.Text.decontamination(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"eval-set join degraded:\n$p")
    assert(!p.contains("SortMergeJoin [shingle"),
      s"shingle-key SMJ appeared:\n$p")
  }

  test("q61: centroid argmin is a partial aggregation, not a window ranking") {
    val p = plan(graft.ext.Similarity.nearestCentroid(spark, sf))
    assert(!p.contains("Window"), s"window ranking would shuffle N*k rows:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"centroid relation must broadcast:\n$p")
  }

  test("q64: the two-phase distinct never plans an Expand") {
    val p = plan(graft.ext.Text.ngramDiversity(spark, sf))
    assert(!p.contains("Expand"), s"Expand appeared in diversity ratio:\n$p")
  }

  test("q67: both incremental branches plan bounded top-k, never a global sort") {
    val p = plan(graft.queries.Advanced.q67IncrementalTopK(spark, sf))
    val topks = "TakeOrderedAndProject".r.findAllIn(p).length
    assert(topks >= 2, s"expected bounded top-k on both branches:\n$p")
  }

  test("q75: the per-type stats relation joins broadcast") {
    val p = plan(graft.queries.Advanced.q75Anomaly(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"stats join degraded:\n$p")
    assert(!p.contains("SortMergeJoin"), s"SMJ for a 5-row stats side:\n$p")
  }

  test("q84: the bloom prefilter sits in-plan and nothing goes cartesian") {
    val p = plan(graft.ext.Corpus.bloomDecontamination(spark, sf))
    // the executor-local UDF prefilter must survive into the physical plan
    // (it is the stage that keeps the corpus index off the confirm shuffle)
    assert(p.contains("UDF"), s"bloom prefilter optimized away:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"unkeyed join appeared:\n$p")
  }

  test("q85: the shard-offset join broadcasts; ranks never sort-merge") {
    val p = plan(graft.ext.Corpus.globalIds(spark, sf))
    assert(p.contains("BroadcastHashJoin"),
      s"64-row offset relation should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"SMJ for the offset join:\n$p")
  }

  test("q86: every PageRank round is a keyed join — no cartesian, no nested loop") {
    val p = plan(graft.ext.Dedup.linkPrior(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"unkeyed join in a round:\n$p")
  }

  test("q87: the PQ codebook broadcasts; vectors never sort-merge to encode") {
    val p = plan(graft.ext.Similarity.pqEncode(spark, sf))
    assert(p.contains("BroadcastHashJoin"), s"codebook join degraded:\n$p")
    assert(!p.contains("SortMergeJoin"), s"SMJ for a constant-size codebook:\n$p")
  }

  test("q88: semantic dedup never plans a cartesian") {
    val p = plan(graft.ext.Similarity.semanticDedup(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"unkeyed join appeared:\n$p")
  }

  test("q91: the fuzzy join is an equi-join on the block key, never all-pairs") {
    val p = plan(graft.ext.Linkage.fuzzyLinkage(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"blocking degraded to an unkeyed join:\n$p")
  }

  test("q93: skip-gram counting never windows the token table") {
    val p = plan(graft.ext.Index.skipgramPairs(spark, sf))
    assert(!p.contains("Window"), s"window shuffle of all tokens:\n$p")
  }

  test("q94: the 1-row bounds relation broadcasts; no sort-merge join") {
    val p = plan(graft.ext.Layout.zorderStats(spark, sf))
    assert(!p.contains("SortMergeJoin"), s"SMJ against a 1-row bounds:\n$p")
  }

  test("q98: prefix-filter candidates are a keyed join, never all-pairs") {
    val p = plan(graft.ext.Dedup.prefixFilterJoin(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"prefix filter degraded to an unkeyed join:\n$p")
  }

  test("q99: ingest overlap counts partial-aggregate before the exchange") {
    val p = plan(graft.ext.Corpus.ingestGate(spark, sf))
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side combine for per-doc overlap counts:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in the gate:\n$p")
  }

  test("q100: heavy-hitter top-k plans as TakeOrderedAndProject over aggregated keys") {
    val p = plan(graft.queries.Advanced.q100SkewAudit(spark, sf))
    assert(p.contains("TakeOrderedAndProject"), s"global sort for top-k:\n$p")
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side combine for key counts:\n$p")
  }

  test("q95: vocab ranking range-shards the term table; its windows are partitioned") {
    val p = plan(graft.ext.Index.vocabInduction(spark, sf))
    assert(p.contains("rangepartitioning"),
      s"two-phase range repartition missing:\n$p")
    assert(p.contains("windowspecdefinition(part#"),
      s"term-table window not shard-partitioned:\n$p")
  }

  test("q110: itemset pairs never self-join or window the basket index") {
    val p = plan(graft.queries.Advanced.q110ItemsetPairs(spark, sf))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      s"in-row pair generation degraded to a join:\n$p")
    assert(!p.contains("Window"), s"window appeared in basket mining:\n$p")
  }

  test("q111: transition counts partial-aggregate after the one sequence window") {
    val p = plan(graft.queries.Advanced.q111Transitions(spark, sf))
    assert(p.contains("partial_count") || p.contains("partial count"),
      s"no map-side combine for transition counts:\n$p")
  }

  test("q96: shard minima partial-aggregate before the exchange") {
    val p = plan(graft.ext.Dedup.shardSimilarity(spark, sf))
    assert(p.contains("partial_min") || p.contains("partial min"),
      s"no map-side combine for the (source, pos) minima:\n$p")
  }

  test("q119: the coverage head is the bounded TopK agg, never a vocab window") {
    val p = plan(graft.ext.Index.coverageCurve(spark, sf))
    assert(p.contains("partial_topkaggregator"),
      s"bounded TopK partial aggregation missing:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"vocabulary-sized window appeared in the head selection:\n$p")
  }

  test("q121: the allocation joins broadcast onto the doc scan; window is domain-partitioned") {
    val p = plan(graft.ext.Corpus.quotaSample(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("windowspecdefinition(source#"),
      s"per-doc window not partitioned by domain:\n$p")
  }

  test("q124: bucketed join + bucket-key agg run with ZERO exchanges") {
    val p = plan(graft.ext.Layout.bucketedJoin(spark, sf))
    assert(p.contains("SortMergeJoin"), s"merge hint not honored:\n$p")
    assert(!p.contains("Exchange"),
      s"bucketed layout failed to satisfy join/agg clustering:\n$p")
    assert(p.contains("Bucketed: true"),
      s"scan did not recognize the bucketed layout:\n$p")
  }

  test("AQE skew-join: partition-level skew splits automatically (no salt needed)") {
    // the complement of q50's salted join: when a shuffle join's skew is
    // at PARTITION granularity and nothing above the join pins its
    // distribution, AQE's OptimizeSkewedJoin splits the hot partition at
    // runtime and manual salting is unnecessary. q50's salt remains the
    // remedy when the skewed join feeds a same-key operation (the split
    // would break the required hash distribution, so AQE declines) or
    // when one KEY outweighs whole partitions on a broadcast-ineligible
    // dim. This lock proves the split actually engages under the
    // documented conditions — config + executed-plan assert.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // scale the skew detector down to fixture bytes (defaults: 256 MiB)
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "65536")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "65536")
      // hot key 1 holds half the fact rows -> one shuffle partition far
      // past factor x median of the others
      val fact = spark.range(60000).select(
        when(col("id") % 2 === 0, lit(1L))
          .otherwise(col("id") % 997 + 2).as("k"),
        lpad(col("id").cast("string"), 32, "x").as("payload"))
      val dim = spark.range(1000).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("attr"))
      val j = fact.join(dim, Seq("k"))
        .select(col("k"), col("payload"), col("attr"))
      j.collect() // AQE decides skew handling only at runtime
      val p = j.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(p.contains("skew=true"),
        s"AQE skew-join split did not engage:\n$p")
    } finally saved.foreach { case (k, v) =>
      v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) }
    }
  }

  test("q153: persisted-index serve — bucket-pruned scan, no exchange below the probe join") {
    val df = graft.ext.Similarity.ivfPqServe(spark, sf)
    df.collect() // AQE finalizes; also guarantees the index tables exist
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the probe IN-list must engage bucket pruning on the index table
    assert(p.contains("SelectedBucketsCount"),
      s"bucket pruning did not engage on the persisted index:\n$p")
    // every index-side join must broadcast its bounded side: a sort-merge
    // or cartesian would shuffle index rows below the probe join
    assert(!p.contains("SortMergeJoin"), s"index join degraded to SMJ:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"unkeyed join appeared:\n$p")
    // the ADC shortlist reduces BEFORE any shuffle (q17's partial TopK)
    assert(p.contains("partial_topkaggregator") || p.contains("ObjectHashAggregate"),
      s"expected partial top-k aggregation of ADC candidates:\n$p")
    // index rows never cross an exchange: every shuffle in the plan keys
    // on qid (LUT aggs, partial-TopK states, shortlist window) or is the
    // 30-row final range sort — a bucket-keyed shuffle would mean the
    // index itself moved
    assert(!p.contains("Exchange hashpartitioning(bucket"),
      s"the persisted index was reshuffled on bucket:\n$p")
    val shuffles = "Exchange (hash|range)partitioning".r.findAllIn(p).length
    assert(shuffles <= 5, s"unexpected extra shuffles ($shuffles):\n$p")
  }

  test("q123: probes plan as TakeOrderedAndProject; the cell probe join broadcasts") {
    val p = plan(graft.queries.Sketches.q123CmsHeavyHitters(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"probe set degraded to a global sort or window:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      s"64-cell sketch relation sort-merged:\n$p")
  }

  test("q133: CDC apply is one partial-aggregable max, no window, no join") {
    val p = plan(graft.queries.Advanced.q133CdcMerge(spark, sf))
    assert(!p.contains("Window"), s"changelog apply degraded to a window:\n$p")
    assert(!p.contains("Join"), s"changelog apply grew a self-join:\n$p")
    assert(p.contains("partial_max"),
      s"map-side combine missing from the changelog apply:\n$p")
  }

  test("q131: both SCD2 windows partition by the dimension key") {
    val p = plan(graft.queries.Advanced.q131Scd2(spark, sf))
    val specs = "windowspecdefinition\\(user_id".r.findAllIn(p).length
    val all = "windowspecdefinition".r.findAllIn(p).length
    assert(all > 0 && specs === all,
      s"an SCD2 window is not keyed by user_id (global sort risk):\n$p")
  }

  test("q137: packing windows are range/shard-partitioned except the bounded offset pass") {
    val p = plan(graft.ext.Layout.filePacking(spark, sf))
    assert(p.contains("windowspecdefinition(rng#"),
      s"in-range cumsum window lost its range partitioning:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"shard-offset join must broadcast (it is #shards rows):\n$p")
  }

  test("q135: image near-dup candidates never plan a cartesian") {
    val p = plan(graft.ext.Multimodal.imageNearDup(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in image near-dup:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop appeared:\n$p")
  }

  test("q226: video frame near-dup candidates never plan a cartesian") {
    val p = plan(graft.ext.Multimodal.videoFrameNearDup(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in frame near-dup:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop appeared:\n$p")
  }

  test("q139: hard-negative mining joins on buckets/ids only, never all-pairs") {
    val p = plan(graft.ext.Similarity.hardNegatives(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in hard-negative mining:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), s"nested-loop appeared:\n$p")
    assert(p.contains("windowspecdefinition(vid#"),
      s"per-anchor argmax window lost its anchor partitioning:\n$p")
  }

  test("q160/q161: fixed-round graph recurrences join on node ids only") {
    Seq(Similarity.graphCentrality(spark, sf),
        Similarity.labelPropagation(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"),
        s"cartesian in graph recurrence:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"nested-loop join in graph recurrence:\n$p")
    }
  }

  test("q162: reshard audit is one scan, in-row argmax, no join at all") {
    val p = plan(graft.ext.Layout.reshardAudit(spark, sf))
    assert(!p.contains("Join"), s"reshard audit grew a join:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 1, s"expected exactly one scan, got $scans:\n$p")
  }

  test("q165: the histogram partial-aggregates (the sketch IS the map-side merge)") {
    val p = plan(graft.queries.Sketches.q165QuantileSketch(spark, sf))
    assert(p.contains("partial_count") || p.contains("HashAggregate"),
      s"histogram lost its partial aggregation:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
  }

  test("q167: phrase adjacency joins on (doc, pos) — no cartesian, no nested loop") {
    val p = plan(graft.ext.Index.phraseSearch(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in phrase join:\n$p")
  }

  test("q169: worklist top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = plan(graft.ext.Model.uncertaintySample(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"uncertainty top-k degraded to a global sort:\n$p")
  }

  test("q178/q182/q184: dedup-audit membership joins broadcast, no cartesian") {
    // the taint / survivor relations are bounded (|eval|+|flagged| and
    // near-dup members respectively) — the corpus-side join must stay a
    // broadcast, never a corpus reshuffle onto a sort-merge join
    Seq(graft.ext.Dedup.clusterDecontam(spark, sf),
        graft.ext.Dedup.survivorshipAudit(spark, sf),
        graft.ext.Dedup.rebalanceQuota(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), s"broadcast lost:\n$p")
      assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
    }
  }

  test("q181: stitch detection joins on (k, digest) — no cartesian, no nested loop") {
    val p = plan(graft.ext.Text.boundaryStitch(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in stitch join:\n$p")
    // the suffix⋈prefix match must be a hash equi-join on the digest
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q183: outlier worklist is broadcast-joined and top-k, not sorted globally") {
    val p = plan(graft.ext.Similarity.centroidOutliers(spark, sf))
    assert(p.contains("TakeOrderedAndProject"),
      s"outlier top-20 degraded to a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"centroid join not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
  }

  test("q134: the corpus is scanned exactly once (Gram explode), iterations reuse it") {
    val df = graft.ext.Similarity.pcaTopComponent(spark, sf)
    df.collect() // materialize the lazy localCheckpoint barriers
    val p = df.queryExecution.executedPlan.toString
    // after the barrier the rounds run on checkpointed RDDs: the executed
    // plan must contain at most one parquet scan of the embeddings table
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans <= 1, s"power iteration re-scans the corpus ($scans scans):\n$p")
  }

  test("q192: Expand multiplies the pre-aggregated grain, not the fact scan") {
    val p = plan(graft.queries.Olap.q192CubeAggregate(spark, sf))
    val iExpand = p.indexOf("Expand")
    val iScan = p.indexOf("Scan parquet")
    assert(iExpand >= 0, s"cube lost its Expand:\n$p")
    assert(iScan > iExpand, s"plan shape unexpected:\n$p")
    // between the Expand and the scan there must be the grain hash agg —
    // i.e. the 4× row multiplication applies to ≤|dims| rows, not the table
    assert(p.substring(iExpand, iScan).contains("HashAggregate"),
      s"Expand sits directly on the fact scan (4x the table at 100 TB):\n$p")
  }

  test("q81: chained grouping sets re-aggregate the finest grain — " +
      "no Expand, fact rows cross the aggregate once") {
    // assert on the PRE-checkpoint base: the localCheckpoint barrier in
    // the full query hides everything upstream (Scan ExistingRDD), so a
    // plan lock on the outer query would pass vacuously — the exact
    // "plan lock a checkpoint blinded" failure class from round 10
    val base = graft.queries.Advanced.q81Base(spark, sf)
    val pb = plan(base)
    // the native groupingSets plan Expands every fact row once per set
    // (3x the corpus through the partial agg); the chained-sets rewrite
    // must keep the fact scan feeding ONE ordinary hash aggregate
    assert(!pb.contains("Expand"),
      s"q81 base regressed to the Expand plan (3x the scan at 100 TB):\n$pb")
    assert("Scan parquet".r.findAllIn(pb).length == 1,
      s"q81 base must scan lineitem exactly once:\n$pb")
    assert(pb.contains("HashAggregate"),
      s"q81 base lost its partial-aggregable hash agg:\n$pb")
    // and the OUTER query (coarser sets over the checkpointed result)
    // must not smuggle an Expand or a re-scan behind the barrier either
    val df = graft.queries.Advanced.q81GroupingSets(spark, sf)
    df.collect() // materialize the lazy localCheckpoint barrier
    val p = plan(df)
    assert(!p.contains("Expand"), s"q81 outer plan grew an Expand:\n$p")
    assert(!p.contains("Scan parquet"),
      s"q81 outer plan re-scans parquet past the barrier:\n$p")
  }

  test("q193: pinned-vocabulary pivot is one scan, one aggregate, no join") {
    val p = plan(graft.queries.Olap.q193PivotEvents(spark, sf))
    assert("Scan parquet".r.findAllIn(p).length == 1,
      s"pivot scans the table more than once:\n$p")
    assert(!p.contains("Join"), s"pivot planned a join per column:\n$p")
  }

  test("q198: weighted sample reduces via partial TopK — no window, no sort of the corpus") {
    val p = plan(graft.ext.Corpus.aesWeightedSample(spark, sf))
    assert(p.contains("ObjectHashAggregate") ||
      p.contains("partial_topkaggregator"),
      s"expected partial top-k aggregation:\n$p")
    assert(!p.contains("Window"), s"window ranking reappeared:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
  }

  test("q211: negative lookup is an equi-join on the computed id, never all-pairs") {
    val p = plan(graft.ext.Similarity.negativeSampling(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"),
      s"negative lookup lost its equi-join:\n$p")
  }

  test("q205: rolling windows merge pre-built daily sketches (one sketch-arm scan)") {
    val p = plan(graft.queries.Sketches.q205RollingDistinct(spark, sf))
    // two deliberate scans total: the sketch arm and the exact audit arm
    assert("Scan parquet".r.findAllIn(p).length <= 2,
      s"rolling distinct rescans the corpus per window:\n$p")
    assert(p.contains("hll_union_agg") || p.contains("Window"),
      s"window union of daily sketches missing:\n$p")
  }

  test("q214: the two-role nation-pair predicate splits into per-side " +
      "IN pushdowns; dims broadcast, no cartesian") {
    val p = plan(graft.queries.TpchCanon.q214NationVolume(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims lost broadcast:\n$p")
    // Catalyst must derive n_name IN (A, B) on EACH nation role from
    // the cross-role OR — that semi-join reduction is the point of the
    // Q7 topology; losing it scans both roles unfiltered
    assert("In\\(n_name".r.findAllIn(p).length >= 2 ||
      ("n_name.*(" + graft.queries.TpchCanon.VolNationA + "|" +
        graft.queries.TpchCanon.VolNationB + ")").r.findAllIn(p).length >= 2,
      s"per-role IN pushdown missing:\n$p")
  }

  test("q215/q216: deep multi-join trees stay cartesian-free with " +
      "broadcast dimensions") {
    for (df <- Seq(graft.queries.TpchCanon.q215ProductProfit(spark, sf),
        graft.queries.TpchCanon.q216MarketShare(spark, sf))) {
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"dims lost broadcast:\n$p")
    }
  }

  test("q217: the decorrelated min-subquery back-join is an equi-join " +
      "on (part, cost), never all-pairs") {
    val p = plan(graft.queries.TpchCanon.q217MinCostSupplier(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"min-equality join degraded to nested loop:\n$p")
  }

  test("q218: both correlated self-references plan as l_orderkey " +
      "equi-joins (semi + anti), never nested loops") {
    val p = plan(graft.queries.TpchCanon.q218LateSoleSupplier(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"correlated self-join degraded to nested loop:\n$p")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"),
      s"semi/anti pair missing (subquery shape changed):\n$p")
  }

  test("q219/q221: outer-preserving topologies keep their join kinds") {
    val p19 = plan(graft.queries.TpchCanon.q219OrderCountHistogram(spark, sf))
    assert(p19.contains("LeftOuter"),
      s"zero-order customers silently dropped (outer join lost):\n$p19")
    val p21 = plan(graft.queries.TpchCanon.q221IdleRichCustomers(spark, sf))
    assert(p21.contains("LeftAnti"),
      s"idle-customer anti-join lost:\n$p21")
    assert(!p21.contains("CartesianProduct"), s"cartesian appeared:\n$p21")
  }

  test("q253/q254: decorrelated-aggregate topologies stay equi-joined — " +
      "promo serve is bounded top-k over broadcast dims") {
    // q253: assert on the PRE-checkpoint prune (the barrier hides it
    // from the outer plan — the vacuous-lock trap): the brand filter
    // must broadcast into the fact scan as an equi-join
    val pp = plan(graft.queries.TpchCanon.q253Pruned(spark, sf))
    assert(pp.contains("BroadcastHashJoin"),
      s"q253 brand prune stopped broadcasting:\n$pp")
    assert(!pp.contains("CartesianProduct") &&
      !pp.contains("BroadcastNestedLoopJoin"),
      s"q253 prune planned an all-pairs join:\n$pp")
    assert("Scan parquet".r.findAllIn(pp).length == 2,
      s"q253 prune should scan lineitem + part exactly once each:\n$pp")
    // and the post-barrier stats join stays equi-keyed
    val p253 = plan(graft.queries.TpchCanon.q253SmallQtyRevenue(spark, sf))
    assert(!p253.contains("CartesianProduct") &&
      !p253.contains("BroadcastNestedLoopJoin"),
      s"q253 planned an all-pairs join:\n$p253")
    // q254: supplier/nation broadcast; the serve is TakeOrdered, never a
    // global sort; nothing cartesian anywhere
    val p254 = plan(graft.queries.TpchCanon.q254PromoSuppliers(spark, sf))
    assert(p254.contains("TakeOrderedAndProject"),
      s"q254 serve lost its bounded top-k:\n$p254")
    assert("BroadcastHashJoin".r.findAllIn(p254).length >= 3,
      s"q254 dimension joins stopped broadcasting:\n$p254")
    assert(!p254.contains("CartesianProduct") &&
      !p254.contains("BroadcastNestedLoopJoin"),
      s"q254 planned an all-pairs join:\n$p254")
    // q255: the PRE-barrier revenue view must be one pushed-down
    // windowed scan feeding a partial-aggregable hash agg (the shipdate
    // filter reaching the scan is the whole windowed-view economy)
    val p255 = plan(graft.queries.TpchCanon.q255Rev(spark, sf))
    assert("Scan parquet".r.findAllIn(p255).length == 1,
      s"q255 rev view scans lineitem more than once:\n$p255")
    assert(p255.contains("HashAggregate"),
      s"q255 rev view lost its hash agg:\n$p255")
    assert(p255.contains("PushedFilters: [") &&
      p255.contains("l_shipdate"),
      s"q255 shipdate window did not reach the scan:\n$p255")
  }

  test("q256: the HAVING-sum prune broadcasts into orders then customer; " +
      "the serve is bounded top-k") {
    val p = plan(graft.queries.TpchCanon.q256BigOrders(spark, sf))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q256 planned an all-pairs join:\n$p")
    // the rare big-order set and then the surviving orders both
    // broadcast — neither orders nor customer reshuffles
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"q256 fact-side prune stopped broadcasting:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"q256 top-100 serve lost its bounded top-k:\n$p")
    // per-order quantity totals partial-aggregate before the exchange
    assert(p.contains("partial_sum") || p.contains("partial sum"),
      s"q256 per-order sum lost its map-side combine:\n$p")
  }

  test("q257: the disjunctive join condition CNF-factors — equi hash " +
      "join on partkey, per-side OR bands pushed into BOTH scans") {
    val p = plan(graft.queries.TpchCanon.q257DisjunctiveRevenue(spark, sf))
    // the repeated p_partkey = l_partkey must be extracted from the OR:
    // a planner that fails this degrades to an all-pairs nested loop
    assert(p.contains("BroadcastHashJoin"),
      s"q257 common join key was not factored out of the OR:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"q257 degraded to an all-pairs join:\n$p")
    // each side's OR-of-bands reaches ITS parquet scan as a pushed
    // residual (quantity bands on lineitem, type/size bands on part),
    // and the repeated shipdate conjunct factors to the fact scan
    assert(
      "PushedFilters: \\[[^\\]]*Or".r.findAllIn(p).length >= 2,
      s"q257 per-side disjunctions did not reach both scans:\n$p")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"),
      s"q257 repeated shipdate conjunct did not factor to the scan:\n$p")
  }

  test("q229: containment rides the capped shingle equi-join — hot set " +
      "broadcast-anti-joined out, never a cartesian") {
    val p = plan(graft.ext.Text.containmentPairs(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian in containment:\n$p")
    assert(p.contains("LeftAnti"), s"df-cap anti-join lost:\n$p")
  }

  test("q230: source divergence joins on the token key and broadcasts " +
      "only the 1-row total — no cartesian beyond it, no window") {
    val p = plan(graft.ext.Text.sourceDivergence(spark, sf))
    // the deliberate crossJoin(broadcast(tot)) plans as a broadcast
    // nested loop over ONE row; a CartesianProduct (unbroadcast) or any
    // Window would mean the closed form regressed to a dense matrix
    assert(!p.contains("CartesianProduct"), s"unbroadcast cartesian:\n$p")
    assert(!p.contains("Window"), s"window appeared in divergence:\n$p")
  }

  test("q232/q233: filtered ANN joins carry the label INSIDE the bucket " +
      "key; neither arm plans a cartesian") {
    Seq(graft.ext.Similarity.filteredAnn(spark, sf),
        graft.ext.Similarity.postFilterAudit(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"nested-loop appeared:\n$p")
    }
  }

  test("q234/q235: semantic decontam and mutual-kNN stay band-bounded — " +
      "no cartesian, no nested-loop") {
    Seq(graft.ext.Similarity.semanticDecontam(spark, sf),
        graft.ext.Similarity.mutualKnn(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"nested-loop appeared:\n$p")
    }
  }

  test("q140: the exact verify runs the sorted-merge kernel, not " +
      "per-pair set intersection") {
    // the hash sets are sorted ONCE at staging (sort_array before the
    // checkpoint), so the per-candidate-pair verify is the
    // allocation-free two-pointer merge — the same class of fix as
    // q98's measured 2.3 s win; a regression to size(array_intersect)
    // re-buys a hash set + intersection array per pair
    val p = plan(graft.ext.Dedup.minhashCalibration(spark, sf))
    assert(p.contains("sorted_intersect_count"),
      s"q140 verify lost the merge kernel:\n$p")
    assert(!p.contains("array_intersect"),
      s"q140 still allocates per-pair intersections:\n$p")
  }

  test("q258: the DECLARATIVE overlap spelling plans to the merge " +
      "kernel — the injected optimizer rule is load-bearing") {
    // q258 spells its overlap as plain
    // size(array_intersect(sort_array(a), sort_array(b))) in a
    // selectExpr; RewriteSortedIntersectCount (injected by
    // GraftExtensions on every gate/bench/test session) must upgrade
    // it to the kernel
    val p = plan(graft.ext.Dedup.sourceVocabOverlap(spark, sf))
    assert(p.contains("sorted_intersect_count"),
      s"declarative spelling did not rewrite to the kernel:\n$p")
    // …and the lock is load-bearing: with the rule excluded, the same
    // query plans WITHOUT the kernel (so a green above can only come
    // from the injection path, not from some other rewrite)
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.graft.RewriteSortedIntersectCount")
    try {
      val p2 = plan(graft.ext.Dedup.sourceVocabOverlap(spark, sf))
      assert(!p2.contains("sorted_intersect_count"),
        "rule exclusion did not remove the kernel — the q258 lock " +
          s"would pass vacuously:\n$p2")
      assert(p2.contains("array_intersect"),
        s"excluded-rule plan lost the declarative spelling too:\n$p2")
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("q259: the DECLARATIVE dot fold plans to the int_dot kernel — " +
      "the second injected optimizer rule is load-bearing") {
    // q259 spells its per-vector anchor dot as the plain
    // aggregate(zip_with(...)) fold in a selectExpr; RewriteIntDotFold
    // (injected by GraftExtensions on every gate/bench/test session)
    // must upgrade it to the whole-stage-codegen kernel
    val p = plan(graft.ext.Similarity.anchorDot(spark, sf))
    assert(p.contains("int_dot"),
      s"declarative dot fold did not rewrite to the kernel:\n$p")
    // …and the lock is load-bearing: with the rule excluded, the same
    // query plans WITHOUT the kernel
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.graft.RewriteIntDotFold")
    try {
      val p2 = plan(graft.ext.Similarity.anchorDot(spark, sf))
      assert(!p2.contains("int_dot"),
        "rule exclusion did not remove the kernel — the q259 lock " +
          s"would pass vacuously:\n$p2")
      assert(p2.contains("zip_with"),
        s"excluded-rule plan lost the declarative spelling too:\n$p2")
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("q260: distinct-over-anti-join plans broadcast-only with no " +
      "Expand and part predicates pushed") {
    val p = plan(graft.queries.TpchCanon.q260SupplierVariety(spark, sf))
    // the blacklist exclusion must be a broadcast ANTI join and the
    // part class join a broadcast — the fact table never reshuffles
    // for either join
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"q260 lost the broadcast anti-join:\n$p")
    // the two-phase distinct spelling must hold: no Expand anywhere
    assert(!p.contains("Expand"), s"q260 grew an Expand:\n$p")
    // part-side attribute pruning reaches the scan
    assert(p.contains("PushedFilters") && p.contains("p_size"),
      s"q260 part predicates not pushed:\n$p")
  }

  // The per-round frontier joins run eagerly inside the traversal (each
  // round is checkpointed), so the plans below cover each query's final
  // stage — for q243 that includes the wedge + closing joins, the part
  // where a mis-keyed join WOULD go cartesian; the round joins
  // themselves are using-column equi-joins by construction.
  test("q242–q247: graph traversal final stages are equi-join only — " +
      "no cartesian, no nested-loop") {
    Seq(graft.ext.Graph.bfsHops(spark, sf),
        graft.ext.Graph.triangles(spark, sf),
        graft.ext.Graph.cheapestPaths(spark, sf),
        graft.ext.Graph.pagerank(spark, sf)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"), s"cartesian appeared:\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"nested-loop appeared:\n$p")
    }
  }
}
