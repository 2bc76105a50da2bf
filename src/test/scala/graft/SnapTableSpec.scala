package graft

import graft.io.SnapTable
import org.apache.spark.sql.functions._

/** The snapshot table format: versioning, time travel, copy-on-write
  * delete granularity, vacuum retention, and the commit-protocol
  * refusals. The oracle gate (q236/q237) proves value-invisibility on
  * the fixture corpus; these tests pin the FORMAT mechanics on planted
  * frames where file boundaries are controlled. */
class SnapTableSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_snap_spec_").toString

  /** The POSITIONAL stats fields of a manifest entry (tagged fields —
    * `bf:` bloom bits, `sz:` byte sizes — excluded, mirroring
    * SnapTable's own parse). */
  private def statFieldsOf(e: String): Array[String] =
    e.split('\t').drop(1).takeWhile(f => !f.contains(':'))

  test("create/append/read: current snapshot is the running union") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), d)
    assert(SnapTable.currentVersion(spark, d) === 1)
    SnapTable.append(Seq((3L, "c")).toDF("id", "s"), d)
    assert(SnapTable.currentVersion(spark, d) === 2)
    assert(SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L))
    assert(SnapTable.read(spark, d, Some(1)).count() === 2)
  }

  test("time travel: every version still serves its original rows " +
      "after a copy-on-write delete rewrote files") {
    val d = tmp()
    val ids = (0L until 100L).toDF("id")
    SnapTable.create(ids.filter(col("id") < 60), d)
    SnapTable.append(ids.filter(col("id") >= 60), d)
    SnapTable.deleteWhere(spark, d, col("id") % 10 === 3)
    def idsOf(v: Int): Seq[Long] =
      SnapTable.read(spark, d, Some(v)).collect().map(_.getLong(0))
        .sorted.toSeq
    assert(idsOf(1) === (0L until 60L))
    assert(idsOf(2) === (0L until 100L))
    assert(idsOf(3) === (0L until 100L).filter(_ % 10 != 3))
    // the current read IS v3
    assert(SnapTable.read(spark, d).count() === 90)
  }

  test("copy-on-write touches only files that contain matches — " +
      "untouched files carry over by reference") {
    val d = tmp()
    // range-partitioned create: file(s) holding 0-49 and 50-99 separate
    val df = (0L until 100L).toDF("id").repartitionByRange(2, col("id"))
    SnapTable.create(df, d)
    val v1 = SnapTable.readManifest(spark, d, 1)
    SnapTable.deleteWhere(spark, d, col("id") < 10)
    val v2 = SnapTable.readManifest(spark, d, 2)
    val carried = v1.toSet.intersect(v2.toSet)
    assert(carried.nonEmpty,
      "CoW rewrote every file — match-free files must carry by reference")
    assert(v2.exists(!v1.contains(_)), "no rewritten file appeared")
    assert(SnapTable.read(spark, d).count() === 90)
  }

  test("a delete with no matches is a no-op: no version churn") {
    // committing an identical manifest would shrink the vacuum window
    // and lengthen every descending manifest scan for nothing (Delta's
    // no-op DELETE behavior)
    val d = tmp()
    SnapTable.create((0L until 10L).toDF("id"), d)
    SnapTable.deleteWhere(spark, d, col("id") > 1000)
    assert(SnapTable.currentVersion(spark, d) === 1)
    assert(SnapTable.read(spark, d).count() === 10)
  }

  test("occCommit: an interloper landing between skipIf and the claim " +
      "is never claimed over (the appendOnce exactly-once window)") {
    // deterministic replay of the check-then-claim race: the skipIf
    // closure decides on PRE-interloper state, then the interloper (a
    // racing twin of the SAME batch) commits before our claim. The
    // version read preceding skipIf means the interloper occupies our
    // claim slot, the rename fails, and the retried skipIf sees the
    // stamp — with the old skipIf-before-read order this double-commits
    val d = tmp()
    SnapTable.create(Seq((1L, "a")).toDF("id", "s"), d)
    val batch = Seq((2L, "b")).toDF("id", "s")
    val added = SnapTable.writeData(batch, d, 2,
      SnapTable.statsColsOf(spark, d, 1))
    var injected = false
    val committed = SnapTable.occCommit(spark, d, 1, Set.empty, Set.empty,
      added,
      Map("batch_id" -> "5") ++ SnapTable.statsMeta(spark, d, 1),
      skipIf = () => {
        val decidedBefore = SnapTable.lastAppliedBatch(spark, d) >= 5L
        if (!injected) {
          injected = true
          assert(SnapTable.appendOnce(batch, d, 5L), "twin failed to land")
        }
        decidedBefore
      })
    assert(committed.isEmpty,
      "batch 5 was committed twice — the skipIf window is open")
    assert(SnapTable.currentVersion(spark, d) === 2) // create + ONE batch
    assert(SnapTable.read(spark, d).count() === 2)
  }

  test("a shallower vacuum after a deeper one does not crash on " +
      "already-retired manifests") {
    val d = tmp()
    SnapTable.create(Seq((0L, "a")).toDF("id", "s"), d)
    (1L to 11L).foreach(i =>
      SnapTable.append(Seq((i, "a")).toDF("id", "s"), d))
    SnapTable.vacuum(spark, d, retain = 2)  // retires v1..v10
    SnapTable.vacuum(spark, d, retain = 6)  // window reaches into them
    assert(SnapTable.read(spark, d).count() === 12)
  }

  test("merge refuses a batch with duplicate keys instead of silently " +
      "writing a multi-row key") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), d)
    val dup = Seq((2L, "x"), (2L, "y")).toDF("id", "s")
    val e = intercept[IllegalArgumentException](
      SnapTable.merge(dup, d, "id"))
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("Z-order on an all-NULL column fails with the column named, " +
      "not an NPE") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), d)
    // schema evolution: later rows carry c2, the snapshot's old rows
    // don't; then delete the carriers so c2 is all-NULL
    SnapTable.append(Seq((3L, "c", 9L)).toDF("id", "s", "c2"), d)
    SnapTable.deleteWhere(spark, d, col("id") === 3L)
    val e = intercept[IllegalArgumentException](
      SnapTable.optimizeZorder(spark, d, 2, "id", "c2"))
    assert(e.getMessage.contains("c2"), e.getMessage)
  }

  test("publish after a vacuum retired the staging's base names the " +
      "re-stage remedy instead of a raw missing-manifest failure") {
    val d = tmp()
    SnapTable.create(Seq((0L, "a")).toDF("id", "s"), d)
    val id = SnapTable.stage(Seq((100L, "w")).toDF("id", "s"), d)
    (1L to 6L).foreach(i =>
      SnapTable.append(Seq((i, "a")).toDF("id", "s"), d))
    SnapTable.vacuum(spark, d, retain = 2) // retires the staging's base v1
    val e = intercept[IllegalStateException](
      SnapTable.publish(spark, d, id))
    assert(e.getMessage.contains("re-stage"), e.getMessage)
    SnapTable.discard(spark, d, id) // the named remedy works
  }

  test("vacuum retires old snapshots and their exclusive files, keeps " +
      "everything the retained versions reference") {
    val d = tmp()
    val ids = (0L until 100L).toDF("id")
    SnapTable.create(ids.filter(col("id") < 60), d)
    SnapTable.append(ids.filter(col("id") >= 60), d)
    SnapTable.deleteWhere(spark, d, col("id") % 10 === 3)
    SnapTable.vacuum(spark, d, retain = 1)
    // old manifests gone: time travel to v1/v2 now refuses
    intercept[IllegalArgumentException](SnapTable.read(spark, d, Some(1)))
    intercept[IllegalArgumentException](SnapTable.read(spark, d, Some(2)))
    // the current snapshot is intact
    assert(SnapTable.read(spark, d).count() === 90)
    // every file the current manifest references still exists; nothing
    // else remains under data/ except the retained write-dirs' files
    val cur = SnapTable.readManifest(spark, d, 3).toSet
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def allDataFiles(p: org.apache.hadoop.fs.Path): Seq[String] = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val f = it.next().getPath.toString
        if (f.endsWith(".parquet")) buf += f
      }
      buf.toSeq
    }
    // keys are the manifest-relative tail: "wNNNNN/part-....parquet"
    val onDisk = allDataFiles(new org.apache.hadoop.fs.Path(s"$d/data"))
      .map(_.split('/').takeRight(2).mkString("/")).toSet
    val curKeys = cur.map(_.stripPrefix("data/"))
    assert(curKeys.forall(onDisk.contains),
      "vacuum deleted a file the current snapshot references")
    // and nothing EXCLUSIVE to the retired versions survived
    assert(onDisk === curKeys,
      s"orphan files survived vacuum: ${onDisk -- curKeys}")
  }

  test("merge: matched keys update, new keys insert, one atomic version") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), d)
    SnapTable.merge(Seq((2L, "B"), (9L, "I")).toDF("id", "s"), d, "id")
    assert(SnapTable.currentVersion(spark, d) === 2)
    val rows = SnapTable.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === Map(1L -> "a", 2L -> "B", 3L -> "c", 9L -> "I"))
    // exactly once: no duplicate key survived the upsert
    assert(SnapTable.read(spark, d).count() === 4)
    // time travel still serves the pre-merge rows
    assert(SnapTable.read(spark, d, Some(1)).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("merge carry-by-reference: files without matched keys are not " +
      "rewritten") {
    val d = tmp()
    SnapTable.create((0L until 100L).toDF("id")
      .withColumn("s", lit("x")).repartitionByRange(2, col("id")), d)
    val v1 = SnapTable.readManifest(spark, d, 1)
    SnapTable.merge(Seq((5L, "y")).toDF("id", "s"), d, "id")
    val v2 = SnapTable.readManifest(spark, d, 2)
    assert(v1.toSet.intersect(v2.toSet).nonEmpty,
      "merge rewrote a file holding no matched key")
    assert(SnapTable.read(spark, d).filter(col("s") === "y").count() === 1)
    assert(SnapTable.read(spark, d).count() === 100)
  }

  test("schema evolution: an append that adds a column reads as the " +
      "union schema; pre-evolution time travel keeps the old schema") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a")).toDF("id", "s"), d)
    SnapTable.append(Seq((2L, "b", 7.5)).toDF("id", "s", "score"), d)
    val cur = SnapTable.read(spark, d)
    assert(cur.columns.toSeq === Seq("id", "s", "score"))
    val byId = cur.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some(r.getDouble(2)))).toMap
    assert(byId === Map(1L -> None, 2L -> Some(7.5)),
      "pre-evolution rows must read the new column as NULL")
    assert(SnapTable.read(spark, d, Some(1)).columns.toSeq === Seq("id", "s"))
  }

  test("a crashed writer's orphan write-dir neither blocks future " +
      "commits nor leaks rows into reads") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a")).toDF("id", "s"), d)
    // simulate a crash between data write and manifest rename: a full
    // write-dir for the NEXT version exists but no manifest references it
    Seq((99L, "orphan")).toDF("id", "s").write
      .parquet(s"$d/data/w00002-deadbeef")
    SnapTable.append(Seq((2L, "b")).toDF("id", "s"), d)
    val ids = SnapTable.read(spark, d).collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L), s"orphan rows leaked or append lost: $ids")
  }

  test("streaming ingest survives vacuum: lastAppliedBatch skips retired " +
      "manifests and later batches still commit") {
    val d = tmp()
    assert(SnapTable.appendOnce(Seq((1L, "a")).toDF("id", "s"), d, 0L))
    assert(SnapTable.appendOnce(Seq((2L, "b")).toDF("id", "s"), d, 1L))
    assert(SnapTable.appendOnce(Seq((3L, "c")).toDF("id", "s"), d, 2L))
    SnapTable.vacuum(spark, d, retain = 1)
    // the stamp scan must not die on the vacuumed v1/v2 manifests
    assert(SnapTable.lastAppliedBatch(spark, d) === 2L)
    assert(!SnapTable.appendOnce(Seq((9L, "x")).toDF("id", "s"), d, 2L))
    assert(SnapTable.appendOnce(Seq((4L, "d")).toDF("id", "s"), d, 3L))
    assert(SnapTable.read(spark, d).count() === 4)
  }

  test("deleteWhere keeps rows whose predicate is NULL — delete means " +
      "pred IS TRUE, not pred IS NOT FALSE") {
    val d = tmp()
    SnapTable.create(Seq((1L, Option("en")), (2L, None: Option[String]),
      (3L, Option("de"))).toDF("id", "lang").coalesce(1), d)
    SnapTable.deleteWhere(spark, d, col("lang") === "en")
    val ids = SnapTable.read(spark, d).collect().map(_.getLong(0)).toSet
    assert(ids === Set(2L, 3L),
      s"NULL-predicate row silently deleted (or match kept): $ids")
  }

  test("copy-on-write rewrites read with mergeSchema: evolved columns " +
      "survive a delete that touches pre- and post-evolution files") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "s").coalesce(1), d)
    SnapTable.append(Seq((3L, "c", 7.5)).toDF("id", "s", "score")
      .coalesce(1), d)
    SnapTable.deleteWhere(spark, d, col("id") === 1L)
    val rows = SnapTable.read(spark, d).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None
        else Some(r.getDouble(2)))).toMap
    assert(rows === Map(2L -> None, 3L -> Some(7.5)),
      "evolved column lost through the CoW rewrite")
  }

  test("stats-based file skipping: the pruned file set is a strict " +
      "subset, the result is identical, and stats survive every op") {
    val d = tmp()
    val ids = (0L until 100L).toDF("id").withColumn("s", lit("x"))
    SnapTable.create(ids.repartitionByRange(4, col("id")), d, Some("id"))
    // pruning bites: a narrow range reads fewer files than the manifest
    val all = SnapTable.readManifest(spark, d, 1)
    val pruned = SnapTable.prunedPaths(spark, d, 10L, 20L)
    assert(pruned.nonEmpty && pruned.size < all.size,
      s"no files skipped: ${pruned.size}/${all.size}")
    // value-invisible: pruned scan ≡ full scan + filter
    def idsOfPruned(lo: Long, hi: Long): Seq[Long] =
      SnapTable.readPruned(spark, d, lo, hi).collect()
        .map(_.getLong(0)).sorted.toSeq
    assert(idsOfPruned(10, 20) === (10L to 20L))
    // stats propagate through append / delete / merge / appendOnce
    SnapTable.append((100L until 120L).toDF("id")
      .withColumn("s", lit("y")), d)
    SnapTable.deleteWhere(spark, d, col("id") === 15L)
    SnapTable.merge(Seq((10L, "z")).toDF("id", "s"), d, "id")
    assert(SnapTable.appendOnce((200L until 210L).toDF("id")
      .withColumn("s", lit("w")), d, 0L))
    val entries = SnapTable.readEntries(spark, d,
      SnapTable.currentVersion(spark, d))
    assert(entries.forall(statFieldsOf(_).length == 2),
      s"a commit dropped the stats annotation: $entries")
    assert(idsOfPruned(0, 300) ===
      ((0L until 120L) ++ (200L until 210L)).filter(_ != 15L).sorted)
    assert(idsOfPruned(205, 300) === (205L until 210L))
    // an empty pruning result is a valid empty frame
    assert(SnapTable.readPruned(spark, d, 5000L, 6000L).count() === 0)
    // a stats-less table refuses the pruned read
    val d2 = tmp()
    SnapTable.create(Seq((1L, "a")).toDF("id", "s"), d2)
    intercept[IllegalArgumentException](
      SnapTable.readPruned(spark, d2, 0L, 10L))
  }

  test("optimize compacts to the target file count, keeps every row, " +
      "re-derives disjoint stats, and old versions still time-travel") {
    val d = tmp()
    val ids = (0L until 100L).toDF("id").withColumn("s", lit("x"))
    SnapTable.create(ids.filter(col("id") < 10)
      .repartition(3), d, Some("id"))
    (1 until 10).foreach { k =>
      SnapTable.append(ids.filter(col("id") >= k * 10 &&
        col("id") < (k + 1) * 10).repartition(3), d)
    }
    val before = SnapTable.readManifest(spark, d, 10)
    assert(before.size >= 10, s"expected many small files, got $before")
    SnapTable.optimize(spark, d, targetFiles = 2)
    val after = SnapTable.readEntries(spark, d, 11)
    assert(after.size <= 2, s"compaction missed: ${after.size} files")
    // every row survived, stats re-derived and DISJOINT (range clustering)
    assert(SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
      .toSeq === (0L until 100L))
    val ranges = after.map(statFieldsOf).collect {
      case Array(lo, hi) => (lo.toLong, hi.toLong)
    }.sortBy(_._1)
    assert(ranges.size === after.size, "optimize dropped stats annotations")
    ranges.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) =>
        assert(hi1 < lo2, s"overlapping post-optimize ranges: $ranges")
      case _ => ()
    }
    // the pre-optimize version is untouched
    assert(SnapTable.read(spark, d, Some(10)).count() === 100)
    assert(SnapTable.readPruned(spark, d, 42L, 57L).collect()
      .map(_.getLong(0)).sorted.toSeq === (42L to 57L))
  }

  test("merge refuses an update batch whose schema is not the table's") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a", 1.0)).toDF("id", "s", "score"), d)
    val e = intercept[IllegalArgumentException](
      SnapTable.merge(Seq((1L, "A")).toDF("id", "s"), d, "id"))
    assert(e.getMessage.contains("score"), e.getMessage)
  }

  test("commit-protocol refusals: double create, ops on a missing table") {
    val d = tmp()
    intercept[IllegalArgumentException](
      SnapTable.read(spark, d))
    intercept[IllegalArgumentException](
      SnapTable.append(Seq(1L).toDF("id"), d))
    SnapTable.create(Seq(1L).toDF("id"), d)
    intercept[IllegalArgumentException](
      SnapTable.create(Seq(2L).toDF("id"), d))
  }

  test("racing appends: every writer's rows land — lost manifest claims " +
      "retry onto the new current instead of dropping a commit") {
    val d = tmp()
    SnapTable.create(Seq(0L).toDF("id"), d)
    val writers = (1 to 6).map { w =>
      new Thread(() =>
        (0 until 3).foreach { i =>
          SnapTable.append(Seq(w * 100L + i).toDF("id"), d)
        })
    }
    writers.foreach(_.start())
    writers.foreach(_.join())
    val got = SnapTable.read(spark, d).collect().map(_.getLong(0)).toSet
    val expected = Set(0L) ++
      (for (w <- 1 to 6; i <- 0 until 3) yield w * 100L + i)
    assert(got === expected, "a racing append lost its commit")
    // 1 create + 18 appends, each a distinct claimed version
    assert(SnapTable.currentVersion(spark, d) === 19)
  }

  test("a delete planned against a stale base rebases over an " +
      "interleaved append — and does NOT apply its predicate to it") {
    val d = tmp()
    SnapTable.create(Seq((1L, "x"), (2L, "x")).toDF("id", "s"), d)
    val planBase = SnapTable.currentVersion(spark, d)
    // interloper appends rows that MATCH the delete predicate
    SnapTable.append(Seq((11L, "x"), (12L, "y")).toDF("id", "s"), d)
    SnapTable.deleteWhereFrom(spark, d, col("s") === "x", planBase)
    assert(SnapTable.currentVersion(spark, d) === 3)
    val got = SnapTable.read(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // v1's x-rows gone; the interleaved 11/"x" SURVIVES (never read)
    assert(got === Set((11L, "x"), (12L, "y")))
  }

  test("a delete whose base files a concurrent rewrite invalidated " +
      "throws instead of resurrecting rows") {
    val d = tmp()
    SnapTable.create(Seq((1L, "x"), (2L, "y")).toDF("id", "s"), d)
    val staleBase = SnapTable.currentVersion(spark, d)
    // concurrent writer REWRITES v1's file (copy-on-write delete)
    SnapTable.deleteWhere(spark, d, col("id") === 1L)
    val e = intercept[SnapTable.ConcurrentWriteException](
      SnapTable.deleteWhereFrom(spark, d, col("s") === "y", staleBase))
    assert(e.getMessage.contains("rewrote"))
    // the failed writer committed nothing
    assert(SnapTable.currentVersion(spark, d) === 2)
    assert(SnapTable.read(spark, d).count() === 1)
  }

  test("Z-order optimize: a 2-D box scan prunes on EITHER dimension " +
      "alone, and the box result equals the plain filtered read") {
    val d = tmp()
    // anti-correlated columns: a 1-D sort on `a` leaves `b` full-range
    // in every file, so any b-pruning proves the Morton tiling works
    val rows = (0L until 256L).map(i => (i, 255L - i, s"s$i"))
    SnapTable.create(rows.toDF("a", "b", "s").repartition(4), d)
    SnapTable.optimizeZorder(spark, d, targetFiles = 8, "a", "b")
    val all = SnapTable.readManifest(spark, d,
      SnapTable.currentVersion(spark, d))
    assert(all.size === 8)
    // dim-1-only, dim-2-only, and conjunctive boxes all prune
    val p1 = SnapTable.prunedPathsBox(spark, d,
      Seq(Some((0L, 63L)), None))
    val p2 = SnapTable.prunedPathsBox(spark, d,
      Seq(None, Some((0L, 63L))))
    val pBox = SnapTable.prunedPathsBox(spark, d,
      Seq(Some((0L, 63L)), Some((192L, 255L))))
    assert(p1.size < all.size, "no pruning on the first dimension")
    assert(p2.size < all.size, "no pruning on the second dimension")
    assert(pBox.size <= math.min(p1.size, p2.size))
    // value gate: the pruned box scan equals the unpruned filtered read
    val got = SnapTable.readPrunedBox(spark, d, 0L, 63L, 192L, 255L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val exp = SnapTable.read(spark, d)
      .filter(col("a").between(0, 63) && col("b").between(192, 255))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got === exp)
    assert(got.nonEmpty)
  }

  test("appends after a Z-order optimize keep writing 2-D stats and " +
      "stay box-prunable") {
    val d = tmp()
    SnapTable.create(
      (0L until 64L).map(i => (i, i * 2, s"x$i")).toDF("a", "b", "s"), d)
    SnapTable.optimizeZorder(spark, d, targetFiles = 4, "a", "b")
    SnapTable.append(
      (1000L until 1064L).map(i => (i, i * 2, s"x$i")).toDF("a", "b", "s"), d)
    // the appended file's 2-D box [1000,1063]×[2000,2126] must be
    // skippable by a low box and reachable by a matching one
    val lowBox = SnapTable.prunedPathsBox(spark, d,
      Seq(Some((0L, 63L)), Some((0L, 126L))))
    val hiBox = SnapTable.readPrunedBox(spark, d, 1000L, 1063L,
      2000L, 2126L)
    assert(lowBox.size < SnapTable.readManifest(spark, d,
      SnapTable.currentVersion(spark, d)).size,
      "append dropped the stats annotations")
    assert(hiBox.count() === 64L)
  }

  test("a writer planned under the OLD stats declaration refuses to " +
      "commit after a concurrent Z-order switched it") {
    val d = tmp()
    SnapTable.create(
      (0L until 32L).map(i => (i, i * 3, s"r$i")).toDF("a", "b", "s"), d,
      statsCol = Some("a"))
    // writer plans an annotated append against v1 (stats = [a]) …
    // (fabricated entry — the conflict must fire before it's used)
    val plannedMeta = Map("stats_col" -> "a")
    // … but a concurrent OPTIMIZE ZORDER commits v2 with stats = [a, b]
    SnapTable.optimizeZorder(spark, d, targetFiles = 2, "a", "b")
    val e = intercept[SnapTable.ConcurrentWriteException](
      SnapTable.occCommit(spark, d, baseV = 1, readSet = Set.empty,
        removed = Set.empty, added = Seq("data/w-fake/part-x.parquet\t0\t9"),
        meta = plannedMeta))
    assert(e.getMessage.contains("declaration"))
  }

  test("a Z-order rebasing over an interleaved append strips the " +
      "append's old-column annotations instead of misreading them") {
    val d = tmp()
    SnapTable.create(
      (0L until 64L).map(i => (i, 63L - i, s"r$i")).toDF("a", "b", "s"), d,
      statsCol = Some("a"))
    val planBase = SnapTable.currentVersion(spark, d)
    // interloper appends rows annotated under the 1-D [a] declaration
    SnapTable.append(
      (500L until 516L).map(i => (i, i + 7, s"x$i")).toDF("a", "b", "s"), d)
    SnapTable.optimizeZorderFrom(spark, d, 4, "a", "b", planBase)
    val v = SnapTable.currentVersion(spark, d)
    assert(v === 3)
    // every carried (non-zorder) entry is a bare path: 1-D [a] bounds
    // must NOT survive into a manifest whose declaration is [a, b]
    val entries = SnapTable.readEntries(spark, d, v)
    val (annotated, bare) =
      entries.partition(statFieldsOf(_).nonEmpty)
    assert(bare.nonEmpty, "the interloper's entry should be carried bare")
    assert(annotated.forall(statFieldsOf(_).length === 4),
      "zorder entries carry exactly two [min,max] pairs")
    // no rows lost, and the box scan still sees the appended rows
    // (their file is unannotated → always read)
    assert(SnapTable.read(spark, d).count() === 80L)
    assert(SnapTable.readPrunedBox(spark, d, 500L, 515L, 0L, 1000L)
      .count() === 16L)
  }

  test("write-audit-publish: staged rows are invisible until publish, " +
      "discard leaves no trace, double-publish refuses") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), d)
    val good = SnapTable.stage(Seq((3L, "c"), (4L, "d")).toDF("id", "s"), d)
    val bad = SnapTable.stage(Seq((9L, "zz")).toDF("id", "s"), d)
    // staging commits nothing: still v1, still 2 rows
    assert(SnapTable.currentVersion(spark, d) === 1)
    assert(SnapTable.read(spark, d).count() === 2)
    // the audit sees exactly the staged batch
    assert(SnapTable.readStaged(spark, d, good).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(3L, 4L))
    val v = SnapTable.publish(spark, d, good)
    assert(v === Some(2))
    assert(SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L, 3L, 4L))
    // published list is gone; a re-publish attempt must refuse
    intercept[IllegalArgumentException](SnapTable.publish(spark, d, good))
    // the bad batch discards without ever having been visible
    SnapTable.discard(spark, d, bad)
    intercept[IllegalArgumentException](SnapTable.readStaged(spark, d, bad))
    assert(SnapTable.read(spark, d).count() === 4)
    // and time travel to v1 still shows the pre-publish table
    assert(SnapTable.read(spark, d, Some(1)).count() === 2)
  }

  test("WAP publish is idempotent against stale leftovers: a re-driven " +
      "staged list whose commit already landed no-ops and sweeps") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a")).toDF("id", "s"), d)
    val id = SnapTable.stage(Seq((2L, "b"), (3L, "c")).toDF("id", "s"), d)
    assert(SnapTable.publish(spark, d, id) === Some(2))
    // simulate the crash-between-commit-and-delete leftover: rewrite
    // the staged list with the SAME id and entries of version 2
    val entries = SnapTable.readEntries(spark, d, 2)
      .filterNot(SnapTable.readEntries(spark, d, 1).toSet)
    val p = new org.apache.hadoop.fs.Path(s"$d/_staged/$id.list")
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(p, true)
    out.write(("# base=1\n" + entries.mkString("\n") + "\n").getBytes)
    out.close()
    // path-recognized leftover: no-op, list swept
    assert(SnapTable.publish(spark, d, id) === None)
    assert(!f.exists(p), "stale staged list must be swept")
    assert(SnapTable.read(spark, d).count() === 3)
    // post-OPTIMIZE leftover: the published files were compacted away,
    // so only the staged-id stamp can recognize it
    out.close()
    val out2 = f.create(p, true)
    out2.write(("# base=1\n" + entries.mkString("\n") + "\n").getBytes)
    out2.close()
    SnapTable.optimize(spark, d, targetFiles = 1)
    assert(SnapTable.publish(spark, d, id) === None,
      "stamp backstop failed — a compacted-away publish re-landed")
    assert(SnapTable.read(spark, d).count() === 3)
    // a tagged staging surfaces in the sweep list until resolved
    val t = SnapTable.stage(Seq((9L, "z")).toDF("id", "s"), d, tag = "b7")
    assert(SnapTable.stagedIds(spark, d).contains((t, "b7")))
    SnapTable.discard(spark, d, t)
    assert(!SnapTable.stagedIds(spark, d).exists(_._1 == t))
  }

  test("abandoned-staging sweep: crash litter <= last-applied discards " +
      "fully, a published leftover keeps its live files, an in-flight " +
      "staging of a newer batch survives; discard is idempotent") {
    val d = tmp()
    val fsys = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def dataDirs(): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$d/data")
      if (!fsys.exists(p)) Set.empty
      else fsys.listStatus(p).map(_.getPath.getName).toSet
    }
    SnapTable.create(Seq((1L, "a")).toDF("id", "s"), d)
    val b0 = SnapTable.stage(Seq((2L, "b")).toDF("id", "s"), d, tag = "0")
    assert(SnapTable.publish(spark, d, b0,
      Map("batch_id" -> "0")) === Some(2))
    // crash litter: an abandoned prior attempt of batch 0
    val preLitter = dataDirs()
    val litter = SnapTable.stage(Seq((99L, "x")).toDF("id", "s"), d,
      tag = "0")
    val litterDirs = dataDirs() -- preLitter
    assert(litterDirs.nonEmpty)
    // published-but-unswept leftover: re-craft b0's list by hand
    // (crash between manifest commit and list cleanup)
    val liveEntries = SnapTable.readEntries(spark, d, 2)
      .filterNot(SnapTable.readEntries(spark, d, 1).toSet)
    val lp = new org.apache.hadoop.fs.Path(s"$d/_staged/$b0.list")
    val out = fsys.create(lp, true)
    out.write(("# base=1\n# tag=0\n" +
      liveEntries.mkString("\n") + "\n").getBytes)
    out.close()
    // in-flight staging of a NOT-yet-applied batch (a live twin's work)
    val inflight = SnapTable.stage(Seq((3L, "c")).toDF("id", "s"), d,
      tag = "1")
    assert(SnapTable.sweepAbandonedStagings(spark, d, upToBatch = 0L) === 2)
    // litter fully gone: list AND its whole write-dir (no _SUCCESS residue)
    assert(!SnapTable.stagedIds(spark, d).exists(_._1 == litter))
    assert(litterDirs.intersect(dataDirs()).isEmpty,
      "litter write-dir survived the sweep")
    // published leftover: only the stale LIST went; live rows intact
    assert(!fsys.exists(lp))
    assert(SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
      .toSeq === Seq(1L, 2L))
    // the in-flight staging was untouched and still publishes
    assert(SnapTable.stagedIds(spark, d).contains((inflight, "1")))
    assert(SnapTable.publish(spark, d, inflight,
      Map("batch_id" -> "1")).isDefined)
    assert(SnapTable.read(spark, d).count() === 3)
    // discard is idempotent: after publish swept the list, and after a
    // prior discard, a cleanup call is a no-op — never an exception
    SnapTable.discard(spark, d, inflight)
    SnapTable.discard(spark, d, litter)
    assert(SnapTable.read(spark, d).count() === 3)
  }

  test("merge rebases over a KEY-DISJOINT concurrent append; a " +
      "key-clashing append and a concurrent compaction both refuse") {
    // key-disjoint append: rebase carries the appended file by reference
    val d = tmp()
    SnapTable.create(Seq((1L, "a"), (2L, "b")).toDF("id", "s"), d)
    SnapTable.append(Seq((5L, "e")).toDF("id", "s"), d) // interloper: v2
    SnapTable.mergeFrom(Seq((2L, "B2"), (3L, "c")).toDF("id", "s"),
      d, "id", v = 1) // planned against v1, commits as v3
    val rows = SnapTable.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === Map(1L -> "a", 2L -> "B2", 3L -> "c", 5L -> "e"),
      "rebased merge lost the append or missed an update")
    assert(SnapTable.read(spark, d).count() === 4, "duplicate keys")
    // key-CLASHING append: the appended file carries a merge key —
    // rebasing would admit a duplicate of it, so the merge must refuse
    SnapTable.append(Seq((7L, "dup")).toDF("id", "s"), d) // v4
    val vBefore = SnapTable.currentVersion(spark, d)
    intercept[SnapTable.ConcurrentWriteException] {
      SnapTable.mergeFrom(Seq((7L, "NEW")).toDF("id", "s"), d, "id", v = 3)
    }
    assert(SnapTable.currentVersion(spark, d) === vBefore,
      "refused merge must not commit")
    // concurrent COMPACTION: rewrites files the merge read — the
    // read-set rule refuses (re-plan + retry is the documented contract)
    val planBase = SnapTable.currentVersion(spark, d)
    SnapTable.optimize(spark, d, targetFiles = 1)
    intercept[SnapTable.ConcurrentWriteException] {
      SnapTable.mergeFrom(Seq((1L, "A9")).toDF("id", "s"), d, "id",
        v = planBase)
    }
    // the caller-level retry against the current snapshot succeeds
    SnapTable.merge(Seq((1L, "A9")).toDF("id", "s"), d, "id")
    assert(SnapTable.read(spark, d).filter(col("s") === "A9").count() === 1)
  }

  test("two concurrent merges with disjoint keys COMPOSE when they " +
      "touch disjoint files; same-file merges serialize via refusal") {
    val d = tmp()
    // two files with controlled key ranges: file A holds {1,2}, file B
    // holds {3,4} (range partitioning makes the boundaries exact)
    SnapTable.create(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "s").repartitionByRange(2, col("id")), d)
    // both merges plan against v1; the winner commits v2, the loser
    // must REBASE (its touched file is untouched by the winner, and the
    // winner's rewrite output carries none of the loser's keys)
    SnapTable.mergeFrom(Seq((1L, "A2")).toDF("id", "s"), d, "id", v = 1)
    SnapTable.mergeFrom(Seq((4L, "D2")).toDF("id", "s"), d, "id", v = 1)
    val rows = SnapTable.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === Map(1L -> "A2", 2L -> "b", 3L -> "c", 4L -> "D2"),
      "file-disjoint merges did not both apply")
    assert(SnapTable.read(spark, d).count() === 4, "duplicate keys")
    // SAME-FILE conflict: both merges rewrite the file carrying key 1 —
    // the loser's touched file is gone from the current manifest, so
    // its read-set check must refuse (rebasing would resurrect the
    // pre-winner rows of that file)
    val base = SnapTable.currentVersion(spark, d)
    SnapTable.mergeFrom(Seq((1L, "A3")).toDF("id", "s"), d, "id", v = base)
    intercept[SnapTable.ConcurrentWriteException] {
      SnapTable.mergeFrom(Seq((1L, "A4")).toDF("id", "s"), d, "id",
        v = base)
    }
    // the documented re-plan + retry then applies cleanly
    SnapTable.merge(Seq((1L, "A4")).toDF("id", "s"), d, "id")
    assert(SnapTable.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "A4", 2L -> "b", 3L -> "c", 4L -> "D2"))
  }

  test("deep-history batch IVM delegates to the fold: ≥32 versions fold " +
      "to the same view as a full rescan, with no per-version plan") {
    val d = tmp()
    SnapTable.create(
      Seq((1L, "s0", 10L)).toDF("id", "source", "n_chars"), d)
    (2 to 33).foreach { i =>
      SnapTable.append(Seq((i.toLong, s"s${i % 3}", i * 10L))
        .toDF("id", "source", "n_chars"), d)
    }
    SnapTable.deleteWhere(spark, d, col("id") % 5 === 0) // removals fold too
    assert(SnapTable.currentVersion(spark, d) > SnapTable.IvmUnionMaxVersions)
    val folded = SnapTable.ivmFoldSourceStats(spark, d, 0,
      SnapTable.currentVersion(spark, d), Map.empty)
    // the fold state equals the full rescan...
    val rescan = SnapTable.read(spark, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("cs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(folded === rescan, "fold drifted from the rescan")
    // ...and the batch IVM spelling above the threshold must NOT build
    // the 2·V-branch union plan: it delegates to the fold and serves a
    // bounded local relation (no parquet scan, no Union in the plan)
    val df = SnapTable.snapshotIvmStatsOf(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Scan parquet") && !plan.contains("Union"),
      s"deep-history IVM still built the per-version union plan:\n$plan")
    val served = df.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(served === rescan, "delegated batch IVM drifted from rescan")
  }

  test("strict (opt-in serializable mode) commits refuse ANY " +
      "interleaved commit") {
    val d = tmp()
    SnapTable.create(Seq(1L).toDF("id"), d)
    SnapTable.append(Seq(2L).toDF("id"), d)
    intercept[SnapTable.ConcurrentWriteException](
      SnapTable.occCommit(spark, d, baseV = 1, readSet = Set.empty,
        removed = Set.empty, added = Seq.empty, meta = Map.empty,
        strict = true))
  }

  // ---- merge-on-read deletion vectors ------------------------------------

  private def dataEntries(d: String, v: Int): Set[String] =
    SnapTable.readManifest(spark, d, v).toSet

  test("merge-on-read delete rewrites ZERO data files: a 1-row delete " +
      "costs one sidecar, the data-file set is byte-identical") {
    val d = tmp()
    SnapTable.create((0L until 100L).toDF("id")
      .repartitionByRange(4, col("id")), d)
    SnapTable.deleteWhereMor(spark, d, col("id") === 42L)
    assert(SnapTable.currentVersion(spark, d) === 2)
    // THE point of the feature: no data file was written or dropped
    assert(dataEntries(d, 2) === dataEntries(d, 1),
      "a MoR delete must not touch the data-file set")
    assert(SnapTable.deleteFilesOf(spark, d, 1).isEmpty)
    assert(SnapTable.deleteFilesOf(spark, d, 2).nonEmpty)
    val ids = SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 100L).filterNot(_ == 42L))
  }

  test("MoR vectors stack, ride over appends, and time-travel: old " +
      "versions serve pre-delete rows as pure meta") {
    val d = tmp()
    SnapTable.create((0L until 50L).toDF("id"), d)
    SnapTable.deleteWhereMor(spark, d, col("id") % 10 === 3) // v2
    SnapTable.deleteWhereMor(spark, d, col("id") % 10 === 7) // v3 stacks
    SnapTable.append((100L until 110L).toDF("id"), d)        // v4 carries
    assert(SnapTable.deleteFilesOf(spark, d, 3).size === 2)
    assert(SnapTable.deleteFilesOf(spark, d, 4).size === 2,
      "an append must carry the current delete-vector set forward")
    def idsOf(v: Int): Seq[Long] =
      SnapTable.read(spark, d, Some(v)).collect().map(_.getLong(0))
        .sorted.toSeq
    assert(idsOf(1) === (0L until 50L), "v1 must still serve everything")
    assert(idsOf(2) === (0L until 50L).filter(_ % 10 != 3))
    assert(idsOf(3) === (0L until 50L).filter(i => i % 10 != 3 && i % 10 != 7))
    assert(idsOf(4) === ((0L until 50L).filter(i => i % 10 != 3 && i % 10 != 7)
      ++ (100L until 110L)))
  }

  test("a MoR delete with no matches is a no-op: no version churn, no " +
      "sidecar litter") {
    val d = tmp()
    SnapTable.create((0L until 10L).toDF("id"), d)
    SnapTable.deleteWhereMor(spark, d, col("id") > 1000L)
    assert(SnapTable.currentVersion(spark, d) === 1)
    // marking an already-MoR-deleted row again is also a no-op: the
    // positions are captured against the DV-APPLIED view
    SnapTable.deleteWhereMor(spark, d, col("id") === 5L)
    SnapTable.deleteWhereMor(spark, d, col("id") === 5L)
    assert(SnapTable.currentVersion(spark, d) === 2)
    assert(SnapTable.deleteFilesOf(spark, d, 2).size === 1)
  }

  test("optimize folds deletion vectors away: clean rewrite, empty " +
      "delete_files, pre-optimize versions still travel") {
    val d = tmp()
    SnapTable.create((0L until 100L).toDF("id")
      .repartitionByRange(4, col("id")), d, statsCol = Some("id"))
    SnapTable.deleteWhereMor(spark, d, col("id") % 4 === 1) // v2
    SnapTable.optimize(spark, d, targetFiles = 2)           // v3 folds
    assert(SnapTable.deleteFilesOf(spark, d, 3).isEmpty,
      "optimize must fold the vectors into the rewrite")
    val ids = SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 100L).filter(_ % 4 != 1))
    assert(SnapTable.read(spark, d, Some(1)).count() === 100)
    assert(SnapTable.read(spark, d, Some(2)).count() === 75)
    // post-fold stats pruning still equals the filtered read (q240 rule)
    assert(SnapTable.readPruned(spark, d, 10L, 29L).collect()
      .map(_.getLong(0)).sorted.toSeq ===
      (10L until 30L).filter(_ % 4 != 1))
  }

  test("readPruned applies deletion vectors (pruned scan ≡ filtered " +
      "read on a DV table)") {
    val d = tmp()
    SnapTable.create((0L until 100L).toDF("id")
      .repartitionByRange(4, col("id")), d, statsCol = Some("id"))
    SnapTable.deleteWhereMor(spark, d, col("id").between(20L, 24L))
    assert(SnapTable.readPruned(spark, d, 10L, 39L).collect()
      .map(_.getLong(0)).sorted.toSeq ===
      (10L until 40L).filterNot(i => i >= 20 && i <= 24))
  }

  test("vacuum retires DV sidecars with their last referencing " +
      "snapshot and keeps the ones retained manifests reference") {
    val d = tmp()
    val f = new org.apache.hadoop.fs.Path(d)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    SnapTable.create((0L until 40L).toDF("id"), d)        // v1
    SnapTable.deleteWhereMor(spark, d, col("id") === 1L)  // v2: dv1
    val dv1 = SnapTable.deleteFilesOf(spark, d, 2)
    SnapTable.optimize(spark, d, targetFiles = 1)         // v3: folds dv1
    SnapTable.deleteWhereMor(spark, d, col("id") === 2L)  // v4: dv2
    val dv2 = SnapTable.deleteFilesOf(spark, d, 4)
    SnapTable.append((100L until 101L).toDF("id"), d)     // v5 carries dv2
    SnapTable.vacuum(spark, d, retain = 2)                // keep v4, v5
    assert(dv1.forall(r => !f.exists(
      new org.apache.hadoop.fs.Path(s"$d/$r"))),
      "dv1 is referenced only by retired v2 — vacuum must delete it")
    assert(dv2.forall(r => f.exists(
      new org.apache.hadoop.fs.Path(s"$d/$r"))),
      "dv2 is referenced by retained v4/v5 — vacuum must keep it")
    // id=1 went at v2 (dv1, folded into v3's rewrite); id=2 at v4 (dv2)
    assert(SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
      .toSeq === ((0L until 40L).filterNot(Set(1L, 2L)) :+ 100L))
  }

  test("OCC composition: a MoR delete rebases over a concurrent " +
      "append, and two MoR deletes from the same base both apply") {
    val d = tmp()
    SnapTable.create((0L until 30L).toDF("id"), d)
    val base = SnapTable.currentVersion(spark, d) // = 1
    // interloper append wins v2; the stale-based MoR delete rebases
    SnapTable.append((100L until 105L).toDF("id"), d)
    SnapTable.deleteWhereMorFrom(spark, d, col("id") === 7L, base)
    assert(SnapTable.currentVersion(spark, d) === 3)
    // two MoR deletes planned against the SAME base: DV-only commits
    // compose by meta merge (neither rewrites anything)
    val b2 = SnapTable.currentVersion(spark, d)
    SnapTable.deleteWhereMorFrom(spark, d, col("id") === 8L, b2)
    SnapTable.deleteWhereMorFrom(spark, d, col("id") === 9L, b2)
    val ids = SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq ===
      ((0L until 30L).filterNot(Set(7L, 8L, 9L)) ++ (100L until 105L)))
  }

  test("OCC conflicts: a rewrite racing a DV change refuses in BOTH " +
      "directions (stranded positions / stranded rewrite)") {
    // direction 1: a CoW delete planned before a MoR delete landed —
    // rebasing would carry a vector whose positions the rewrite strands
    val d1 = tmp()
    SnapTable.create((0L until 20L).toDF("id"), d1)
    val b1 = SnapTable.currentVersion(spark, d1)
    SnapTable.deleteWhereMor(spark, d1, col("id") === 3L)
    intercept[SnapTable.ConcurrentWriteException](
      SnapTable.deleteWhereFrom(spark, d1, col("id") === 5L, b1))
    // direction 2: a MoR delete planned before a rewrite landed — its
    // positions refer to files the rewrite replaced (read-set rule).
    // coalesce(1): the conflict is FILE-granular, so the rewrite must
    // hit the very file the vector records (disjoint files compose)
    val d2 = tmp()
    SnapTable.create((0L until 20L).toDF("id").coalesce(1), d2)
    val b2 = SnapTable.currentVersion(spark, d2)
    SnapTable.deleteWhere(spark, d2, col("id") === 3L) // CoW rewrite wins
    intercept[SnapTable.ConcurrentWriteException](
      SnapTable.deleteWhereMorFrom(spark, d2, col("id") === 5L, b2))
    // the conflicted delete's already-written sidecar must be cleaned
    // up — no manifest references it, so it would otherwise leak past
    // every vacuum forever
    val delDir = new org.apache.hadoop.fs.Path(s"$d2/_deletes")
    val f2 = delDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f2.exists(delDir) || f2.listStatus(delDir).isEmpty,
      "a conflicted MoR delete leaked its sidecar")
  }

  test("merge-on-read MERGE rewrites ZERO data files: old rows of " +
      "matched keys become vector positions, the batch appends, both " +
      "arms land in one commit") {
    val d = tmp()
    SnapTable.create((0L until 40L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartitionByRange(4, col("id")), d)
    val v1 = dataEntries(d, 1)
    // update ids 5 and 25 (two different files), insert id 100
    SnapTable.mergeMor(
      Seq((5L, "NEW5"), (25L, "NEW25"), (100L, "NEW100")).toDF("id", "s"),
      d, "id")
    assert(SnapTable.currentVersion(spark, d) === 2)
    val v2 = dataEntries(d, 2)
    assert(v1.subsetOf(v2), "a MoR merge must carry every base file")
    assert((v2 -- v1).nonEmpty, "the update batch must append new files")
    assert(SnapTable.deleteFilesOf(spark, d, 2).nonEmpty,
      "the matched keys' old rows must become a deletion vector")
    val rows = SnapTable.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.size === 41) // 40 originals − 0 net + 1 insert
    assert(rows(5L) === "NEW5" && rows(25L) === "NEW25" &&
      rows(100L) === "NEW100")
    assert(rows(6L) === "v6", "an unmatched row changed")
    // time travel: v1 still serves the pre-merge rows (pure meta)
    assert(SnapTable.read(spark, d, Some(1)).filter(col("id") === 5L)
      .head().getString(1) === "v5")
    // a pure-insert merge leaves NO vector behind (empty sidecar dropped)
    SnapTable.mergeMor(Seq((200L, "NEW200")).toDF("id", "s"), d, "id")
    assert(SnapTable.deleteFilesOf(spark, d, 3) ===
      SnapTable.deleteFilesOf(spark, d, 2))
    // shared validation still guards the MoR spelling
    intercept[IllegalArgumentException](SnapTable.mergeMor(
      Seq((1L, "a"), (1L, "b")).toDF("id", "s"), d, "id"))
    intercept[IllegalArgumentException](SnapTable.mergeMor(
      Seq(1L).toDF("id"), d, "id"))
  }

  test("MoR merge OCC: rebases over a key-disjoint append, refuses a " +
      "key-clashing one, and a conflicted commit leaks no sidecar") {
    val d = tmp()
    SnapTable.create((0L until 20L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1), d)
    val base = SnapTable.currentVersion(spark, d)
    // key-DISJOINT interloper append → the stale-based MoR merge rebases
    SnapTable.append(Seq((50L, "x")).toDF("id", "s"), d)
    SnapTable.mergeMorFrom(Seq((3L, "NEW3")).toDF("id", "s"), d, "id", base)
    val rows = SnapTable.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(3L) === "NEW3" && rows(50L) === "x" && rows.size === 21)
    // key-CLASHING interloper append → refuse (duplicate key otherwise)
    val b2 = SnapTable.currentVersion(spark, d)
    SnapTable.append(Seq((7L, "clash")).toDF("id", "s"), d)
    intercept[SnapTable.ConcurrentWriteException](
      SnapTable.mergeMorFrom(Seq((7L, "NEW7")).toDF("id", "s"), d, "id", b2))
    // a concurrent REWRITE of a touched file → read-set refusal, and
    // the conflicted merge's sidecar must not leak
    val d2 = tmp()
    SnapTable.create((0L until 20L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1), d2)
    val b3 = SnapTable.currentVersion(spark, d2)
    SnapTable.deleteWhere(spark, d2, col("id") === 2L) // CoW rewrite wins
    intercept[SnapTable.ConcurrentWriteException](
      SnapTable.mergeMorFrom(Seq((5L, "NEW5")).toDF("id", "s"), d2, "id", b3))
    val delDir = new org.apache.hadoop.fs.Path(s"$d2/_deletes")
    val f2 = delDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!f2.exists(delDir) || f2.listStatus(delDir).isEmpty,
      "a conflicted MoR merge leaked its sidecar")
  }

  test("reserved row-identity column names refuse loudly instead of " +
      "being silently clobbered by the DV machinery") {
    val d = tmp()
    SnapTable.create(Seq((1L, 9L)).toDF("id", "__pos"), d)
    val e = intercept[IllegalArgumentException](
      SnapTable.deleteWhereMor(spark, d, col("id") === 1L))
    assert(e.getMessage.contains("reserved"), e.getMessage)
    // the CoW path routes through the same reader — same refusal
    intercept[IllegalArgumentException](
      SnapTable.deleteWhere(spark, d, col("id") === 1L))
  }

  test("CoW delete and MERGE on a DV table apply the vectors: no " +
      "resurrection through the rewrite path") {
    val d = tmp()
    SnapTable.create((0L until 20L).map(i => (i, s"v$i")).toDF("id", "s")
      .coalesce(1), d)
    SnapTable.deleteWhereMor(spark, d, col("id") === 5L)
    // CoW rewrite of the (single) touched file must NOT resurrect id=5
    SnapTable.deleteWhere(spark, d, col("id") === 10L)
    assert(SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
      .toSeq === (0L until 20L).filterNot(Set(5L, 10L)))
    // merging the MoR-deleted key INSERTS it exactly once (the hidden
    // physical row must not ride back in next to the insert)
    SnapTable.merge(Seq((5L, "NEW")).toDF("id", "s"), d, "id")
    val rows = SnapTable.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows(5L) === "NEW")
    assert(rows.size === 19) // 0..19 minus {10} (5 re-inserted)
  }

  // ---- DV-aware IVM/CDC folds (the round-13 refusal, closed) -------------

  /** Rescan closed form the fold must match. */
  private def rescanStats(d: String): Map[String, (Long, Long)] =
    SnapTable.read(spark, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("cs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  test("IVM folds a stacked-DV window: MoR deletes and a MoR merge " +
      "fold as negative sidecar deltas, equal to the full rescan") {
    val d = tmp()
    SnapTable.create((0L until 60L).map(i => (i, s"s${i % 3}", 10L))
      .toDF("doc_id", "source", "n_chars")
      .repartitionByRange(3, col("doc_id")), d)
    SnapTable.deleteWhereMor(spark, d, col("doc_id") % 10 === 3)  // v2: DV
    SnapTable.deleteWhereMor(spark, d, col("doc_id") % 10 === 7)  // v3 stacks
    SnapTable.mergeMor((0L until 60L by 9L).map(i => (i, "up", 500L))
      .toDF("doc_id", "source", "n_chars"), d, "doc_id")          // v4: both arms
    SnapTable.append(Seq((1000L, "late", 7L))
      .toDF("doc_id", "source", "n_chars"), d)                    // v5 carries
    val folded = SnapTable.ivmFoldSourceStats(spark, d, 0,
      SnapTable.currentVersion(spark, d), Map.empty)
    assert(folded === rescanStats(d), "DV-aware fold drifted from rescan")
    // incremental advance: fold ONLY the new version after another
    // stacked MoR delete — the sidecar folds as a negative delta
    val v0 = SnapTable.currentVersion(spark, d)
    SnapTable.deleteWhereMor(spark, d, col("source") === "up" &&
      col("doc_id") % 2 === 0)                                    // v6 stacks
    val advanced = SnapTable.ivmFoldSourceStats(spark, d, v0,
      SnapTable.currentVersion(spark, d), folded)
    assert(advanced === rescanStats(d), "incremental DV fold drifted")
    // and the batch union spelling agrees with the fold
    val union = SnapTable.snapshotIvmStatsOf(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(union === advanced, "union spelling drifted from the fold")
  }

  test("IVM re-seeds from a DV-carrying retained manifest after vacuum " +
      "(reads the snapshot under its vectors) and a CoW rewrite of a " +
      "DV-covered file subtracts only the visible rows") {
    val d = tmp()
    SnapTable.create((0L until 40L).map(i => (i, s"s${i % 2}", 10L))
      .toDF("doc_id", "source", "n_chars")
      .repartitionByRange(2, col("doc_id")), d)
    SnapTable.deleteWhereMor(spark, d, col("doc_id") % 4 === 1)  // v2: DV
    // CoW delete rewrites a DV-covered file: the removed file's OLD
    // visible content (net of v2's vector) must subtract, not its full
    // parquet contents
    SnapTable.deleteWhere(spark, d, col("doc_id") === 6L)        // v3: rewrite
    SnapTable.append(Seq((100L, "s0", 5L))
      .toDF("doc_id", "source", "n_chars"), d)                   // v4
    assert(SnapTable.ivmFoldSourceStats(spark, d, 0,
      SnapTable.currentVersion(spark, d), Map.empty) === rescanStats(d))
    // vacuum away v1/v2 so a fresh fold MUST re-seed from a retained
    // manifest; v3 still carries the (partially dangling) vector meta
    SnapTable.vacuum(spark, d, retain = 2)
    assert(SnapTable.deleteFilesOf(spark, d, 3).nonEmpty,
      "fixture: the retained re-seed manifest should carry a vector")
    assert(SnapTable.ivmFoldSourceStats(spark, d, 0,
      SnapTable.currentVersion(spark, d), Map.empty) === rescanStats(d),
      "re-seed from a DV-carrying manifest drifted from rescan")
  }

  // ---- per-file bloom bits (equality skipping) ---------------------------

  test("bloom equality skipping: a point lookup reads a STRICT subset " +
      "of files on a hash-laid-out table, the result equals the plain " +
      "filtered read, and a miss probe returns empty") {
    val d = tmp()
    // hash layout: every file spans the full id range — min/max stats
    // would prune NOTHING here; only the bloom bits can
    SnapTable.create((0L until 400L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(8, col("id")), d, bloomCol = Some("id"))
    val all = SnapTable.readManifest(spark, d,
      SnapTable.currentVersion(spark, d))
    val pruned = SnapTable.bloomPrunedPaths(spark, d, 137L,
      SnapTable.currentVersion(spark, d))
    assert(pruned.toSet.subsetOf(all.toSet))
    assert(pruned.size < all.size,
      s"bloom pruned nothing: ${pruned.size}/${all.size} files")
    assert(pruned.nonEmpty, "the containing file must survive the probe")
    val hit = SnapTable.readPrunedEq(spark, d, 137L).collect()
    assert(hit.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((137L, "v137")))
    // miss probe: no wrong skips, just an empty (possibly 0-file) read
    assert(SnapTable.readPrunedEq(spark, d, 100137L).count() === 0)
  }

  test("bloom bits survive append/delete/optimize (new files get their " +
      "own bits), compose with deletion vectors, and a bloom-less " +
      "table refuses readPrunedEq") {
    val d = tmp()
    SnapTable.create((0L until 100L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartition(4, col("id")), d, bloomCol = Some("id"))
    SnapTable.append(Seq((500L, "late")).toDF("id", "s"), d)
    assert(SnapTable.readPrunedEq(spark, d, 500L).collect()
      .map(_.getString(1)).toSeq === Seq("late"),
      "an appended file must be bloom-probed too")
    // the append's file should be prunable away for a v1-range probe:
    // every annotated file is judged by its OWN bits
    val pruned = SnapTable.bloomPrunedPaths(spark, d, 500L,
      SnapTable.currentVersion(spark, d))
    assert(pruned.size < SnapTable.readManifest(spark, d,
      SnapTable.currentVersion(spark, d)).size)
    // MoR delete: the equality scan applies the vectors (DV-aware)
    SnapTable.deleteWhereMor(spark, d, col("id") === 42L)
    assert(SnapTable.readPrunedEq(spark, d, 42L).count() === 0,
      "readPrunedEq must apply deletion vectors")
    // optimize rewrites everything and re-derives bloom bits
    SnapTable.optimize(spark, d, targetFiles = 2)
    assert(SnapTable.readPrunedEq(spark, d, 77L).collect()
      .map(_.getString(1)).toSeq === Seq("v77"))
    assert(SnapTable.readPrunedEq(spark, d, 42L).count() === 0)
    // a table created without bloomCol refuses with the remedy named
    val d2 = tmp()
    SnapTable.create(Seq((1L, "a")).toDF("id", "s"), d2)
    val e = intercept[IllegalArgumentException](
      SnapTable.readPrunedEq(spark, d2, 1L))
    assert(e.getMessage.contains("bloom"), e.getMessage)
  }

  test("a schema-evolved append LACKING the declared stats/bloom " +
      "column commits with unannotated files (always read) instead of " +
      "crashing after the data landed") {
    val d = tmp()
    SnapTable.create((0L until 20L).map(i => (i, s"v$i"))
      .toDF("id", "s").repartitionByRange(2, col("id")), d,
      statsCol = Some("id"), bloomCol = Some("id"))
    // narrower batch: no 'id' at all — mergeSchema admits it; the
    // annotation pass must SKIP, not throw unresolved-column
    SnapTable.append(Seq("orphan_row").toDF("s"), d)
    assert(SnapTable.read(spark, d).count() === 21)
    // pruned reads stay CORRECT: the unannotated file is always read,
    // so the range scan still equals the plain filtered read...
    assert(SnapTable.readPruned(spark, d, 5L, 8L).collect()
      .map(_.getLong(0)).sorted.toSeq === (5L to 8L))
    // ...and a bloom probe still finds its row (plus reads the
    // unannotated file, harmlessly)
    assert(SnapTable.readPrunedEq(spark, d, 7L).collect()
      .map(_.getString(1)).toSeq === Seq("v7"))
    // annotated batches after the narrow one annotate again
    SnapTable.append(Seq((100L, "late")).toDF("id", "s"), d)
    val pruned = SnapTable.bloomPrunedPaths(spark, d, 100L,
      SnapTable.currentVersion(spark, d))
    assert(pruned.size < SnapTable.readManifest(spark, d,
      SnapTable.currentVersion(spark, d)).size,
      "post-evolution batches must resume bloom annotation")
  }

  test("bloom on a STRING column: the declared type rides the meta and " +
      "the probe hashes the same type the writer did") {
    val d = tmp()
    SnapTable.create((0L until 60L).map(i => (i, s"key_$i"))
      .toDF("id", "k").repartition(6, col("k")), d,
      bloomCol = Some("k"))
    val hit = SnapTable.readPrunedEq(spark, d, "key_37").collect()
    assert(hit.map(_.getLong(0)).toSeq === Seq(37L))
    val pruned = SnapTable.bloomPrunedPaths(spark, d, "key_37",
      SnapTable.currentVersion(spark, d))
    assert(pruned.size < 6, s"string bloom pruned nothing: ${pruned.size}")
    assert(SnapTable.readPrunedEq(spark, d, "no_such_key").count() === 0)
  }

  test("bloom and min/max stats coexist on one table: range scans " +
      "prune by stats, point probes by bloom, values agree with plain " +
      "reads") {
    val d = tmp()
    SnapTable.create((0L until 200L).map(i => (i, i * 3))
      .toDF("id", "x").repartitionByRange(4, col("id")), d,
      statsCol = Some("id"), bloomCol = Some("id"))
    // range scan via stats (bloom tag must not confuse the stats parse)
    assert(SnapTable.readPruned(spark, d, 50L, 59L).collect()
      .map(_.getLong(0)).sorted.toSeq === (50L until 60L))
    assert(SnapTable.prunedPaths(spark, d, 50L, 59L).size === 1)
    // point probe via bloom
    assert(SnapTable.readPrunedEq(spark, d, 123L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((123L, 369L)))
  }

  test("plan shapes: a DV-free read plans a PLAIN parquet scan (no " +
      "metadata projection, no join — DV support costs existing tables " +
      "nothing), a DV read plans the anti-join, and pruned scans list " +
      "ONLY their chosen files") {
    val d = tmp()
    SnapTable.create((0L until 100L).map(i => (i, i * 2))
      .toDF("id", "x").repartitionByRange(4, col("id")), d,
      statsCol = Some("id"), bloomCol = Some("id"))
    val clean = SnapTable.read(spark, d)
    val cleanPlan = clean.queryExecution.executedPlan.toString
    assert(!cleanPlan.contains("Join") && !cleanPlan.contains("__fk"),
      s"a DV-free read paid the DV machinery:\n$cleanPlan")
    // pruned reads expose their file lists: strictly the chosen subset
    val allFiles = clean.inputFiles.toSet
    assert(allFiles.size === 4)
    // repartitionByRange samples its boundaries, so the window may
    // straddle a file edge — strict subset is the contract, not 1 file
    val rangeFiles = SnapTable.readPruned(spark, d, 10L, 29L).inputFiles.toSet
    assert(rangeFiles.size < 4 && rangeFiles.subsetOf(allFiles),
      s"range scan read ${rangeFiles.size}/4 files")
    val eqFiles = SnapTable.readPrunedEq(spark, d, 57L).inputFiles.toSet
    assert(eqFiles.size < 4 && eqFiles.subsetOf(allFiles),
      s"bloom scan read ${eqFiles.size}/4 files")
    // after a MoR delete the read pays exactly one anti-join
    SnapTable.deleteWhereMor(spark, d, col("id") === 3L)
    val dvPlan = SnapTable.read(spark, d).queryExecution
      .executedPlan.toString
    assert(dvPlan.contains("LeftAnti"),
      s"a DV read must anti-join the vectors:\n$dvPlan")
    // ...and optimize returns the table to the plain-scan plan
    SnapTable.optimize(spark, d, targetFiles = 2)
    val foldedPlan = SnapTable.read(spark, d).queryExecution
      .executedPlan.toString
    assert(!foldedPlan.contains("Join"),
      s"post-optimize read still pays the DV machinery:\n$foldedPlan")
  }

  // ---- column mapping (rename without rewrite) ---------------------------

  test("renameColumn is pure metadata: zero data files change, the new " +
      "name reads back, time travel shows the old name, and writers " +
      "speak the logical schema") {
    val d = tmp()
    SnapTable.create((0L until 20L).map(i => (i, s"v$i", i * 2))
      .toDF("id", "s", "x"), d)
    val v1Files = dataEntries(d, 1)
    SnapTable.renameColumn(spark, d, "x", "score")
    assert(SnapTable.currentVersion(spark, d) === 2)
    assert(dataEntries(d, 2) === v1Files,
      "a rename must not touch the data-file set")
    assert(SnapTable.read(spark, d).columns.toSeq === Seq("id", "s", "score"))
    assert(SnapTable.read(spark, d, Some(1)).columns.toSeq ===
      Seq("id", "s", "x"), "pre-rename time travel must keep the old name")
    // append under the LOGICAL name: physical files stay uniform
    SnapTable.append(Seq((100L, "late", 7L)).toDF("id", "s", "score"), d)
    assert(SnapTable.read(spark, d).filter(col("id") === 100L)
      .head().getLong(2) === 7L)
    // CoW delete predicated on the logical name, across both vintages
    SnapTable.deleteWhere(spark, d, col("score") < 6L)
    assert(SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
      .toSeq === ((3L until 20L) :+ 100L))
    // merge under the logical schema replaces + inserts
    SnapTable.merge(Seq((5L, "NEW", 999L), (200L, "ins", 1L))
      .toDF("id", "s", "score"), d, "id")
    val rows = SnapTable.read(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(rows(5L) === 999L && rows(200L) === 1L)
    // MoR delete through the mapping
    SnapTable.deleteWhereMor(spark, d, col("score") === 999L)
    assert(SnapTable.read(spark, d).filter(col("id") === 5L).count() === 0)
    // rename BACK to the physical name empties the map
    SnapTable.renameColumn(spark, d, "score", "x")
    assert(SnapTable.read(spark, d).columns.toSeq === Seq("id", "s", "x"))
    assert(SnapTable.manifestMeta(spark, d,
      SnapTable.currentVersion(spark, d)).get("col_map").isEmpty,
      "renaming back to the physical name must drop the map entry")
  }

  test("rename refusals: unknown column, collision, declared stats/" +
      "bloom columns, reserved names; a writer racing a rename " +
      "conflicts instead of reverting it") {
    val d = tmp()
    SnapTable.create((0L until 10L).map(i => (i, i * 3))
      .toDF("id", "x").repartitionByRange(2, col("id")), d,
      statsCol = Some("id"), bloomCol = Some("id"))
    intercept[IllegalArgumentException](
      SnapTable.renameColumn(spark, d, "nope", "y"))
    intercept[IllegalArgumentException](
      SnapTable.renameColumn(spark, d, "x", "id")) // collision
    intercept[IllegalArgumentException](
      SnapTable.renameColumn(spark, d, "id", "key")) // stats+bloom col
    intercept[IllegalArgumentException](
      SnapTable.renameColumn(spark, d, "x", "__pos")) // reserved
    // col_map serialization metacharacters would brick every later
    // parse — refused up front, not discovered at the next read
    intercept[IllegalArgumentException](
      SnapTable.renameColumn(spark, d, "x", "a,b"))
    intercept[IllegalArgumentException](
      SnapTable.renameColumn(spark, d, "x", "a:b"))
    // a logical name may not shadow another column's PHYSICAL name:
    // with physical [x, w] and w renamed away (w→z), renaming x→w
    // would make the rename folds produce duplicate columns
    val dShadow = tmp()
    SnapTable.create(Seq((1L, 2L, 3L)).toDF("id", "x", "w"), dShadow)
    SnapTable.renameColumn(spark, dShadow, "w", "z")
    intercept[IllegalArgumentException](
      SnapTable.renameColumn(spark, dShadow, "x", "w"))
    // renaming w's logical name BACK to w (its own physical) is fine
    SnapTable.renameColumn(spark, dShadow, "z", "w")
    assert(SnapTable.read(spark, dShadow).columns.toSeq ===
      Seq("id", "x", "w"))
    // an append planned BEFORE a rename landed must conflict (its
    // carried meta would silently revert the map) — re-plan then works
    val base = SnapTable.currentVersion(spark, d)
    SnapTable.renameColumn(spark, d, "x", "y")
    intercept[SnapTable.ConcurrentWriteException] {
      SnapTable.occCommit(spark, d, base, Set.empty, Set.empty,
        SnapTable.writeData(Seq((50L, 1L)).toDF("id", "x"), d, base + 1,
          Seq("id"), SnapTable.bloomDeclOf(spark, d, base)),
        SnapTable.layoutMeta(spark, d, base))
    }
    SnapTable.append(Seq((50L, 1L)).toDF("id", "y"), d)
    assert(SnapTable.read(spark, d).count() === 11)
    // post-rename: stats range pruning AND bloom point probes still
    // serve (their columns were shielded from the rename)
    assert(SnapTable.readPruned(spark, d, 2L, 4L).collect()
      .map(_.getLong(0)).sorted.toSeq === Seq(2L, 3L, 4L))
    assert(SnapTable.readPrunedEq(spark, d, 7L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((7L, 21L)))
  }

  test("CDC counts see a DV transition: a MoR delete diffs as deletes, " +
      "a MoR merge as updates + inserts") {
    val d = tmp()
    SnapTable.create((0L until 20L).map(i => (i, s"v$i")).toDF("id", "s"), d)
    SnapTable.deleteWhereMor(spark, d, col("id") < 3L)           // v2: DV
    SnapTable.mergeMor(Seq((5L, "NEW5"), (100L, "NEW100"))
      .toDF("id", "s"), d, "id")                                 // v3: DV+files
    def diff(a: Int, b: Int): (Long, Long, Long) = {
      val fa = SnapTable.read(spark, d, Some(a))
        .select(col("id"), col("s").as("sa"))
      val fb = SnapTable.read(spark, d, Some(b))
        .select(col("id"), col("s").as("sb"))
      val j = fa.join(fb, Seq("id"), "full_outer").collect()
      (j.count(r => r.isNullAt(1)),                       // inserted
        j.count(r => r.isNullAt(2)),                      // deleted
        j.count(r => !r.isNullAt(1) && !r.isNullAt(2) &&
          r.getString(1) != r.getString(2)))              // updated
    }
    assert(diff(1, 2) === (0L, 3L, 0L), "MoR delete must diff as deletes")
    assert(diff(2, 3) === (1L, 0L, 1L), "MoR merge must diff as upsert")
    // the MANIFEST-SCOPED incremental CDC (reads only each commit's
    // delta) must report the same counts over the same DV history
    val inc = SnapTable.cdcIncremental(spark, d, "id", Seq("s"), 1, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(inc === Map((1L, 2L) -> (0L, 3L, 0L), (2L, 3L) -> (1L, 0L, 1L)),
      s"incremental CDC drifted from the read-level diff: $inc")
    // an OPTIMIZE transition (delta = the whole table, all rows carried
    // content-equal) reports ZERO changes — a pure file move is not CDC
    SnapTable.optimize(spark, d, targetFiles = 1)
    val inc2 = SnapTable.cdcIncremental(spark, d, "id", Seq("s"), 3, 4)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(inc2.toSeq === Seq((0L, 0L, 0L)),
      s"a compaction leaked phantom CDC events: ${inc2.toSeq}")
    // presence-only CDC (no content columns): inserts/deletes count,
    // updates are definitionally 0 — must not crash on empty cols
    val pres = SnapTable.cdcIncremental(spark, d, "id", Seq.empty, 1, 3)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(pres.toSeq === Seq((0L, 3L, 0L), (1L, 0L, 0L)),
      s"presence-only CDC drifted: ${pres.toSeq}")
    // schema-evolved narrow append: delta files LACK a requested
    // column — it must read as NULL (as a mergeSchema snapshot read
    // would serve), not crash unresolved
    val d2 = tmp()
    SnapTable.create(Seq((1L, "a", 9L)).toDF("id", "s", "extra"), d2)
    SnapTable.append(Seq((2L, "b")).toDF("id", "s"), d2) // no 'extra'
    val evo = SnapTable.cdcIncremental(spark, d2, "id",
      Seq("s", "extra"), 1, 2)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(evo.toSeq === Seq((1L, 0L, 0L)),
      s"evolved-schema incremental CDC drifted: ${evo.toSeq}")
  }

  test("write-side shadow guard: a batch column named like a " +
      "mapped-away PHYSICAL name refuses, naming the logical name") {
    val d = tmp()
    SnapTable.create(Seq((1L, 10L)).toDF("id", "x"), d)
    SnapTable.renameColumn(spark, d, "x", "score")
    // after x→score, a batch carrying a fresh column literally named
    // 'x' would silently merge into the renamed column's physical
    // storage and read back under 'score'
    val e = intercept[IllegalArgumentException](
      SnapTable.append(Seq((2L, 5L, 6L)).toDF("id", "score", "x"), d))
    assert(e.getMessage.contains("score") && e.getMessage.contains("'x'"))
    // the logical spelling still appends fine
    SnapTable.append(Seq((2L, 5L)).toDF("id", "score"), d)
    assert(SnapTable.read(spark, d).count() === 2)
  }

  test("recorded physical schema: the manifest's union schema tracks " +
      "evolution, and CDC refuses typo'd / physical column names") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a", 9L)).toDF("id", "s", "extra"), d)
    SnapTable.append(Seq((2L, "b")).toDF("id", "s"), d) // narrower batch
    val meta = SnapTable.manifestMeta(spark, d, 2)
    assert(meta.contains("schema"), "commits must record the schema")
    assert(meta("schema").contains("extra"),
      "a narrower append must not shrink the recorded union schema")
    // a typo'd CDC column fails loudly instead of silently reading
    // NULL on both sides (differs=false, updates undercounted)
    val e = intercept[IllegalArgumentException](
      SnapTable.cdcIncremental(spark, d, "id", Seq("s", "extrra"), 1, 2))
    assert(e.getMessage.contains("extrra"))
    // on a renamed table, CDC under the LOGICAL name counts updates;
    // the mapped-away physical name refuses
    val d2 = tmp()
    SnapTable.create((0L until 10L).map(i => (i, s"v$i", i))
      .toDF("id", "s", "x"), d2)
    SnapTable.renameColumn(spark, d2, "x", "score")            // v2
    SnapTable.merge((0L until 3L).map(i => (i, s"v$i", i + 100L))
      .toDF("id", "s", "score"), d2, "id")                     // v3
    val counts = SnapTable.cdcIncremental(spark, d2, "id",
      Seq("s", "score"), 1, 3)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(counts.toSeq === Seq((0L, 0L, 3L)),
      s"renamed-column CDC must see the updates: ${counts.toSeq}")
    intercept[IllegalArgumentException](
      SnapTable.cdcIncremental(spark, d2, "id", Seq("x"), 1, 3))
  }

  test("DV minor compaction folds stacked sidecars into ONE: zero data " +
      "rewrites, value identity, a single anti-join plan, time travel " +
      "intact, and no phantom IVM/CDC events") {
    val d = tmp()
    SnapTable.create((0L until 100L).map(i => (i, s"v$i")).toDF("id", "s")
      .repartitionByRange(4, col("id")), d)
    SnapTable.deleteWhereMor(spark, d, col("id") % 10 === 3)
    SnapTable.deleteWhereMor(spark, d, col("id") % 7 === 2)
    SnapTable.mergeMor(Seq((5L, "NEW5")).toDF("id", "s"), d, "id")
    val v0 = SnapTable.currentVersion(spark, d)
    assert(SnapTable.deleteFilesOf(spark, d, v0).size === 3)
    val before = dataEntries(d, v0)
    val preRows = SnapTable.read(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    SnapTable.compactDeletionVectors(spark, d)
    val v = SnapTable.currentVersion(spark, d)
    assert(v === v0 + 1)
    assert(SnapTable.deleteFilesOf(spark, d, v).size === 1,
      "compaction must leave exactly one sidecar")
    assert(dataEntries(d, v) === before,
      "compaction must rewrite zero data files")
    assert(SnapTable.read(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === preRows,
      "compaction must be value-invisible")
    val plan = SnapTable.read(spark, d).queryExecution
      .executedPlan.toString
    assert("LeftAnti".r.findAllIn(plan).size === 1,
      s"the compacted read must pay exactly one anti-join:\n$plan")
    // pre-compaction versions still read their stacked vectors
    assert(SnapTable.read(spark, d, Some(v0)).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet === preRows)
    // idempotent: one sidecar → no version churn
    SnapTable.compactDeletionVectors(spark, d)
    assert(SnapTable.currentVersion(spark, d) === v)
    // the compaction transition is invisible to the CDC feed (the
    // un-vectored resurrection cancels the re-vectored delta exactly)
    val inc = SnapTable.cdcIncremental(spark, d, "id", Seq("s"), v0, v)
      .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(inc.toSeq === Seq((0L, 0L, 0L)),
      s"DV compaction leaked phantom CDC events: ${inc.toSeq}")
  }

  test("a deep CDC catch-up window chunks into bounded jobs and " +
      "equals the drip-fed per-transition counts") {
    val d = tmp()
    // 21 transitions (> IvmUnionMaxVersions = 16): create + 19 appends
    // of i rows each + one CoW delete — the chunked path must cross a
    // chunk boundary and agree with per-transition (drip-fed) windows
    SnapTable.create((0L until 5L).map(i => (i, s"v$i")).toDF("id", "s"), d)
    (1 to 19).foreach { w =>
      val base = 100L * w
      SnapTable.append((base until base + w).map(i => (i, s"v$i"))
        .toDF("id", "s"), d)
    }
    SnapTable.deleteWhere(spark, d, col("id") === 100L) // v21
    val cur = SnapTable.currentVersion(spark, d)
    assert(cur === 21 && cur > SnapTable.IvmUnionMaxVersions)
    val deep = SnapTable.cdcIncremental(spark, d, "id", Seq("s"), 0, cur)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    // drip-fed truth: one single-transition window at a time
    val drip = (0 until cur).flatMap(v =>
      SnapTable.cdcIncremental(spark, d, "id", Seq("s"), v, v + 1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))))
    assert(deep === drip,
      s"chunked deep window diverged from drip-fed counts:\n$deep\n$drip")
    // closed form spot checks: the create inserts 5, append w inserts
    // w, the delete deletes exactly one
    assert(deep.head === ((0L, 1L, 5L, 0L, 0L)))
    assert(deep(7) === ((7L, 8L, 7L, 0L, 0L)))
    assert(deep.last === ((20L, 21L, 0L, 1L, 0L)))
  }

  test("row-level CDC reproduces read-level diffs (updates emit BOTH " +
      "images); applyCdcRows maintains a replica exactly-once") {
    val d = tmp()
    SnapTable.create((0L until 20L).map(i => (i, s"v$i")).toDF("id", "s"), d)
    SnapTable.deleteWhereMor(spark, d, col("id") < 3L)              // v2
    SnapTable.mergeMor(Seq((5L, "NEW5"), (100L, "NEW100"))
      .toDF("id", "s"), d, "id")                                    // v3
    val rows = SnapTable.cdcRows(spark, d, "id", Seq("s"), 1, 3)
      .collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3),
        r.getString(4))).toSet
    assert(rows === Set(
      (1L, "delete", 0L, "v0"), (1L, "delete", 1L, "v1"),
      (1L, "delete", 2L, "v2"),
      (2L, "insert", 100L, "NEW100"),
      (2L, "update_preimage", 5L, "v5"),
      (2L, "update_postimage", 5L, "NEW5")), s"row feed drifted: $rows")
    // a replica replaying the feed transition-by-transition equals the
    // source at every version
    val rep = tmp()
    (0 until 3).foreach { fv =>
      assert(SnapTable.applyCdcRows(spark, rep,
        SnapTable.cdcRows(spark, d, "id", Seq("s"), fv, fv + 1),
        "id", fv + 1), s"transition $fv->${fv + 1} did not apply")
      val got = SnapTable.read(spark, rep).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      val want = SnapTable.read(spark, d, Some(fv + 1)).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === want, s"replica diverged at v${fv + 1}")
    }
    // exactly-once: a redelivered transition no-ops on the stamp
    assert(!SnapTable.applyCdcRows(spark, rep,
      SnapTable.cdcRows(spark, d, "id", Seq("s"), 1, 2), "id", 2))
    assert(SnapTable.lastAppliedCdcVersion(spark, rep) === 3)
    // a metadata-only window yields an EMPTY typed frame, not an error
    SnapTable.renameColumn(spark, d, "s", "label")
    val empty = SnapTable.cdcRows(spark, d, "id", Seq("label"), 3, 4)
    assert(empty.count() === 0 &&
      empty.columns.toSeq ===
        Seq("from_v", "to_v", "_change_type", "id", "label"))
  }

  test("plan-driven manifest skipping: a PLAIN read().filter prunes " +
      "the scan to manifest-admissible files (range via stats, point " +
      "via bloom, through the DV anti-join); the registered source " +
      "serves the same, incl. DV/col-mapped snapshots via the " +
      "fallback tier") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val d = tmp()
    SnapTable.create(
      spark.range(400).select(col("id"), (col("id") * 2).as("x"))
        .repartitionByRange(8, col("id")), d,
      statsCol = Some("id"), bloomCol = Some("id"))
    def nf(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect() // metrics populate after the action
      df.queryExecution.executedPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec
            if sc.schema.fieldNames.contains("x") => // data scan, not DV
          sc.metrics("numFiles").value
      }.sum
    }
    val all = nf(SnapTable.read(s2, d))
    assert(all === 8)
    val ranged = SnapTable.read(s2, d).filter(col("id").between(10L, 59L))
    assert(nf(ranged) < all, "range filter did not prune the plain read")
    assert(ranged.collect().map(_.getLong(0)).sorted.toSeq ===
      (10L to 59L), "pruning must be value-invisible")
    assert(nf(SnapTable.read(s2, d).filter(col("id") === 57L)) < all,
      "bloom equality filter did not prune the plain read")
    assert(nf(SnapTable.read(s2, d).filter(col("id").isin(3L, 57L))) < all,
      "bloom IN-list filter did not prune the plain read")
    // an unrecognized predicate prunes nothing but stays correct
    assert(SnapTable.read(s2, d).filter(col("x") % 100 === 0).count()
      === 8)
    // …and the filter keeps pruning THROUGH the DV anti-join
    SnapTable.deleteWhereMor(s2, d, col("id") === 11L)
    val dvRanged = SnapTable.read(s2, d).filter(col("id").between(10L, 59L))
    assert(nf(dvRanged) < all, "pruning lost under the DV anti-join")
    assert(dvRanged.collect().map(_.getLong(0)).sorted.toSeq ===
      (10L to 59L).filter(_ != 11L))
    // the registered source serves the DV snapshot through the
    // fallback tier: the anti-join applies under the relation, filters
    // re-apply inside it, values match the explicit read
    val dvSrc = s2.read.format("graftsnap").load(d)
    assert(dvSrc.count() === 399)
    assert(dvSrc.filter(col("id").between(10L, 59L))
      .collect().map(_.getLong(0)).sorted.toSeq ===
      (10L to 59L).filter(_ != 11L))
    assert(dvSrc.agg(sum(col("x"))).head.getLong(0) ===
      SnapTable.read(s2, d).agg(sum(col("x"))).head.getLong(0),
      "DV fallback tier diverged from SnapTable.read")
    // …serves the pre-DV version via versionAsOf, pruned and pushed
    val v1 = s2.read.format("graftsnap").option("versionAsOf", "1").load(d)
    assert(v1.count() === 400)
    val v1Ranged = v1.filter(col("id").between(10L, 59L))
    assert(nf(v1Ranged) < all && v1Ranged.count() === 50)
    // …resolves timestampAsOf through the commit stamps
    val ts1 = SnapTable.manifestMeta(s2, d, 1)("ts")
    assert(s2.read.format("graftsnap").option("timestampAsOf", ts1)
      .load(d).count() === 400)
    // …and serves a column-mapped snapshot under its LOGICAL name
    val d2 = tmp()
    SnapTable.create(Seq((1L, 2L), (2L, 9L)).toDF("id", "x"), d2)
    SnapTable.renameColumn(spark, d2, "x", "score")
    val mapped = s2.read.format("graftsnap").load(d2)
    assert(mapped.columns.toSeq === Seq("id", "score"),
      s"column-mapped source must serve logical names: " +
        mapped.columns.mkString(","))
    assert(mapped.filter(col("score") > 5L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((2L, 9L)))
  }

  test("manifest segmentation: commits write O(delta) manifest bytes — " +
      "appends add one segment, DV-only commits none, untouched " +
      "segments carry by reference, CoW spills only touched segments") {
    val d = tmp()
    SnapTable.create((0L until 6400L).toDF("id").repartition(64), d)
    val s1 = SnapTable.segmentRefs(spark, d, 1)
    assert(s1.size === 1, s"create must write one segment: $s1")
    SnapTable.append(Seq(10000L).toDF("id"), d)
    val s2 = SnapTable.segmentRefs(spark, d, 2)
    assert(s2.size === 2 && s1.forall(s2.contains),
      "an append must add ONE segment and carry v1's by reference")
    def len(rel: String): Long = new java.io.File(s"$d/$rel").length
    val newSeg = (s2.toSet -- s1.toSet).head
    assert(len("_snapshots/v00002.manifest") + len(newSeg) < len(s1.head),
      "an append's manifest bytes (head + new segment) must be smaller " +
        "than the full entry list it no longer serializes")
    // a deletion-vector commit is pure meta at the manifest level:
    // same segment set, no new segment
    SnapTable.deleteWhereMor(spark, d, col("id") === 5L)
    assert(SnapTable.segmentRefs(spark, d, 3).toSet === s2.toSet,
      "a DV-only commit must write no segment")
    // a CoW delete retires exactly the segments it touched
    SnapTable.deleteWhere(spark, d, col("id") === 10000L)
    val s4 = SnapTable.segmentRefs(spark, d, 4)
    assert(s4.contains(s1.head), "the untouched segment must carry")
    assert(!s4.contains(newSeg), "the touched segment must retire")
    // value identity + time travel across the segmented history
    assert(SnapTable.read(spark, d).count() === 6399)
    assert(SnapTable.read(spark, d, Some(1)).count() === 6400)
    assert(SnapTable.read(spark, d, Some(2)).count() === 6401)
  }

  test("segment fold policy bounds the head; vacuum retires segments " +
      "with their last referencing manifest") {
    val d = tmp()
    SnapTable.create(Seq(0L).toDF("id"), d)
    (1 to 60).foreach(i => SnapTable.append(Seq(i.toLong).toDF("id"), d))
    val cur = SnapTable.currentVersion(spark, d)
    assert(SnapTable.segmentRefs(spark, d, cur).size <= 48,
      "the head must stay bounded under append-per-commit ingest")
    assert(SnapTable.read(spark, d).collect().map(_.getLong(0)).sorted
      .toSeq === (0L to 60L), "segment folding must be value-invisible")
    SnapTable.vacuum(spark, d, retain = 2)
    val live = (SnapTable.oldestRetainedVersion(spark, d) to cur)
      .flatMap(v => SnapTable.segmentRefs(spark, d, v))
      .map(_.split('/').last).toSet
    val onDisk = new java.io.File(s"$d/_snapshots/seg").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).toSet // crc shadows
    assert(onDisk === live,
      s"segments on disk must be exactly the retained heads' references" +
        s" (orphans: ${onDisk -- live}, missing: ${live -- onDisk})")
  }

  test("timestamp time travel: monotonic commit stamps resolve " +
      "'as of <time>' to the right version; pre-history refuses") {
    val d = tmp()
    SnapTable.create(Seq((1L, "a")).toDF("id", "s"), d)
    SnapTable.append(Seq((2L, "b")).toDF("id", "s"), d)
    SnapTable.deleteWhere(spark, d, col("id") === 1L)
    val ts = (1 to 3).map(v =>
      SnapTable.manifestMeta(spark, d, v)("ts").toLong)
    assert(ts(0) < ts(1) && ts(1) < ts(2),
      s"commit timestamps must be strictly monotonic: $ts")
    assert(SnapTable.versionAtTimestamp(spark, d, ts(1)) === 2)
    assert(SnapTable.versionAtTimestamp(spark, d, ts(2) - 1) === 2,
      "a timestamp between commits resolves to the older one")
    assert(SnapTable.versionAtTimestamp(spark, d,
      System.currentTimeMillis() + 60000L) === 3)
    assert(SnapTable.readAsOfTimestamp(spark, d, ts(1)).count() === 2)
    assert(SnapTable.readAsOfTimestamp(spark, d, ts(2)).count() === 1)
    val e = intercept[IllegalArgumentException](
      SnapTable.versionAtTimestamp(spark, d, ts(0) - 1))
    assert(e.getMessage.contains("predates"))
    // vacuum moves the refusal horizon with the retained window
    SnapTable.vacuum(spark, d, retain = 1)
    intercept[IllegalArgumentException](
      SnapTable.versionAtTimestamp(spark, d, ts(1)))
  }

  test("vacuum materializes retired versions' file lists before " +
      "deleting: shared segments survive the walk cache-cold") {
    val d = tmp()
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, i * 2)).toDF("a", "b")
    SnapTable.create(batch(0, 20), d)   // v1 → seg s1
    SnapTable.append(batch(20, 40), d)  // v2 → carries s1, adds s2
    SnapTable.append(batch(40, 60), d)  // v3 → carries s1+s2, adds s3
    // v4: declaration change spills every carried segment, so retained
    // heads stop referencing s1..s3 and vacuum will retire them —
    // s1 is shared by retired v1/v2/v3, the exact interleaving where
    // delete-as-you-walk breaks manifestAt(v2) mid-loop
    SnapTable.optimizeZorder(spark, d, targetFiles = 2, "a", "b")
    SnapTable.append(batch(60, 80), d)  // v5
    SnapTable.dropSegCacheForTest()     // v2/v3 expansion must re-READ s1
    SnapTable.vacuum(spark, d, retain = 2) // retires v1..v3
    assert(SnapTable.read(spark, d).count() === 80)
    assert(SnapTable.read(spark, d, Some(4)).count() === 60)
  }

  test("vacuum retries past a previous crashed run: a retired version " +
      "whose segment is already gone is skipped, not a wedge") {
    val d = tmp()
    def batch(lo: Long, hi: Long) =
      (lo until hi).map(i => (i, i * 2)).toDF("a", "b")
    SnapTable.create(batch(0, 20), d)   // v1 → seg s1
    SnapTable.append(batch(20, 40), d)  // v2
    SnapTable.optimizeZorder(spark, d, targetFiles = 2, "a", "b") // v3
    SnapTable.append(batch(40, 60), d)  // v4
    // simulate a vacuum that died after deleting v1/v2's shared
    // segment but before their manifests: s1 gone, manifests remain
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val segDir = new org.apache.hadoop.fs.Path(s"$d/_snapshots/seg")
    val s1 = f.listStatus(segDir).map(_.getPath)
      .filter(_.getName.startsWith("s00001")).head
    f.delete(s1, false)
    SnapTable.dropSegCacheForTest()
    // the retry must not wedge on the unreadable retired versions
    SnapTable.vacuum(spark, d, retain = 2) // retires v1, v2
    assert(SnapTable.read(spark, d).count() === 60)
    assert(SnapTable.read(spark, d, Some(3)).count() === 40)
  }

  test("removeOrphanFiles reclaims crash-window leftovers but never " +
      "touches live, staged, or younger-than-horizon files") {
    val d = tmp()
    SnapTable.create((0L until 40L).toDF("id"), d)
    SnapTable.append((40L until 80L).toDF("id"), d)
    val stagedId = SnapTable.stage((100L until 110L).toDF("id"), d)
    val f = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    def plant(rel: String): Unit = {
      val p = new org.apache.hadoop.fs.Path(s"$d/$rel")
      f.mkdirs(p.getParent)
      val o = f.create(p, true); o.write("x".getBytes); o.close()
    }
    // the three crash-window shapes: an uncommitted data file, a
    // leaked segment, a head tmp — plus one YOUNG uncommitted file
    val dead = Seq("data/w-dead99/part-00000.parquet",
      "_snapshots/seg/s99999-dead.seg",
      "_snapshots/v00099.manifest.dead.inprogress")
    (dead :+ "data/w-young/part-00000.parquet").foreach(plant)
    dead.foreach(rel => f.setTimes(
      new org.apache.hadoop.fs.Path(s"$d/$rel"), 1000L, -1))
    val gone = SnapTable.removeOrphanFiles(spark, d, olderThanMs = 60000L)
    assert(gone.toSet === dead.toSet, s"deleted: $gone")
    // live snapshots and time travel untouched
    assert(SnapTable.read(spark, d).count() === 80)
    assert(SnapTable.read(spark, d, Some(1)).count() === 40)
    // the young orphan survives the age guard
    assert(f.exists(new org.apache.hadoop.fs.Path(
      s"$d/data/w-young/part-00000.parquet")))
    // a zero horizon lets the reference set alone protect: the young
    // orphan goes, the staged batch's files SURVIVE and still publish
    val gone2 = SnapTable.removeOrphanFiles(spark, d, olderThanMs = 0L)
    // write-marker _SUCCESS files are unreferenced too — fair game
    assert(gone2.filterNot(_.endsWith("_SUCCESS")) ===
      Seq("data/w-young/part-00000.parquet"), s"deleted: $gone2")
    SnapTable.publish(spark, d, stagedId)
    assert(SnapTable.read(spark, d).count() === 90,
      "the staged batch lost files to the orphan sweep")
  }

  test("a declaration-change spill keeps carried entries' sz: byte-" +
      "size tags (planning must not regress to per-file RPCs)") {
    val d = tmp()
    SnapTable.create(
      (0L until 32L).map(i => (i, i * 3, s"r$i")).toDF("a", "b", "s"), d,
      statsCol = Some("a"))
    val planBase = SnapTable.currentVersion(spark, d)
    SnapTable.append(
      (500L until 516L).map(i => (i, i + 7, s"x$i")).toDF("a", "b", "s"), d)
    // rebase over the interloper: its [a]-annotated entry is carried
    // STRIPPED of positional stats — but the declaration-independent
    // sz: tag must survive the strip
    SnapTable.optimizeZorderFrom(spark, d, 4, "a", "b", planBase)
    val entries = SnapTable.readEntries(spark, d,
      SnapTable.currentVersion(spark, d))
    assert(entries.nonEmpty)
    assert(entries.forall(_.split('\t').exists(_.startsWith("sz:"))),
      s"an entry lost its sz: tag: ${entries.filterNot(
        _.split('\t').exists(_.startsWith("sz:"))).mkString(", ")}")
  }
}
