package graft

import org.apache.spark.sql.functions._
import graft.io.SnapTable

/** Seeded randomized op-sequence fuzz for the DV-aware IVM fold — the
  * RulesPropertySpec discipline applied to the round-14 flagship: for
  * ANY interleaving of appends, CoW deletes, merge-on-read deletes,
  * CoW merges, MoR merges, and optimizes, the incremental fold must
  * equal a full rescan at every version, the from-scratch fold must
  * agree, and a vacuum mid-history must only force a re-seed, never a
  * wrong answer. The fixtures (q264 etc.) pin one curated history;
  * this pins the ALGEBRA — added-net-of-dvTo, removed-net-of-dvFrom,
  * sidecar-negative, stacked vectors — against histories nobody
  * hand-picked. */
class SnapTablePropertySpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-snapfuzz").toString + "/t"

  private def rescan(d: String): Map[String, (Long, Long)] =
    SnapTable.read(spark, d).groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("cs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap

  /** One random op; returns a short label for failure messages. */
  private def randomOp(rnd: scala.util.Random, d: String,
      nextId: () => Long): String = {
    def rows(n: Int) = (0 until n).map { _ =>
      (nextId(), s"s${rnd.nextInt(4)}", 1L + rnd.nextInt(100))
    }
    def df(rs: Seq[(Long, String, Long)]) =
      rs.toDF("id", "source", "n_chars")
    def existingIds(k: Int): Seq[Long] = {
      val ids = SnapTable.read(spark, d).select(col("id"))
        .limit(200).collect().map(_.getLong(0)).distinct
      rnd.shuffle(ids.toSeq).take(k)
    }
    rnd.nextInt(6) match {
      case 0 =>
        SnapTable.append(df(rows(3 + rnd.nextInt(5))), d); "append"
      case 1 =>
        val m = 3 + rnd.nextInt(5)
        SnapTable.deleteWhere(spark, d, col("id") % m === rnd.nextInt(m))
        s"deleteWhere(%$m)"
      case 2 =>
        val m = 3 + rnd.nextInt(5)
        SnapTable.deleteWhereMor(spark, d,
          col("id") % m === rnd.nextInt(m))
        s"deleteWhereMor(%$m)"
      case 3 =>
        val upd = existingIds(2).map(i =>
          (i, "merged", 500L + rnd.nextInt(50))) ++ rows(1)
        if (upd.nonEmpty) SnapTable.merge(df(upd), d, "id")
        "merge"
      case 4 =>
        val upd = existingIds(2).map(i =>
          (i, "upserted", 700L + rnd.nextInt(50))) ++ rows(1)
        if (upd.nonEmpty) SnapTable.mergeMor(df(upd), d, "id")
        "mergeMor"
      case 5 =>
        SnapTable.optimize(spark, d, 1 + rnd.nextInt(3)); "optimize"
    }
  }

  test("threaded OCC fuzz: four writers race appends, MoR deletes and " +
      "merges with re-plan-on-conflict; every intended op lands exactly " +
      "once and the DV-aware fold equals the rescan") {
    val d = tmp()
    SnapTable.create((0L until 20L).map(i => (i, "s0", 10L))
      .toDF("id", "source", "n_chars").repartition(2), d)
    // caller-level re-plan + retry is the documented contract for every
    // ConcurrentWriteException; anything else propagates and fails the test
    def retry(op: () => Unit): Unit = {
      var attempts = 0
      while (attempts < 40) {
        try { op(); return }
        catch {
          case _: SnapTable.ConcurrentWriteException =>
            attempts += 1; Thread.sleep(10L * attempts)
        }
      }
      fail("an op conflicted 40 times — livelock")
    }
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until 4).map { i =>
      val base = 1000L * (i + 1)
      new Thread(() => try {
        def df(rs: Seq[(Long, String, Long)]) =
          rs.toDF("id", "source", "n_chars")
        retry(() => SnapTable.append(
          df((0 until 5).map(k => (base + k, s"s${i + 1}", 10L))), d))
        retry(() => SnapTable.deleteWhereMor(spark, d,
          col("id") === base + 1))
        retry(() => SnapTable.merge(
          df(Seq((base + 2, "merged", 99L))), d, "id"))
      } catch { case t: Throwable => failures.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(threads.forall(!_.isAlive), "a writer thread hung past 120s")
    assert(failures.isEmpty, s"writer died: ${failures.peek()}")
    val rows = SnapTable.read(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    val expected = (0L until 20L).map(_ -> ("s0", 10L)).toMap ++
      (0 until 4).flatMap { i =>
        val base = 1000L * (i + 1)
        Seq(base -> (s"s${i + 1}", 10L), base + 2 -> ("merged", 99L),
          base + 3 -> (s"s${i + 1}", 10L), base + 4 -> (s"s${i + 1}", 10L))
      }.toMap
    assert(rows === expected,
      "racing writers lost/duplicated/resurrected rows")
    // the DV-aware fold agrees with the rescan over the raced history
    val folded = SnapTable.ivmFoldSourceStats(spark, d, 0,
      SnapTable.currentVersion(spark, d), Map.empty)
    assert(folded === rescan(d), "fold diverged over the raced history")
  }

  for (seed <- Seq(11, 47)) {
    test(s"fold ≡ rescan under a random 10-op history (seed $seed), " +
        "incrementally at every version and from scratch at the end") {
      val rnd = new scala.util.Random(seed)
      val d = tmp()
      var id = 0L
      def nextId() = { id += 1; id }
      SnapTable.create(
        (0 until 12).map(_ => (nextId(), s"s${rnd.nextInt(4)}",
          1L + rnd.nextInt(100))).toDF("id", "source", "n_chars")
          .repartition(2), d)
      var state = Map.empty[String, (Long, Long)]
      var foldedV = 0
      val trace = new StringBuilder
      (1 to 10).foreach { step =>
        val label = randomOp(rnd, d, () => nextId())
        trace ++= s" $step:$label"
        val cur = SnapTable.currentVersion(spark, d)
        state = SnapTable.ivmFoldSourceStats(spark, d, foldedV, cur, state)
        foldedV = cur
        assert(state === rescan(d),
          s"incremental fold diverged after$trace (v$cur)")
      }
      // from-scratch fold over the whole history agrees
      val fresh = SnapTable.ivmFoldSourceStats(spark, d, 0,
        SnapTable.currentVersion(spark, d), Map.empty)
      assert(fresh === rescan(d), s"from-scratch fold diverged:$trace")
      // vacuum away most of the history: a fresh fold must re-seed
      // from the oldest retained manifest (possibly DV-carrying) and
      // still agree
      SnapTable.vacuum(spark, d, retain = 2)
      val reseeded = SnapTable.ivmFoldSourceStats(spark, d, 0,
        SnapTable.currentVersion(spark, d), Map.empty)
      assert(reseeded === rescan(d), s"post-vacuum re-seed diverged:$trace")
    }
  }

  for (seed <- Seq(13, 29)) {
    test(s"front door ≡ explicit read under a random history and " +
        s"random filters (DV + rename fallback tier, seed $seed)") {
      val rnd = new scala.util.Random(seed)
      val d = tmp()
      var id = 0L
      val nextId = () => { id += 1; id }
      SnapTable.create((0 until 8).map(_ =>
        (nextId(), s"s${rnd.nextInt(4)}", 1L + rnd.nextInt(100)))
        .toDF("id", "source", "n_chars"), d)
      val trace = (1 to 6).map(_ => randomOp(rnd, d, nextId))
        .mkString(", ")
      // rename LAST (the producer ops above speak the old name), then
      // stack one more sidecar so the end state carries a col map AND
      // (usually) deletion vectors — the fallback tier's territory
      SnapTable.renameColumn(spark, d, "n_chars", "chars")
      SnapTable.deleteWhereMor(spark, d, col("id") % 3 === 1)
      val src = spark.read.format("graftsnap").load(d)
      val ref = SnapTable.read(spark, d)
      assert(src.columns.toSeq === ref.columns.toSeq,
        s"front-door schema diverged: ${src.columns.mkString(",")} vs " +
          s"${ref.columns.mkString(",")} ($trace)")
      // random predicates mixing translatable shapes (range, equality,
      // IN, startsWith — re-applied inside the fallback scan) and
      // untranslatable ones (modulo — must cost reads, not rows)
      def leaf(): org.apache.spark.sql.Column = rnd.nextInt(6) match {
        case 0 => col("id") % (2 + rnd.nextInt(5)) === rnd.nextInt(5)
        case 1 => col("chars").between(
          rnd.nextInt(200).toLong, rnd.nextInt(1000).toLong)
        case 2 => col("source") === s"s${rnd.nextInt(5)}"
        case 3 => col("id") > rnd.nextInt(40).toLong
        case 4 => col("source").startsWith("s")
        case 5 => col("chars").isin(
          Seq.fill(3)(1L + rnd.nextInt(100)): _*)
      }
      def pred(): org.apache.spark.sql.Column = rnd.nextInt(3) match {
        case 0 => leaf()
        case 1 => leaf() && leaf()
        case 2 => leaf() || !leaf()
      }
      (1 to 12).foreach { i =>
        val p = pred()
        val a = src.filter(p).collect().map(_.mkString("|")).sorted.toSeq
        val b = ref.filter(p).collect().map(_.mkString("|")).sorted.toSeq
        assert(a === b,
          s"filter #$i diverged (seed $seed; history: $trace; pred: $p)")
      }
    }
  }
}
