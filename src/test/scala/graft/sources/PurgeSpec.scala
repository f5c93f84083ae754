package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Physical purge of deleted history ([[AzofWriter.purgeDeleted]]) —
  * the GDPR-erase semantics, pinned:
  *
  *   - a key whose CURRENT winner is a tombstone at-or-before `before`
  *     vanishes from ALL history (post-purge view at every as-of);
  *   - live keys — including delete-then-resurrect — are identical at
  *     every as-of;
  *   - tombstones newer than `before` are retained (undo window);
  *   - the purged keys' bytes are absent from every file the new
  *     snapshot references, and after vacuum expires the pre-purge
  *     snapshots, absent from the table directory entirely.
  */
class PurgeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def ts(s: String) = Instant.parse(s)

  private def df(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, v) =>
        Row(k, Timestamp.from(ts(t)), v) }),
      schema.toStruct)

  private def current(lake: String): Seq[(String, String)] =
    AzofScan.scan(spark, lake, "t", AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  private def asOf(lake: String, t: String): Seq[(String, String)] =
    AzofScan.scan(spark, lake, "t", AsOf.EventTime(ts(t)))
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  /** Every key value present in any file the CURRENT snapshot names. */
  private def keysInReferencedFiles(lake: String): Set[String] = {
    val t = AzofTable(spark, lake, "t")
    val dir = t.tableDir
    t.currentSnapshot.allFiles.flatMap { f =>
      spark.read.parquet(new org.apache.hadoop.fs.Path(dir, f).toString)
        .select(TableSchema.KeyName).collect().map(_.getString(0))
    }
  }

  /** Every key value present in any parquet anywhere in the table dir. */
  private def keysOnDisk(lake: String): Set[String] = {
    val dir = java.nio.file.Paths.get(
      new org.apache.hadoop.fs.Path(lake, "t").toUri.getPath)
    java.nio.file.Files.list(dir).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
      .flatMap(p => spark.read.parquet(p)
        .select(TableSchema.KeyName).collect().map(_.getString(0)))
      .toSet
  }

  private def build(): String = {
    val lake = Files.createTempDirectory("azof-purge").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1"),
      ("3", "2024-01-04T00:00:00Z", "c1"),
      ("4", "2024-01-05T00:00:00Z", "d1")))                          // v2
    AzofWriter.commitDelta(spark, lake, "t", df(
      ("1", "2024-01-12T00:00:00Z", "a2"),
      ("5", "2024-01-13T00:00:00Z", "e1")),
      ts("2024-01-10T00:00:00Z"), ts("2024-01-20T00:00:00Z"))        // v3
    AzofWriter.commitDelete(spark, lake, "t", Seq("1", "2"),
      ts("2024-02-01T00:00:00Z"))                                    // v4
    AzofWriter.commitDelta(spark, lake, "t", df(
      ("1", "2024-02-10T00:00:00Z", "a3")),
      ts("2024-02-05T00:00:00Z"), ts("2024-02-15T00:00:00Z"))        // v5: resurrect 1
    AzofWriter.commitDelete(spark, lake, "t", Seq("5"),
      ts("2024-03-01T00:00:00Z"))                                    // v6
    lake
  }

  test("purge erases deleted keys from all history; live keys identical at every as-of") {
    val lake = build()
    // pre-purge expectations
    assert(current(lake) == Seq("1" -> "a3", "3" -> "c1", "4" -> "d1"))
    assert(asOf(lake, "2024-01-15T00:00:00Z") == Seq("1" -> "a2",
      "2" -> "b1", "3" -> "c1", "4" -> "d1", "5" -> "e1"))

    // purge window Feb 15: key 2 qualifies (tombstone Feb 1 is its
    // winner); key 1 was resurrected (winner = data row) — untouched;
    // key 5's tombstone (Mar 1) is newer than the window — retained
    val r = AzofWriter.purgeDeleted(spark, lake, "t",
      ts("2024-02-15T00:00:00Z"))
    assert(r.purgedKeys == 1L)
    assert(AzofTable(spark, lake, "t").currentSnapshot.op.contains("purge"))

    // live keys: identical at every as-of; key 2: absent from all
    // history (post-purge view); key 5: still travels, still suppressed
    assert(current(lake) == Seq("1" -> "a3", "3" -> "c1", "4" -> "d1"))
    assert(asOf(lake, "2024-01-15T00:00:00Z") == Seq("1" -> "a2",
      "3" -> "c1", "4" -> "d1", "5" -> "e1"),
      "purged key 2 must be absent; live keys untouched")
    assert(asOf(lake, "2024-01-04T00:00:00Z") == Seq("1" -> "a1",
      "3" -> "c1"))
    assert(asOf(lake, "2024-02-20T00:00:00Z") == Seq("1" -> "a3",
      "3" -> "c1", "4" -> "d1", "5" -> "e1"))

    // the purged key's bytes are gone from every referenced file —
    // data rows AND its tombstone row
    assert(!keysInReferencedFiles(lake).contains("2"),
      "key 2 bytes survive in a referenced file")

    // idempotent: a second purge in the same window finds nothing
    assert(AzofWriter.purgeDeleted(spark, lake, "t",
      ts("2024-02-15T00:00:00Z")).purgedKeys == 0L)

    // widening the window purges key 5 too
    val r2 = AzofWriter.purgeDeleted(spark, lake, "t",
      ts("2024-04-01T00:00:00Z"))
    assert(r2.purgedKeys == 1L)
    assert(!keysInReferencedFiles(lake).contains("5"))
    assert(asOf(lake, "2024-01-15T00:00:00Z") == Seq("1" -> "a2",
      "3" -> "c1", "4" -> "d1"))
    assert(current(lake) == Seq("1" -> "a3", "3" -> "c1", "4" -> "d1"))
  }

  test("purge + vacuum: the purged keys' bytes leave the table directory") {
    val lake = build()
    AzofWriter.purgeDeleted(spark, lake, "t", ts("2024-04-01T00:00:00Z"))
    // pre-vacuum: pre-purge snapshots still reference the old files, so
    // the bytes are still on disk (documented), just unreferenced by
    // the current snapshot
    assert(keysOnDisk(lake).intersect(Set("2", "5")).nonEmpty,
      "old files should remain until vacuum expires their snapshots")

    val rep = AzofVacuum.vacuum(spark, lake, "t", keepLast = 1,
      minAgeMs = 0)
    assert(rep.deletedDataFiles.nonEmpty)
    // the takedown runbook's end state: purged keys' bytes are gone
    // from the TABLE DIRECTORY, not just the current tree
    assert(keysOnDisk(lake).intersect(Set("2", "5")).isEmpty,
      "purged keys' bytes survive vacuum")
    // and the table still scans correctly everywhere
    assert(current(lake) == Seq("1" -> "a3", "3" -> "c1", "4" -> "d1"))
    assert(asOf(lake, "2024-01-15T00:00:00Z") == Seq("1" -> "a2",
      "3" -> "c1", "4" -> "d1"))
  }

  test("purge composes with compaction: closed segments rewrite too") {
    val lake = build()
    AzofWriter.compact(spark, lake, "t", ts("2024-02-20T00:00:00Z"))   // v7
    val r = AzofWriter.purgeDeleted(spark, lake, "t",
      ts("2024-04-01T00:00:00Z"))
    assert(r.purgedKeys == 2L, "keys 2 and 5 purge through the compacted tree")
    assert(keysInReferencedFiles(lake).intersect(Set("2", "5")).isEmpty)
    assert(current(lake) == Seq("1" -> "a3", "3" -> "c1", "4" -> "d1"))
    assert(asOf(lake, "2024-01-15T00:00:00Z") == Seq("1" -> "a2",
      "3" -> "c1", "4" -> "d1"))
  }

  test("purge races a concurrent delta commit: both land, neither is lost") {
    // the subtle bit: purge builds its file mapping from one snapshot
    // but commitMeta may re-apply it against a RACING writer's — the
    // racer's new files must pass through untouched while every
    // purge-known file still swaps
    val lake = build()
    val vBefore = AzofTable(spark, lake, "t").currentVersion.toLong
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val purger = new Thread(() =>
      try { AzofWriter.purgeDeleted(spark, lake, "t",
        ts("2024-04-01T00:00:00Z")); () }
      catch { case e: Throwable => failures.add(e); () })
    val writer = new Thread(() =>
      try AzofWriter.commitDelta(spark, lake, "t",
        df(("9", "2024-03-10T00:00:00Z", "z1")),
        ts("2024-03-05T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
      catch { case e: Throwable => failures.add(e); () })
    purger.start(); writer.start()
    purger.join(120000); writer.join(120000)
    assert(failures.isEmpty,
      s"racer died: ${Option(failures.peek()).map(_.toString)}")

    // both commits landed
    assert(AzofTable(spark, lake, "t").currentVersion.toLong == vBefore + 2)
    // the racer's row is visible, the purged keys are gone everywhere
    assert(current(lake) == Seq("1" -> "a3", "3" -> "c1", "4" -> "d1",
      "9" -> "z1"))
    assert(keysInReferencedFiles(lake).intersect(Set("2", "5")).isEmpty,
      "purge lost files to the race")
    assert(asOf(lake, "2024-01-15T00:00:00Z") == Seq("1" -> "a2",
      "3" -> "c1", "4" -> "d1"))
  }

  test("purge reaches fixpoint through an injected concurrent compaction") {
    // deterministic injection of the one documented race: a compaction
    // committing BETWEEN the purge's read snapshot and its commit
    // copies purged keys into new base/carry files the purge's mapping
    // does not cover. The hook guard runs a compaction at Jan 15 right
    // before the purge snapshot publishes — key 2's tombstone (Feb 1)
    // is AFTER the compaction point, so the merged base carries 2's
    // data and the carry-forward delta carries its tombstone: exactly
    // the bytes a single pass would leave behind. purgeDeleted must
    // detect the compaction in its window and erase them with no
    // operator second pass.
    val lake = build()
    PurgeRaceHook.arm(lake, "t", ts("2024-01-15T00:00:00Z"))
    val prev = spark.conf.getOption("spark.azof.commitGuard.file")
    spark.conf.set("spark.azof.commitGuard.file",
      classOf[CompactInjectingGuard].getName)
    try {
      val r = AzofWriter.purgeDeleted(spark, lake, "t",
        ts("2024-02-15T00:00:00Z"))
      assert(PurgeRaceHook.fired, "the race hook never fired — test is vacuous")
      assert(r.purgedKeys == 1L) // key 2, counted once across passes
      // the compaction-carried copies are gone too — the single-pass
      // failure mode this fixpoint exists for
      assert(!keysInReferencedFiles(lake).contains("2"),
        "compaction-carried bytes of key 2 survived the purge fixpoint")
      // both the compaction and the purge history landed
      val t = AzofTable(spark, lake, "t")
      assert(t.currentSnapshot.op.contains("purge"))
      // live keys unaffected at every probe; purged key absent from all
      // history (same pins as the unraced case)
      assert(current(lake) == Seq("1" -> "a3", "3" -> "c1", "4" -> "d1"))
      assert(asOf(lake, "2024-01-15T00:00:00Z") == Seq("1" -> "a2",
        "3" -> "c1", "4" -> "d1", "5" -> "e1"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.azof.commitGuard.file", v)
        case None    => spark.conf.unset("spark.azof.commitGuard.file")
      }
      PurgeRaceHook.disarm()
    }
  }

  // ---- randomized property: purge ≡ model-minus-purged at every probe

  private val t0 = Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
  private val hour = 3600L * 1000

  private val stepGen: Gen[(String, Int, Option[String])] = for {
    k <- Gen.chooseNum(1, 5)
    h <- Gen.chooseNum(0, 96)
    del <- Gen.prob(0.35)
    v <- Gen.alphaStr.map(s => s"v${s.take(3)}")
  } yield (k.toString, h, if (del) None else Some(v))

  private val caseGen = for {
    n <- Gen.chooseNum(3, 20)
    steps <- Gen.listOfN(n, stepGen)
    compactAt <- Gen.option(Gen.chooseNum(1, 96))
    beforeH <- Gen.chooseNum(0, 98)
    probes <- Gen.listOfN(4, Gen.chooseNum(-1, 98))
  } yield (steps, compactAt, beforeH, probes)

  test("random interleavings: post-purge scan == model minus purged keys at every probe") {
    for (seed <- 1 to 8) {
      val (steps0, compactAt, beforeH, probes) =
        caseGen.apply(Gen.Parameters.default, Seed(seed.toLong)).get
      val steps = steps0.distinctBy(_._2) // unambiguous ordering
      if (steps.nonEmpty) {
        val lake = Files.createTempDirectory("azof-pprop").toString
        AzofWriter.createTable(spark, lake, "p", schema,
          Instant.ofEpochMilli(t0))
        steps.foreach { case (k, h, upsert) =>
          upsert match {
            case Some(v) =>
              val d = spark.createDataFrame(
                spark.sparkContext.parallelize(
                  Seq(Row(k, new Timestamp(t0 + h * hour), v))),
                schema.toStruct)
              AzofWriter.commitDelta(spark, lake, "p", d,
                Instant.ofEpochMilli(t0 + h * hour),
                Instant.ofEpochMilli(t0 + (h + 1) * hour))
            case None =>
              AzofWriter.commitDelete(spark, lake, "p", Seq(k),
                Instant.ofEpochMilli(t0 + h * hour))
          }
        }
        compactAt.foreach { c =>
          AzofWriter.compact(spark, lake, "p",
            Instant.ofEpochMilli(t0 + c * hour - 1))
        }

        // purged = keys whose CURRENT winner is a tombstone <= beforeH
        val purged: Set[String] =
          steps.groupBy(_._1).collect { case (k, rs)
            if { val (_, h, up) = rs.maxBy(_._2); up.isEmpty && h <= beforeH }
            => k }.toSet

        val rep = AzofWriter.purgeDeleted(spark, lake, "p",
          Instant.ofEpochMilli(t0 + beforeH * hour))
        assert(rep.purgedKeys == purged.size.toLong,
          s"seed $seed: purged ${rep.purgedKeys}, model says ${purged.size}")

        def model(probeH: Int): Seq[(String, Long, String)] =
          steps.filter(_._2 <= probeH).groupBy(_._1).toSeq.flatMap {
            case (k, rs) =>
              val (_, h, up) = rs.maxBy(_._2)
              up.filter(_ => !purged.contains(k))
                .map(v => (k, t0 + h * hour, v))
          }.sortBy(_._1)

        def scan(probeH: Int): Seq[(String, Long, String)] =
          AzofScan.scan(spark, lake, "p",
              AsOf.EventTime(Instant.ofEpochMilli(t0 + probeH * hour)))
            .select("key", "event_time", "value").collect()
            .map(r => (r.getString(0), r.getTimestamp(1).getTime,
              r.getString(2)))
            .sortBy(_._1).toSeq

        probes.foreach { p =>
          assert(scan(p) == model(p),
            s"seed $seed probe $p diverged after purge@$beforeH " +
              s"(purged=$purged, steps: $steps)")
        }
        // bytes: no purged key in any referenced file
        val t = AzofTable(spark, lake, "p")
        val leaked = t.currentSnapshot.allFiles.flatMap { f =>
          spark.read.parquet(
              new org.apache.hadoop.fs.Path(t.tableDir, f).toString)
            .select(TableSchema.KeyName).collect().map(_.getString(0))
        }.toSet.intersect(purged)
        assert(leaked.isEmpty, s"seed $seed: purged keys $leaked still on file")
      }
    }
  }
}

/** Arming state for [[CompactInjectingGuard]] (static because the guard
  * is instantiated reflectively by scheme config).
  */
object PurgeRaceHook {
  @volatile var lake: String = _
  @volatile var table: String = _
  @volatile var compactAt: Instant = _
  @volatile var fired = false
  def arm(l: String, t: String, at: Instant): Unit = {
    lake = l; table = t; compactAt = at; fired = false
  }
  def disarm(): Unit = { lake = null; fired = false }
}

/** Test guard: on the FIRST snapshot publish to the armed table after
  * arming (the purge's commit — the test sequences no other commit),
  * runs a compaction against the same table and only then lets the
  * publish proceed — deterministically recreating "compaction committed
  * between the purge's read snapshot and its commit". The inner
  * compaction's own publishes pass straight through (fired flag).
  */
class CompactInjectingGuard extends CommitGuard {
  override def publish(
      fs: org.apache.hadoop.fs.FileSystem,
      tmp: org.apache.hadoop.fs.Path,
      target: org.apache.hadoop.fs.Path): Boolean = {
    val armed = Option(PurgeRaceHook.lake).exists(l =>
      target.toString.contains(
        new org.apache.hadoop.fs.Path(l, PurgeRaceHook.table).toString))
    if (armed && !PurgeRaceHook.fired) {
      PurgeRaceHook.fired = true
      AzofWriter.compact(
        org.apache.spark.sql.SparkSession.active,
        PurgeRaceHook.lake, PurgeRaceHook.table, PurgeRaceHook.compactAt)
    }
    CommitGuard.Rename.publish(fs, tmp, target)
  }
}
