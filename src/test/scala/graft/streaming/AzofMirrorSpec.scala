package graft.streaming

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import graft.sources.{AzofChangeFeed, AzofWriter}
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Table-to-table replication including deletes: mirror ≡ source under
  * Current and as-of scans, exactly-once across restarts, atomic
  * per-range application.
  */
class AzofMirrorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def df(rows: (String, String, String)*) = {
    val data = rows.map { case (k, t, v) =>
      Row(k, Timestamp.from(Instant.parse(t)), v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema.toStruct)
  }

  private def ts(s: String) = Instant.parse(s)

  private def scanSorted(lake: String, table: String,
      asOf: AsOf = AsOf.Current): Seq[(String, String)] =
    AzofScan.scan(spark, lake, table, asOf)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("mirror ≡ source across upserts, deletes, restarts") {
    val src = Files.createTempDirectory("azof-mirror-src").toString
    val dst = Files.createTempDirectory("azof-mirror-dst").toString
    val ck = Files.createTempDirectory("azof-mirror-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, src, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1"),
      ("3", "2024-01-04T00:00:00Z", "c1")))                          // v2
    AzofWriter.commitDelta(spark, src, "t",
      df(("1", "2024-02-05T00:00:00Z", "a2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    AzofWriter.commitDelete(spark, src, "t", Seq("2"),
      ts("2024-03-01T00:00:00Z"))                                    // v4

    def sync(): Unit = {
      val q = AzofMirror.replicate(spark, src, "t", dst, "m", ck)
      q.awaitTermination(120000)
      ()
    }
    sync()
    assert(scanSorted(dst, "m") == Seq("1" -> "a2", "3" -> "c1"),
      "mirror Current: upserts applied, deleted key suppressed")
    assert(scanSorted(dst, "m") == scanSorted(src, "t"))
    // as-of semantics carried over: before the delete, key 2 lives
    assert(scanSorted(dst, "m", AsOf.EventTime(ts("2024-02-10T00:00:00Z"))) ==
      scanSorted(src, "t", AsOf.EventTime(ts("2024-02-10T00:00:00Z"))))

    // idle re-sync commits nothing (no re-delivery, no empty commits)
    val vBefore = AzofTable(spark, dst, "m").currentVersion
    sync()
    assert(AzofTable(spark, dst, "m").currentVersion == vBefore)

    // more source activity incl. a re-insert of the deleted key; the
    // mirror follows and stays equivalent at every probe
    AzofWriter.commitDelta(spark, src, "t",
      df(("2", "2024-03-10T00:00:00Z", "b-back")),
      ts("2024-03-05T00:00:00Z"), ts("2024-03-15T00:00:00Z"))        // v5
    AzofWriter.commitDelete(spark, src, "t", Seq("3"),
      ts("2024-03-20T00:00:00Z"))                                    // v6
    sync()
    assert(scanSorted(dst, "m") == Seq("1" -> "a2", "2" -> "b-back"))
    assert(scanSorted(dst, "m") == scanSorted(src, "t"))
    Seq("2024-01-15T00:00:00Z", "2024-03-02T00:00:00Z",
        "2024-03-12T00:00:00Z").foreach { t =>
      assert(scanSorted(dst, "m", AsOf.EventTime(ts(t))) ==
        scanSorted(src, "t", AsOf.EventTime(ts(t))), s"as-of $t diverged")
    }
    // exactly-once: the mirror's own change feed carries no duplicates
    val all = AzofChangeFeed.since(spark, dst, "m", 1L)
      .select("key", "value", "_deleted").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2)))
      .toSeq
    assert(all.size == all.distinct.size, s"duplicate mirrored rows: $all")
    // and the deletes arrived as tombstones, not as dropped rows
    assert(all.count(_._3) == 2)
  }

  test("native-sink mirror (writeStream.toTable) ≡ foreachBatch mirror " +
    "across upserts, deletes, restarts") {
    val src = Files.createTempDirectory("azof-nmir-src").toString
    val dst = Files.createTempDirectory("azof-nmir-dst").toString
    val ck = Files.createTempDirectory("azof-nmir-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, src, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))                          // v2
    AzofWriter.commitDelta(spark, src, "t",
      df(("1", "2024-02-05T00:00:00Z", "a2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    AzofWriter.commitDelete(spark, src, "t", Seq("2"),
      ts("2024-03-01T00:00:00Z"))                                    // v4

    def sync(): Unit = {
      val q = AzofMirror.replicateNative(spark, src, "t", dst, "m", ck)
      q.awaitTermination(120000)
      ()
    }
    sync()
    assert(scanSorted(dst, "m") == Seq("1" -> "a2"),
      "native mirror Current: upsert applied, deleted key suppressed")
    assert(scanSorted(dst, "m") == scanSorted(src, "t"))
    assert(scanSorted(dst, "m", AsOf.EventTime(ts("2024-02-10T00:00:00Z"))) ==
      scanSorted(src, "t", AsOf.EventTime(ts("2024-02-10T00:00:00Z"))))

    // idle re-sync commits nothing (the sink's replay guard + an
    // exhausted feed)
    val vBefore = AzofTable(spark, dst, "m").currentVersion
    sync()
    assert(AzofTable(spark, dst, "m").currentVersion == vBefore)

    // restart from the same checkpoint picks up new commits only —
    // including a re-insert of the tombstoned key
    AzofWriter.commitDelta(spark, src, "t",
      df(("2", "2024-03-10T00:00:00Z", "b-back")),
      ts("2024-03-05T00:00:00Z"), ts("2024-03-15T00:00:00Z"))        // v5
    sync()
    assert(scanSorted(dst, "m") == Seq("1" -> "a2", "2" -> "b-back"))
    assert(scanSorted(dst, "m") == scanSorted(src, "t"))
    // exactly-once: no duplicate rows in the mirror's own change feed
    val all = AzofChangeFeed.since(spark, dst, "m", 1L)
      .select("key", "value", "_deleted").collect()
      .map(r => (r.getString(0), Option(r.getString(1)), r.getBoolean(2)))
      .toSeq
    assert(all.size == all.distinct.size, s"duplicate mirrored rows: $all")
    assert(all.count(_._3) == 1, "the delete arrived as a tombstone")
  }

  test("native mirror staged on a target BRANCH: upserts AND tombstones " +
    "invisible to main until fast-forward publishes the audited replica") {
    val src = Files.createTempDirectory("azof-bmir-src").toString
    val dst = Files.createTempDirectory("azof-bmir-dst").toString
    val ck = Files.createTempDirectory("azof-bmir-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createBranch(spark, dst, "m", "stage")
    AzofWriter.commitBase(spark, src, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))                          // v2
    AzofWriter.commitDelete(spark, src, "t", Seq("2"),
      ts("2024-03-01T00:00:00Z"))                                    // v3

    val q = AzofMirror.replicateNative(spark, src, "t", dst, "m", ck,
      targetBranch = Some("stage"))
    q.awaitTermination(120000)

    val t = AzofTable(spark, dst, "m")
    assert(t.currentVersion == "1", "main pointer untouched by the stage")
    assert(scanSorted(dst, "m").isEmpty, "main blind to the staged replica")
    // the branch head carries the full replica, tombstone included
    val head = t.branchHead("stage").get
    assert(AzofScan.scanSnapshot(spark, t, t.snapshot(head.toString),
        AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq.sorted ==
      Seq("1" -> "a1"))

    AzofWriter.fastForward(spark, dst, "m", "stage")
    assert(scanSorted(dst, "m") == scanSorted(src, "t"),
      "published replica ≡ source, delete semantics preserved")
    assert(scanSorted(dst, "m") == Seq("1" -> "a1"))
  }

  test("mirror FROM a staged branch: the audit mirror tracks the " +
    "staging lineage, blind to diverged main, resumable") {
    val src = Files.createTempDirectory("azof-smir-src").toString
    val dst = Files.createTempDirectory("azof-smir-dst").toString
    val ck = Files.createTempDirectory("azof-smir-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createBranch(spark, src, "t", "stage")
    // main diverges: its rows must NOT reach the audit mirror
    AzofWriter.commitBase(spark, src, "t",
      df(("9", "2024-01-02T00:00:00Z", "m1")))                       // v2 main
    AzofWriter.commitDelta(spark, src, "t",
      df(("1", "2024-02-01T00:00:00Z", "a1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-02-02T00:00:00Z"),
      branch = Some("stage"))                                        // v3 br

    def mirrorOnce(): Unit = {
      val q = AzofMirror.replicate(spark, src, "t", dst, "m", ck,
        sourceBranch = Some("stage"))
      assert(q.awaitTermination(120000))
    }
    mirrorOnce()
    assert(scanSorted(dst, "m") == Seq("1" -> "a1"),
      "staged rows only — diverged main invisible to the audit mirror")

    AzofWriter.commitDelta(spark, src, "t",
      df(("2", "2024-03-01T00:00:00Z", "b1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-03-02T00:00:00Z"),
      branch = Some("stage"))                                        // v4 br
    mirrorOnce()
    assert(scanSorted(dst, "m") == Seq("1" -> "a1", "2" -> "b1"),
      "resume delivers only the new staged commit")
  }

  test("source compaction mid-mirror delivers nothing; post-compaction commits still flow") {
    val src = Files.createTempDirectory("azof-mirror3-src").toString
    val dst = Files.createTempDirectory("azof-mirror3-dst").toString
    val ck = Files.createTempDirectory("azof-mirror3-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, src, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))                          // v2
    AzofWriter.commitDelete(spark, src, "t", Seq("1"),
      ts("2024-02-01T00:00:00Z"))                                    // v3
    def sync(): Unit = {
      val q = AzofMirror.replicate(spark, src, "t", dst, "m", ck)
      q.awaitTermination(120000); ()
    }
    sync()
    assert(scanSorted(dst, "m") == Seq("2" -> "b1"))

    // source compacts: a full rewrite of its live rows — the feed must
    // NOT re-deliver them into the mirror as fresh commits
    AzofWriter.compact(spark, src, "t", ts("2024-03-01T00:00:00Z"))  // v4
    val vBefore = AzofTable(spark, dst, "m").currentVersion
    sync()
    assert(AzofTable(spark, dst, "m").currentVersion == vBefore,
      "a compaction-only range must not commit anything to the mirror")

    // post-compaction source commits flow normally and equivalence holds
    AzofWriter.commitDelta(spark, src, "t",
      df(("3", "2024-03-05T00:00:00Z", "c1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v5
    sync()
    assert(scanSorted(dst, "m") == scanSorted(src, "t"))
    assert(scanSorted(dst, "m") == Seq("2" -> "b1", "3" -> "c1"))
  }

  test("live follower soak: processing-time trigger converges under concurrent commits + compaction; every observed state is a commit boundary") {
    val src = Files.createTempDirectory("azof-mirror-live-src").toString
    val dst = Files.createTempDirectory("azof-mirror-live-dst").toString
    val ck = Files.createTempDirectory("azof-mirror-live-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, src, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1"),
      ("3", "2024-01-04T00:00:00Z", "c1")))                          // v2

    // each source commit range applies atomically to the mirror, so a
    // mirror scan at ANY instant must equal the source's state at SOME
    // commit boundary — never a half-applied range
    val allowed = scala.collection.mutable.ArrayBuffer[Seq[(String, String)]]()
    allowed += Seq.empty          // before the first range lands
    allowed += scanSorted(src, "t")
    def observe(): Unit = {
      val got = scanSorted(dst, "m")
      assert(allowed.contains(got),
        s"mirror state $got matches no source commit boundary:\n$allowed")
    }

    val q = AzofMirror.replicate(spark, src, "t", dst, "m", ck,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("250 milliseconds"),
      maxVersionsPerBatch = Some(2))
    try {
      val steps: Seq[() => Unit] = Seq(
        () => AzofWriter.commitDelta(spark, src, "t",
          df(("1", "2024-02-05T00:00:00Z", "a2")),
          ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z")),   // v3
        () => AzofWriter.commitDelete(spark, src, "t", Seq("2"),
          ts("2024-03-01T00:00:00Z")),                               // v4
        () => AzofWriter.commitDelta(spark, src, "t",
          df(("4", "2024-03-05T00:00:00Z", "d1")),
          ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z")),   // v5
        // compaction mid-stream: rewrites everything, changes nothing
        () => AzofWriter.compact(spark, src, "t",
          ts("2024-04-01T00:00:00Z")),                               // v6
        () => AzofWriter.commitDelete(spark, src, "t", Seq("3"),
          ts("2024-04-02T00:00:00Z")),                               // v7
        () => AzofWriter.commitDelta(spark, src, "t",
          df(("2", "2024-04-10T00:00:00Z", "b2")),                   // resurrect
          ts("2024-04-05T00:00:00Z"), ts("2024-05-01T00:00:00Z")))   // v8
      steps.foreach { step =>
        step()
        allowed += scanSorted(src, "t")
        observe()
        Thread.sleep(300)
        observe()
      }

      // convergence: the live follower reaches the source's Current
      // within the trigger cadence (bounded catch-up: 2 versions/batch)
      val want = scanSorted(src, "t")
      assert(want == Seq("1" -> "a2", "2" -> "b2", "4" -> "d1"))
      val deadline = System.currentTimeMillis() + 120000
      var got = scanSorted(dst, "m")
      while (got != want && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        got = scanSorted(dst, "m")
      }
      assert(got == want, s"mirror failed to converge: $got != $want")

      // event-time agreement at a mid-history cut too
      val cut = AsOf.EventTime(ts("2024-03-02T00:00:00Z"))
      assert(scanSorted(dst, "m", cut) == scanSorted(src, "t", cut))
    } finally q.stop()
  }

  test("a source purge does not propagate; the mirror purges itself to parity") {
    // GDPR across replicas: op="purge" ranges deliver nothing (a
    // rewrite is not data), so after a source purge the mirror still
    // holds the erased key's bytes — the runbook is purgeDeleted on
    // EVERY replica, which reaches the same keys because the
    // tombstones replicated
    val src = Files.createTempDirectory("azof-mirror-purge-src").toString
    val dst = Files.createTempDirectory("azof-mirror-purge-dst").toString
    val ck = Files.createTempDirectory("azof-mirror-purge-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, src, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))                          // v2
    AzofWriter.commitDelete(spark, src, "t", Seq("1"),
      ts("2024-02-01T00:00:00Z"))                                    // v3
    def sync(): Unit = {
      val q = AzofMirror.replicate(spark, src, "t", dst, "m", ck)
      q.awaitTermination(120000); ()
    }
    sync()
    assert(scanSorted(dst, "m") == Seq("2" -> "b1"))

    def keysInFiles(lake: String, table: String): Set[String] = {
      val t = AzofTable(spark, lake, table)
      t.currentSnapshot.allFiles.flatMap { f =>
        spark.read.parquet(
            new org.apache.hadoop.fs.Path(t.tableDir, f).toString)
          .select(TableSchema.KeyName).collect().map(_.getString(0))
      }
    }

    // source purge erases key 1 there...
    AzofWriter.purgeDeleted(spark, src, "t", ts("2024-03-01T00:00:00Z"))
    assert(!keysInFiles(src, "t").contains("1"))
    // ...but the purge range delivers NOTHING to the mirror: the
    // mirror's history (incl. the erased key's bytes) is unchanged
    val vBefore = AzofTable(spark, dst, "m").currentVersion
    sync()
    assert(AzofTable(spark, dst, "m").currentVersion == vBefore,
      "a purge-only range must not commit anything to the mirror")
    assert(keysInFiles(dst, "m").contains("1"),
      "mirror still holds the purged key until it purges itself")

    // the mirror's own purge reaches the same key (its tombstone
    // replicated) and restores parity
    val r = AzofWriter.purgeDeleted(spark, dst, "m",
      ts("2024-03-01T00:00:00Z"))
    assert(r.purgedKeys == 1L)
    assert(!keysInFiles(dst, "m").contains("1"))
    assert(scanSorted(dst, "m") == scanSorted(src, "t"))
    assert(scanSorted(dst, "m", AsOf.EventTime(ts("2024-01-15T00:00:00Z"))) ==
      scanSorted(src, "t", AsOf.EventTime(ts("2024-01-15T00:00:00Z"))))

    // and the mirror stream still works after both purges: a fresh
    // source commit flows normally
    AzofWriter.commitDelta(spark, src, "t",
      df(("3", "2024-03-05T00:00:00Z", "c1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
    sync()
    assert(scanSorted(dst, "m") == Seq("2" -> "b1", "3" -> "c1"))
  }

  test("by-key layouts mirror correctly (overlapping delta windows)") {
    // commitPartitioned(byKey = true) produces files whose event-time
    // windows OVERLAP across commits — the layout the default scan
    // reads event-time-first; the mirror must reproduce the same rows
    val src = Files.createTempDirectory("azof-mirror4-src").toString
    val dst = Files.createTempDirectory("azof-mirror4-dst").toString
    val ck = Files.createTempDirectory("azof-mirror4-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitPartitioned(spark, src, "t", df(
      ("a", "2024-01-10T00:00:00Z", "a1"),
      ("b", "2024-01-20T00:00:00Z", "b1"),
      ("c", "2024-01-15T00:00:00Z", "c1"),
      ("d", "2024-01-05T00:00:00Z", "d1")), numFiles = 2, byKey = true)
    AzofWriter.commitPartitioned(spark, src, "t", df(
      ("a", "2024-01-12T00:00:00Z", "a2"),   // newer -> wins
      ("b", "2024-01-08T00:00:00Z", "b0"),   // older -> loses
      ("e", "2024-01-18T00:00:00Z", "e1")), numFiles = 2, byKey = true)
    val q = AzofMirror.replicate(spark, src, "t", dst, "m", ck)
    q.awaitTermination(120000)
    assert(scanSorted(dst, "m") == scanSorted(src, "t"))
    assert(scanSorted(dst, "m") == Seq("a" -> "a2", "b" -> "b1",
      "c" -> "c1", "d" -> "d1", "e" -> "e1"))
  }

  test("fresh mirror of a vacuumed source: replicate fails loudly, seedAndReplicate reaches parity and resumes") {
    val src = Files.createTempDirectory("azof-mirror-seed-src").toString
    val dst = Files.createTempDirectory("azof-mirror-seed-dst").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, src, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1"),
      ("3", "2024-01-04T00:00:00Z", "c1")))                          // v2
    AzofWriter.commitDelete(spark, src, "t", Seq("2"),
      ts("2024-02-01T00:00:00Z"))                                    // v3
    AzofWriter.commitDelta(spark, src, "t",
      df(("4", "2024-02-05T00:00:00Z", "d1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v4
    // vacuum the early history: retained snapshot floor = 3
    graft.sources.AzofVacuum.vacuum(spark, src, "t", keepLast = 2,
      minAgeMs = 0)

    // a FULL-history mirror of this source is impossible — and must
    // say so, not idle or mis-copy
    AzofWriter.createTable(spark, dst, "m0", schema, ts("2024-01-01T00:00:00Z"))
    val ck0 = Files.createTempDirectory("azof-mirror-seed-ck0").toString
    val q0 = AzofMirror.replicate(spark, src, "t", dst, "m0", ck0)
    val err = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q0.processAllAvailable(); q0.awaitTermination(60000); ()
    }
    q0.stop()
    def messages(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(err).exists(_.contains("retention")))

    // seedAndReplicate: one Current-scan base commit + follow from the
    // seed version
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    val ck = Files.createTempDirectory("azof-mirror-seed-ck").toString
    def sync(): Unit = {
      val q = AzofMirror.seedAndReplicate(spark, src, "t", dst, "m", ck)
      q.awaitTermination(120000); ()
    }
    sync()
    assert(scanSorted(dst, "m") == Seq("1" -> "a1", "3" -> "c1", "4" -> "d1"))
    assert(new java.io.File(ck, "_azof_seed_version").isFile)

    // subsequent source commits (incl. a delete of a SEEDED key) flow
    // through the same checkpoint — the sidecar pins the seed version,
    // so the restart must not re-seed or skip
    AzofWriter.commitDelta(spark, src, "t",
      df(("5", "2024-03-05T00:00:00Z", "e1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v5
    AzofWriter.commitDelete(spark, src, "t", Seq("3"),
      ts("2024-04-01T00:00:00Z"))                                    // v6
    val mVersionAfterSeed = AzofTable(spark, dst, "m").currentVersion.toLong
    sync()
    assert(scanSorted(dst, "m") == scanSorted(src, "t"))
    assert(scanSorted(dst, "m") == Seq("1" -> "a1", "4" -> "d1", "5" -> "e1"))
    // exactly one mixed commit for the (4, 6] range — no re-seed
    assert(AzofTable(spark, dst, "m").currentVersion.toLong ==
      mVersionAfterSeed + 1)
    // as-of from the seed point on agrees with the source
    val cut = AsOf.EventTime(ts("2024-03-10T00:00:00Z"))
    assert(scanSorted(dst, "m", cut) == scanSorted(src, "t", cut))

    // a non-empty mirror with NO seed sidecar refuses loudly
    val ckLost = Files.createTempDirectory("azof-mirror-seed-lost").toString
    val e2 = intercept[IllegalArgumentException] {
      AzofMirror.seedAndReplicate(spark, src, "t", dst, "m", ckLost)
    }
    assert(e2.getMessage.contains("seed"))
  }

  test("a delete-free mirror stays marker-free") {
    val src = Files.createTempDirectory("azof-mirror2-src").toString
    val dst = Files.createTempDirectory("azof-mirror2-dst").toString
    val ck = Files.createTempDirectory("azof-mirror2-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, src, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    val q = AzofMirror.replicate(spark, src, "t", dst, "m", ck)
    q.awaitTermination(120000)
    assert(scanSorted(dst, "m") == Seq("1" -> "a1"))
    // no tombstone-flagged files: the marker column was stripped before
    // the commit, so the mirror's scans read the plain schema
    assert(AzofTable(spark, dst, "m").currentSnapshot.tombstoneFiles.isEmpty)
  }

  test("bounded catch-up crosses a schema-evolution boundary by widening pre-evolution ranges") {
    // a long-lagged mirror with maxVersionsPerBatch starts AFTER the
    // source evolved: its pin is the new schema, but the first
    // catch-up batches end at pre-evolution versions whose schema is
    // narrower — those ranges must widen to the pin (nulls in the
    // added column), not kill a perfectly healthy catch-up
    val src = Files.createTempDirectory("azof-mirror-bevo-src").toString
    val dst = Files.createTempDirectory("azof-mirror-bevo-dst").toString
    val ck = Files.createTempDirectory("azof-mirror-bevo-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, src, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))                          // v2
    AzofWriter.addColumn(spark, src, "t",
      ColumnDef("note", ColumnType.AzString, nullable = true))       // v3
    val evolved = AzofTable(spark, src, "t").currentSnapshot.schema.toStruct
    AzofWriter.commitDelta(spark, src, "t",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row("3",
          Timestamp.from(ts("2024-02-05T00:00:00Z")), "c1", "n1"))),
        evolved),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v4
    val q = AzofMirror.replicate(spark, src, "t", dst, "m", ck,
      maxVersionsPerBatch = Some(1))
    q.awaitTermination(120000)
    val got = AzofScan.scan(spark, dst, "m")
      .select("key", "value", "note").collect()
      .map(r => (r.getString(0), r.getString(1), Option(r.getString(2))))
      .sortBy(_._1).toSeq
    assert(got == Seq(("1", "a1", None), ("2", "b1", None),
      ("3", "c1", Some("n1"))))
  }

  test("source schema evolution: mid-stream fails loudly; restart widens the mirror") {
    val src = Files.createTempDirectory("azof-mirror-evo-src").toString
    val dst = Files.createTempDirectory("azof-mirror-evo-dst").toString
    val ck = Files.createTempDirectory("azof-mirror-evo-ck").toString
    AzofWriter.createTable(spark, src, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.createTable(spark, dst, "m", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, src, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))                          // v2

    // live follower catches up on the pre-evolution schema
    val q = AzofMirror.replicate(spark, src, "t", dst, "m", ck,
      trigger = org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("100 milliseconds"))
    try {
      val deadline = System.currentTimeMillis() + 120000
      while (scanSorted(dst, "m").isEmpty &&
          System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(scanSorted(dst, "m") == Seq("1" -> "a1", "2" -> "b1"))

      // evolve the source mid-stream and commit data with the column
      val evolved = TableSchema(Seq(
        ColumnDef("value", ColumnType.AzString, nullable = false),
        ColumnDef("note", ColumnType.AzString, nullable = true)))
      AzofWriter.addColumn(spark, src, "t",
        ColumnDef("note", ColumnType.AzString, nullable = true))     // v3
      AzofWriter.commitDelta(spark, src, "t",
        spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(Row("3",
            Timestamp.from(ts("2024-02-05T00:00:00Z")), "c1", "n1"))),
          evolved.toStruct),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v4

      // PINNED BEHAVIOR 1: the running stream must die LOUDLY, naming
      // both schema versions and the restart runbook — never silently
      // drop the added column
      val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q.awaitTermination(120000); ()
      }
      def causes(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: causes(x.getCause))
      val msg = causes(ex).map(m => Option(m.getMessage).getOrElse(""))
        .mkString("\n")
      assert(msg.contains("schema changed while this stream was running"))
      // the failing range ends at whichever evolved version the planner
      // saw first (v3 add-column or v4 data) — both name the pin
      assert(msg.contains("at version 2"))
      assert(msg.contains("[key,event_time,value,note]"))
      assert(msg.contains("Restart"))
    } finally scala.util.Try(q.stop())

    // a SECOND evolution lands BEFORE the operator restarts: the WAL
    // batch recovered on restart ends at a version whose schema is
    // NARROWER than the new pin — the source must WIDEN that range to
    // the pin (nulls in the newer columns) instead of throwing forever
    // and wedging the checkpoint
    AzofWriter.addColumn(spark, src, "t",
      ColumnDef("note2", ColumnType.AzString, nullable = true))      // v5

    // PINNED BEHAVIOR 2: a restart on the SAME checkpoint re-pins the
    // (twice-)widened schema, widens the mirror table, and resumes at
    // the checkpointed boundary — no rows lost, no column dropped
    val q2 = AzofMirror.replicate(spark, src, "t", dst, "m", ck)
    q2.awaitTermination(120000)
    assert(AzofTable(spark, dst, "m").currentSnapshot.schema.columns
      .map(_.name) == Seq("value", "note", "note2"))
    def state(): Seq[(String, String, Option[String], Option[String])] =
      AzofScan.scan(spark, dst, "m")
        .select("key", "value", "note", "note2").collect()
        .map(r => (r.getString(0), r.getString(1),
          Option(r.getString(2)), Option(r.getString(3))))
        .sortBy(_._1).toSeq
    assert(state() == Seq(("1", "a1", None, None), ("2", "b1", None, None),
      ("3", "c1", Some("n1"), None)),
      "pre-evolution rows read with null added columns; the new row " +
        "carries its note through the widened replay")
    // and the mirror keeps following on the full new schema
    AzofWriter.commitDelta(spark, src, "t",
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row("1",
          Timestamp.from(ts("2024-03-05T00:00:00Z")), "a2", "n2", "x2"))),
        AzofTable(spark, src, "t").currentSnapshot.schema.toStruct),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))        // v6
    val q3 = AzofMirror.replicate(spark, src, "t", dst, "m", ck)
    q3.awaitTermination(120000)
    assert(state() == Seq(("1", "a2", Some("n2"), Some("x2")),
      ("2", "b1", None, None), ("3", "c1", Some("n1"), None)))
  }
}
