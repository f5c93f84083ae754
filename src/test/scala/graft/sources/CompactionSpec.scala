package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def df(rows: (String, String, String)*) = {
    val data = rows.map { case (k, t, v) =>
      Row(k, Timestamp.from(Instant.parse(t)), v)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data.toSeq), schema.toStruct)
  }

  private def ts(s: String) = Instant.parse(s)

  private def build(): String = {
    val lake = Files.createTempDirectory("azof-compact").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))
    AzofWriter.commitDelta(spark, lake, "t", df(
      ("1", "2024-02-05T00:00:00Z", "a2"),
      ("3", "2024-02-06T00:00:00Z", "c1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "t", df(
      ("2", "2024-03-10T00:00:00Z", "b2")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
    lake
  }

  private def vals(lake: String, asOf: AsOf): Seq[(String, String)] =
    AzofScan.scan(spark, lake, "t", asOf).select("key", "value")
      .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  private val probes: Seq[AsOf] = Seq(
    AsOf.Current,
    AsOf.EventTime(ts("2024-01-15T00:00:00Z")),
    AsOf.EventTime(ts("2024-02-10T00:00:00Z")),
    AsOf.EventTime(ts("2024-03-15T00:00:00Z")),
    AsOf.EventTime(ts("2023-12-01T00:00:00Z")))

  test("compaction preserves every as-of view and shrinks the Current file set") {
    val lake = build()
    val before = probes.map(vals(lake, _))

    AzofWriter.compact(spark, lake, "t", ts("2024-04-01T00:00:00Z"))

    val after = probes.map(vals(lake, _))
    assert(after == before)

    // Current now resolves to exactly the one compacted base file
    val files = AzofTable(spark, lake, "t").currentSnapshot.dataFiles(AsOf.Current)
    assert(files.size == 1 && files.head.startsWith("compact_s5_")
      && files.head.endsWith(".parquet"))
    assert(AzofTable(spark, lake, "t").currentVersion == "5")

    // and the old version still resolves multiple files for history
    val old = AzofTable(spark, lake, "t").snapshot("4")
    assert(old.dataFiles(AsOf.Current).size == 3)
  }

  test("no as-of gap at the compaction boundary (sub-millisecond instants)") {
    val lake = build()
    val at = ts("2024-04-01T00:00:00Z")
    // probes straddling the boundary at microsecond precision — Spark
    // timestamps are micros, so a closed-child end of `at - 1ms` would
    // leave (at-1ms, at) covered by NO segment and these would go empty
    val gapProbes = Seq(
      at.minusMillis(1),                  // old exclusive end
      at.minusMillis(1).plusNanos(1000),  // strictly inside the old gap
      at.minusNanos(1000),                // 1µs before the boundary
      at,                                 // the boundary itself
      at.plusNanos(1000))                 // just after
    val before = gapProbes.map(t => vals(lake, AsOf.EventTime(t)))
    assert(before.forall(_.nonEmpty))
    AzofWriter.compact(spark, lake, "t", at)
    val after = gapProbes.map(t => vals(lake, AsOf.EventTime(t)))
    assert(after == before)
  }

  test("second commitBase is rejected (base replace would lose data silently)") {
    val lake = build()
    val err = intercept[IllegalArgumentException] {
      AzofWriter.commitBase(spark, lake, "t", df(
        ("9", "2024-03-20T00:00:00Z", "z1")))
    }
    assert(err.getMessage.contains("commitDelta"))
    // compaction opens a fresh (file-bearing) segment; a commitBase after
    // it must still be rejected
    AzofWriter.compact(spark, lake, "t", ts("2024-04-01T00:00:00Z"))
    intercept[IllegalArgumentException] {
      AzofWriter.commitBase(spark, lake, "t", df(
        ("9", "2024-04-20T00:00:00Z", "z1")))
    }
  }

  test("a well-formed foreign snapshot blocks the commit loudly and is never clobbered") {
    val lake = build()
    // a COMPLETE JSON object at the next id that this engine cannot read
    // as a snapshot — possibly a newer engine's committed document, NOT
    // crash debris (that would be truncated JSON, see CrashRecoverySpec):
    // the commit must refuse rather than fork history past it
    val next = AzofTable(spark, lake, "t").currentVersion.toLong + 1
    val f = new java.io.File(new java.io.File(lake, "t"), s"s$next.json")
    java.nio.file.Files.writeString(f.toPath, "{\"racer\": true}")
    val before = java.nio.file.Files.readString(f.toPath)
    val err = intercept[IllegalStateException] {
      AzofWriter.commitDelta(spark, lake, "t", df(
        ("9", "2024-03-20T00:00:00Z", "z1")),
        ts("2024-03-15T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
    }
    assert(err.getMessage.contains("newer engine"))
    // the foreign snapshot survives untouched
    assert(java.nio.file.Files.readString(f.toPath) == before)
  }

  test("a VALID racing snapshot is honored as parse base: loser retries to N+1") {
    val lake = build()
    val t = AzofTable(spark, lake, "t")
    val next = t.currentVersion.toLong + 1
    // simulate a racing writer whose s{next}.json landed but whose
    // version.txt bump hasn't: a valid snapshot carrying a marker entry
    // this commit does not write itself
    val racerSnap = t.currentSnapshot.copy(
      streamBatches =
        t.currentSnapshot.streamBatches + ("racer-app" -> 7L),
      op = Some("racer"))
    AzofWriter.writeSnapshot(spark, s"$lake/t", next.toString, racerSnap)
    val racerPath = java.nio.file.Paths.get(lake, "t", s"s$next.json")
    val racerBytes = java.nio.file.Files.readString(racerPath)

    AzofWriter.commitDelta(spark, lake, "t", df(
      ("9", "2024-03-20T00:00:00Z", "z1")),
      ts("2024-03-15T00:00:00Z"), ts("2024-04-01T00:00:00Z"))

    // the racer's snapshot is never clobbered; the loser lands one past
    // it, and its update is applied ON the racer's state (the marker
    // carries through) — the Delta-log-style optimistic contract
    assert(java.nio.file.Files.readString(racerPath) == racerBytes)
    val after = AzofTable(spark, lake, "t")
    assert(after.currentVersion.toLong == next + 1)
    assert(after.currentSnapshot.streamBatches.get("racer-app").contains(7L))
    assert(vals(lake, AsOf.Current).contains("9" -> "z1"))
  }

  test("commits after compaction layer onto the new open segment") {
    val lake = build()
    AzofWriter.compact(spark, lake, "t", ts("2024-04-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "t", df(
      ("1", "2024-04-10T00:00:00Z", "a3"),
      ("4", "2024-04-11T00:00:00Z", "d1")),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))

    assert(vals(lake, AsOf.Current) ==
      Seq("1" -> "a3", "2" -> "b2", "3" -> "c1", "4" -> "d1"))
    // pre-compaction history still intact
    assert(vals(lake, AsOf.EventTime(ts("2024-02-10T00:00:00Z"))) ==
      Seq("1" -> "a2", "2" -> "b1", "3" -> "c1"))
    // post-compaction, pre-commit point: compacted state
    assert(vals(lake, AsOf.EventTime(ts("2024-04-05T00:00:00Z"))) ==
      Seq("1" -> "a2", "2" -> "b2", "3" -> "c1"))
  }

  test("byKey multi-file compaction restores the point-lookup layout") {
    // a KV-shaped table: 64 keys landed in event-time order, so every
    // pre-compaction file mixes the whole key range and a point lookup
    // must read all of them; compact(byKey) re-clusters the merged
    // state into disjoint key slices
    val lake = Files.createTempDirectory("azof-compact-bykey").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    val keys = (0 until 64).map(i => f"$i%02d")
    // event_time deliberately DE-correlated from the key ((i*17)%60):
    // time-range clustering then mixes the key space, the worst case a
    // byKey re-cluster exists to fix
    def sec(i: Int, month: Int) = f"2024-$month%02d-02T00:00:${(i * 17) % 60}%02dZ"
    AzofWriter.commitBase(spark, lake, "t", df(
      keys.zipWithIndex.map { case (k, i) => (k, sec(i, 1), s"v$k-1") }: _*))
    AzofWriter.commitDelta(spark, lake, "t", df(
      keys.zipWithIndex.map { case (k, i) => (k, sec(i, 2), s"v$k-2") }: _*),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))

    val at = ts("2024-03-01T00:00:00Z")
    val timeProbes = Seq(AsOf.Current,
      AsOf.EventTime(ts("2024-01-15T00:00:00Z")),
      AsOf.EventTime(ts("2024-02-15T00:00:00Z")))
    val before = timeProbes.map(vals(lake, _))
    AzofWriter.compact(spark, lake, "t", at, numFiles = 4, byKey = true)
    assert(timeProbes.map(vals(lake, _)) == before)

    val snap = AzofTable(spark, lake, "t").currentSnapshot
    val all = AzofScan.prunedFiles(snap, AsOf.Current)
    assert(all.size == 4 && all.forall(_.startsWith("compact_s")))
    // every point lookup prunes to exactly ONE merged file via the
    // per-file key stats — the layout commitPartitioned(byKey) promises,
    // now surviving compaction
    keys.foreach { k =>
      val pf = AzofScan.prunedFiles(snap, AsOf.Current,
        Some(KeyFilter.Keys(Set(k))))
      assert(pf.size == 1, s"key $k read ${pf.size} files")
    }
    // and the filtered scan is exact
    val row = AzofScan.scan(spark, lake, "t", AsOf.Current,
      keyFilter = Some(KeyFilter.Keys(Set("07")))).collect()
    assert(row.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq("07" -> "v07-2"))
    // the default (time-clustered) shape instead leaves lookups wide:
    // byKey is a real layout choice, not a no-op
    val lake2 = Files.createTempDirectory("azof-compact-bytime").toString
    AzofWriter.createTable(spark, lake2, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake2, "t", df(
      keys.zipWithIndex.map { case (k, i) => (k, sec(i, 1), s"v$k-1") }: _*))
    AzofWriter.compact(spark, lake2, "t", at, numFiles = 4)
    val snap2 = AzofTable(spark, lake2, "t").currentSnapshot
    assert(AzofScan.prunedFiles(snap2, AsOf.Current,
      Some(KeyFilter.Keys(Set("32")))).size > 1)
  }

  test("main compaction lands past branch commits sharing the id space") {
    val lake = build()                                     // main at v4
    AzofWriter.createBranch(spark, lake, "t", "side")
    AzofWriter.commitDelta(spark, lake, "t", df(
      ("9", "2024-03-15T00:00:00Z", "z1")),
      ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"),
      branch = Some("side"))                               // s5 = branch doc
    val before = AzofScan.scan(spark, lake, "t")
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    // v5 is occupied by the branch commit: compaction must walk past it
    AzofWriter.compact(spark, lake, "t", ts("2024-04-01T00:00:00Z"))
    val t = AzofTable(spark, lake, "t")
    assert(t.currentVersion.toLong == 6L,
      "compact landed past the branch doc at s5")
    val after = AzofScan.scan(spark, lake, "t")
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(after == before, "compaction preserved main's view")
    // the branch is untouched and still publishable
    assert(t.branchHead("side").contains(5L))
  }

  test("branch compaction folds a staged lineage; fast-forward publishes " +
    "the folded tree; main blind until then") {
    val lake = Files.createTempDirectory("azof-bcompact").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1")))                // v2
    AzofWriter.createBranch(spark, lake, "t", "stage")     // fork 2
    // a long-staged lineage: many small deltas (the mirrored-replica
    // shape) plus a staged tombstone
    (1 to 4).foreach { i =>
      AzofWriter.commitDelta(spark, lake, "t", df(
        (s"k$i", f"2024-02-0${i}T00:00:00Z", s"v$i")),
        ts(f"2024-02-0${i}T00:00:00Z"), ts(f"2024-02-0${i + 1}T00:00:00Z"),
        branch = Some("stage"))                            // s3..s6
    }
    val marks = df(("k2", "2024-03-01T00:00:00Z", "x"))
      .withColumn("value",
        org.apache.spark.sql.functions.lit(null).cast("string"))
      .withColumn(TableSchema.DeletedName,
        org.apache.spark.sql.functions.lit(true))
    AzofWriter.commitDelta(spark, lake, "t", marks,
      ts("2024-03-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"),
      branch = Some("stage"))                              // s7

    val t0 = AzofTable(spark, lake, "t")
    val headBefore = t0.branchHead("stage").get
    val filesBefore = t0.snapshot(headBefore.toString)
      .dataFiles(graft.format.AsOf.Current).size
    AzofWriter.compact(spark, lake, "t", ts("2024-04-01T00:00:00Z"),
      branch = Some("stage"))
    val t = AzofTable(spark, lake, "t")
    assert(t.currentVersion.toLong == 2L, "main pointer untouched")
    val head = t.branchHead("stage").get
    assert(head > headBefore, "branch pointer advanced to the compact")
    val headSnap = t.snapshot(head.toString)
    assert(headSnap.branch.contains("stage") &&
      headSnap.parent.contains(headBefore),
      "compact doc carries the branch lineage tags")
    val filesAfter = headSnap.dataFiles(graft.format.AsOf.Current).size
    assert(filesAfter < filesBefore,
      s"folded: $filesBefore files -> $filesAfter")
    // the branch view is unchanged by the fold (k2 stays deleted)
    val staged = AzofScan.scanSnapshot(spark, t, headSnap,
        graft.format.AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(staged == Seq("1" -> "a1", "k1" -> "v1", "k3" -> "v3",
      "k4" -> "v4"))
    // main is still blind; publish lands the folded tree in one commit
    assert(AzofScan.scan(spark, lake, "t")
      .select("key").collect().map(_.getString(0)).toSeq == Seq("1"))
    AzofWriter.fastForward(spark, lake, "t", "stage")
    val published = AzofScan.scan(spark, lake, "t")
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(published == staged, "published ≡ audited folded tree")
    assert(AzofTable(spark, lake, "t").currentSnapshot
      .dataFiles(graft.format.AsOf.Current).size == filesAfter)
  }

  test("branch fold racing branch data commits: deltas always land " +
    "(retry adopts the fold); the fold either lands or fails loudly") {
    for (round <- 1 to 3) {
      val lake = Files.createTempDirectory(s"azof-bfold-race$round").toString
      AzofWriter.createTable(spark, lake, "t", schema,
        ts("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(spark, lake, "t",
        df(("1", "2024-01-02T00:00:00Z", "a1")))                     // v2
      AzofWriter.createBranch(spark, lake, "t", "stage")
      (1 to 3).foreach { i =>
        AzofWriter.commitDelta(spark, lake, "t",
          df((s"k$i", f"2024-02-0${i}T00:00:00Z", s"v$i")),
          ts(f"2024-02-0${i}T00:00:00Z"), ts(f"2024-02-0${i}T00:00:00Z"),
          branch = Some("stage"))
      }
      @volatile var foldErr: Option[Throwable] = None
      val folder = new Thread(() =>
        try AzofWriter.compact(spark, lake, "t",
          ts("2024-03-01T00:00:00Z"), branch = Some("stage"))
        catch { case e: Throwable => foldErr = Some(e) })
      val writer = new Thread(() =>
        // commitMeta's branch path: loses the id race -> retries onto
        // the fold head (the adopted-chain walk), never silently lost
        AzofWriter.commitDelta(spark, lake, "t",
          df(("k9", "2024-04-01T00:00:00Z", "v9")),
          ts("2024-04-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"),
          branch = Some("stage")))
      folder.start(); writer.start(); folder.join(); writer.join()

      // the delta ALWAYS lands; the fold may lose its one-shot id claim
      // (maintenance ops do not retry — rerunnable by contract), but a
      // "successful" fold that dropped the racing delta is the bug this
      // spec exists to catch
      val t = AzofTable(spark, lake, "t")
      val head = t.branchHead("stage").get
      val staged = graft.operators.AzofScan
        .scanSnapshot(spark, t, t.snapshot(head.toString),
          graft.format.AsOf.Current)
        .select("key").collect().map(_.getString(0)).toSet
      assert(staged == Set("1", "k1", "k2", "k3", "k9"),
        s"round $round (fold ${if (foldErr.isEmpty) "landed" else
          s"failed: ${foldErr.get.getMessage.take(60)}"}): $staged")
      assert(AzofTable(spark, lake, "t").currentVersion == "2",
        "main untouched throughout the race")
    }
  }

  test("compacted snapshot JSON round-trips and keeps closed deltas off roots") {
    val lake = build()
    AzofWriter.compact(spark, lake, "t", ts("2024-04-01T00:00:00Z"))
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    assert(SnapshotCodec.parse(SnapshotCodec.render(snap)) == snap)
    // no closed root carries direct deltas (Current-scan leak guard)
    snap.segments.filter(_.end.isDefined).foreach(s => assert(s.delta.isEmpty))
  }

  test("branch fold racing a sibling delta in the branchLineage->freeId " +
    "window ABORTS instead of orphaning the acknowledged delta " +
    "(deterministic injection on the fold's free-id probe)") {
    // The one interleaving the threaded race test cannot pin: a sibling
    // branch delta fully commits (doc + pointer + ack) AFTER the fold
    // read its head but BEFORE the fold scans for a free id — the fold
    // then lands at a HIGHER id with a stale parent, and a blind
    // pointer advance (`raw < nextId`) would strand the sibling BELOW
    // the pointer, unreachable to branchHead's forward-only walk: a
    // lost committed write. The injected FS commits the sibling exactly
    // at the fold's first free-id exists() probe.
    spark.sparkContext.hadoopConfiguration.set(
      "fs.foldfs.impl", classOf[FoldRaceFs].getName)
    spark.conf.set("spark.hadoop.fs.foldfs.impl",
      classOf[FoldRaceFs].getName)
    val local = Files.createTempDirectory("azof-fold-inject").toString
    val lake = s"foldfs:$local"
    AzofWriter.createTable(spark, lake, "t", schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t",
      df(("1", "2024-01-02T00:00:00Z", "a1")))                       // v2
    AzofWriter.createBranch(spark, lake, "t", "stage")               // fork 2
    AzofWriter.commitDelta(spark, lake, "t",
      df(("k1", "2024-02-01T00:00:00Z", "v1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-02-01T00:00:00Z"),
      branch = Some("stage"))                                        // s3
    FoldRaceFs.arm(lake, "t")
    try {
      val e = intercept[IllegalStateException](
        AzofWriter.compact(spark, lake, "t", ts("2024-03-01T00:00:00Z"),
          branch = Some("stage")))
      assert(FoldRaceFs.fired, "the race hook never fired — test is vacuous")
      assert(e.getMessage.contains("fold aborted"), e.getMessage)
      val t = AzofTable(spark, lake, "t")
      // the sibling's acknowledged commit (s4) is the head — NOT lost
      assert(t.branchHead("stage").contains(4L),
        s"sibling delta must stay reachable; head=${t.branchHead("stage")}")
      val staged = AzofScan.scanSnapshot(spark, t, t.snapshot("4"),
          AsOf.Current)
        .select("key").collect().map(_.getString(0)).toSet
      assert(staged == Set("1", "k1", "k9"),
        s"every committed row survives the aborted fold: $staged")
      // the orphan fold document was removed, not left as an ambiguous
      // same-parent sibling for future forward walks
      val fs = new org.apache.hadoop.fs.Path(lake, "t")
        .getFileSystem(spark.sessionState.newHadoopConf())
      assert(!fs.exists(new org.apache.hadoop.fs.Path(lake, "t/s5.json")),
        "aborted fold's snapshot document must be deleted")
      assert(t.currentVersion == "2", "main untouched")
      // the documented runbook: re-running the fold against the new
      // head succeeds and folds BOTH deltas
      AzofWriter.compact(spark, lake, "t", ts("2024-03-01T00:00:00Z"),
        branch = Some("stage"))
      val head2 = t.branchHead("stage").get
      val snap2 = t.snapshot(head2.toString)
      assert(snap2.op.contains("compact") && snap2.parent.contains(4L))
      val folded = AzofScan.scanSnapshot(spark, t, snap2, AsOf.Current)
        .select("key").collect().map(_.getString(0)).toSet
      assert(folded == Set("1", "k1", "k9"))
    } finally FoldRaceFs.disarm()
  }
}

/** RawLocalFileSystem whose first `exists()` probe on a snapshot
  * document under the armed table commits a SIBLING branch delta — the
  * deterministic injection for the fold's branchLineage→freeId race
  * window (the fold has read its head, has not yet picked its id).
  */
class FoldRaceFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "foldfs"
  override def getUri: java.net.URI = java.net.URI.create("foldfs:///")
  override def exists(f: org.apache.hadoop.fs.Path): Boolean = {
    FoldRaceFs.maybeFire(f)
    super.exists(f)
  }
}

object FoldRaceFs {
  @volatile var lake: String = _
  @volatile var table: String = _
  @volatile var fired: Boolean = false
  def arm(l: String, t: String): Unit = { lake = l; table = t; fired = false }
  def disarm(): Unit = { lake = null; table = null }
  def maybeFire(f: org.apache.hadoop.fs.Path): Unit = {
    val n = f.getName
    val armed = lake != null && !fired &&
      n.matches("s\\d+\\.json") && f.toString.contains(s"/$table/")
    if (armed) {
      fired = true
      val sp = org.apache.spark.sql.SparkSession.active
      val st = TableSchema(Seq(
        ColumnDef("value", ColumnType.AzString, nullable = false))).toStruct
      val sibling = sp.createDataFrame(
        sp.sparkContext.parallelize(Seq(Row("k9",
          Timestamp.from(Instant.parse("2024-02-02T00:00:00Z")), "v9"))),
        st)
      AzofWriter.commitDelta(sp, lake, table, sibling,
        Instant.parse("2024-02-02T00:00:00Z"),
        Instant.parse("2024-02-02T00:00:00Z"),
        branch = Some("stage"))
      ()
    }
  }
}
