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

  test("compacted snapshot JSON round-trips and keeps closed deltas off roots") {
    val lake = build()
    AzofWriter.compact(spark, lake, "t", ts("2024-04-01T00:00:00Z"))
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    assert(SnapshotCodec.parse(SnapshotCodec.render(snap)) == snap)
    // no closed root carries direct deltas (Current-scan leak guard)
    snap.segments.filter(_.end.isDefined).foreach(s => assert(s.delta.isEmpty))
  }
}
