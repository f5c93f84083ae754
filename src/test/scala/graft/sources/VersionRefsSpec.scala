package graft.sources

import graft.TestSpark
import graft.format._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Named version refs (tags) + append-only rollback:
  *
  *   - `AzofWriter.tagVersion` records `tag -> version` in the
  *     snapshot's `refs` ext field (carried forward by every commit);
  *     `VERSION AS OF '<tag>'` resolves through the CURRENT snapshot on
  *     every read surface (reader option, catalog SQL, change-feed
  *     bounds), and vacuum retains tagged documents + their files
  *     regardless of `keepLast`.
  *   - `AzofWriter.rollback` restores an earlier version's schema +
  *     segment tree as a NEW commit, preserving the head's
  *     `streamBatches` (replay protection stays monotone), the union
  *     of `retired`, and the head's `refs`; it refuses when the target
  *     references physically-removed files, and the change feed skips
  *     the rollback commit (its rows were fed when first committed).
  */
class VersionRefsSpec extends AnyFunSuite {
  private lazy val lake = Files.createTempDirectory("azof-refs").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.refs", classOf[AzofCatalog].getName)
    s.conf.set("spark.sql.catalog.refs.path", lake)
    s
  }

  private def ts(s: String) = Instant.parse(s)
  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def df(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, v) =>
        Row(k, Timestamp.from(ts(t)), v) }),
      schema.toStruct)

  /** create + one delta per row group, returning nothing; version after
    * = 1 + groups.size
    */
  private def mk(table: String, groups: Seq[Seq[(String, String, String)]]): Unit = {
    AzofWriter.createTable(spark, lake, table, schema,
      ts("2024-01-01T00:00:00Z"))
    groups.foreach { rows =>
      AzofWriter.commitDelta(spark, lake, table, df(rows: _*),
        ts(rows.map(_._2).min), ts(rows.map(_._2).max))
    }
  }

  private def values(table: String, versionSpec: Option[String]): Seq[(String, String)] = {
    val r = versionSpec.foldLeft(
      spark.read.format("azof").option("table", table)) {
        (b, v) => b.option("versionAsOf", v)
      }.load(lake)
    r.select("key", "value").collect()
      .map(x => (x.getString(0), x.getString(1))).sorted.toSeq
  }

  test("tag resolves on the reader option, catalog SQL, and stays put as the table moves") {
    mk("t1", Seq(
      Seq(("1", "2024-01-05T00:00:00Z", "a")),
      Seq(("2", "2024-01-06T00:00:00Z", "b"))))
    // tag the CURRENT version (3 = create + 2 deltas), by default
    val v = AzofWriter.tagVersion(spark, lake, "t1", "release-1")
    assert(v == 4, s"tag commit should land at 4, got $v")
    // table moves on
    AzofWriter.commitDelta(spark, lake, "t1",
      df(("1", "2024-02-05T00:00:00Z", "a2")),
      ts("2024-02-05T00:00:00Z"), ts("2024-02-05T00:00:00Z"))
    // reader option: the tag pins the pre-move state
    assert(values("t1", Some("release-1")) == Seq("1" -> "a", "2" -> "b"))
    // catalog SQL VERSION AS OF '<tag>'
    val got = spark.sql(
      "SELECT key, value FROM refs.t1 VERSION AS OF 'release-1'")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(got == Seq("1" -> "a", "2" -> "b"))
    // current reads the moved state
    assert(values("t1", None) == Seq("1" -> "a2", "2" -> "b"))
    // numeric specs still resolve as plain versions
    assert(values("t1", Some("3")) == Seq("1" -> "a", "2" -> "b"))
  }

  test("tag name/target validation: digits-only, whitespace, unknown, missing target") {
    mk("t2", Seq(Seq(("1", "2024-01-05T00:00:00Z", "a"))))
    intercept[IllegalArgumentException] {
      AzofWriter.tagVersion(spark, lake, "t2", "123")
    }
    intercept[IllegalArgumentException] {
      AzofWriter.tagVersion(spark, lake, "t2", " padded ")
    }
    intercept[IllegalArgumentException] {
      AzofWriter.tagVersion(spark, lake, "t2", "")
    }
    // tagging a version that does not exist on disk
    val e = intercept[IllegalArgumentException] {
      AzofWriter.tagVersion(spark, lake, "t2", "ghost", Some(99L))
    }
    assert(e.getMessage.contains("99"))
    // resolving an unknown tag names the known ones
    AzofWriter.tagVersion(spark, lake, "t2", "known")
    val e2 = intercept[IllegalArgumentException] { values("t2", Some("nope")) }
    assert(e2.getMessage.contains("known"), e2.getMessage)
  }

  test("retag requires replace; idempotent re-tag commits nothing; untag removes") {
    mk("t3", Seq(
      Seq(("1", "2024-01-05T00:00:00Z", "a")),
      Seq(("1", "2024-01-06T00:00:00Z", "b"))))
    AzofWriter.tagVersion(spark, lake, "t3", "pin", Some(2L))
    // idempotent: same tag -> same target commits no new version
    val before = AzofTable(spark, lake, "t3").currentVersion.toLong
    assert(AzofWriter.tagVersion(spark, lake, "t3", "pin", Some(2L)) == before)
    assert(AzofTable(spark, lake, "t3").currentVersion.toLong == before)
    // moving it without replace refuses
    val e = intercept[IllegalArgumentException] {
      AzofWriter.tagVersion(spark, lake, "t3", "pin", Some(3L))
    }
    assert(e.getMessage.contains("replace"))
    // with replace it moves
    AzofWriter.tagVersion(spark, lake, "t3", "pin", Some(3L), replace = true)
    assert(values("t3", Some("pin")) == Seq("1" -> "b"))
    // untag removes; unknown untag refuses
    AzofWriter.untagVersion(spark, lake, "t3", "pin")
    intercept[IllegalArgumentException] { values("t3", Some("pin")) }
    val e2 = intercept[IllegalArgumentException] {
      AzofWriter.untagVersion(spark, lake, "t3", "pin")
    }
    assert(e2.getMessage.contains("no such tag"))
  }

  test("refs round-trip the codec; malformed foreign values degrade away") {
    val snap = Snapshot(schema, Seq(
      Segment("2024", ts("2024-01-01T00:00:00Z"), None, None, Nil, Nil)),
      refs = Map("release-1" -> 3L, "audit" -> 7L))
    val parsed = SnapshotCodec.parse(SnapshotCodec.render(snap))
    assert(parsed.refs == Map("release-1" -> 3L, "audit" -> 7L))
    // foreign writer minted a non-integral ref value: the tag degrades
    // away, the table survives
    val doctored = SnapshotCodec.render(snap)
      .replace("\"audit\" : 7", "\"audit\" : \"seven\"")
    assert(SnapshotCodec.parse(doctored).refs == Map("release-1" -> 3L))
    // refs absent entirely = empty map (pre-refs tables)
    assert(SnapshotCodec.parse(SnapshotCodec.render(
      snap.copy(refs = Map.empty))).refs.isEmpty)
  }

  test("vacuum retains tagged versions and their files; untag releases them") {
    mk("t4", Seq(
      Seq(("1", "2024-01-05T00:00:00Z", "a")),
      Seq(("1", "2024-01-06T00:00:00Z", "b")),
      Seq(("1", "2024-01-07T00:00:00Z", "c"))))
    // tag version 2 (after the first delta: value "a")
    AzofWriter.tagVersion(spark, lake, "t4", "audit-2024", Some(2L))
    val r = AzofVacuum.vacuum(spark, lake, "t4", keepLast = 1, minAgeMs = 0)
    assert(r.retainedSnapshots.contains(2),
      s"tagged s2 must be retained: $r")
    assert(!r.deletedSnapshots.contains(2))
    // the tagged view still reads — document AND data files survived
    assert(values("t4", Some("audit-2024")) == Seq("1" -> "a"))
    // untag; now the next vacuum expires it
    AzofWriter.untagVersion(spark, lake, "t4", "audit-2024")
    val r2 = AzofVacuum.vacuum(spark, lake, "t4", keepLast = 1, minAgeMs = 0)
    assert(r2.deletedSnapshots.contains(2), s"untagged s2 should expire: $r2")
    intercept[Exception] { values("t4", Some("2")) }
  }

  test("rollback restores the old view as a new commit; history intact; appends win after") {
    mk("t5", Seq(
      Seq(("1", "2024-01-05T00:00:00Z", "a"), ("2", "2024-01-05T06:00:00Z", "x")),
      Seq(("1", "2024-01-06T00:00:00Z", "bad"))))
    assert(values("t5", None) == Seq("1" -> "bad", "2" -> "x"))
    val v = AzofWriter.rollback(spark, lake, "t5", 2L)
    assert(v == 4)
    // current view = version 2's view
    assert(values("t5", None) == Seq("1" -> "a", "2" -> "x"))
    // the rolled-back-over version still time-travels
    assert(values("t5", Some("3")) == Seq("1" -> "bad", "2" -> "x"))
    // a post-rollback append wins (commit-seq: new delta outranks)
    AzofWriter.commitDelta(spark, lake, "t5",
      df(("1", "2024-01-07T00:00:00Z", "good")),
      ts("2024-01-07T00:00:00Z"), ts("2024-01-07T00:00:00Z"))
    assert(values("t5", None) == Seq("1" -> "good", "2" -> "x"))
    // op is stamped for the change feed's classification
    assert(AzofTable(spark, lake, "t5").snapshot("4").op.contains("rollback"))
  }

  test("rollback preserves stream replay protection and the union of retired names") {
    mk("t6", Seq(Seq(("1", "2024-01-05T00:00:00Z", "a"))))
    // column evolution: add c2 at v3, then drop it at v4
    AzofWriter.addColumn(spark, lake, "t6",
      ColumnDef("c2", ColumnType.AzString, nullable = true))
    AzofWriter.dropColumn(spark, lake, "t6", "c2")
    // a streaming sink stamps batch 5
    assert(graft.streaming.AzofSink.commitBatch(lake, "t6",
      df(("9", "2024-01-08T00:00:00Z", "s")).toDF(), 5L, "appA"))
    // roll back to v2 (before the add/drop)
    AzofWriter.rollback(spark, lake, "t6", 2L)
    val snap = AzofTable(spark, lake, "t6").currentSnapshot
    // replay protection survives the rollback: batch 5 is a replay
    assert(snap.streamBatches.get("appA").contains(5L))
    assert(!graft.streaming.AzofSink.commitBatch(lake, "t6",
      df(("9", "2024-01-08T00:00:00Z", "s")).toDF(), 5L, "appA"))
    // retired union survives: c2's bytes never lived in files here, but
    // the name was dropped at head — it stays refused after rollback
    assert(snap.retired.contains("c2"))
    intercept[IllegalArgumentException] {
      AzofWriter.addColumn(spark, lake, "t6",
        ColumnDef("c2", ColumnType.AzString, nullable = true))
    }
    // and the rolled-back schema no longer declares it
    assert(!snap.schema.columns.exists(_.name == "c2"))
  }

  test("rollback refuses when the target's files were physically removed") {
    mk("t7", Seq(
      Seq(("1", "2024-01-05T00:00:00Z", "a")),
      Seq(("1", "2024-01-06T00:00:00Z", "b"))))
    // compact rewrites, then vacuum physically removes the old deltas
    AzofWriter.compact(spark, lake, "t7", ts("2024-06-01T00:00:00Z"))
    AzofVacuum.vacuum(spark, lake, "t7", keepLast = 1, minAgeMs = 0)
    val e = intercept[IllegalArgumentException] {
      AzofWriter.rollback(spark, lake, "t7", 2L)
    }
    assert(e.getMessage.contains("does not exist") ||
      e.getMessage.contains("no longer exist"), e.getMessage)
  }

  test("change feed skips the rollback commit; tags resolve in changesFrom") {
    mk("t8", Seq(
      Seq(("1", "2024-01-05T00:00:00Z", "a")),
      Seq(("2", "2024-01-06T00:00:00Z", "b"))))
    AzofWriter.tagVersion(spark, lake, "t8", "base", Some(2L))
    AzofWriter.rollback(spark, lake, "t8", 2L)
    // feed from v3 (tag commit) onward: the rollback commit adds no rows
    val rows = spark.read.format("azof").option("table", "t8")
      .option("changesFrom", "3").load(lake).collect()
    assert(rows.isEmpty, s"rollback must feed no rows, got ${rows.length}")
    // tag name as a changesFrom bound: everything after v2 = delta of
    // key 2 (the tag/rollback commits feed nothing)
    val tagged = spark.read.format("azof").option("table", "t8")
      .option("changesFrom", "base").load(lake)
      .select("key").collect().map(_.getString(0)).toSeq
    assert(tagged == Seq("2"), s"got $tagged")
  }

  test("CALL system.tag / untag / rollback from SQL") {
    mk("t9", Seq(
      Seq(("1", "2024-01-05T00:00:00Z", "a")),
      Seq(("1", "2024-01-06T00:00:00Z", "b"))))
    val r = spark.sql(
      "CALL refs.system.tag(`table` => 't9', name => 'v-good', version => 2)")
      .collect()(0)
    assert(r.getString(0) == "v-good" && r.getLong(1) == 2L)
    assert(spark.sql(
      "SELECT value FROM refs.t9 VERSION AS OF 'v-good'")
      .collect().map(_.getString(0)).toSeq == Seq("a"))
    // default target = current version
    val r2 = spark.sql(
      "CALL refs.system.tag(`table` => 't9', name => 'head')").collect()(0)
    assert(r2.getLong(1) == r2.getLong(2) - 1)
    val rb = spark.sql(
      "CALL refs.system.rollback(`table` => 't9', to_version => 2)")
      .collect()(0)
    assert(rb.getLong(0) == 2L)
    assert(spark.sql("SELECT value FROM refs.t9").collect()
      .map(_.getString(0)).toSeq == Seq("a"))
    val ut = spark.sql(
      "CALL refs.system.untag(`table` => 't9', name => 'v-good')").collect()(0)
    assert(ut.getString(0) == "v-good")
    intercept[Exception] {
      spark.sql("SELECT value FROM refs.t9 VERSION AS OF 'v-good'").collect()
    }
  }

  test("CALL system.rollback accepts a tag; exactly one target required") {
    mk("t10", Seq(
      Seq(("1", "2024-01-05T00:00:00Z", "good")),
      Seq(("1", "2024-01-06T00:00:00Z", "bad"))))
    AzofWriter.tagVersion(spark, lake, "t10", "known-good", Some(2L))
    val r = spark.sql(
      "CALL refs.system.rollback(`table` => 't10', tag => 'known-good')")
      .collect()(0)
    assert(r.getLong(0) == 2L)
    assert(spark.sql("SELECT value FROM refs.t10").collect()
      .map(_.getString(0)).toSeq == Seq("good"))
    // both targets, or neither, refuse
    intercept[Exception] {
      spark.sql("CALL refs.system.rollback(`table` => 't10', " +
        "to_version => 2, tag => 'known-good')").collect()
    }
    intercept[Exception] {
      spark.sql("CALL refs.system.rollback(`table` => 't10')").collect()
    }
  }
}
