package graft.sources

import graft.TestSpark
import graft.format._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Tags/rollback under write concurrency: ref commits are metadata-only
  * but ride the SAME optimistic commitMeta retry as data commits, so a
  * tag racing a delta must never lose either effect — the loser
  * re-reads and re-applies on the winner's snapshot. Also pins that a
  * rollback racing a delta keeps BOTH commits in the chain (the later
  * one wins the view, whichever lands second) — the append-only
  * contract's answer to concurrent restore.
  */
class RefsConcurrencySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))
  private val t0 = Instant.parse("2024-01-01T00:00:00Z")
  private def hourTs(h: Int) = t0.plusSeconds(h * 3600L)
  private def df(rows: (String, Int, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, h, v) =>
        Row(k, Timestamp.from(hourTs(h)), v) }),
      schema.toStruct)

  test("a tag racing deltas: every commit lands, refs survive every data commit") {
    val lake = Files.createTempDirectory("azof-refrace").toString
    AzofWriter.createTable(spark, lake, "t", schema, t0)
    AzofWriter.commitDelta(spark, lake, "t", df(("1", 1, "a")),
      hourTs(1), hourTs(1))

    // racers: 3 taggers (distinct names) + 3 delta writers, all at once
    val threads = (1 to 3).map { i =>
      new Thread(() =>
        AzofWriter.tagVersion(spark, lake, "t", s"tag-$i", Some(2L)))
    } ++ (1 to 3).map { i =>
      new Thread(() =>
        AzofWriter.commitDelta(spark, lake, "t", df((s"k$i", 10 + i, s"v$i")),
          hourTs(10 + i), hourTs(10 + i)))
    }
    threads.foreach(_.start()); threads.foreach(_.join())

    val t = AzofTable(spark, lake, "t")
    // 2 (create+delta) + 6 racers = 8 commits, none lost
    assert(t.currentVersion.toLong == 8L, s"at ${t.currentVersion}")
    val snap = t.currentSnapshot
    assert(snap.refs.keySet == Set("tag-1", "tag-2", "tag-3"),
      s"refs lost in the race: ${snap.refs}")
    assert(snap.refs.values.forall(_ == 2L))
    // every delta writer's row is in the current view
    val keys = spark.read.format("azof").option("table", "t").load(lake)
      .select("key").collect().map(_.getString(0)).toSet
    assert(keys == Set("1", "k1", "k2", "k3"))
    // the tag still reads the version-2 state
    assert(spark.read.format("azof").option("table", "t")
      .option("versionAsOf", "tag-2").load(lake)
      .select("key").collect().map(_.getString(0)).toSeq == Seq("1"))
  }

  test("rollback racing a delta: both commits land; the chain stays linear") {
    val lake = Files.createTempDirectory("azof-rbrace").toString
    AzofWriter.createTable(spark, lake, "t", schema, t0)
    AzofWriter.commitDelta(spark, lake, "t", df(("1", 1, "good")),
      hourTs(1), hourTs(1))                                        // v2
    AzofWriter.commitDelta(spark, lake, "t", df(("1", 2, "bad")),
      hourTs(2), hourTs(2))                                        // v3

    val th1 = new Thread(() =>
      AzofWriter.rollback(spark, lake, "t", 2L))
    val th2 = new Thread(() =>
      AzofWriter.commitDelta(spark, lake, "t", df(("2", 5, "x")),
        hourTs(5), hourTs(5)))
    th1.start(); th2.start(); th1.join(); th2.join()

    val t = AzofTable(spark, lake, "t")
    assert(t.currentVersion.toLong == 5L)
    // both effects exist somewhere in the chain: one of v4/v5 is the
    // rollback, the other the delta — and whichever landed SECOND
    // defines the current view (append-only: nothing was erased)
    val ops = Seq(4L, 5L).map(v => t.snapshot(v.toString).op.getOrElse(""))
    assert(ops.toSet == Set("rollback", "commit-delta"), s"ops=$ops")
    val current = spark.read.format("azof").option("table", "t").load(lake)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    if (ops.last == "rollback") {
      // rollback landed second: it re-applied on the delta's snapshot,
      // restoring v2's segment tree — the racer's delta is rolled over
      // but still time-travels
      assert(current == Map("1" -> "good"))
      val v4 = Seq(4L, 5L).find(v =>
        t.snapshot(v.toString).op.contains("commit-delta")).get
      val pre = spark.read.format("azof").option("table", "t")
        .option("versionAsOf", v4.toString).load(lake)
        .select("key").collect().map(_.getString(0)).toSet
      assert(pre.contains("2"))
    } else {
      // delta landed second on the rolled-back snapshot: restored state
      // plus the new key
      assert(current == Map("1" -> "good", "2" -> "x"))
    }
  }
}
