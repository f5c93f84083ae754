package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Hierarchical re-segmentation: repeated compactions must fold closed
  * segments into a financials-style tree instead of accumulating k flat
  * closed roots — snapshot metadata stays O(log k) while every historic
  * as-of view is bit-identical and its pruned file set stays leaf-local.
  */
class RefoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private val t0 = Instant.parse("2024-01-01T00:00:00Z")
  private def hourTs(h: Int) = t0.plusSeconds(h * 3600L)

  private def df(rows: Seq[(String, Int, String)]) = {
    val data = rows.map { case (k, h, v) =>
      Row(k, Timestamp.from(hourTs(h)), v)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema.toStruct)
  }

  private def depth(s: Segment): Int =
    1 + (if (s.segments.isEmpty) 0 else s.segments.map(depth).max)

  test("k compactions: log-size tree, unchanged views, leaf-local pruning") {
    val k = 13
    val lake = Files.createTempDirectory("azof-refold").toString
    AzofWriter.createTable(spark, lake, "t", schema, t0)
    AzofWriter.commitBase(spark, lake, "t",
      df(Seq(("1", 0, "v0"), ("2", 0, "w0"))))

    val probes = (0 to 2 * k + 2).map(hourTs)
    def view(a: AsOf): Seq[(String, String)] =
      AzofScan.scan(spark, lake, "t", a).select("key", "value")
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    def views(as: Seq[AsOf]): Seq[Seq[(String, String)]] = as.map(view)

    for (i <- 1 to k) {
      val h = 2 * i - 1
      AzofWriter.commitDelta(spark, lake, "t",
        df(Seq(("1", h, s"v$i"), ((i % 5 + 2).toString, h, s"x$i"))),
        hourTs(h), hourTs(h + 1))
      // cheap probe set every round (fold boundaries + current); the
      // full historic sweep at the rounds where a fold fires (4, 8, 12)
      val as =
        if (i % 4 == 0 || i == k)
          AsOf.Current +: probes.map(AsOf.EventTime)
        else
          Seq(AsOf.Current, AsOf.EventTime(hourTs(1)),
            AsOf.EventTime(hourTs(2 * i - 2)), AsOf.EventTime(hourTs(h)))
      val before = views(as)
      AzofWriter.compact(spark, lake, "t", hourTs(2 * i))
      assert(views(as) == before, s"compaction $i changed a view")
    }

    val snap = AzofTable(spark, lake, "t").currentSnapshot
    // key-range data skipping keeps working through the folded tree:
    // stats live on the leaves and the fold never drops them
    val hit = AzofScan.scan(spark, lake, "t", AsOf.Current,
        keyFilter = Some(graft.format.KeyFilter.Keys(Set("1"))))
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(hit == Seq("1" -> s"v$k"))
    // folded: 13 closed + 1 open would be 14 flat roots; the base-4
    // counter leaves 3·fold1 + 1 closed + 1 open = at most 8, with one
    // generation-2-capable structure at larger k
    assert(snap.segments.length <= 8,
      s"expected folded roots, got ${snap.segments.length}")
    assert(snap.segments.exists(s => s.id.startsWith("fold")),
      "no fold parent present")
    assert(snap.segments.map(depth).max >= 3, "fold parents should nest")

    // every as-of prunes to a leaf-local file set, never O(k)
    (AsOf.Current +: probes.map(AsOf.EventTime)).foreach { a =>
      val files = snap.dataFiles(a)
      assert(files.size <= 6, s"$a reads ${files.size} files: $files")
    }

    // the folded snapshot round-trips through the codec byte-stably
    assert(SnapshotCodec.parse(SnapshotCodec.render(snap)) == snap)

    // and version history is intact: an as-of through an OLD snapshot
    // (pre-folding) equals the same as-of through the folded head
    val t = AzofTable(spark, lake, "t")
    val oldSnap = t.snapshot((t.currentVersion.toLong - 4).toString)
    val a = AsOf.EventTime(hourTs(5))
    val viaOld = AzofScan.scanSnapshot(spark, t, oldSnap, a)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(viaOld == view(a))
  }

  test("a foreign delta-bearing closed root is never folded (its deltas " +
    "would vanish behind the parent's range check)") {
    // root-level deltas pass only is_before at root level — they
    // contribute to Current and any asOf >= start even when the root's
    // range is long past. Folding such a root under a range-capped
    // parent would hide them. Build that foreign layout by hand.
    val lake = Files.createTempDirectory("azof-refold-foreign").toString
    val dir = s"$lake/t"
    def iso(s: String) = Instant.parse(s)
    AzofWriter.writeDataFile(spark,
      df(Seq(("a", 4, "a1"))), dir, "fileA.parquet")
    AzofWriter.writeDataFile(spark,
      df(Seq(("b", 800, "b1"))), dir, "fileAd.parquet") // ~Feb 3
    AzofWriter.writeDataFile(spark,
      df(Seq(("c", 900, "c1"))), dir, "fileB.parquet")
    AzofWriter.writeDataFile(spark,
      df(Seq(("d", 1600, "d1"))), dir, "fileC.parquet")
    AzofWriter.writeDataFile(spark,
      df(Seq(("e", 2300, "e1"))), dir, "fileD.parquet")
    val segs = Seq(
      // closed root A with a ROOT-LEVEL delta whose window extends past
      // A's end — the foreign shape this engine's compaction never makes
      Segment("A", iso("2024-01-01T00:00:00Z"), Some(iso("2024-01-31T00:00:00Z")),
        Some("fileA.parquet"), Seq.empty,
        Seq(Delta("fileAd.parquet", iso("2024-02-01T00:00:00Z"),
          iso("2024-03-01T00:00:00Z")))),
      Segment("B", iso("2024-02-01T00:00:00Z"), Some(iso("2024-02-28T00:00:00Z")),
        Some("fileB.parquet"), Seq.empty, Seq.empty),
      Segment("C", iso("2024-03-01T00:00:00Z"), Some(iso("2024-03-31T00:00:00Z")),
        Some("fileC.parquet"), Seq.empty, Seq.empty),
      Segment("D", iso("2024-04-01T00:00:00Z"), Some(iso("2024-04-30T00:00:00Z")),
        Some("fileD.parquet"), Seq.empty, Seq.empty),
      Segment("E", iso("2024-05-01T00:00:00Z"), None, None, Seq.empty, Seq.empty))
    AzofWriter.writeSnapshot(spark, dir, "1",
      Snapshot(schema, segs, op = Some("create")))
    AzofWriter.writeVersion(spark, dir, "1")

    def view(a: AsOf): Seq[(String, String)] =
      AzofScan.scan(spark, lake, "t", a).select("key", "value")
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    val probes = Seq(AsOf.Current,
      AsOf.EventTime(iso("2024-01-15T00:00:00Z")),
      AsOf.EventTime(iso("2024-02-15T00:00:00Z")),
      AsOf.EventTime(iso("2024-03-15T00:00:00Z")),
      AsOf.EventTime(iso("2024-05-15T00:00:00Z")))
    val before = probes.map(view)
    // the root delta's row is visible in Current pre-compaction
    assert(before.head.contains("b" -> "b1"))

    AzofWriter.compact(spark, lake, "t", iso("2024-05-20T00:00:00Z"))
    assert(probes.map(view) == before,
      "compaction with refold changed a view of the foreign layout")
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    val rootA = snap.segments.find(_.id == "A")
    assert(rootA.nonEmpty && rootA.get.delta.nonEmpty,
      s"delta-bearing root A must stay at top level; roots: ${snap.segments.map(_.id)}")
    // the delta-free closed roots behind it still folded
    assert(snap.segments.exists(_.id.startsWith("fold")))
  }
}
