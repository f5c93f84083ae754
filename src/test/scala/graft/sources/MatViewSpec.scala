package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted incremental materialized view: after every refresh,
  * serve ≡ the one-shot GROUP BY over the source's LIVE corpus — under
  * inserts (monoid path, no source rescan), group-moving revisions and
  * deletes (additive pre-image subtraction + min/max rescan confined to
  * groups that lost rows), across both merge-guard shapes, with the
  * epoch rebuild as the rollback hatch.
  */
class MatViewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val srcSchema = TableSchema(Seq(
    ColumnDef("grp", ColumnType.AzString, nullable = false),
    ColumnDef("v", ColumnType.AzInt, nullable = false)))

  private val view =
    ViewDef(Seq("grp"), sumCols = Seq("v"), minMaxCols = Seq("v"))

  private def df(rows: (String, String, String, Long)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, g, v) =>
        Row(k, Timestamp.from(Instant.parse(t)), g, v) }),
      srcSchema.toStruct)

  private def ts(s: String) = Instant.parse(s)

  private def mkLake(tag: String): (String, String) = {
    val l = Files.createTempDirectory(s"azof-mv-$tag").toString
    val ck = Files.createTempDirectory(s"azof-mv-$tag-ck").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    (l, ck)
  }

  private def refresh(
      l: String, ck: String, bMax: Long = Long.MaxValue): Unit = {
    val q = MatView.refresh(spark, l, "src", l, "mv", view, ck,
      broadcastKeyMax = bMax)
    assert(q.awaitTermination(120000))
  }

  private def served(l: String, tbl: String = "mv") =
    MatView.serve(spark, l, tbl, view)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  /** One-shot GROUP BY over the lake's LIVE rows. */
  private def oneShot(l: String) =
    AzofScan.scan(spark, l, "src")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v"), max(col("v")).as("max_v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq

  test("bootstrap + insert-only refreshes stay retrain-exact (the " +
    "monoid path: new groups appear, extrema merge without a rescan)") {
    val (l, ck) = mkLake("ins")
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", 10L),
      ("2", "2024-01-02T00:00:00Z", "a", 4L),
      ("3", "2024-01-02T00:00:00Z", "b", 7L)))                       // v2
    refresh(l, ck)
    assert(served(l) == oneShot(l))
    // second batch: extends group a's extrema both ways, adds group c
    AzofWriter.commitDelta(spark, l, "src", df(
      ("4", "2024-02-05T00:00:00Z", "a", 99L),
      ("5", "2024-02-05T00:00:00Z", "a", 1L),
      ("6", "2024-02-05T00:00:00Z", "c", 5L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    assert(served(l) == oneShot(l))
    assert(served(l).map(_._1) == Seq("a", "b", "c"))
  }

  test("a revision that changes the value AND moves the key across " +
    "groups keeps both groups retrain-exact (pre-image subtraction + " +
    "rescan of the group that lost the row)") {
    val (l, ck) = mkLake("rev")
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", 10L),
      ("2", "2024-01-02T00:00:00Z", "a", 4L),
      ("3", "2024-01-02T00:00:00Z", "b", 7L)))                       // v2
    refresh(l, ck)
    // key 1 was group a's MAX holder; it moves to group b with a new
    // value — a must rescan (its max falls to 4), b monoid-merges
    AzofWriter.commitDelta(spark, l, "src", df(
      ("1", "2024-02-05T00:00:00Z", "b", 2L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    assert(served(l) == oneShot(l))
    assert(served(l) == Seq(
      ("a", 1L, 4L, 4L, 4L), ("b", 2L, 9L, 2L, 7L)))
  }

  test("deletes: tombstoning a group's extremum rescans it, and a " +
    "fully-emptied group leaves the served view") {
    val (l, ck) = mkLake("del")
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", 10L),
      ("2", "2024-01-02T00:00:00Z", "a", 4L),
      ("3", "2024-01-02T00:00:00Z", "b", 7L)))                       // v2
    refresh(l, ck)
    AzofWriter.commitDelete(spark, l, "src", Seq("1"),
      ts("2024-02-05T00:00:00Z"))                                    // v3
    refresh(l, ck)
    assert(served(l) == oneShot(l))
    assert(served(l) == Seq(("a", 1L, 4L, 4L, 4L), ("b", 1L, 7L, 7L, 7L)))
    AzofWriter.commitDelete(spark, l, "src", Seq("3"),
      ts("2024-03-05T00:00:00Z"))                                    // v4
    refresh(l, ck)
    assert(served(l) == oneShot(l))
    assert(served(l).map(_._1) == Seq("a"), "emptied group b must leave")
    // and it can come back
    AzofWriter.commitDelta(spark, l, "src", df(
      ("7", "2024-04-05T00:00:00Z", "b", 3L)),
      ts("2024-04-01T00:00:00Z"), ts("2024-05-01T00:00:00Z"))        // v5
    refresh(l, ck)
    assert(served(l) == oneShot(l))
  }

  test("one catch-up batch spanning insert+revision+delete commits " +
    "counts only the END state, on BOTH merge-guard shapes") {
    def build(tag: String, bMax: Long) = {
      val (l, ck) = mkLake(tag)
      AzofWriter.commitBase(spark, l, "src", df(
        ("1", "2024-01-02T00:00:00Z", "a", 10L),
        ("2", "2024-01-02T00:00:00Z", "b", 4L)))                     // v2
      refresh(l, ck, bMax)
      // three commits, ONE refresh: key 1 revised twice (intermediate
      // version must never count), key 2 deleted, key 3 inserted
      AzofWriter.commitDelta(spark, l, "src", df(
        ("1", "2024-02-05T00:00:00Z", "a", 50L),
        ("3", "2024-02-05T00:00:00Z", "c", 6L)),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))      // v3
      AzofWriter.commitDelta(spark, l, "src", df(
        ("1", "2024-03-05T00:00:00Z", "b", 8L)),
        ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))      // v4
      AzofWriter.commitDelete(spark, l, "src", Seq("2"),
        ts("2024-04-05T00:00:00Z"))                                  // v5
      refresh(l, ck, bMax)
      (served(l), oneShot(l))
    }
    val (sBc, oBc) = build("cu-bc", Long.MaxValue)
    assert(sBc == oBc)
    val (sSh, oSh) = build("cu-sh", 0L) // every batch exceeds the budget
    assert(sSh == oSh)
    assert(sBc == sSh, "broadcast and shuffle guard shapes must agree")
  }

  test("multi-column groups and multiple aggregate columns") {
    val schema2 = TableSchema(Seq(
      ColumnDef("g1", ColumnType.AzString, nullable = false),
      ColumnDef("g2", ColumnType.AzInt, nullable = false),
      ColumnDef("x", ColumnType.AzInt, nullable = false),
      ColumnDef("y", ColumnType.AzInt, nullable = false)))
    val v2 = ViewDef(Seq("g1", "g2"), sumCols = Seq("x", "y"),
      minMaxCols = Seq("y"))
    val l = Files.createTempDirectory("azof-mv-multi").toString
    val ck = Files.createTempDirectory("azof-mv-multi-ck").toString
    AzofWriter.createTable(spark, l, "src", schema2,
      ts("2024-01-01T00:00:00Z"))
    def rows(rs: (String, String, Long, Long, Long)*) =
      spark.createDataFrame(
        spark.sparkContext.parallelize(rs.map { case (k, g1, g2, x, y) =>
          Row(k, Timestamp.from(Instant.parse("2024-01-02T00:00:00Z")),
            g1, g2, x, y) }),
        schema2.toStruct)
    AzofWriter.commitBase(spark, l, "src", rows(
      ("1", "a", 1L, 10L, 100L), ("2", "a", 1L, 20L, 50L),
      ("3", "a", 2L, 30L, 60L), ("4", "b", 1L, 40L, 70L)))           // v2
    val q = MatView.refresh(spark, l, "src", l, "mv2", v2, ck)
    assert(q.awaitTermination(120000))
    AzofWriter.commitDelete(spark, l, "src", Seq("1"),
      ts("2024-02-05T00:00:00Z"))                                    // v3
    val q2 = MatView.refresh(spark, l, "src", l, "mv2", v2, ck)
    assert(q2.awaitTermination(120000))
    val got = MatView.serve(spark, l, "mv2", v2)
      .orderBy("g1", "g2").collect().map(_.toSeq).toSeq
    val want = AzofScan.scan(spark, l, "src")
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("n_rows"), sum(col("x")).as("sum_x"),
        sum(col("y")).as("sum_y"), min(col("y")).as("min_y"),
        max(col("y")).as("max_y"))
      .orderBy("g1", "g2").collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("viewSchema refuses nullable or non-Int aggregate columns and " +
    "unknown names") {
    val s = TableSchema(Seq(
      ColumnDef("g", ColumnType.AzString, nullable = false),
      ColumnDef("nv", ColumnType.AzInt, nullable = true),
      ColumnDef("sv", ColumnType.AzString, nullable = false)))
    intercept[IllegalArgumentException] {
      MatView.viewSchema(s, ViewDef(Seq("g"), sumCols = Seq("nv")))
    }
    intercept[IllegalArgumentException] {
      MatView.viewSchema(s, ViewDef(Seq("g"), minMaxCols = Seq("sv")))
    }
    intercept[IllegalArgumentException] {
      MatView.viewSchema(s, ViewDef(Seq("g"), sumCols = Seq("absent")))
    }
    intercept[IllegalArgumentException] { ViewDef(Nil) }
  }

  test("the min/max rescan is FILE-CONFINED on a value-clustered " +
    "layout: the counting FS opens only the churned group's files") {
    spark.sparkContext.hadoopConfiguration.set(
      "fs.mvfs.impl", classOf[MvCountingFs].getName)
    spark.conf.set("spark.hadoop.fs.mvfs.impl",
      classOf[MvCountingFs].getName)
    val local = Files.createTempDirectory("azof-mv-count").toString
    val l = s"mvfs:$local"
    val ck = Files.createTempDirectory("azof-mv-count-ck").toString
    AzofWriter.createTable(spark, l, "src", srcSchema,
      ts("2024-01-01T00:00:00Z"))
    // one file per GROUP (disjoint key ranges too): per-file value
    // stats then separate the groups, so the rescan's In pushdown can
    // file-skip
    def batch(g: String, at: String) = df(
      (1 to 6).map(i => (s"$g$i", at, g, (i * 10).toLong)): _*)
    AzofWriter.commitBase(spark, l, "src",
      batch("a", "2024-01-10T00:00:00Z"))
    Seq("b", "c", "d", "e", "f").zipWithIndex.foreach { case (g, i) =>
      AzofWriter.commitDelta(spark, l, "src",
        batch(g, f"2024-01-${11 + i}%02dT00:00:00Z"),
        ts(f"2024-01-${11 + i}%02dT00:00:00Z"),
        ts(f"2024-01-${11 + i}%02dT00:00:00Z"))
    }
    refresh(l, ck) // bootstrap: reads everything, uncounted
    val dataFiles = AzofTable(spark, l, "src").currentSnapshot
      .dataFiles(graft.format.AsOf.Current).size
    assert(dataFiles >= 6, s"clustered corpus expected, got $dataFiles")
    // delete group a's MAX holder — a must rescan, nothing else
    AzofWriter.commitDelete(spark, l, "src", Seq("a6"),
      ts("2024-02-05T00:00:00Z"))
    MvCountingFs.reset()
    refresh(l, ck)
    val opened = MvCountingFs.srcDataFiles
    assert(opened.nonEmpty, "counting FS saw no reads — vacuous")
    assert(opened.size <= 3 && opened.size < dataFiles,
      s"rescan must be confined to the churned group's files: opened " +
        s"${opened.size} of $dataFiles: $opened")
    assert(served(l) == oneShot(l))
    assert(served(l).find(_._1 == "a").get == ("a", 5L, 150L, 10L, 50L))
  }

  test("rebuildEpoch after a source rollback serves the rolled-back " +
    "live state (the no-feed-event reconciliation hatch)") {
    val (l, ck) = mkLake("rb")
    AzofWriter.commitBase(spark, l, "src", df(
      ("1", "2024-01-02T00:00:00Z", "a", 10L),
      ("2", "2024-01-02T00:00:00Z", "b", 4L)))                       // v2
    refresh(l, ck)
    AzofWriter.commitDelta(spark, l, "src", df(
      ("3", "2024-02-05T00:00:00Z", "c", 6L)),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))        // v3
    refresh(l, ck)
    AzofWriter.rollback(spark, l, "src", 2L)                         // v4
    MatView.rebuildEpoch(spark, l, "src", l, "mv_e2", view,
      ts("2024-06-01T00:00:00Z"))
    assert(served(l, "mv_e2") == oneShot(l))
    assert(served(l, "mv_e2").map(_._1) == Seq("a", "b"))
  }
}

/** RawLocalFileSystem counting distinct parquet data files opened under
  * the `src` table — the file-confinement pin for the MatView min/max
  * rescan on a value-clustered layout.
  */
class MvCountingFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "mvfs"
  override def getUri: java.net.URI = java.net.URI.create("mvfs:///")
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int)
      : org.apache.hadoop.fs.FSDataInputStream = {
    MvCountingFs.record(f)
    super.open(f, bufferSize)
  }
}

object MvCountingFs {
  val opened = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def record(f: org.apache.hadoop.fs.Path): Unit = {
    val s = f.toString
    if (s.contains("/src/") && s.endsWith(".parquet")) { opened.add(s); () }
  }
  def reset(): Unit = opened.clear()
  def srcDataFiles: Set[String] = {
    import scala.jdk.CollectionConverters._
    opened.asScala.toSet
  }
}
