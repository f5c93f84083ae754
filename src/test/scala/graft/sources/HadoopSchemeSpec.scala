package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** A scheme-qualified Hadoop filesystem for tests: identical storage to
  * the local FS but addressed as `testdfs:/...` URIs. Any code path that
  * drops the Hadoop `Path`/`FileSystem` abstraction — string-concatenates
  * paths, round-trips through `java.io.File`, or assumes scheme-less
  * spellings — fails loudly against it, which is exactly the point.
  */
class TestDfsFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "testdfs"
  override def getUri: java.net.URI = java.net.URI.create("testdfs:///")
}

/** The writer → scan → compact → vacuum round-trip must behave
  * identically over any Hadoop filesystem, not just the default local
  * one. Parameterized over the implicit local scheme and the custom
  * `testdfs:` scheme (RawLocalFileSystem-backed, so it also skips the
  * Checksum layer — a second behavioral variant of create/rename).
  */
class HadoopSchemeSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = TestSpark.spark
    s.sparkContext.hadoopConfiguration.set(
      "fs.testdfs.impl", classOf[TestDfsFileSystem].getName)
    s.conf.set("spark.hadoop.fs.testdfs.impl",
      classOf[TestDfsFileSystem].getName)
    s
  }

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def ts(s: String) = Instant.parse(s)

  private def df(rows: (String, String, String)*) = {
    val data = rows.map { case (k, t, v) =>
      Row(k, Timestamp.from(ts(t)), v)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq), schema.toStruct)
  }

  /** Full lifecycle on one lakehouse URI; returns the observed views. */
  private def roundTrip(lake: String): Seq[Seq[(String, String)]] = {
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))
    AzofWriter.commitDelta(spark, lake, "t", df(
      ("1", "2024-02-05T00:00:00Z", "a2"),
      ("3", "2024-02-06T00:00:00Z", "c1")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    AzofWriter.commitPartitioned(spark, lake, "t", df(
      ("4", "2024-03-05T00:00:00Z", "d1"),
      ("5", "2024-03-20T00:00:00Z", "e1")), numFiles = 2)
    def view(a: AsOf) =
      AzofScan.scan(spark, lake, "t", a).select("key", "value")
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    val probes = Seq(AsOf.Current,
      AsOf.EventTime(ts("2024-01-15T00:00:00Z")),
      AsOf.EventTime(ts("2024-02-15T00:00:00Z")))
    val before = probes.map(view)
    AzofWriter.compact(spark, lake, "t", ts("2024-03-10T00:00:00Z"))
    val after = probes.map(view)
    assert(after == before, s"$lake: compaction changed a view")
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("extra", ColumnType.AzString, nullable = true))
    AzofVacuum.vacuum(spark, lake, "t", keepLast = 1, minAgeMs = 0)
    val afterVacuum = probes.map(view)
    assert(afterVacuum == before, s"$lake: vacuum changed a view")
    // key lookup through per-file stats works over this scheme too
    val hit = AzofScan.scan(spark, lake, "t", AsOf.Current,
        keyFilter = Some(KeyFilter.Keys(Set("4"))))
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(hit == Seq("4" -> "d1"), s"$lake: key lookup broke")
    // delete + physical purge run over this scheme too — and since the
    // table was compacted AND schema-evolved above, this also crosses
    // purge with both (per-file rewrite preserves each file's own
    // schema; the purge reaches rows inside the closed child)
    AzofWriter.commitDelete(spark, lake, "t", Seq("1"),
      ts("2024-04-01T00:00:00Z"))
    val purged = AzofWriter.purgeDeleted(spark, lake, "t",
      ts("2024-05-01T00:00:00Z"))
    assert(purged.purgedKeys == 1L, s"$lake: purge missed the deleted key")
    val afterPurge = probes.map(view)
    assert(afterPurge == before.map(_.filterNot(_._1 == "1")),
      s"$lake: purge must remove exactly key 1 from every as-of")
    AzofVacuum.vacuum(spark, lake, "t", keepLast = 1, minAgeMs = 0)
    assert(probes.map(view) == afterPurge, s"$lake: post-purge vacuum changed a view")
    before
  }

  test("lifecycle is scheme-agnostic: local path ≡ testdfs:// URIs") {
    val localRoot = Files.createTempDirectory("azof-fs-local").toString
    val dfsRoot = "testdfs:" + Files.createTempDirectory("azof-fs-dfs").toString

    val localViews = roundTrip(localRoot)
    val dfsViews = roundTrip(dfsRoot)
    assert(localViews == dfsViews)

    // the testdfs table really lives behind the scheme: its snapshot
    // addresses resolve through the Hadoop FS, and the reader surface
    // accepts the qualified URI end to end
    val viaReader = spark.read.format("azof")
      .option("table", "t").load(dfsRoot)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    assert(viaReader == localViews.head.filterNot(_._1 == "1"))
  }

  test("streaming sink appId is stable across scheme respellings") {
    val ck = Files.createTempDirectory("azof-fs-ck").toString
    val bare = graft.streaming.AzofSink.appIdFor(ck)
    assert(graft.streaming.AzofSink.appIdFor(s"file:$ck") == bare)
    assert(graft.streaming.AzofSink.appIdFor(s"file://$ck") == bare)
    assert(graft.streaming.AzofSink.appIdFor(ck + "/") == bare)
  }
}
