package graft.sources

import graft.TestSpark
import graft.format._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** SQL metadata tables ([[AzofMetadataTables]]): `cat.t.history`,
  * `cat.t.files`, `cat.t.refs` — Iceberg-convention introspection
  * through the same DSv2 catalog that serves the data, driver-sized by
  * construction (snapshot docs + one directory listing).
  */
class MetadataTablesSpec extends AnyFunSuite {
  private lazy val lake = Files.createTempDirectory("azof-meta").toString
  private lazy val spark = {
    val s = TestSpark.spark
    s.conf.set("spark.sql.catalog.meta", classOf[AzofCatalog].getName)
    s.conf.set("spark.sql.catalog.meta.path", lake)
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

  private def mk(table: String): Unit = {
    AzofWriter.createTable(spark, lake, table, schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, table,
      df(("1", "2024-01-05T00:00:00Z", "a")),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-05T00:00:00Z"))
    AzofWriter.commitDelete(spark, lake, table, Seq("1"),
      ts("2024-01-08T00:00:00Z"))
  }

  test("history: one row per snapshot, ops + file counts + tags + current marker") {
    mk("h1")
    AzofWriter.tagVersion(spark, lake, "h1", "pin", Some(2L))
    val rows = spark.sql(
      "SELECT version, op, data_files, tagged_as, is_current " +
        "FROM meta.h1.history ORDER BY version").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getString(1)).toSeq ==
      Seq("create", "commit-delta", "commit-delete", "tag"))
    // file counts grow with the data commits, not the tag commit
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 1L, 2L, 2L))
    assert(rows.map(r => Option(r.getString(3))).toSeq ==
      Seq(None, Some("pin"), None, None))
    assert(rows.map(_.getBoolean(4)).toSeq ==
      Seq(false, false, false, true))
    // committed_at is populated from the document's mtime
    val at = spark.sql(
      "SELECT committed_at FROM meta.h1.history WHERE version = 2")
      .collect()(0).getTimestamp(0)
    assert(at != null && math.abs(
      at.getTime - System.currentTimeMillis()) < 3600L * 1000)
  }

  test("files: current snapshot's registered files with stats and sizes") {
    mk("f1")
    val rows = spark.sql(
      "SELECT file, kind, tombstone, seq, key_min, key_max, rows, " +
        "size_bytes FROM meta.f1.files ORDER BY file").collect()
    assert(rows.length == 2, rows.mkString("; "))
    assert(rows.forall(_.getString(1) == "delta"))
    assert(rows.forall(_.getLong(7) > 0), "sizes come from the listing")
    assert(rows.forall(r => r.getString(4) == "1" && r.getString(5) == "1"))
    // exactly one tombstone delta, and seq is stamped on both
    assert(rows.count(_.getBoolean(2)) == 1)
    assert(rows.map(_.getLong(3)).toSet == Set(2L, 3L))
    // per-file row counts from the commit stats pass (1 row each here)
    assert(rows.forall(r => !r.isNullAt(6) && r.getLong(6) == 1L))
  }

  test("refs: tags AND branch heads, typed; empty when neither exists") {
    mk("r1")
    assert(spark.sql("SELECT * FROM meta.r1.refs").collect().isEmpty)
    AzofWriter.tagVersion(spark, lake, "r1", "b-tag", Some(1L))
    AzofWriter.tagVersion(spark, lake, "r1", "a-tag", Some(2L))
    AzofWriter.createBranch(spark, lake, "r1", "audit")   // forks at v5
    AzofWriter.commitDelta(spark, lake, "r1",
      df(("2", "2024-02-05T00:00:00Z", "b")),
      ts("2024-02-05T00:00:00Z"), ts("2024-02-05T00:00:00Z"),
      branch = Some("audit"))                             // s6, on-branch
    val rows = spark.sql(
      "SELECT name, type, version FROM meta.r1.refs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(rows == Seq(("a-tag", "tag", 2L), ("audit", "branch", 6L),
      ("b-tag", "tag", 1L)))
    // history carries the lineage columns: the branch doc names its
    // branch and parent; main docs chain parents on the main walk
    val hist = spark.sql(
      "SELECT version, branch, parent FROM meta.r1.history ORDER BY version")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(hist.last == ((6L, Some("audit"), Some(5L))))
    assert(hist.filter(_._2.isEmpty).map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    // a PINNED refs view is historical snapshot state: tags only
    val pinned = spark.sql(
      "SELECT name, type FROM meta.r1.refs VERSION AS OF 5").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(pinned == Seq(("a-tag", "tag"), ("b-tag", "tag")))
  }

  test("VERSION AS OF pins files/refs to the snapshot; history refuses the pin") {
    mk("v1")   // v1 create, v2 delta, v3 delete
    AzofWriter.tagVersion(spark, lake, "v1", "t2", Some(2L))  // v4
    // files at version 2: just the data delta, no tombstone yet
    val at2 = spark.sql(
      "SELECT file, tombstone FROM meta.v1.files VERSION AS OF 2").collect()
    assert(at2.length == 1 && !at2(0).getBoolean(1))
    // ... and a TAG resolves as the version spec
    assert(spark.sql(
      "SELECT file FROM meta.v1.files VERSION AS OF 't2'").collect()
      .length == 1)
    // refs at version 3 (before the tag commit): empty
    assert(spark.sql(
      "SELECT * FROM meta.v1.refs VERSION AS OF 3").collect().isEmpty)
    // current refs show the tag
    assert(spark.sql("SELECT name FROM meta.v1.refs").collect()
      .map(_.getString(0)).toSeq == Seq("t2"))
    // history already spans versions: the pin refuses loudly
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM meta.v1.history VERSION AS OF 2").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("spans all versions")), msgs(e))
  }

  test("reader surface: .option(\"meta\", ...) serves the same views") {
    mk("m1")
    AzofWriter.tagVersion(spark, lake, "m1", "pin", Some(2L))
    def rd(kind: String, v: Option[String] = None) = {
      val b = spark.read.format("azof").option("table", "m1")
        .option("meta", kind)
      v.fold(b)(b.option("versionAsOf", _)).load(lake)
    }
    // same rows as the catalog surface, column for column
    val viaCat = spark.sql(
      "SELECT * FROM meta.m1.history ORDER BY version").collect().toSeq
    val viaRdr = rd("history").orderBy("version").collect().toSeq
    assert(viaRdr == viaCat)
    assert(rd("refs").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("pin", "tag", 2L)))
    // version pin (by tag) on files
    assert(rd("files", Some("pin")).collect().length == 1)
    // unknown view name refuses; history refuses the pin
    intercept[Exception] { rd("nope").collect() }
    intercept[Exception] { rd("history", Some("2")).collect() }
  }

  test("DESCRIBE EXTENDED surfaces version/op/file/tag properties; TIMESTAMP AS OF on a view refuses") {
    mk("d1")
    AzofWriter.tagVersion(spark, lake, "d1", "p", Some(2L))  // v4
    val props = spark.sql("DESCRIBE TABLE EXTENDED meta.d1").collect()
      .find(_.getString(0) == "Table Properties").map(_.getString(1))
      .getOrElse("")
    assert(props.contains("format=azof") && props.contains("version=4") &&
      props.contains("op=tag") && props.contains("tags=1"), props)
    // a version-pinned load reports ITS version (DESCRIBE has no
    // VERSION AS OF grammar — assert through the catalog API)
    val cat = spark.sessionState.catalogManager.catalog("meta")
      .asInstanceOf[org.apache.spark.sql.connector.catalog.TableCatalog]
    val pinnedProps = cat.loadTable(
      org.apache.spark.sql.connector.catalog.Identifier.of(
        Array.empty[String], "d1"), "p").properties()
    assert(pinnedProps.get("version") == "2", pinnedProps.toString)
    // TIMESTAMP AS OF on a metadata view refuses with the remedy
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM meta.d1.files TIMESTAMP AS OF " +
        "'2024-06-01 00:00:00'").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("VERSION AS OF")), msgs(e))
  }

  test("a real table always wins the metadata name; missing parents still error") {
    // a genuine azof table literally named 'history' under namespace-less root
    AzofWriter.createTable(spark, lake, "history", schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitDelta(spark, lake, "history",
      df(("9", "2024-01-05T00:00:00Z", "real")),
      ts("2024-01-05T00:00:00Z"), ts("2024-01-05T00:00:00Z"))
    val got = spark.sql("SELECT value FROM meta.history").collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("real"))
    // unknown parent: still the standard missing-table error
    intercept[Exception] {
      spark.sql("SELECT * FROM meta.nope.history").collect()
    }
  }
}
