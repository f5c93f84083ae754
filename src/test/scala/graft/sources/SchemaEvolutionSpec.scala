package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val v1Schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def ts(s: String) = Instant.parse(s)

  test("added column reads as null from pre-evolution files, values from new ones") {
    val lake = Files.createTempDirectory("azof-evolve").toString
    AzofWriter.createTable(spark, lake, "t", v1Schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a1"))),
      v1Schema.toStruct))

    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("score", ColumnType.AzInt, nullable = true))
    val v2Schema = AzofTable(spark, lake, "t").currentSnapshot.schema
    assert(v2Schema.columns.map(_.name) == Seq("value", "score"))

    AzofWriter.commitDelta(spark, lake, "t", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("2", Timestamp.from(ts("2024-02-05T00:00:00Z")), "b1", 42L))),
      v2Schema.toStruct),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))

    val cur = AzofScan.scan(spark, lake, "t").select("key", "value", "score")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1).toSeq
    assert(cur == Seq(("1", "a1", None), ("2", "b1", Some(42L))))

    // time travel BEFORE the evolution still uses the current (evolved)
    // declared schema — old rows surface null for the new column
    val past = AzofScan.scan(spark, lake, "t",
        AsOf.EventTime(ts("2024-01-15T00:00:00Z")))
      .select("key", "score").collect()
    assert(past.length == 1 && past.head.isNullAt(1))
  }

  test("rejects non-nullable or duplicate columns") {
    val lake = Files.createTempDirectory("azof-evolve2").toString
    AzofWriter.createTable(spark, lake, "t", v1Schema, ts("2024-01-01T00:00:00Z"))
    assertThrows[IllegalArgumentException] {
      AzofWriter.addColumn(spark, lake, "t",
        ColumnDef("x", ColumnType.AzInt, nullable = false))
    }
    assertThrows[IllegalArgumentException] {
      AzofWriter.addColumn(spark, lake, "t",
        ColumnDef("value", ColumnType.AzString, nullable = true))
    }
    assertThrows[IllegalArgumentException] {
      AzofWriter.addColumn(spark, lake, "t",
        ColumnDef("key", ColumnType.AzString, nullable = true))
    }
  }

  test("dropped column vanishes from scans, survives time travel, cannot resurrect") {
    val lake = Files.createTempDirectory("azof-evolve3").toString
    val two = TableSchema(Seq(
      ColumnDef("value", ColumnType.AzString, nullable = false),
      ColumnDef("score", ColumnType.AzInt, nullable = true)))
    AzofWriter.createTable(spark, lake, "t", two, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a1", 7L))),
      two.toStruct))
    val preDropVersion = AzofTable(spark, lake, "t").currentVersion

    AzofWriter.dropColumn(spark, lake, "t", "score")
    // post-drop scans omit the column entirely
    val cur = AzofScan.scan(spark, lake, "t")
    assert(cur.columns.toSeq == Seq("key", "event_time", "value"))
    assert(cur.select("key", "value").collect().map(r =>
      (r.getString(0), r.getString(1))).toSeq == Seq(("1", "a1")))
    // commits after the drop use the narrowed schema
    AzofWriter.commitDelta(spark, lake, "t", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("2", Timestamp.from(ts("2024-02-05T00:00:00Z")), "b1"))),
      AzofTable(spark, lake, "t").currentSnapshot.schema.toStruct),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    assert(AzofScan.scan(spark, lake, "t").count() == 2)

    // version time travel resolves the PRE-DROP snapshot's own schema:
    // the old values are still there
    val t = AzofTable(spark, lake, "t")
    val old = AzofScan.scanSnapshot(spark, t, t.snapshot(preDropVersion),
      AsOf.Current)
    assert(old.columns.contains("score"))
    assert(old.select("score").collect().head.getLong(0) == 7L)

    // resurrection guard: the retired name is refused with the reason
    val err = intercept[IllegalArgumentException] {
      AzofWriter.addColumn(spark, lake, "t",
        ColumnDef("score", ColumnType.AzInt, nullable = true))
    }
    assert(err.getMessage.contains("RESURRECT"))
    // a FRESH name is fine, and the retired list survives the commit
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("score2", ColumnType.AzInt, nullable = true))
    assert(AzofTable(spark, lake, "t").currentSnapshot.retired ==
      Seq("score"))

    // system columns and unknown columns are rejected
    assertThrows[IllegalArgumentException] {
      AzofWriter.dropColumn(spark, lake, "t", "key")
    }
    assertThrows[IllegalArgumentException] {
      AzofWriter.dropColumn(spark, lake, "t", "nope")
    }

    // the retired list round-trips through the snapshot codec
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    assert(SnapshotCodec.parse(SnapshotCodec.render(snap)) == snap)
  }

  test("renamed column: old files read under the new name, new commits " +
    "write byte-compatibly, value skipping survives") {
    val lake = Files.createTempDirectory("azof-evolve4").toString
    AzofWriter.createTable(spark, lake, "t", v1Schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a1"))),
      v1Schema.toStruct))
    val preRename = AzofTable(spark, lake, "t").currentVersion

    AzofWriter.renameColumn(spark, lake, "t", "value", "content")
    val renamed = AzofTable(spark, lake, "t").currentSnapshot
    assert(renamed.schema.columns.map(_.name) == Seq("content"))
    assert(renamed.schema.columns.head.physicalName == "value")
    assert(renamed.retired.contains("value"))
    assert(SnapshotCodec.parse(SnapshotCodec.render(renamed)) == renamed)

    // pre-rename bytes surface under the NEW logical name
    val cur = AzofScan.scan(spark, lake, "t")
    assert(cur.columns.toSeq == Seq("key", "event_time", "content"))
    assert(cur.select("content").collect().map(_.getString(0)).toSeq ==
      Seq("a1"))
    // commits after the rename accept the logical name and land under
    // the physical one — one unified read across old and new files
    AzofWriter.commitDelta(spark, lake, "t", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("2", Timestamp.from(ts("2024-02-05T00:00:00Z")), "b1"))),
      renamed.schema.toStruct),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    assert(AzofScan.scan(spark, lake, "t")
      .select("key", "content").collect()
      .map(r => (r.getString(0), r.getString(1))).sorted.toSeq ==
      Seq("1" -> "a1", "2" -> "b1"))
    // the new file's stats are keyed by the PHYSICAL name, and value
    // skipping on the logical name still consults them
    val snap2 = AzofTable(spark, lake, "t").currentSnapshot
    assert(snap2.segments.head.delta.head.stats.get.cols.contains("value"))
    import org.apache.spark.sql.sources.EqualTo
    val pruned = ValueStats.prune(snap2.schema,
      AzofScan.prunedEntries(snap2, AsOf.Current),
      Seq(EqualTo("content", "zzz")))
    assert(pruned.size < AzofScan.prunedEntries(snap2, AsOf.Current).size,
      "value skip on the renamed column should prune the new file")

    // version time travel resolves the PRE-RENAME schema: old name back
    val t = AzofTable(spark, lake, "t")
    val old = AzofScan.scanSnapshot(spark, t, t.snapshot(preRename),
      AsOf.Current)
    assert(old.columns.contains("value") && !old.columns.contains("content"))

    // rename-back to the own physical name is the one retired-name
    // exception (the bytes are this column's own)
    AzofWriter.renameColumn(spark, lake, "t", "content", "value")
    assert(AzofTable(spark, lake, "t").currentSnapshot
      .schema.columns.map(c => (c.name, c.physical)) ==
      Seq(("value", None)))
    AzofWriter.renameColumn(spark, lake, "t", "value", "content")

    // guards: rename to an existing/retired/system name refuses
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("extra", ColumnType.AzInt, nullable = true))
    assertThrows[IllegalArgumentException] {
      AzofWriter.renameColumn(spark, lake, "t", "extra", "content")
    }
    val err = intercept[IllegalArgumentException] {
      AzofWriter.renameColumn(spark, lake, "t", "extra", "value")
    }
    assert(err.getMessage.contains("RESURRECT"))
    assertThrows[IllegalArgumentException] {
      AzofWriter.renameColumn(spark, lake, "t", "key", "k2")
    }
  }

  test("rename -> drop -> re-add interplay: every historical name stays " +
    "retired; a fresh name works") {
    val lake = Files.createTempDirectory("azof-evolve5").toString
    AzofWriter.createTable(spark, lake, "t", v1Schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a1"))),
      v1Schema.toStruct))

    AzofWriter.renameColumn(spark, lake, "t", "value", "content")
    AzofWriter.dropColumn(spark, lake, "t", "content")
    val retired = AzofTable(spark, lake, "t").currentSnapshot.retired
    assert(retired.contains("value") && retired.contains("content"))

    // BOTH names refuse re-adding: "value" bytes live in old files,
    // "content" was the dropped logical name
    assertThrows[IllegalArgumentException] {
      AzofWriter.addColumn(spark, lake, "t",
        ColumnDef("value", ColumnType.AzString, nullable = true))
    }
    assertThrows[IllegalArgumentException] {
      AzofWriter.addColumn(spark, lake, "t",
        ColumnDef("content", ColumnType.AzString, nullable = true))
    }
    AzofWriter.addColumn(spark, lake, "t",
      ColumnDef("fresh", ColumnType.AzString, nullable = true))
    assert(AzofScan.scan(spark, lake, "t").columns.toSeq ==
      Seq("key", "event_time", "fresh"))
  }

  test("ALTER TABLE RENAME COLUMN and DML through the renamed column " +
    "work end to end over SQL") {
    val lake = Files.createTempDirectory("azof-evolve6").toString
    spark.conf.set("spark.sql.catalog.evo", classOf[AzofCatalog].getName)
    spark.conf.set("spark.sql.catalog.evo.path", lake)
    AzofWriter.createTable(spark, lake, "t", v1Schema,
      ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a1"),
        Row("2", Timestamp.from(ts("2024-01-03T00:00:00Z")), "b1"))),
      v1Schema.toStruct))

    spark.sql("ALTER TABLE evo.t RENAME COLUMN value TO content")
    assert(spark.sql("SELECT content FROM evo.t WHERE key = '1'")
      .collect().map(_.getString(0)).toSeq == Seq("a1"))
    // UPDATE through the renamed column: the DML writer maps the
    // logical row schema onto the physical file layout
    spark.sql("UPDATE evo.t SET content = concat(content, '!') " +
      "WHERE key = '2'")
    assert(spark.sql("SELECT key, content FROM evo.t ORDER BY key")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq("1" -> "a1", "2" -> "b1!"))
  }
}
