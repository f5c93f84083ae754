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
}
