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
}
