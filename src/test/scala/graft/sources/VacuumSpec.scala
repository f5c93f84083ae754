package graft.sources

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import java.nio.file.{Files, Paths}
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class VacuumSpec extends AnyFunSuite {
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
    val lake = Files.createTempDirectory("azof-vacuum").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))
    AzofWriter.commitDelta(spark, lake, "t", df(
      ("1", "2024-02-05T00:00:00Z", "a2")),
      ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
    lake
  }

  private def listTable(lake: String): Set[String] =
    Files.list(Paths.get(lake, "t")).map[String](_.getFileName.toString)
      .toArray.map(_.toString).toSet

  test("vacuum deletes orphan data files and expired snapshots, never referenced files") {
    val lake = build()
    // orphan: debris of a crashed write — no snapshot references it
    Files.write(Paths.get(lake, "t", "orphan_abc.parquet"), Array[Byte](1, 2))
    val before = AzofScan.scan(spark, lake, "t", AsOf.Current)
      .select("key", "value").collect().map(r => (r.getString(0), r.getString(1))).toSet

    val rep = AzofVacuum.vacuum(spark, lake, "t", keepLast = 1, minAgeMs = 0)

    assert(rep.deletedDataFiles == Seq("orphan_abc.parquet"))
    assert(rep.deletedSnapshots == Seq(1, 2)) // current is s3
    assert(rep.retainedSnapshots == Seq(3))
    val files = listTable(lake)
    assert(!files.contains("orphan_abc.parquet"))
    assert(!files.contains("s1.json") && files.contains("s3.json"))

    // event-time travel still fully works off the retained snapshot
    val after = AzofScan.scan(spark, lake, "t", AsOf.Current)
      .select("key", "value").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(after == before)
    val hist = AzofScan.scan(spark, lake, "t",
        AsOf.EventTime(ts("2024-01-15T00:00:00Z")))
      .select("key", "value").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(hist == Set("1" -> "a1", "2" -> "b1"))
  }

  test("dry run reports but deletes nothing") {
    val lake = build()
    Files.write(Paths.get(lake, "t", "orphan_xyz.parquet"), Array[Byte](3))
    val rep = AzofVacuum.vacuum(spark, lake, "t", keepLast = 1, dryRun = true, minAgeMs = 0)
    assert(rep.deletedDataFiles == Seq("orphan_xyz.parquet"))
    val files = listTable(lake)
    assert(files.contains("orphan_xyz.parquet") && files.contains("s1.json"))
  }

  test("keepLast larger than history retains everything") {
    val lake = build()
    val rep = AzofVacuum.vacuum(spark, lake, "t", keepLast = 10, minAgeMs = 0)
    assert(rep.deletedSnapshots.isEmpty && rep.deletedDataFiles.isEmpty)
    assert(rep.retainedSnapshots == Seq(1, 2, 3))
  }
}
