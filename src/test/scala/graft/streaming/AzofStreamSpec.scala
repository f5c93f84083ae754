package graft.streaming

import graft.TestSpark
import graft.format._
import graft.sources.AzofWriter
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** The streaming table scan must follow commits live and ignore
  * compaction rewrites.
  */
class AzofStreamSpec extends AnyFunSuite {
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

  test("appends stream replays history, follows new commits, skips compaction") {
    val lake = Files.createTempDirectory("azof-stream").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    AzofWriter.commitBase(spark, lake, "t", df(
      ("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1")))

    val q = AzofStream.appends(spark, lake, "t")
      .writeStream.outputMode("append").format("memory")
      .queryName("azof_appends").start()
    try {
      q.processAllAvailable()
      // replay: the pre-existing base commit
      assert(spark.table("azof_appends").count() == 2)

      // follow: a new delta commit streams through
      AzofWriter.commitDelta(spark, lake, "t", df(
        ("1", "2024-02-05T00:00:00Z", "a2")),
        ts("2024-02-01T00:00:00Z"), ts("2024-03-01T00:00:00Z"))
      q.processAllAvailable()
      val rows = spark.table("azof_appends")
        .collect().map(r => (r.getString(0), r.getString(2))).toSet
      assert(rows == Set("1" -> "a1", "2" -> "b1", "1" -> "a2"))

      // compaction rewrites every live row into compact_s4.parquet —
      // the append feed must NOT re-emit them
      AzofWriter.compact(spark, lake, "t", ts("2024-03-01T00:00:00Z"))
      q.processAllAvailable()
      assert(spark.table("azof_appends").count() == 3)

      // and commits after compaction still stream
      AzofWriter.commitDelta(spark, lake, "t", df(
        ("3", "2024-03-05T00:00:00Z", "c1")),
        ts("2024-03-01T00:00:00Z"), ts("2024-04-01T00:00:00Z"))
      q.processAllAvailable()
      assert(spark.table("azof_appends").count() == 4)
    } finally q.stop()
  }
}
