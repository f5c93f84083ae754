package graft.streaming

import graft.TestSpark
import graft.format._
import graft.operators.{AzofScan, TextAnalysis}
import graft.sources.AzofWriter
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end training-data ingest: a document stream is content-
  * fingerprinted, streaming-deduped within the watermark, and committed
  * into an azof table by the sink — then served by the batch scan and
  * the SQL surface. This is the composition a real corpus build runs;
  * the spec pins that the pieces actually compose.
  */
class IngestPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = TableSchema(Seq(
    ColumnDef("text", ColumnType.AzString, nullable = false),
    ColumnDef("fp", ColumnType.AzString, nullable = false)))

  private def ts(s: String) = Instant.parse(s)

  test("stream -> fingerprint dedup -> azof sink -> scan") {
    val lake = Files.createTempDirectory("azof-ingest").toString
    val ckpt = Files.createTempDirectory("azof-ingest-ck").toString
    AzofWriter.createTable(spark, lake, "docs", schema,
      ts("2024-01-01T00:00:00Z"))

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    // duplicate content arrives under two ids inside one watermark window
    mem.addData(
      ("d1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "Alpha  beta GAMMA"),
      ("d2", Timestamp.from(ts("2024-01-02T01:00:00Z")), "alpha beta gamma"),
      ("d3", Timestamp.from(ts("2024-01-02T02:00:00Z")), "something else"))

    val cleaned = mem.toDF().toDF("key", "event_time", "text")
      .withColumn("fp", TextAnalysis.fingerprint(col("text")))
      .withWatermark("event_time", "1 hour")
      .dropDuplicates("fp")
      .select("key", "event_time", "text", "fp")

    AzofSink.append(cleaned, lake, "docs", ckpt).awaitTermination()

    val rows = AzofScan.scan(spark, lake, "docs", AsOf.Current)
      .select("key", "fp").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
    // d2 is a normalized duplicate of d1 — exactly one of the pair lands
    assert(rows.map(_._1) == Seq("d1", "d3"))
    assert(rows.map(_._2).distinct.size == 2)

    // and the committed table serves SQL time travel like any other
    spark.conf.set("spark.azof.path", lake)
    val n = spark.sql("SELECT count(*) AS n FROM azof.docs").collect()(0).getLong(0)
    assert(n == 2)
  }
}
