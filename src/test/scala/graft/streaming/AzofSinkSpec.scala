package graft.streaming

import graft.TestSpark
import graft.format._
import graft.operators.AzofScan
import graft.sources.AzofWriter
import java.nio.file.Files
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** The streaming sink must land micro-batches as delta commits, be
  * idempotent on batch replay, and resume from its checkpoint.
  */
class AzofSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = TableSchema(Seq(
    ColumnDef("value", ColumnType.AzString, nullable = false)))

  private def ts(s: String) = Instant.parse(s)

  private def mkTable(): String = {
    val lake = Files.createTempDirectory("azof-sink").toString
    AzofWriter.createTable(spark, lake, "t", schema, ts("2024-01-01T00:00:00Z"))
    lake
  }

  private def batchDf(rows: (String, String, String)*) =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (k, t, v) =>
        Row(k, Timestamp.from(ts(t)), v) }),
      schema.toStruct)

  private def currentKv(lake: String): Seq[(String, String)] =
    AzofScan.scan(spark, lake, "t", AsOf.Current)
      .select("key", "value").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq

  test("commitBatch lands a delta; replaying the same batch id is a no-op") {
    val lake = mkTable()
    val b0 = batchDf(("1", "2024-01-02T00:00:00Z", "a1"),
      ("2", "2024-01-03T00:00:00Z", "b1"))
    assert(AzofSink.commitBatch(lake, "t", b0, batchId = 0, appId = "specA"))
    assert(currentKv(lake) == Seq("1" -> "a1", "2" -> "b1"))
    val v1 = AzofTable(spark, lake, "t").currentVersion

    // crash-replay of batch 0: must not double-commit
    assert(!AzofSink.commitBatch(lake, "t", b0, batchId = 0, appId = "specA"))
    assert(AzofTable(spark, lake, "t").currentVersion == v1)

    // next batch commits, and its delta window is the batch's min/max
    assert(AzofSink.commitBatch(lake, "t",
      batchDf(("1", "2024-02-05T00:00:00Z", "a2")), batchId = 1, appId = "specA"))
    assert(currentKv(lake) == Seq("1" -> "a2", "2" -> "b1"))
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    assert(snap.op.contains("stream-delta#specA#1"))
    val d = snap.segments.flatMap(_.delta).last
    assert(d.start == ts("2024-02-05T00:00:00Z") &&
      d.end == ts("2024-02-05T00:00:00Z"))

    // empty batch: no commit
    assert(!AzofSink.commitBatch(lake, "t", batchDf(), batchId = 2, appId = "specA"))

    // a foreign commit between batch and checkpoint ack must not defeat
    // replay detection (the stamp is found behind the head commit)
    AzofWriter.commitDelta(spark, lake, "t",
      batchDf(("7", "2024-03-01T00:00:00Z", "g1")),
      ts("2024-02-20T00:00:00Z"), ts("2024-03-10T00:00:00Z"))
    val v2 = AzofTable(spark, lake, "t").currentVersion
    assert(!AzofSink.commitBatch(lake, "t",
      batchDf(("1", "2024-02-05T00:00:00Z", "a2")), batchId = 1, appId = "specA"))
    assert(AzofTable(spark, lake, "t").currentVersion == v2)

    // a NEW stream (different appId / fresh checkpoint) restarts its
    // batch ids at 0 and must NOT be mistaken for a replay of this one
    assert(AzofSink.commitBatch(lake, "t",
      batchDf(("8", "2024-03-05T00:00:00Z", "h1")), batchId = 0,
      appId = "other-stream"))
    assert(currentKv(lake).contains("8" -> "h1"))
  }

  test("replay stays skipped behind ANY number of interleaved foreign commits") {
    // the snapshot's stream_batches index is carried forward by every
    // commit, so replay detection is exact — no bounded history scan
    // that a burst of foreign commits could outrun
    val lake = mkTable()
    assert(AzofSink.commitBatch(lake, "t",
      batchDf(("1", "2024-01-02T00:00:00Z", "a1")), batchId = 0, appId = "deep"))
    val snap0 = AzofTable(spark, lake, "t").currentSnapshot
    assert(snap0.streamBatches == Map("deep" -> 0L))

    for (i <- 1 to 100)
      AzofWriter.commitDelta(spark, lake, "t",
        batchDf((s"f$i", "2024-02-01T00:00:00Z", s"v$i")),
        ts("2024-02-01T00:00:00Z"), ts("2024-02-02T00:00:00Z"))

    // the index survived 100 foreign commits; the replayed batch is
    // still recognized and skipped
    val v = AzofTable(spark, lake, "t").currentVersion
    assert(AzofTable(spark, lake, "t").currentSnapshot.streamBatches ==
      Map("deep" -> 0L))
    assert(!AzofSink.commitBatch(lake, "t",
      batchDf(("1", "2024-01-02T00:00:00Z", "a1")), batchId = 0, appId = "deep"))
    assert(AzofTable(spark, lake, "t").currentVersion == v)

    // and a genuinely new batch still commits, extending the index
    assert(AzofSink.commitBatch(lake, "t",
      batchDf(("2", "2024-03-01T00:00:00Z", "b1")), batchId = 1, appId = "deep"))
    assert(AzofTable(spark, lake, "t").currentSnapshot.streamBatches ==
      Map("deep" -> 1L))
  }

  test("end-to-end: memory stream -> sink -> scan, resumable checkpoint") {
    val lake = mkTable()
    val ckpt = Files.createTempDirectory("azof-sink-ck").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Timestamp, String)]
    val stream = mem.toDF().toDF("key", "event_time", "value")

    mem.addData(("1", Timestamp.from(ts("2024-01-02T00:00:00Z")), "a1"),
      ("2", Timestamp.from(ts("2024-01-03T00:00:00Z")), "b1"))
    AzofSink.append(stream, lake, "t", ckpt).awaitTermination()
    assert(currentKv(lake) == Seq("1" -> "a1", "2" -> "b1"))

    // second pass over the SAME checkpoint: only new data commits
    mem.addData(("3", Timestamp.from(ts("2024-01-04T00:00:00Z")), "c1"))
    AzofSink.append(stream, lake, "t", ckpt).awaitTermination()
    assert(currentKv(lake) == Seq("1" -> "a1", "2" -> "b1", "3" -> "c1"))

    // the batch-side scan and the streaming append feed agree
    val feed = AzofStream.appends(spark, lake, "t")
      .writeStream.outputMode("append").format("memory")
      .queryName("sink_feed").start()
    try {
      feed.processAllAvailable()
      assert(spark.table("sink_feed").count() == 3)
    } finally feed.stop()
  }
}
