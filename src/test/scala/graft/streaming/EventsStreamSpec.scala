package graft.streaming

import graft.TestSpark
import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class EventsStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def stage(copies: Int): String = {
    val dir = Files.createTempDirectory("events-stream")
    (1 to copies).foreach { i =>
      Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
        dir.resolve(s"events_$i.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }
    dir.toString
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String): Unit = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("streaming tumbling window agg equals batch result") {
    val dir = stage(1)
    val streamed = EventsStream.tumblingAgg(
      EventsStream.readEvents(spark, dir), "1 hour", "2 hours")
    runToMemory(streamed, "stream_agg", "complete")

    val got = spark.table("stream_agg").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1.getTime, t._2)).toSeq

    val expected = EventsStream.tumblingAgg(
        EventsStream.readEventsBatch(spark, dir), "1 hour", "2 hours")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1.getTime, t._2)).toSeq

    assert(got.nonEmpty && got == expected)
  }

  test("streaming dedup collapses duplicated input files") {
    val dir = stage(2) // same file twice => every event duplicated
    val n = EventsStream.readEventsBatch(spark, dir).count()
    val deduped = EventsStream.dedupStream(
      EventsStream.readEvents(spark, dir), "1 hour")
    runToMemory(deduped, "stream_dedup", "append")
    val got = spark.table("stream_dedup").count()
    assert(n == 2 * got)
    assert(got == spark.table("stream_dedup").select("event_id").distinct().count())
  }

  test("stream-stream attribution join equals its batch twin") {
    val dir = stage(1)
    def collect(rows: Array[Row]) = rows
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(5)))
      .sortBy(identity).toSeq

    // purchases attributed to same-user views within the prior 2 hours
    val streamed = EventsStream.attributionJoin(
      EventsStream.readEvents(spark, dir),
      sourceEvent = "view", attribEvent = "purchase",
      watermark = "4 hours", horizonSec = 7200)
    runToMemory(streamed, "stream_attr", "append")
    val got = collect(spark.table("stream_attr").collect())

    val expected = collect(EventsStream.attributionJoin(
        EventsStream.readEventsBatch(spark, dir),
        sourceEvent = "view", attribEvent = "purchase",
        watermark = "4 hours", horizonSec = 7200)
      .collect())

    assert(got.nonEmpty, "corpus must produce attributed pairs")
    assert(got == expected)
    // interval bound actually holds
    spark.table("stream_attr").collect().foreach { r =>
      val lag = r.getDouble(5)
      assert(lag >= 0 && lag <= 7200, s"lag $lag outside horizon")
    }
  }
}
