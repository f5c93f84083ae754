package graft.streaming

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime
import java.sql.Timestamp
import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-equals-batch pin for stateful sessionization: after the
  * watermark passes every main session's end+gap (driven by two sentinel
  * files in later micro-batches), the emitted closed sessions must be
  * exactly the batch-computed sessions of the main data.
  */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val GapMs = 30L * 60 * 1000

  private def writeOne(df: org.apache.spark.sql.DataFrame, dir: Path,
      name: String, mtimeSec: Long): Unit = {
    val stage = Files.createTempDirectory("sess-stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = Files.list(stage).filter(_.toString.endsWith(".parquet"))
      .findFirst().get()
    val target = dir.resolve(name)
    Files.move(part, target)
    Files.setLastModifiedTime(target, FileTime.fromMillis(mtimeSec * 1000))
  }

  test("flatMapGroupsWithState sessions equal batch sessions once watermark passes") {
    import spark.implicits._
    // the events FILE, not the mixed table dir: the probe reads real
    // footers now (the old silent NTZ fallback let a mixed-dir read
    // "work" by filling foreign files' columns with nulls)
    val main = EventsStream
      .readEventsBatch(spark, "/root/testdata/sf0.001/events.parquet")
      .where(col("user_id") < 10).select(col("user_id"), col("ts"))
    val maxTs = main.agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime

    val inDir = Files.createTempDirectory("sess-in")
    writeOne(main, inDir, "a_main.parquet", 1000)
    val s1 = Seq((9991L, new Timestamp(maxTs + 86400000L))).toDF("user_id", "ts")
    val s2 = Seq((9992L, new Timestamp(maxTs + 2 * 86400000L))).toDF("user_id", "ts")
    writeOne(s1, inDir, "b_sentinel1.parquet", 2000)
    writeOne(s2, inDir, "c_sentinel2.parquet", 3000)

    val stream = spark.readStream
      .schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString)
    val q = Sessionize.sessions(stream, GapMs, "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("sessions_out").start()
    try q.processAllAvailable() finally q.stop()

    val got = spark.table("sessions_out")
      .where(col("user_id") < 10)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    val expected = Sessionize.sessionsBatch(spark, main, GapMs)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    assert(expected.nonEmpty)
    assert(got == expected)
    // the LAST sentinel's session can never close (nothing advances the
    // watermark past it) — it must not have been emitted. (Sentinel1 DOES
    // close, correctly, once sentinel2's watermark passes its gap.)
    assert(spark.table("sessions_out").where(col("user_id") === 9992).count() == 0)
  }
}
