package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Drive the streaming surface from the command line:
  *
  *   runMain graft.streaming.StreamDemo <eventsParquetDir>
  *
  * Streams the directory through the tumbling-window aggregation and the
  * streaming dedup, printing summary rows when each query drains.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    // File streaming sources require a directory; an sf dir holds ALL
    // tables' parquet, so stage just events.parquet into a temp dir.
    val arg = args.headOption.getOrElse("/root/testdata/sf0.001")
    val dir = if (new java.io.File(s"$arg/events.parquet").exists()) {
      val d = java.nio.file.Files.createTempDirectory("events-only")
      java.nio.file.Files.copy(java.nio.file.Paths.get(s"$arg/events.parquet"),
        d.resolve("events.parquet"))
      d.toString
    } else arg
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val agg = EventsStream.tumblingAgg(
      EventsStream.readEvents(spark, dir), "1 hour", "2 hours")
    val q1 = agg.writeStream.outputMode("complete")
      .format("memory").queryName("win").start()
    q1.processAllAvailable(); q1.stop()
    val win = spark.table("win")
    println(s"WINDOWS rows=${win.count()}")
    win.orderBy(desc("n")).show(5, truncate = false)

    val dd = EventsStream.dedupStream(
      EventsStream.readEvents(spark, dir), "1 hour")
    val q2 = dd.writeStream.outputMode("append")
      .format("memory").queryName("dd").start()
    q2.processAllAvailable(); q2.stop()
    val input = EventsStream.readEventsBatch(spark, dir).count()
    val deduped = spark.table("dd").count()
    println(s"DEDUP input=$input out=$deduped")

    // Stateful sessionization (flatMapGroupsWithState). A far-future
    // sentinel event staged as a second micro-batch advances the
    // watermark so every real session times out and emits.
    val gapMs = 30L * 60 * 1000
    val staged = java.nio.file.Files.createTempDirectory("sess-demo")
    val ev = EventsStream.readEventsBatch(spark, dir)
      .select(col("user_id"), col("ts"))
    ev.coalesce(1).write.mode("overwrite")
      .parquet(staged.resolve("b1").toString)
    ev.agg(max(col("ts")).as("ts"))
      .select(lit(-1L).as("user_id"),
        (col("ts") + expr("INTERVAL 2 DAYS")).as("ts"))
      .coalesce(1).write.mode("overwrite")
      .parquet(staged.resolve("b2").toString)
    val stream = spark.readStream.schema("user_id LONG, ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString + "/b*")
    val q3 = Sessionize.sessions(stream, gapMs, "0 seconds")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess").start()
    q3.processAllAvailable(); q3.stop()
    val sess = spark.table("sess").where(col("user_id") >= 0)
    val batchSess = Sessionize.sessionsBatch(spark, ev, gapMs)
    println(s"SESSIONS streamed=${sess.count()} batch=${batchSess.count()}")
    sess.orderBy(desc("n_events")).show(5, truncate = false)
    spark.stop()
  }
}
