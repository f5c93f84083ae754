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
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
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
    spark.stop()
  }
}
