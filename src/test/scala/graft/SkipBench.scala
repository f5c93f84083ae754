package graft

import graft.format._
import graft.operators.AzofScan
import graft.sources.AzofWriter
import java.sql.Timestamp
import java.time.Instant
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-benchmark for stats-based file skipping (evidence for
  * docs/SCALE.md, not part of the test suite):
  * `sbt "Test/runMain graft.SkipBench [rows] [files]"` builds a by-key
  * table and times a point lookup with the key filter (file skipping)
  * vs the same predicate as a plain WHERE (all files scanned, parquet
  * row-group pruning only).
  */
object SkipBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(1000000)
    val nFiles = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lake = java.nio.file.Files.createTempDirectory("azof-skipbench").toString
    val schema = TableSchema(Seq(
      ColumnDef("value", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(spark, lake, "t", schema,
      Instant.parse("2024-01-01T00:00:00Z"))
    val t0 = Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val df = spark.range(nRows.toLong).select(
      format_string("k%08d", col("id")).as("key"),
      (lit(t0) + pmod(col("id") * 2654435761L, lit(90L * 86400000L)))
        .cast("timestamp").as("event_time"),
      concat(lit("v"), col("id")).as("value"))
    AzofWriter.commitPartitioned(spark, lake, "t", df, nFiles, byKey = true)
    val snap = AzofTable(spark, lake, "t").currentSnapshot
    val lookupKey = f"k${nRows / 2}%08d"
    println(s"rows=$nRows files=${snap.dataFiles(AsOf.Current).size} " +
      s"prunedForLookup=${AzofScan.prunedFiles(snap, AsOf.Current,
        Some(KeyFilter.Keys(Set(lookupKey)))).size}")

    def time(label: String)(f: => Long): Unit = {
      val runs = (1 to 5).map { _ =>
        val s = System.nanoTime(); val n = f
        ((System.nanoTime() - s) / 1e6, n)
      }
      println(f"$label%-12s min=${runs.map(_._1).min}%8.1f ms " +
        f"(median=${runs.map(_._1).sorted.apply(2)}%8.1f ms, rows=${runs.head._2})")
    }
    time("skipped") {
      AzofScan.scan(spark, lake, "t", AsOf.Current,
        keyFilter = Some(KeyFilter.Keys(Set(lookupKey)))).count()
    }
    time("unskipped") {
      AzofScan.scan(spark, lake, "t", AsOf.Current)
        .where(col("key") === lookupKey).count()
    }
    spark.stop()
  }
}
