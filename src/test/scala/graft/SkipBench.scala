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

    // scenario 2: TIME-partitioned layout (ranges useless for point
    // lookups) with per-file key blooms — nFiles commits, disjoint key
    // slices per commit but each file's range spans the key space
    val lake2 = java.nio.file.Files.createTempDirectory("azof-skipbench2").toString
    spark.conf.set("spark.azof.stats.bloomBits",
      (8 * (nRows / nFiles)).toString)
    AzofWriter.createTable(spark, lake2, "t", schema,
      Instant.parse("2024-01-01T00:00:00Z"))
    val slice = nRows / nFiles
    (0 until nFiles).foreach { i =>
      val part = spark.range(i.toLong * slice, (i + 1).toLong * slice).select(
        format_string("k%08d", col("id")).as("key"),
        (lit(t0) + lit(i * 86400000L) + pmod(col("id") * 2654435761L,
          lit(86400000L))).cast("timestamp").as("event_time"),
        concat(lit("v"), col("id")).as("value"))
      // every commit also carries the global min and max key, so every
      // file's RANGE spans the whole key space
      val edges = spark.range(2).select(
        when(col("id") === 0, "k00000000")
          .otherwise(f"k${nRows - 1}%08d").as("key"),
        (lit(t0) + lit(i * 86400000L)).cast("timestamp").as("event_time"),
        lit("edge").as("value"))
      AzofWriter.commitDelta(spark, lake2, "t", part.union(edges),
        Instant.ofEpochMilli(t0 + i * 86400000L),
        Instant.ofEpochMilli(t0 + (i + 1) * 86400000L))
    }
    val snap2 = AzofTable(spark, lake2, "t").currentSnapshot
    println(s"bytime files=${snap2.dataFiles(AsOf.Current).size} " +
      s"bloomPruned=${AzofScan.prunedFiles(snap2, AsOf.Current,
        Some(KeyFilter.Keys(Set(lookupKey)))).size}")
    time("bloom") {
      AzofScan.scan(spark, lake2, "t", AsOf.Current,
        keyFilter = Some(KeyFilter.Keys(Set(lookupKey)))).count()
    }
    spark.conf.unset("spark.azof.stats.bloomBits")
    time("no-bloom") {
      AzofScan.scan(spark, lake2, "t", AsOf.Current)
        .where(col("key") === lookupKey).count()
    }
    spark.stop()
  }
}
