package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver's parquet corpus (TESTDATA.md). `events.parquet`
  * has carried different physical types for `ts` across driver testdata
  * generations: INT64 TIMESTAMP(NANOS) (which Spark's parquet reader
  * rejects by default — read nanos as long, convert to µs), and plain
  * TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ). Normalize
  * both to session-local TimestampType (session TZ is pinned UTC, so the
  * NTZ→LTZ cast is wall-clock-identical and matches DuckDB's read).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val df = spark.read.parquet(s"$sfDir/events.parquet")
        df.schema("ts").dataType match {
          case org.apache.spark.sql.types.LongType =>
            df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
          case org.apache.spark.sql.types.TimestampNTZType =>
            df.withColumn("ts",
              col("ts").cast(org.apache.spark.sql.types.TimestampType))
          case _ => df
        }
      case n => spark.read.parquet(s"$sfDir/$n.parquet")
    }
}
