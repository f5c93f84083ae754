package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loader for the driver's parquet corpus (TESTDATA.md). `events.parquet`
  * carries INT64 TIMESTAMP(NANOS) which Spark's parquet reader rejects by
  * default — read nanos as long and convert to microseconds (values are
  * microsecond-aligned, so the conversion is exact and matches DuckDB's
  * ns→µs read).
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    name match {
      case "events" =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(s"$sfDir/events.parquet")
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case n => spark.read.parquet(s"$sfDir/$n.parquet")
    }
}
