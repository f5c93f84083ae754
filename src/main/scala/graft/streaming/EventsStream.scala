package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table — the streaming
  * counterpart the reference lists as unimplemented roadmap ("Streaming
  * in scan", reference: README.md:158-159), expressed the Spark way:
  * `readStream` file source → event-time watermark → windowed
  * aggregation / streaming dedup → any sink. The same transforms run in
  * batch mode, which is how the tests pin stream-equals-batch semantics.
  */
object EventsStream {

  /** Physical schema of events.parquet. `ts` has varied across driver
    * testdata generations — INT64 TIMESTAMP(NANOS) (Spark reads it only
    * as long via nanosAsLong; values are µs-aligned so conversion is
    * exact) or TIMESTAMP(MICROS) without timezone (TIMESTAMP_NTZ) — so
    * the streaming schema is probed from the footer of whatever file is
    * present and `normalize` converts either to session-UTC timestamps.
    */
  def rawSchema(tsType: DataType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def probeTsType(spark: SparkSession, dir: String): DataType =
    scala.util.Try(spark.read.parquet(dir).schema("ts").dataType)
      .getOrElse(throw new IllegalArgumentException(
        s"EventsStream: no readable events parquet under $dir to probe " +
          "the ts physical type. The events schema has shipped as both " +
          "INT64 TIMESTAMP(NANOS) and TIMESTAMP_NTZ, and a streaming " +
          "schema is FIXED at start — a guessed type fails (or misreads) " +
          "once real files arrive, so the probe refuses to guess. Start " +
          "the stream against a directory holding at least one events " +
          "file."))

  private def normalize(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Stream of events from a directory of parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.readStream
      .schema(rawSchema(probeTsType(spark, dir))).parquet(dir))
  }

  /** Batch twin of [[readEvents]] for stream-equals-batch assertions. */
  def readEventsBatch(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalize(spark.read
      .schema(rawSchema(probeTsType(spark, dir))).parquet(dir))
  }

  /** Tumbling event-time window aggregation with a watermark: per
    * (window, event_type) counts and an exact decimal value sum. Works
    * identically on streaming and batch inputs.
    */
  def tumblingAgg(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(DecimalType(38, 4))
          .cast("double").as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Streaming exact dedup on event identity within the watermark
    * horizon — the streaming arm of the dedup family.
    */
  def dedupStream(events: DataFrame, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicates("event_id")

  /** Stream-stream interval join — attribution: each `attribEvent` is
    * joined to the SAME user's `sourceEvent`s that happened in the
    * preceding `horizonSec` seconds. Both sides carry watermarks and the
    * join condition carries the event-time interval bound, which is what
    * lets Spark expire join state — unbounded state otherwise. Works
    * identically on streaming and batch inputs (the spec's gate).
    *
    * Output: (user_id, src_id, src_ts, att_id, att_ts, lag_sec).
    */
  def attributionJoin(
      events: DataFrame, sourceEvent: String, attribEvent: String,
      watermark: String, horizonSec: Long): DataFrame = {
    val src = events.where(col("event_type") === sourceEvent)
      .select(col("user_id"), col("event_id").as("src_id"),
        col("ts").as("src_ts"))
      .withWatermark("src_ts", watermark)
    val att = events.where(col("event_type") === attribEvent)
      .select(col("user_id"), col("event_id").as("att_id"),
        col("ts").as("att_ts"))
      .withWatermark("att_ts", watermark)
    src.join(att,
        src("user_id") === att("user_id") &&
          col("att_ts") >= col("src_ts") &&
          col("att_ts") <= col("src_ts") + expr(s"INTERVAL $horizonSec SECONDS"))
      .select(src("user_id"), col("src_id"), col("src_ts"),
        col("att_id"), col("att_ts"),
        (unix_micros(col("att_ts")) - unix_micros(col("src_ts")))
          .cast("double").divide(1e6).as("lag_sec"))
  }
}
