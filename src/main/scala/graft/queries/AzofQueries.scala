package graft.queries

import graft.Tables
import graft.format._
import graft.operators.AzofScan
import graft.sources.AzofWriter
import java.nio.file.Files
import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end exercise of the azof format itself inside the driver's
  * correctness gate: build a real azof table (base + two deltas) from the
  * `events` table, scan it AS OF a cut point through the production scan
  * path, and let DuckDB verify the equivalent latest-row-per-key query on
  * the raw events. This proves snapshot commit, segment/delta pruning,
  * file-precedence dedup, and ms-timestamp fidelity in one query.
  */
object AzofQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_azof_roundtrip" -> roundtrip)

  private def roundtrip(s: SparkSession, dir: String): DataFrame = {
    // The committed azof table is a deterministic function of the input
    // events, so cache it per scale-factor dir and rebuild only when the
    // _COMMITTED marker is absent (fresh temp dir per attempt, atomic
    // rename into place).
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    // cachedLake is a lakehouse dir holding the one table "events_kv"
    val cachedLake = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-azof-rt-$key")
    val marker = new java.io.File(new java.io.File(cachedLake, "events_kv"),
      "_COMMITTED")
    if (marker.isFile) {
      return AzofScan.scan(s, cachedLake.toString, "events_kv",
          AsOf.EventTime(Instant.parse("2024-01-25T00:00:00Z")))
        .select("key", "event_time", "event_type")
    }

    // azof stores ms timestamps; truncate up front so engine and oracle
    // agree on the event_time values and the as-of cut.
    val ev = Tables(s, dir, "events")
      .withColumn("ts", date_trunc("millisecond", col("ts")))
    val kv = ev.select(
      col("user_id").cast("string").as("key"),
      col("ts").as("event_time"),
      col("event_type"),
      col("props"))

    val lake = Files.createTempDirectory("azof-rt").toString
    val schema = TableSchema(Seq(
      ColumnDef("event_type", ColumnType.AzString, nullable = false),
      ColumnDef("props", ColumnType.AzString, nullable = false)))
    AzofWriter.createTable(s, lake, "events_kv", schema,
      Instant.parse("2024-01-01T00:00:00Z"))

    val d10 = "2024-01-10 00:00:00"
    val d20 = "2024-01-20 00:00:00"
    AzofWriter.commitBase(s, lake, "events_kv",
      kv.where(col("event_time") < expr(s"TIMESTAMP '$d10'")))
    AzofWriter.commitDelta(s, lake, "events_kv",
      kv.where(col("event_time") >= expr(s"TIMESTAMP '$d10'") &&
        col("event_time") < expr(s"TIMESTAMP '$d20'")),
      Instant.parse("2024-01-10T00:00:00Z"), Instant.parse("2024-01-20T00:00:00Z"))
    AzofWriter.commitDelta(s, lake, "events_kv",
      kv.where(col("event_time") >= expr(s"TIMESTAMP '$d20'")),
      Instant.parse("2024-01-20T00:00:00Z"), Instant.parse("2024-02-01T00:00:00Z"))

    Files.createFile(java.nio.file.Paths.get(lake, "events_kv", "_COMMITTED"))
    val fromLake =
      if (new java.io.File(lake).renameTo(cachedLake) || marker.isFile)
        cachedLake.toString
      else lake // lost a race or cross-device rename failed; use as built
    AzofScan.scan(s, fromLake, "events_kv",
        AsOf.EventTime(Instant.parse("2024-01-25T00:00:00Z")))
      .select("key", "event_time", "event_type")
  }

  def oracleSql: Map[String, String] = Map(
    "q18_azof_roundtrip" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE date_trunc('milliseconds', ts) <= TIMESTAMP '2024-01-25 00:00:00')
         WHERE rn = 1""")
}
