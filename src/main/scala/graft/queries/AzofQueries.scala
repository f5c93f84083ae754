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
    "q18_azof_roundtrip" -> roundtrip,
    "q32_key_lookup" -> keyLookup,
    "q33_sql_insert" -> sqlInsert,
    "q34_bykey_lookup" -> byKeyLookup)

  /** Build (or reuse) the events_kv azof lakehouse for `dir` and return
    * its path. The committed table is a deterministic function of the
    * input events, so it is cached per scale-factor dir and rebuilt only
    * when the `_COMMITTED` marker is absent (fresh temp dir per attempt,
    * atomic rename into place). The cache name carries a format
    * generation ("v2": key-range stats in the snapshot) so a cache from
    * an older build never masks new snapshot metadata.
    */
  private def ensureLake(s: SparkSession, dir: String): String = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    // cachedLake is a lakehouse dir holding the one table "events_kv"
    val cachedLake = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-azof-rt-v2-$key")
    val marker = new java.io.File(new java.io.File(cachedLake, "events_kv"),
      "_COMMITTED")
    if (marker.isFile) return cachedLake.toString

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
    if (new java.io.File(lake).renameTo(cachedLake) || marker.isFile)
      cachedLake.toString
    else lake // lost a race or cross-device rename failed; use as built
  }

  private def roundtrip(s: SparkSession, dir: String): DataFrame =
    AzofScan.scan(s, ensureLake(s, dir), "events_kv",
        AsOf.EventTime(Instant.parse("2024-01-25T00:00:00Z")))
      .select("key", "event_time", "event_type")

  /** Key point-lookup through the PUBLIC reader surface with a WHERE on
    * `key`: the filter flows through the relation's pushdown into
    * stats-based file skipping ([[graft.format.FileStats]]) and the
    * residual predicate, so this gates both the skip logic and its
    * exactness against DuckDB. (This layout partitions files by time,
    * not key — numeric-string user ids spread across every file — so the
    * query exercises the conservative keep-everything path end to end;
    * DataSkippingSpec pins the actually-skips-files cases on
    * key-partitioned layouts.)
    */
  private def keyLookup(s: SparkSession, dir: String): DataFrame =
    s.read.format("azof").option("table", "events_kv")
      .option("asOf", "2024-01-25T00:00:00Z")
      .load(ensureLake(s, dir))
      .where(col("key").isin("7", "23", "41"))
      .select("key", "event_time", "event_type")

  /** The by-key distributed commit under the oracle gate: all events
    * land in ONE `commitPartitioned(byKey = true)` commit (files
    * range-partitioned by key, disjoint per-file key stats), then a
    * point lookup through the public reader — which prunes to the one
    * file whose range covers each key — must still match the brute
    * latest-row-per-key oracle.
    */
  private def byKeyLookup(s: SparkSession, dir: String): DataFrame = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val cachedLake = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-azof-bk-v1-$key")
    val marker = new java.io.File(new java.io.File(cachedLake, "events_bk"),
      "_COMMITTED")
    val lake =
      if (marker.isFile) cachedLake.toString
      else {
        val ev = Tables(s, dir, "events")
          .withColumn("ts", date_trunc("millisecond", col("ts")))
        val kv = ev.select(
          col("user_id").cast("string").as("key"),
          col("ts").as("event_time"),
          col("event_type"),
          col("props"))
        val tmp = Files.createTempDirectory("azof-bk").toString
        val schema = TableSchema(Seq(
          ColumnDef("event_type", ColumnType.AzString, nullable = false),
          ColumnDef("props", ColumnType.AzString, nullable = false)))
        AzofWriter.createTable(s, tmp, "events_bk", schema,
          Instant.parse("2024-01-01T00:00:00Z"))
        AzofWriter.commitPartitioned(s, tmp, "events_bk", kv,
          numFiles = 8, byKey = true)
        Files.createFile(java.nio.file.Paths.get(tmp, "events_bk", "_COMMITTED"))
        if (new java.io.File(tmp).renameTo(cachedLake) || marker.isFile)
          cachedLake.toString
        else tmp
      }
    s.read.format("azof").option("table", "events_bk").load(lake)
      .where(col("key").isin("7", "23", "41", "103"))
      .select("key", "event_time", "event_type")
  }

  /** The SQL WRITE surface under the oracle gate: CREATE TABLE + INSERT
    * INTO through the DSv2 catalog (→ partitioned delta commit), read
    * back through catalog SQL. The catalog name carries the sf-dir hash
    * because Spark caches catalog instances per name — one session
    * touching two scale factors (the bench's warmup) must not alias
    * their lakehouses.
    */
  private def sqlInsert(s: SparkSession, dir: String): DataFrame = {
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val lake = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-azof-sqlins-v2-$key")
    val cat = s"azsql_$key"
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.AzofCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.path", lake.toString)
    val marker = new java.io.File(new java.io.File(lake, "events_sql"),
      "_COMMITTED")
    if (!marker.isFile) {
      // partial build from a crashed attempt: start clean
      if (lake.isDirectory) {
        import scala.reflect.io.Directory
        new Directory(lake).deleteRecursively()
      }
      lake.mkdirs()
      s.sql(
        s"""CREATE TABLE $cat.events_sql
            (key STRING, event_time TIMESTAMP, event_type STRING, props STRING)
            USING azof TBLPROPERTIES ('start'='2024-01-01T00:00:00Z')""")
      Tables(s, dir, "events").createOrReplaceTempView(s"ev_src_$key")
      s.sql(
        s"""INSERT INTO $cat.events_sql
            SELECT CAST(user_id AS STRING), date_trunc('millisecond', ts),
                   event_type, props
            FROM ev_src_$key
            WHERE date_trunc('millisecond', ts) < TIMESTAMP'2024-01-10 00:00:00'""")
      Files.createFile(marker.toPath)
      ()
    }
    s.sql(s"SELECT key, event_time, event_type FROM $cat.events_sql")
  }

  def oracleSql: Map[String, String] = Map(
    "q18_azof_roundtrip" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE date_trunc('milliseconds', ts) <= TIMESTAMP '2024-01-25 00:00:00')
         WHERE rn = 1""",
    // key predicates commute with the per-key dedup, so the oracle is
    // q18's latest-row-per-key query restricted to the looked-up keys
    "q32_key_lookup" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE date_trunc('milliseconds', ts) <= TIMESTAMP '2024-01-25 00:00:00'
                 AND CAST(user_id AS VARCHAR) IN ('7', '23', '41'))
         WHERE rn = 1""",
    // the SQL-inserted table holds ms-truncated events before Jan 10;
    // its Current scan is latest-row-per-key over exactly that set
    "q33_sql_insert" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE date_trunc('milliseconds', ts) < TIMESTAMP '2024-01-10 00:00:00')
         WHERE rn = 1""",
    // one by-key commit holds ALL events, so Current is plain
    // latest-row-per-key restricted to the looked-up keys
    "q34_bykey_lookup" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE CAST(user_id AS VARCHAR) IN ('7', '23', '41', '103'))
         WHERE rn = 1""")
}
