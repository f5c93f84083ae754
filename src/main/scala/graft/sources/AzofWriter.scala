package graft.sources

import graft.format._
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.UUID
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Writer/versioning layer — the reference's unchecked roadmap
  * ("Single row / key-value writer", "Compaction", README.md:152-155)
  * realized the Spark way: `df.write.parquet` + snapshot-JSON commit +
  * `version.txt` bump. Data files keep the reference's physical contract:
  * column order `key, event_time, values...`, millisecond UTC timestamps,
  * rows sorted event_time-descending (the CLI generator's convention,
  * reference: crates/azof-cli/src/test_bench.rs:103-121).
  */
object AzofWriter {

  private def fs(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def writeUtf8(spark: SparkSession, p: Path, content: String): Unit = {
    val out = fs(spark, p).create(p, true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write `df` as a single parquet object at `tableDir/fileName`
    * (azof data files are single objects addressed by the snapshot;
    * reference: crates/azof/src/lakehouse.rs:44-47). Rows are sorted
    * event_time-descending and timestamps written as TIMESTAMP_MILLIS for
    * byte-level format parity. Fixture/commit-sized writes only — large
    * tables should land as multiple base files across segments.
    */
  def writeDataFile(
      spark: SparkSession,
      df: DataFrame,
      tableDir: String,
      fileName: String): Unit = {
    val dir = new Path(tableDir)
    val target = new Path(dir, fileName)
    val tmp = new Path(dir, s"_tmp_${UUID.randomUUID().toString}")
    val conf = spark.conf
    val prevTsType = conf.get("spark.sql.parquet.outputTimestampType")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try {
      df.coalesce(1)
        .sortWithinPartitions(col(TableSchema.EventTimeName).desc)
        .write.mode("overwrite").parquet(tmp.toString)
      val f = fs(spark, dir)
      val part = f.listStatus(tmp)
        .map(_.getPath)
        .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file under $tmp"))
      val parent = target.getParent
      if (!f.exists(parent)) { f.mkdirs(parent); () }
      if (f.exists(target)) { f.delete(target, false); () }
      if (!f.rename(part, target))
        throw new IllegalStateException(s"rename $part -> $target failed")
      f.delete(tmp, true)
      ()
    } finally conf.set("spark.sql.parquet.outputTimestampType", prevTsType)
  }

  def writeSnapshot(
      spark: SparkSession,
      tableDir: String,
      id: String,
      snapshot: Snapshot): Unit =
    writeUtf8(spark, new Path(tableDir, s"s$id.json"), SnapshotCodec.render(snapshot))

  def writeVersion(spark: SparkSession, tableDir: String, id: String): Unit =
    writeUtf8(spark, new Path(tableDir, "version.txt"), id)

  /** Create a table with one open segment and no data (snapshot 1). */
  def createTable(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      schema: TableSchema,
      segmentStart: Instant): Unit = {
    val dir = new Path(lakehousePath, name).toString
    val snap = Snapshot(schema,
      Seq(Segment("1", segmentStart, None, None, Seq.empty, Seq.empty)))
    writeSnapshot(spark, dir, "1", snap)
    writeVersion(spark, dir, "1")
  }

  /** Commit `df` (schema `key, event_time, values...`) as the base file of
    * the open root segment: new snapshot id = current + 1.
    */
  def commitBase(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      df: DataFrame): Unit =
    commit(spark, lakehousePath, name) { (nextId, snap) =>
      val fileName = s"base_s$nextId.parquet"
      val segs = mapOpenRoot(snap.segments)(s => s.copy(file = Some(fileName)))
      (fileName, snap.copy(segments = segs))
    } (df)

  /** Commit `df` as a delta file `[start, end]` on the open root segment:
    * new snapshot id = current + 1, `version.txt` bumped.
    */
  def commitDelta(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      df: DataFrame,
      start: Instant,
      end: Instant): Unit =
    commit(spark, lakehousePath, name) { (nextId, snap) =>
      val fileName = s"delta_s$nextId.parquet"
      val segs = mapOpenRoot(snap.segments)(s =>
        s.copy(delta = s.delta :+ Delta(fileName, start, end)))
      (fileName, snap.copy(segments = segs))
    } (df)

  private def mapOpenRoot(segments: Seq[Segment])(f: Segment => Segment): Seq[Segment] = {
    val openIdx = segments.indexWhere(_.end.isEmpty)
    require(openIdx >= 0, "table has no open segment to commit into")
    segments.updated(openIdx, f(segments(openIdx)))
  }

  private def commit(
      spark: SparkSession,
      lakehousePath: String,
      name: String)(
      update: (String, Snapshot) => (String, Snapshot))(
      df: DataFrame): Unit = {
    val table = AzofTable(spark, lakehousePath, name)
    val cur = table.currentVersion
    val nextId = (cur.toLong + 1).toString
    val (fileName, newSnap) = update(nextId, table.currentSnapshot)
    val dir = table.tableDir.toString
    val ordered = df.select(newSnap.schema.allColumnNames.map(col): _*)
    writeDataFile(spark, ordered, dir, fileName)
    writeSnapshot(spark, dir, nextId, newSnap)
    writeVersion(spark, dir, nextId)
  }
}
