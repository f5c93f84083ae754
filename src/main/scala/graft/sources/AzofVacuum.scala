package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.format.AzofTable

/** VACUUM for azof tables: expire old snapshot documents and delete data
  * files no retained snapshot references — the lakehouse maintenance
  * operation (Delta-VACUUM analogue) the reference leaves unimplemented.
  *
  * azof nuance: a snapshot's segment tree carries the table's FULL
  * history, so expiring old `s{N}.json` documents does NOT lose event-time
  * travel — `TIMESTAMP AS OF` resolves entirely inside the current
  * snapshot. What expires is `VERSION AS OF n` for dropped n. Data files
  * become deletable only when no retained tree references them: orphans
  * from crashed commits, and files superseded by rewrites whose
  * referencing snapshots have all expired.
  *
  * All work is metadata + file listing on the driver — O(files in one
  * table directory), no Spark job; safe at any table size because a
  * table's file count is bounded by its commit history, not its rows.
  */
object AzofVacuum {

  final case class Report(
      deletedDataFiles: Seq[String],
      deletedSnapshots: Seq[Int],
      retainedSnapshots: Seq[Int])

  /** Default retention age (1 hour) — matches the CLI default, and is
    * deliberately the PROGRAMMATIC default too: the writer lands the data
    * file BEFORE s{N}.json and the version bump, so a minAge of 0 lets a
    * concurrent vacuum classify a mid-commit file as orphan debris and
    * corrupt the commit. Callers that KNOW no commit is in flight (tests,
    * single-writer offline maintenance) opt into `minAgeMs = 0`
    * explicitly.
    */
  val DefaultMinAgeMs: Long = 60L * 60 * 1000

  /** @param keepLast how many trailing snapshot versions to retain
    *                 (>=1; the current version is always retained)
    * @param dryRun   report what would be deleted without deleting
    * @param minAgeMs only delete files/snapshots last modified at least
    *                 this long ago — the Delta-style retention guard
    *                 against racing an in-flight commit (see
    *                 [[DefaultMinAgeMs]]).
    */
  def vacuum(
      spark: SparkSession, lakehousePath: String, table: String,
      keepLast: Int, dryRun: Boolean = false,
      minAgeMs: Long = DefaultMinAgeMs): Report = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val tableDir = new Path(lakehousePath, table)
    val conf = spark.sessionState.newHadoopConf()
    val fs = tableDir.getFileSystem(conf)
    val t = new AzofTable(tableDir, conf)
    val current = t.currentVersion.toInt
    val keepFrom = math.max(1, current - keepLast + 1)

    val statuses = fs.listStatus(tableDir).toSeq
    val now = System.currentTimeMillis()
    def oldEnough(name: String): Boolean = statuses
      .find(_.getPath.getName == name)
      .forall(now - _.getModificationTime >= minAgeMs)

    val snapshotIds = statuses
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("s") && s.endsWith(".json") =>
        s.stripPrefix("s").stripSuffix(".json")
      }
      .flatMap(s => scala.util.Try(s.toInt).toOption)
      .sorted
    // ids beyond version.txt are debris from a crashed commit (snapshot
    // written, version bump lost) — expire them with the old ones, but
    // only past the retention age (they may be a commit IN FLIGHT).
    // A snapshot document that fails to PARSE is the same debris one
    // notch worse (a pre-temp+rename writer died mid-write): it was
    // never committed — version.txt only ever names fully-written
    // documents — so it is expireable regardless of the retention range
    // and contributes nothing to the referenced set. The current
    // snapshot must still parse; that failing is real corruption.
    val corrupt = snapshotIds
      .filter(id => scala.util.Try(t.snapshot(id.toString)).isFailure)
      .toSet
    require(!corrupt.contains(current),
      s"current snapshot s$current.json is unreadable")
    val (retained, expiredAll) = snapshotIds.partition(id =>
      id >= keepFrom && id <= current && !corrupt.contains(id))
    val expired = expiredAll.filter(id => oldEnough(s"s$id.json"))
    require(retained.contains(current),
      s"current snapshot s$current.json is missing")

    // The referenced set is computed from EVERY snapshot JSON that will
    // remain on disk after THIS vacuum — retained ones plus expired-but-
    // too-young ones — not just the retained range: deleting a data file
    // still referenced by a kept-for-now s{N}.json would leave that
    // VERSION AS OF dangling until the next vacuum finally expired it.
    val remaining = snapshotIds.filterNot(expired.contains)
    val referenced = remaining
      .filterNot(corrupt.contains)
      .flatMap(id => t.snapshot(id.toString).allFiles)
      .toSet
    val dataFiles = statuses
      .map(_.getPath.getName)
      .filter(_.endsWith(".parquet"))
    val garbage = dataFiles.filterNot(referenced.contains).filter(oldEnough)
    // `_tmp_*` entries (staged snapshot docs / parquet staging dirs) are
    // pure write-side scratch: anything past the retention age belongs
    // to a crashed attempt, never to live data.
    val tmpDebris = statuses
      .map(_.getPath.getName)
      .filter(n => n.startsWith("_tmp_") && oldEnough(n))

    if (!dryRun) {
      garbage.foreach(f => fs.delete(new Path(tableDir, f), false))
      tmpDebris.foreach(f => fs.delete(new Path(tableDir, f), true))
      expired.foreach(id => fs.delete(new Path(tableDir, s"s$id.json"), false))
    }
    Report((garbage ++ tmpDebris).sorted, expired, retained)
  }
}
