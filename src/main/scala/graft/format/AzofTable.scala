package graft.format

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Table/version resolution over any Hadoop-supported filesystem (local,
  * HDFS, S3A, ...) — the Spark-side equivalent of the reference's
  * `object_store`-backed Table (reference: crates/azof/src/table.rs:6-41):
  * a table is a directory holding `version.txt` (bare current snapshot
  * id), `s{id}.json` snapshot documents, and parquet data files addressed
  * relative to the directory.
  */
final class AzofTable(val tableDir: Path, conf: Configuration) {
  private def fs: FileSystem = tableDir.getFileSystem(conf)

  private def readUtf8(p: Path): String = {
    val in = fs.open(p)
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** `version.txt` → current snapshot id (reference: table.rs:35-41).
    *
    * Bounded retry on a missing/empty pointer: the writer replaces the
    * pointer by atomic rename where the store supports it, but on
    * rename-refusing stores (HDFS) the replace is delete+rename with a
    * brief pointer-ABSENT window; a reader landing inside it would
    * otherwise fail a healthy table. Five backoff probes (10+20+40+80+
    * 160 ≈ 300 ms total) cover that window; a pointer still absent
    * afterwards is a real error. A MISSING pointer under a missing
    * table directory fails immediately — that is a wrong path, not a
    * replace window, and a typo'd CLI invocation should not burn the
    * full backoff before erroring.
    */
  def currentVersion: String = {
    var attempt = 0
    var result: Option[String] = None
    while (result.isEmpty) {
      val raw =
        try Some(readUtf8(new Path(tableDir, "version.txt")))
        catch {
          case e: java.io.FileNotFoundException =>
            if (attempt >= 5 || !fs.exists(tableDir)) throw e
            None
        }
      raw.map(_.trim).filter(_.nonEmpty) match {
        case some @ Some(_) => result = some
        case None =>
          if (attempt >= 5)
            throw new java.io.IOException(
              s"version.txt in $tableDir is empty after retries")
          Thread.sleep(10L << attempt)
          attempt += 1
      }
    }
    result.get
  }

  /** `s{id}.json` → parsed snapshot (reference: table.rs:21-33). */
  def snapshot(id: String): Snapshot =
    SnapshotCodec.parse(readUtf8(new Path(tableDir, s"s$id.json")))

  /** A `VERSION AS OF` spec → numeric snapshot id: a numeric spec
    * passes through; anything else resolves as a NAMED ref (tag)
    * through the CURRENT snapshot's `refs` index — one O(1) lookup, no
    * history walk, because every commit carries the ref map forward.
    * Unknown tags fail loudly, naming the tags that do exist.
    */
  def resolveVersion(spec: String): String = {
    val t = spec.trim
    if (t.nonEmpty && t.forall(_.isDigit)) t
    else currentSnapshot.refs.get(t) match {
      case Some(v) => v.toString
      case None => branchHead(t) match {
        case Some(v) => v.toString
        case None =>
          val known = currentSnapshot.refs.keys.toSeq.sorted
          val branches = listBranches
          throw new IllegalArgumentException(
            s"azof table $tableDir has no version tag or branch '$t'" +
              (if (known.isEmpty && branches.isEmpty)
                 " (none exist; create one with tagVersion / " +
                   "createBranch / CALL system.{tag,create_branch})"
               else (if (known.nonEmpty)
                       s"; known tags: ${known.mkString(", ")}" else "") +
                 (if (branches.nonEmpty)
                    s"; known branches: ${branches.sorted.mkString(", ")}"
                  else "")))
      }
    }
  }

  /** Head version of branch `name`, or None if no such branch. The
    * pointer file (`branch-<name>.txt`) is a lag-tolerant cache exactly
    * like `version.txt`: a branch commit lands its snapshot document
    * FIRST and bumps the pointer second, so a crash between the two
    * leaves the head behind by one (or more). Recovery walks FORWARD
    * from the pointer adopting only documents that chain onto the
    * candidate head via `parent` with the same `branch` tag — a foreign
    * doc, a same-named doc from a dropped-and-recreated branch, or an
    * unrelated main commit never advances the head.
    */
  def branchHead(name: String): Option[Long] = {
    val p = new Path(tableDir, AzofTable.branchFile(name))
    if (!fs.exists(p)) None
    else {
      var head = readUtf8(p).trim.toLong
      val ids = AzofTable.snapshotIdsOnDisk(fs, tableDir).filter(_ > head)
      var advanced = true
      while (advanced) {
        advanced = false
        ids.find { id =>
          id > head && (classifySnapshot(id.toString) match {
            case SnapshotCodec.DocClass.Valid(s) =>
              s.branch.contains(name) && s.parent.contains(head)
            case _ => false
          })
        } match {
          case Some(id) => head = id; advanced = true
          case None => ()
        }
      }
      Some(head)
    }
  }

  /** Names of every branch with a live pointer file. */
  def listBranches: Seq[String] =
    if (!fs.exists(tableDir)) Seq.empty
    else fs.listStatus(tableDir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("branch-") && n.endsWith(".txt") =>
        n.stripPrefix("branch-").stripSuffix(".txt")
      }

  /** Read + classify `s{id}.json` ([[SnapshotCodec.classify]]). Read
    * failures (missing file, transient store errors) propagate as
    * IOExceptions — they are NOT corruption, and conflating them would
    * let a commit silently fork past (or a vacuum delete) a live
    * snapshot that merely failed one read.
    */
  def classifySnapshot(id: String): SnapshotCodec.DocClass =
    SnapshotCodec.classify(readUtf8(new Path(tableDir, s"s$id.json")))

  def currentSnapshot: Snapshot = snapshot(currentVersion)

  /** Absolute paths of the pruned data-file set for `asOf`, in merge
    * precedence order (first file wins per key).
    */
  def dataFilePaths(asOf: AsOf): Seq[Path] =
    currentSnapshot.dataFiles(asOf).map(f => new Path(tableDir, f))
}

object AzofTable {
  def apply(spark: SparkSession, lakehousePath: String, name: String): AzofTable =
    new AzofTable(
      new Path(lakehousePath, name),
      spark.sessionState.newHadoopConf())

  /** Numeric ids of every `s{N}.json` in `tableDir`, sorted — the ONE
    * directory-listing pipeline shared by vacuum and the change feed
    * (parseability of the documents is NOT checked here; callers that
    * care classify via [[SnapshotCodec.classify]]).
    */
  /** Pointer-file name for branch `name` (sibling of `version.txt`). */
  def branchFile(name: String): String = s"branch-$name.txt"

  def snapshotIdsOnDisk(fs: FileSystem, tableDir: Path): Seq[Long] =
    fs.listStatus(tableDir).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("s") && s.endsWith(".json") =>
        s.stripPrefix("s").stripSuffix(".json")
      }
      .flatMap(s => scala.util.Try(s.toLong).toOption)
      .sorted
}
