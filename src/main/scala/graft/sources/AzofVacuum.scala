package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import graft.format.{AzofTable, SnapshotCodec}

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

  /** `deletedDataFiles` holds parquet data-file names only; swept
    * `_tmp_*` staging debris (snapshot temps, parquet staging dirs) is
    * reported separately in `deletedTmpFiles` so consumers that treat
    * the data-file list as parquet names never see staging entries.
    */
  final case class Report(
      deletedDataFiles: Seq[String],
      deletedSnapshots: Seq[Int],
      retainedSnapshots: Seq[Int],
      deletedTmpFiles: Seq[String] = Seq.empty)

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

    val snapshotIds =
      AzofTable.snapshotIdsOnDisk(fs, tableDir).map(_.toInt)
    // ONE parse pass: every snapshot document is read and classified
    // exactly once (SnapshotCodec.classify); the corrupt set, the
    // loud-abort check, and the referenced-file union below all derive
    // from this map — on a 1000-commit table that's 1000 document reads
    // per vacuum, not 2000. Read IOExceptions propagate: a transient
    // read failure must never classify a live snapshot as debris (that
    // would let vacuum delete its document and the data files only it
    // references).
    val docs: Map[Int, SnapshotCodec.DocClass] =
      snapshotIds.map(id => id -> t.classifySnapshot(id.toString)).toMap

    // A well-formed JSON object this codec cannot read is NOT crash
    // debris — it may be a NEWER engine's committed document, and its
    // referenced data files are unknowable here. Deleting it (or
    // computing a referenced set without it) risks destroying a commit,
    // so vacuum refuses the whole table loudly. The refusal cannot be
    // soundly scoped to the retained id range: data-file GC keys on the
    // UNION of every remaining snapshot's referenced files, and an
    // unknown document's references are unknowable wherever its id
    // sits — even an out-of-range unknown could reference a file GC
    // would otherwise sweep. The error therefore names the operator
    // remedy instead of offering an unsafe override.
    val unknown = docs.collect {
      case (id, _: SnapshotCodec.DocClass.WellFormedUnknown) => id
    }.toSeq.sorted
    require(unknown.isEmpty,
      s"snapshot${if (unknown.size > 1) "s" else ""} " +
        unknown.map(i => s"s$i.json").mkString(", ") +
        " parse as JSON but not as snapshots this engine can read " +
        "(possibly committed by a newer engine version) — refusing to " +
        "vacuum: their referenced data files are unknown. Nothing was " +
        "deleted. Remedy: if the table is shared with a newer engine, " +
        "upgrade this engine and re-run; if the document is foreign " +
        "debris that never belonged to this table, inspect and remove " +
        "it by hand, then re-run")

    // ids beyond version.txt are debris from a crashed commit (snapshot
    // written, version bump lost) — expire them with the old ones, but
    // only past the retention age (they may be a commit IN FLIGHT).
    // A MALFORMED document (truncated JSON — a pre-temp+rename writer
    // died mid-write) is the same debris one notch worse: it was never
    // committed — version.txt only ever names fully-written documents —
    // so it is expireable regardless of the retention range and
    // contributes nothing to the referenced set. The current snapshot
    // must still parse; that failing is real corruption.
    val corrupt = docs.collect {
      case (id, _: SnapshotCodec.DocClass.Malformed) => id
    }.toSet
    require(!corrupt.contains(current),
      s"current snapshot s$current.json is unreadable")
    // Named version refs (tags) pin their target documents regardless of
    // keepLast: the CURRENT snapshot's ref index is authoritative (every
    // commit carries refs forward). A tagged id whose document went
    // malformed on disk is refused loudly — "retaining" it would keep a
    // doc that contributes nothing to the referenced-file union, so its
    // data files would be swept and the tag left dangling. A tag whose
    // target document is already absent is ignored for retention (it is
    // already dangling; resolution fails loudly at read time).
    val tagged: Set[Int] = docs.get(current) match {
      case Some(SnapshotCodec.DocClass.Valid(s)) =>
        val t = s.refs.values.map(_.toInt).toSet
        val taggedCorrupt = (t intersect corrupt).toSeq.sorted
        require(taggedCorrupt.isEmpty,
          s"tagged snapshot${if (taggedCorrupt.size > 1) "s" else ""} " +
            taggedCorrupt.map(i => s"s$i.json").mkString(", ") +
            " are unreadable on disk — refusing to vacuum: expiring a " +
            "tagged version would dangle its tag, retaining an " +
            "unreadable one would sweep its data files. Untag or " +
            "restore the document, then re-run")
        t.filter(snapshotIds.contains)
      case _ => Set.empty
    }
    // Live BRANCH lineages pin their documents the way tags do: for
    // every branch pointer file, walk the head's parent chain down to
    // its main fork — those ids (typically beyond version.txt, where
    // the debris rule would otherwise expire them) stay. A dropped
    // branch's documents fall out of this set and expire normally. A
    // live head that is malformed or missing is refused loudly, the
    // tag contract: expiring it would dangle the branch, retaining an
    // unreadable doc would sweep the data files only it references.
    val branchPinned: Set[Int] = t.listBranches.flatMap { b =>
      val head = t.branchHead(b).getOrElse(
        throw new IllegalStateException(
          s"branch '$b' pointer names no resolvable head — refusing to " +
            "vacuum; drop the branch or restore its documents, then re-run"))
      require(!corrupt.contains(head.toInt) &&
        snapshotIds.contains(head.toInt),
        s"branch '$b' head s$head.json is unreadable or missing on disk " +
          "— refusing to vacuum: expiring it would dangle the branch. " +
          "Drop the branch or restore the document, then re-run")
      var ids = List(head.toInt)
      var cur = docs(head.toInt) match {
        case SnapshotCodec.DocClass.Valid(s) => s
        case _ => throw new IllegalStateException(
          s"branch '$b' head s$head.json unreadable") // guarded above
      }
      while (cur.branch.nonEmpty && cur.parent.nonEmpty &&
        docs.get(cur.parent.get.toInt)
          .exists(_.isInstanceOf[SnapshotCodec.DocClass.Valid])) {
        val p = cur.parent.get.toInt
        ids ::= p
        cur = docs(p).asInstanceOf[SnapshotCodec.DocClass.Valid].snapshot
      }
      ids
    }.toSet
    val (retained, expiredAll) = snapshotIds.partition(id =>
      (id >= keepFrom && id <= current && !corrupt.contains(id)) ||
        tagged.contains(id) || branchPinned.contains(id))
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
      .flatMap(id => docs.get(id).toSeq.collect {
        case SnapshotCodec.DocClass.Valid(s) => s
      })
      .flatMap(_.allFiles)
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
    Report(garbage.sorted, expired, retained, tmpDebris.sorted)
  }
}
