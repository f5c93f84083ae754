package graft.sources

import graft.format._
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change feed between two snapshot versions — the batch form of the
  * reference's "Streaming in scan" roadmap item (reference:
  * README.md:158-159): every row added by commits in `(fromVersion,
  * toVersion]`, tagged with `_commit_version` plus a `_deleted` flag
  * (the Delta-CDF-style change-type column: false for inserts/upserts,
  * true for tombstone rows from `commitDelete`, whose values are NULL).
  * The feed is exactly the new data files of each data-adding commit;
  * `compact` snapshots rewrite existing rows and are skipped via the
  * snapshot `op` marker.
  */
object AzofChangeFeed {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def between(
      spark: SparkSession,
      lakehousePath: String,
      table: String,
      fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion, "fromVersion must be <= toVersion")
    val t = AzofTable(spark, lakehousePath, table)
    // ONE parse per snapshot document, memoized over [from, to] — the
    // pairwise walk used to re-parse every interior document as both
    // the `v` and the `v - 1` of adjacent iterations, doubling driver
    // JSON work on long histories (same O(2N)-reads shape the vacuum
    // fix removed, AzofVacuum.scala).
    val snaps: Map[Long, Snapshot] =
      (fromVersion to toVersion).map(v => v -> t.snapshot(v.toString)).toMap
    // BRANCH commits share the version sequence but belong to another
    // lineage: they are not main feed events (their rows surface at
    // fast-forward publish time, when the FF commit's diff picks up the
    // branch's files), so the walk below runs over MAIN documents only
    // and diffs each against its main PREDECESSOR. Feed bounds normally
    // arrive as main versions (offsets come from version.txt), but a
    // CAPPED stream offset lives in the SHARED id space and can name a
    // branch document (AzofCommitSource.latestOffset caps to
    // base + maxVersionsPerBatch): branch commits deliver nothing to
    // the main feed, so a batch ending at such an offset delivered
    // exactly the main commits <= it — REBASE the diff to the greatest
    // main document <= fromVersion (every id between is a branch doc by
    // maximality, so nothing is skipped or re-delivered). This is the
    // main-side mirror of branchBetween's tolerance for main ids inside
    // ITS bounds; the old loud require here wedged a checkpointed
    // capped offset permanently.
    val (base, baseSnap) =
      if (snaps(fromVersion).branch.isEmpty) (fromVersion, snaps(fromVersion))
      else mainAtOrBefore(spark, t, fromVersion)
    val delivered: Seq[Long] =
      ((fromVersion + 1) to toVersion).filter(v => snaps(v).branch.isEmpty)
    def snapOf(v: Long): Snapshot =
      if (v == base && !snaps.contains(v)) baseSnap else snaps(v)
    val schema =
      delivered.lastOption.map(v => snaps(v).schema).getOrElse(baseSnap.schema)

    // (file, committing version) for every data-adding commit in range;
    // the ROWS come from ONE parquet scan below.
    val fileVersions: Seq[(String, Long)] =
      (base +: delivered).zip(delivered).flatMap { case (prev, v) =>
        val snap = snaps(v)
        // compact REWRITES rows, purge REMOVES them, rollback
        // RE-REGISTERS old files whose rows this feed already delivered
        // when they first committed — none adds data, so none's file
        // names enter the feed. (A rollback DOES change the table's
        // current view without a feed event: downstream mirrors/indexes
        // of a rolled-back table need an epoch rebuild, the documented
        // reconciliation contract — see AzofWriter.rollback. Fast-
        // forward DOES feed: the branch's files go live at publish.)
        if (snap.op.exists(o =>
          o == "compact" || o == "purge" || o == "rollback")) Seq.empty
        else (snap.allFiles -- snapOf(prev).allFiles).toSeq.sorted.map(_ -> v)
      }

    assemble(spark, t, table, schema, fileVersions,
      snaps.valuesIterator.flatMap(_.tombstoneFiles).toSet ++
        baseSnap.tombstoneFiles)
  }

  /** Greatest MAIN-lineage snapshot with id <= `v` — the rebase target
    * for feed bounds that name a BRANCH document. Stream offsets live in
    * the table's SHARED id space, so a capped offset
    * ([[graft.streaming.AzofCommitSource]]'s `maxVersionsPerBatch`) can
    * land on a branch commit's id; the main feed's semantics for such an
    * offset are "every main commit <= it delivered", whose diff base is
    * exactly this document. The downward walk parses only the branch
    * documents between `v` and its nearest main predecessor — bounded by
    * one branch run, not history.
    */
  private[graft] def mainAtOrBefore(
      spark: SparkSession, t: AzofTable, v: Long): (Long, Snapshot) = {
    val first = t.snapshot(v.toString)
    if (first.branch.isEmpty) (v, first)
    else {
      val fs = t.tableDir.getFileSystem(spark.sessionState.newHadoopConf())
      AzofTable.snapshotIdsOnDisk(fs, t.tableDir)
        .filter(_ < v).sorted(Ordering[Long].reverse).iterator
        .map(id => id -> t.snapshot(id.toString))
        .collectFirst { case (id, s) if s.branch.isEmpty => (id, s) }
        .getOrElse(throw new IllegalStateException(
          s"no main-lineage snapshot at or before $v in ${t.tableDir} — " +
            "every earlier document is a branch commit or was expired " +
            "by vacuum; re-seed the consumer from a full scan"))
    }
  }

  /** Greatest snapshot on `branchName`'s chain with id <= `v` — or the
    * FORK snapshot when the whole chain is past `v`. The branch twin of
    * [[mainAtOrBefore]]: a capped branch-stream offset can name a MAIN
    * document in the shared id space, and (now that branch lineages can
    * additively evolve) the stream's end-schema guard needs the BRANCH
    * schema in force at that point, not main's.
    */
  private[graft] def branchAtOrBefore(
      t: AzofTable, branchName: String, v: Long): Snapshot = {
    var cur = t.branchHead(branchName).getOrElse(
      throw new IllegalArgumentException(
        s"no such branch '$branchName' on ${t.tableDir}"))
    var snap = t.snapshot(cur.toString)
    while (snap.branch.contains(branchName) && cur > v) {
      cur = snap.parent.getOrElse(throw new IllegalStateException(
        s"branch '$branchName' lineage broken at s$cur.json: no parent " +
          "link"))
      snap = t.snapshot(cur.toString)
    }
    snap
  }

  /** Publish preview — the audit primitive of the write-audit-publish
    * flow: every row that publishing `branchName` (via
    * [[AzofWriter.fastForward]] or [[AzofWriter.mergeBranch]]) would
    * make live on main, commit-exactly, BEFORE the publish happens.
    * Rows carry `_commit_version` = the BRANCH commit that staged them
    * (provenance — the eventual main feed tags them with the publish
    * commit instead, which does not exist yet) and the same `_deleted`
    * tombstone flag as the main feed, so an auditor sees exactly which
    * keys the publish adds, updates, or deletes without scanning either
    * lineage's full state.
    *
    * The change set is exactly what the publish registers: the branch
    * lineage's delta files since the fork, minus anything already on
    * main's current snapshot (mergeBranch skips those — re-previewing
    * after a partial publish shows only the remainder). Like the main
    * feed this is metadata-pruned — one scan over only the staged
    * files, never a branch-vs-main state diff.
    */
  def branchDiff(
      spark: SparkSession,
      lakehousePath: String,
      table: String,
      branchName: String): DataFrame = {
    val t = AzofTable(spark, lakehousePath, table)
    val head = t.branchHead(branchName).getOrElse(
      throw new IllegalArgumentException(
        s"no such branch '$branchName' on $table" +
          (if (t.listBranches.isEmpty) ""
           else s"; known branches: ${t.listBranches.sorted.mkString(", ")}")))
    val headSnap = t.snapshot(head.toString)
    require(headSnap.branch.contains(branchName),
      s"branch '$branchName' has no commits (head s$head.json is the " +
        "fork itself) — nothing to preview")
    // branch commits oldest-first, walking the parent chain to the fork
    var chain = List.empty[(Long, Snapshot)]
    var cur = head
    var snap = headSnap
    while (snap.branch.nonEmpty) {
      chain ::= (cur, snap)
      cur = snap.parent.getOrElse(throw new IllegalStateException(
        s"branch '$branchName' lineage broken at s$cur.json: no parent " +
          "link — cannot prove ancestry for a publish preview"))
      snap = t.snapshot(cur.toString)
    }
    // files main already serves never re-publish (fork tree + anything
    // an earlier merge carried over) — same exclusion mergeBranch
    // applies. The preview is HEAD-TREE-scoped: each file tags the
    // chain commit that introduced it, and only files the head tree
    // still references publish. A branch COMPACT (fold-before-publish)
    // closes the staged deltas into history and adds their merged
    // state, so a folded branch previews BOTH — the staged rows at
    // their staging commits plus the fold's re-asserted state at the
    // fold commit — which is exactly what the post-publish main feed
    // delivers (fast-forward registers the whole head tree, closed
    // children included). Content duplication across the two is the
    // same idempotent-upsert story as main compaction's merged rows.
    val headFiles = headSnap.allFiles
    val published = snap.allFiles ++ t.currentSnapshot.allFiles
    var prevFiles = snap.allFiles
    val fileVersions: Seq[(String, Long)] = chain.flatMap { case (v, s) =>
      val fresh = s.allFiles -- prevFiles
      prevFiles = s.allFiles
      (fresh & headFiles &~ published).toSeq.sorted.map(_ -> v)
    }
    assemble(spark, t, table, headSnap.schema, fileVersions,
      chain.iterator.map(_._2).flatMap(_.tombstoneFiles).toSet)
  }

  /** Commit-exact change feed over a BRANCH lineage — the branch twin
    * of [[between]], serving the streaming tail of a STAGED lineage
    * (audit pipelines that follow a staging branch live, before
    * publish). Delivers every row added by the branch's data-adding
    * commits with id in `(fromVersion, toVersion]`, tagged
    * `_commit_version` = the landing snapshot id and the `_deleted`
    * tombstone flag. Ids are the table's shared snapshot numbering:
    * main commits interleave but never enter this walk (the chain is
    * the head's parent links), and the same maintenance-op skip as the
    * main feed applies — a branch FOLD ([[AzofWriter.compact]] with a
    * branch) rewrites rows and delivers nothing, exactly like main
    * compaction. (Contrast [[branchDiff]], which previews the PUBLISH
    * and therefore serves the folded tree.)
    */
  def branchBetween(
      spark: SparkSession,
      lakehousePath: String,
      table: String,
      branchName: String,
      fromVersion: Long,
      toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion, "fromVersion must be <= toVersion")
    val t = AzofTable(spark, lakehousePath, table)
    val head = t.branchHead(branchName).getOrElse(
      throw new IllegalArgumentException(
        s"no such branch '$branchName' on $table" +
          (if (t.listBranches.isEmpty) ""
           else s"; known branches: ${t.listBranches.sorted.mkString(", ")}")))
    // chain head -> fork, oldest-first; parse each document once
    var chain = List.empty[(Long, Snapshot)]
    var cur = head
    var snap = t.snapshot(cur.toString)
    while (snap.branch.contains(branchName)) {
      chain ::= (cur, snap)
      cur = snap.parent.getOrElse(throw new IllegalStateException(
        s"branch '$branchName' lineage broken at s$cur.json: no parent " +
          "link — cannot walk the commit chain"))
      snap = t.snapshot(cur.toString)
    }
    // the lineage schema IN FORCE at the range's end (branch lineages
    // can additively evolve): the greatest chain doc <= toVersion, or
    // the fork when the whole range precedes the chain
    val schema = chain.filter(_._1 <= toVersion).lastOption
      .map(_._2).getOrElse(snap).schema
    var prevFiles = snap.allFiles // the fork tree
    val fileVersions: Seq[(String, Long)] = chain.flatMap { case (v, s) =>
      val fresh = (s.allFiles -- prevFiles).toSeq.sorted
      prevFiles = s.allFiles
      if (v <= fromVersion || v > toVersion ||
        s.op.exists(o => o == "compact" || o == "purge" || o == "rollback"))
        Seq.empty
      else fresh.map(_ -> v)
    }
    assemble(spark, t, table, schema, fileVersions,
      chain.iterator.map(_._2).flatMap(_.tombstoneFiles).toSet)
  }

  /** One-scan row assembly shared by the main feed and the branch
    * publish preview: read every (file, tagging version) pair, recover
    * the version per row from the file basename, surface tombstone rows
    * as `_deleted = true`.
    */
  private def assemble(
      spark: SparkSession,
      t: AzofTable,
      table: String,
      schema: TableSchema,
      fileVersions: Seq[(String, Long)],
      tombstoneNames: Set[String]): DataFrame = {
    // delete commits surface as rows tagged `_deleted = true` (values
    // NULL) — the Delta-CDF-style change-type column, always present so
    // the feed's schema is stable whether or not the range has deletes
    val hasTombstones =
      fileVersions.exists { case (f, _) => tombstoneNames(f) }
    // files store PHYSICAL column names; the feed surfaces LOGICAL ones
    val readSchema =
      if (hasTombstones)
        schema.physicalStruct.add(TableSchema.DeletedName, "boolean")
      else schema.physicalStruct
    def toLogical(df: DataFrame): DataFrame = schema.toLogicalNames(df)
    def withDeleted(df: DataFrame): DataFrame = {
      val logical = toLogical(df)
      if (hasTombstones)
        logical.withColumn("_deleted",
            coalesce(col(TableSchema.DeletedName), lit(false)))
          .drop(TableSchema.DeletedName)
      else logical.withColumn("_deleted", lit(false))
    }

    if (fileVersions.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema.toStruct.add("_commit_version", "long")
          .add("_deleted", "boolean", nullable = false))
    else {
      val paths = fileVersions.map { case (f, _) =>
        new Path(t.tableDir, f).toString
      }
      val basenames = fileVersions.map { case (f, _) => new Path(f).getName }
      // input_file_name() yields the URI-ESCAPED path: a file name that
      // URI-encoding rewrites (or a duplicate basename across
      // subdirectories) would make the lookup disagree with the raw
      // snapshot names. Engine-generated names are safe; for foreign
      // layouts fall back to per-file reads (plan grows with the file
      // count — acceptable for these rare layouts), mirroring AzofScan.
      def uriSafe(n: String): Boolean =
        new java.net.URI(null, null, n, null).getRawPath == n
      if (basenames.distinct.size == basenames.size &&
          basenames.forall(uriSafe)) {
        // ONE scan over all new files with the committing version
        // recovered per row from the file's basename — the AzofScan
        // precedence-map pattern. The old shape (one DataFrame per file
        // reduced with nested unionAll) grew the plan linearly with
        // commit count and blew up driver planning on long-history
        // tables; this plan is O(1) in the number of commits. Basenames
        // are unique within a table directory (all files live flat), and
        // a literal map caps expression size at few files, a broadcast
        // join beyond that.
        val single = spark.read.schema(readSchema).parquet(paths: _*)
        val baseName = regexp_extract(input_file_name(), "[^/]+$", 0)
        val threshold = spark.conf
          .getOption("spark.azof.precedenceJoinThreshold")
          .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
          .getOrElse(64)
        val tagged = if (fileVersions.size <= threshold) {
          val entries = fileVersions.flatMap { case (f, v) =>
            Seq(lit(new Path(f).getName), lit(v))
          }
          single
            .withColumn("_cf_file", baseName)
            .withColumn("_commit_version",
              element_at(map(entries: _*), col("_cf_file")))
        } else {
          val lookup = broadcast(
            spark.createDataFrame(fileVersions.map { case (f, v) =>
              (new Path(f).getName, v)
            }).toDF("_cf_file", "_commit_version"))
          single.withColumn("_cf_file", baseName)
            .join(lookup, Seq("_cf_file"), "left")
        }
        // a null tag means input_file_name() disagreed with the literal
        // file list despite the safety gate — fail LOUDLY instead of
        // silently mistagging (map path) or dropping rows (join path)
        withDeleted(tagged
          .withColumn("_commit_version",
            coalesce(col("_commit_version"), raise_error(concat(
              lit(s"azof change feed on $table: data file not in the " +
                "commit map (URI-escaped name mismatch?): "),
              col("_cf_file")))))
          .drop("_cf_file"))
      } else {
        withDeleted(fileVersions.zip(paths).map { case ((_, v), p) =>
          spark.read.schema(readSchema).parquet(p)
            .withColumn("_commit_version", lit(v))
        }.reduce(_ unionAll _))
      }
    }
  }

  /** Feed from a version up to the current snapshot. */
  def since(
      spark: SparkSession,
      lakehousePath: String,
      table: String,
      fromVersion: Long): DataFrame = {
    val t = AzofTable(spark, lakehousePath, table)
    between(spark, lakehousePath, table, fromVersion, t.currentVersion.toLong)
  }

  /** One poll of a resumable, COMMIT-EXACT tail over the change feed:
    * read the consumer's last processed version from `checkpointDir`,
    * hand `fn` every row committed in `(last, current]` (tagged with
    * `_commit_version`), then advance the checkpoint — deliver-then-
    * advance, so a crash mid-`fn` re-delivers the unacknowledged
    * versions on resume (plus any newly committed ones): at-least-once,
    * with every row carrying its `_commit_version` — an idempotent or
    * version-keyed sink (e.g. [[graft.streaming.AzofSink]] with its
    * `stream_batches` replay index) gets effectively-once.
    *
    * Commit-exactness is the property the file-tailing stream
    * ([[graft.streaming.AzofStream.appends]]) cannot give: that feed
    * surfaces data FILES as they land, so a crashed writer's orphan
    * (file written, snapshot commit never finalized) enters downstream
    * state and is never retracted. This feed reads only files a
    * COMMITTED snapshot references, so orphans are invisible by
    * construction; the trade-off is commit-granularity latency instead
    * of file-granularity.
    *
    * Returns the `(from, to)` version range delivered (`from > to`
    * means no new commits). A consumer that lags past snapshot
    * retention fails with a clear out-of-range error (the Kafka
    * earliest-offset analogue) instead of a bare missing-file read —
    * detected at feed CONSTRUCTION (snapshot walk); a vacuum racing
    * the delivery itself can still surface as a task-level missing
    * -file failure inside `fn`, in which case the offset correctly
    * does not advance and the retry hits the loud path.
    *
    * @param startVersion first poll's base when no checkpoint exists:
    *                     process `(startVersion, current]`; defaults to
    *                     1 — everything after table creation (version 1
    *                     is the data-less create snapshot, the earliest
    *                     valid feed base).
    */
  def followOnce(
      spark: SparkSession,
      lakehousePath: String,
      table: String,
      checkpointDir: String,
      startVersion: Long = 1L)(
      fn: (DataFrame, Long, Long) => Unit): (Long, Long) = {
    val ckDir = new Path(checkpointDir)
    val ck = new Path(ckDir, "azof-commit-offset")
    val fs = ck.getFileSystem(spark.sessionState.newHadoopConf())
    // seed the offset on the FIRST poll even when there is nothing to
    // deliver yet: an explicit startVersion must survive into later
    // polls, not silently revert to the default base once commits land
    def advance(to: Long): Unit = {
      if (!fs.exists(ckDir)) { fs.mkdirs(ckDir); () }
      // a single-consumer checkpoint has no legitimate concurrent
      // writers, so a survived foreign file is a stale offset — the
      // consumer would silently re-deliver forever if this passed
      if (!AtomicReplace.replace(fs, ckDir, ck, to.toString))
        throw new java.io.IOException(
          s"failed to advance offset $ck: a stale offset file survived " +
            "the replace (store fault mid-replace, or a concurrent " +
            "consumer sharing this checkpoint)")
    }
    val existing =
      if (!fs.exists(ck)) {
        // an ABSENT offset beside _tmp_ptr_ staging residue is not a
        // fresh checkpoint — it is an offset write interrupted inside
        // the delete+rename fallback window (rename-refusing stores).
        // Seeding startVersion here would silently replay history past
        // the lost offset; refuse and make the operator decide.
        val residue =
          if (!fs.exists(ckDir)) Array.empty[String]
          else fs.listStatus(ckDir).map(_.getPath.getName)
            .filter(_.startsWith("_tmp_ptr_"))
        if (residue.nonEmpty)
          throw new IllegalStateException(
            s"checkpoint $checkpointDir has no offset but carries " +
              s"staging residue (${residue.mkString(", ")}) from an " +
              "interrupted offset write — the previous offset may be " +
              "lost. Re-seed explicitly: delete the residue and pass " +
              "startVersion, or start a fresh checkpoint.")
        None
      } else Some(readOffset(fs, ck))
    existing.filter(_ != startVersion).foreach { off =>
      if (startVersion != 1L)
        log.warn(
          s"checkpoint $checkpointDir already holds offset $off; " +
            s"startVersion $startVersion is ignored (re-seed with a " +
            "fresh checkpoint to change the base)")
    }
    val t = AzofTable(spark, lakehousePath, table)
    val cur = t.currentVersion.toLong
    // an offset AHEAD of the table is never a caught-up consumer — it
    // is a stale checkpoint from a deleted-and-recreated table or a
    // typo'd base; silently waiting here would skip every version up
    // to the stale offset once the table catches up. Checked BEFORE
    // seeding so a bad explicit base never pollutes the checkpoint.
    if (existing.getOrElse(startVersion) > cur)
      throw new IllegalStateException(
        s"${existing.map(o => s"checkpoint offset $o")
          .getOrElse(s"startVersion $startVersion")} is ahead of " +
          s"$table's current version $cur: stale checkpoint (table " +
          "recreated?) or a bad base — use a fresh checkpoint with an " +
          "in-range base")
    val last = existing.getOrElse { advance(startVersion); startVersion }
    if (cur <= last) (last + 1, cur)
    else {
      val df =
        try between(spark, lakehousePath, table, last, cur)
        catch {
          case e: java.io.FileNotFoundException =>
            throw new IllegalStateException(
              s"change-feed consumer at version $last lags past snapshot " +
                s"retention for $table (current $cur): a snapshot in range " +
                s"was vacuumed. Re-seed from a full scan, then start a " +
                s"fresh checkpoint at the retained floor — " +
                s"startVersion = earliestFeedBase(...) = " +
                s"${scala.util.Try(earliestFeedBase(spark, lakehousePath, table))
                  .getOrElse("?")} (CLI: --from that version).", e)
        }
      fn(df, last + 1, cur)
      // advance AFTER delivery: a crash mid-fn re-delivers on resume
      advance(cur)
      (last + 1, cur)
    }
  }

  /** Read the checkpoint offset, tolerating the brief EMPTY window an
    * interrupted create-if-absent restore can expose on rename-refusing
    * stores (AtomicReplace's restore path publishes create → write →
    * close; a reader landing between create and close sees a present-
    * but-empty file). Bounded backoff mirrors
    * [[graft.format.AzofTable.currentVersion]]; an offset still empty
    * afterwards — or holding non-numeric bytes — fails with a
    * descriptive error instead of a bare NumberFormatException.
    */
  private def readOffset(
      fs: org.apache.hadoop.fs.FileSystem, ck: Path): Long = {
    var attempt = 0
    while (true) {
      val in = fs.open(ck)
      val s = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim
      finally in.close()
      if (s.nonEmpty)
        return s.toLongOption.getOrElse(throw new IllegalStateException(
          s"offset file $ck holds '$s', not a snapshot version — " +
            "corrupted checkpoint; re-seed with a fresh checkpoint"))
      if (attempt >= 5)
        throw new IllegalStateException(
          s"offset file $ck is empty after retries: an offset write was " +
            "interrupted mid-restore and the previous offset may be " +
            "lost — re-seed explicitly with a fresh checkpoint and an " +
            "appropriate startVersion")
      Thread.sleep(10L << attempt)
      attempt += 1
    }
    0L // unreachable
  }

  /** The lowest version a change-feed consumer can currently use as its
    * base: the oldest snapshot document still on disk. Rows committed
    * before it are only reachable via a full scan — the Kafka
    * earliest-offset analogue for re-seeding a consumer that lagged
    * past vacuum retention.
    */
  def earliestFeedBase(
      spark: SparkSession, lakehousePath: String, table: String): Long = {
    val dir = new Path(lakehousePath, table)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val ids = AzofTable.snapshotIdsOnDisk(fs, dir)
    require(ids.nonEmpty, s"no snapshot documents under $dir")
    ids.min
  }
}
