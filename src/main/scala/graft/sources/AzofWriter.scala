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

  /** Version-keyed data-file name with a unique suffix. Snapshot JSONs
    * address files by exact name, so names need not be predictable —
    * and they must NOT be: two committers racing at the same next
    * version would otherwise write the SAME target, letting the race
    * loser silently replace the winner's just-landed bytes before the
    * winner's create-if-absent snapshot commit (the snapshot-level
    * first-writer-wins guard protects metadata only). Unique names also
    * unwedge retries after a crashed commit: the orphan from the failed
    * attempt never collides with the retry, and vacuum ages it out.
    */
  private def uniqueSuffix(): String = UUID.randomUUID().toString.take(8)

  /** Opt-in per-file key Bloom filters in the snapshot stats
    * (`spark.azof.stats.bloomBits`, 0/unset = off; rounded down to a
    * byte multiple; `spark.azof.stats.bloomK` hashes, default 4).
    * Opt-in because the filter's base64 rides in every snapshot
    * document: bits should be ~10× the expected distinct keys per file
    * (e.g. 65536 bits = 8 KB/file for ~6k keys at ~1% FPR), which an
    * operator sizes for lookup-heavy tables and leaves off for tables
    * whose layouts min/max ranges already prune.
    */
  private def bloomConf(spark: SparkSession): Option[(Int, Int)] =
    spark.conf.getOption("spark.azof.stats.bloomBits")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .map(_ / 8 * 8)
      .filter(_ >= 64)
      .map { bits =>
        (bits, spark.conf.getOption("spark.azof.stats.bloomK")
          .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
          .filter(_ >= 1).getOrElse(4))
      }

  /** OR-accumulating Bloom aggregator over the key column — partial
    * aggregation per partition, byte-wise OR merge, so building the
    * filter costs one pass and shuffles only bitset-sized buffers.
    */
  private class BloomAgg(bits: Int, k: Int)
    extends org.apache.spark.sql.expressions.Aggregator[String, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte](bits / 8)
    override def reduce(buf: Array[Byte], key: String): Array[Byte] = {
      KeyBloom.put(buf, key, bits, k); buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  private def bloomColumn(
      spark: SparkSession, conf: Option[(Int, Int)]): Seq[org.apache.spark.sql.Column] =
    conf.toSeq.map { case (bits, k) =>
      org.apache.spark.sql.functions
        .udaf(new BloomAgg(bits, k), org.apache.spark.sql.Encoders.STRING)
        .apply(col(TableSchema.KeyName))
    }

  private def uniqueFileName(prefix: String): String =
    s"${prefix}_${uniqueSuffix()}.parquet"

  private def writeUtf8(
      spark: SparkSession, p: Path, content: String,
      overwrite: Boolean = true): Unit = {
    val out = fs(spark, p).create(p, overwrite)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write `df` as a single parquet object at `tableDir/fileName`
    * (azof data files are single objects addressed by the snapshot;
    * reference: crates/azof/src/lakehouse.rs:44-47). Rows are sorted
    * event_time-descending and timestamps written as TIMESTAMP_MILLIS for
    * byte-level format parity. Fixture/commit-sized writes only — large
    * tables should land as multiple base files across segments.
    *
    * Returns the file's key-range stats for the snapshot's data-skipping
    * ext field (None for an empty file) — a second small min/max
    * aggregation over the single just-written file. This path is the
    * fixture-scale commit; the distributed path
    * ([[writePartitionedFiles]]) folds its stats into the one read-back
    * pass it already makes.
    */
  /** The VALUE columns of `df` eligible for per-file range stats
    * ([[graft.format.ValueStats]]), each with its canonical string
    * encoder applied AFTER the typed min/max (aggregating the encoding
    * would order "10" before "9"). Timestamp columns encode as epoch
    * millis; system columns and the tombstone marker never carry
    * ranges (key has its own stats, event_time IS the delta window).
    */
  private def valueStatCols(
      df: DataFrame): Seq[(String, org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column)] = valueStatColsOf(df.schema)

  private def valueStatColsOf(
      schema: org.apache.spark.sql.types.StructType)
      : Seq[(String, org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column)] = {
    import org.apache.spark.sql.types._
    schema.fields.toSeq.collect {
      case f if f.name != TableSchema.KeyName &&
        f.name != TableSchema.EventTimeName &&
        f.name != TableSchema.DeletedName &&
        (f.dataType == StringType || f.dataType == LongType ||
          f.dataType == BooleanType) =>
        f.name -> ((c: org.apache.spark.sql.Column) => c.cast("string"))
      case f if f.name != TableSchema.EventTimeName &&
        f.dataType == TimestampType =>
        f.name -> ((c: org.apache.spark.sql.Column) =>
          unix_millis(c).cast("string"))
    }
  }

  /** Read back `2·names.size` min/max strings starting at `off` into
    * the [[ColRange]] map, skipping all-NULL columns.
    */
  private def colRanges(
      row: org.apache.spark.sql.Row, off: Int,
      names: Seq[String]): Map[String, graft.format.ColRange] =
    names.zipWithIndex.flatMap { case (n, i) =>
      val (a, b) = (off + 2 * i, off + 2 * i + 1)
      if (row.isNullAt(a) || row.isNullAt(b)) None
      else Some(n -> graft.format.ColRange(row.getString(a), row.getString(b)))
    }.toMap

  /** The reserved per-file EVENT-TIME range stat
    * ([[TableSchema.EventTimeStatName]], epoch-millis decimals) — what
    * bounds a BASE file's rows for the event-time `AS OF` rewrite gate
    * (deltas carry a window; base files carry only this).
    */
  private def etStatAggs: Seq[org.apache.spark.sql.Column] = Seq(
    unix_millis(min(col(TableSchema.EventTimeName))).cast("string"),
    unix_millis(max(col(TableSchema.EventTimeName))).cast("string"))

  private def etRange(
      row: org.apache.spark.sql.Row, off: Int)
      : Map[String, graft.format.ColRange] =
    if (row.isNullAt(off) || row.isNullAt(off + 1)) Map.empty
    else Map(TableSchema.EventTimeStatName ->
      graft.format.ColRange(row.getString(off), row.getString(off + 1)))

  def writeDataFile(
      spark: SparkSession,
      df: DataFrame,
      tableDir: String,
      fileName: String): Option[FileStats] = {
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
      val bc = bloomConf(spark)
      val written = spark.read.parquet(target.toString)
      val vcols = valueStatCols(written)
      val aggs = Seq(min(col(TableSchema.KeyName)),
        max(col(TableSchema.KeyName))) ++ bloomColumn(spark, bc) ++
        vcols.flatMap { case (n, enc) =>
          Seq(enc(min(col(n))), enc(max(col(n)))) } ++
        etStatAggs ++
        Seq(count(lit(1)))
      val mm = written.agg(aggs.head, aggs.tail: _*).collect()(0)
      val vOff = 2 + (if (bc.isDefined) 1 else 0)
      if (mm.isNullAt(0)) None
      else Some(FileStats(mm.getString(0), mm.getString(1),
        bc.map { case (bits, k) =>
          KeyBloom.fromBytes(mm.getAs[Array[Byte]](2), bits, k)
        },
        colRanges(mm, vOff, vcols.map(_._1)) ++
          etRange(mm, vOff + 2 * vcols.size),
        rows = Some(mm.getLong(vOff + 2 * vcols.size + 2))))
    } finally conf.set("spark.sql.parquet.outputTimestampType", prevTsType)
  }

  /** Write snapshot `id` — REFUSES to overwrite an existing s{id}.json
    * (`FileAlreadyExistsException`): snapshot documents are immutable
    * once written, so first-writer-wins makes concurrent committers
    * lose-and-retry instead of silently clobbering each other's snapshot
    * (optimistic concurrency, Delta-log style).
    *
    * The content lands via temp file + rename, never by writing the
    * final name directly: a writer that crashes or errors mid-write must
    * not leave a TRUNCATED s{id}.json, because the commit path selects
    * the highest existing s{N}.json as its parse base — a half-written
    * document there would wedge every subsequent commit on this table.
    * A crash can only orphan a `_tmp_snap_*` file, which nothing ever
    * parses and vacuum ages out.
    *
    * The publish step goes through the pluggable [[CommitGuard]]: the
    * default exists-check + rename is exactly as strong as the store's
    * rename semantics (HDFS refuses a rename onto an existing file
    * atomically; Hadoop's local filesystem and plain S3A check-then-act,
    * so two same-instant committers can in principle both pass). On
    * object stores, registering a conditional-put guard under
    * `spark.azof.commitGuard.<scheme>` closes that window exactly. The
    * data files themselves are immune either way: they are uniquely
    * named, so a metadata race never cross-links another writer's bytes.
    */
  def writeSnapshot(
      spark: SparkSession,
      tableDir: String,
      id: String,
      snapshot: Snapshot): Unit = {
    val dir = new Path(tableDir)
    val target = new Path(dir, s"s$id.json")
    val tmp = new Path(dir, s"_tmp_snap_${UUID.randomUUID().toString}.json")
    val f = fs(spark, target)
    writeUtf8(spark, tmp, SnapshotCodec.render(snapshot))
    val won =
      try CommitGuard.forPath(spark, target).publish(f, tmp, target)
      catch {
        case scala.util.control.NonFatal(e) =>
          scala.util.Try(f.delete(tmp, false)); throw e
      }
    if (!won) {
      scala.util.Try(f.delete(tmp, false))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(
        s"snapshot $target already exists (lost commit race)")
    }
    // a winning guard may consume tmp (rename) or leave it (copy-based
    // conditional put) — either way nothing may linger
    scala.util.Try(if (f.exists(tmp)) f.delete(tmp, false))
    ()
  }

  /** Move the version pointer — atomically where the store allows it.
    * The pointer is the ONE mutable object in the format, so it goes
    * through [[AtomicReplace]] (staged rename, never truncate-in-place:
    * a direct create-truncate-write exposes any concurrent reader to an
    * EMPTY pointer mid-write — observed as a `NumberFormatException:
    * ""` under racing committers). Stores that refuse
    * rename-onto-existing (HDFS) fall back to delete+rename, whose
    * brief pointer-ABSENT window is covered by the bounded reader-side
    * retry in [[graft.format.AzofTable.currentVersion]]. A false return
    * (a concurrent writer's pointer survived the fallback window) is
    * benign here: pointers are forward-only on every writer and the
    * next commit's forward probe re-converges past both.
    */
  def writeVersion(spark: SparkSession, tableDir: String, id: String): Unit = {
    val dir = new Path(tableDir)
    AtomicReplace.replace(fs(spark, dir), dir, new Path(dir, "version.txt"), id)
    ()
  }

  /** Create a table with one open segment and no data (snapshot 1). */
  def createTable(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      schema: TableSchema,
      segmentStart: Instant): Unit = {
    val dir = new Path(lakehousePath, name).toString
    val snap = Snapshot(schema,
      Seq(Segment("1", segmentStart, None, None, Seq.empty, Seq.empty)),
      op = Some("create"))
    writeSnapshot(spark, dir, "1", snap)
    writeVersion(spark, dir, "1")
  }

  /** Whether a table exists under the lakehouse: a version pointer, or a
    * first snapshot from a create that crashed before the pointer write.
    */
  def tableExists(
      spark: SparkSession, lakehousePath: String, name: String): Boolean = {
    val dir = new Path(lakehousePath, name)
    val f = fs(spark, dir)
    f.exists(new Path(dir, "version.txt")) || f.exists(new Path(dir, "s1.json"))
  }

  /** [[createTable]] unless the table already exists — the idempotent
    * form the index companions use (re-running a flow's `create` must be
    * a no-op, not a `FileAlreadyExistsException`). A create that crashed
    * between the snapshot and the pointer is repaired by re-pointing at
    * snapshot 1. Returns true iff this call created the table.
    */
  def createTableIfAbsent(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      schema: TableSchema,
      segmentStart: Instant): Boolean = {
    val dir = new Path(lakehousePath, name)
    val f = fs(spark, dir)
    if (f.exists(new Path(dir, "version.txt"))) false
    else if (f.exists(new Path(dir, "s1.json"))) {
      writeVersion(spark, dir.toString, "1")
      false
    } else {
      createTable(spark, lakehousePath, name, schema, segmentStart)
      true
    }
  }

  /** Commit `df` (schema `key, event_time, values...`) as the base file of
    * the open root segment: new snapshot id = current + 1. The open
    * segment must not already have a base — a second commitBase would
    * silently REPLACE it, dropping every prior base row from Current and
    * event-time views (recoverable only via VERSION AS OF); incremental
    * writes go through [[commitDelta]], rewrites through [[compact]].
    */
  def commitBase(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      df: DataFrame): Unit = {
    // tombstones are DELTAS by design: only delta entries carry the
    // tombstone flag, so marker rows in a base file would read back as
    // null-valued data rows — refuse rather than silently corrupt
    require(!df.columns.contains(TableSchema.DeletedName),
      s"commitBase with a ${TableSchema.DeletedName} column: tombstone " +
        "rows commit through commitDelta/commitDelete, never into a base file")
    val (dir, fileName, stats) =
      landCommitFile(spark, lakehousePath, name, df, "base")
    commitMeta(spark, dir) { (snap, _) =>
      val segs = mapOpenRoot(snap.segments) { s =>
        // file OR deltas: a multi-file compaction leaves file=None with
        // the merged state in deltas — a base committed under those
        // deltas would be silently shadowed for every key they carry,
        // the same hazard as replacing an existing base.
        require(s.file.isEmpty && s.delta.isEmpty,
          s"open segment ${s.id} already carries data " +
            s"(file=${s.file}, deltas=${s.delta.size}): " +
            "use commitDelta for incremental writes or compact to rewrite")
        s.copy(file = Some(fileName), fileStats = stats)
      }
      snap.copy(segments = segs, op = Some("commit-base"))
    }
  }

  /** Commit `df` as a delta file `[start, end]` on the open root segment:
    * new snapshot id = current + 1, `version.txt` bumped. `op` overrides
    * the snapshot's operation stamp (default "commit-delta");
    * `streamBatch` records `appId -> batchId` in the snapshot's
    * `stream_batches` replay index — the streaming sink passes both to
    * make micro-batch commits idempotent.
    *
    * A `df` carrying the `_azof_deleted` marker column commits as a
    * MIXED data+tombstone file (the replication shape: one micro-batch
    * holds a source commit range's upserts AND deletes) — the marker
    * rides per-row and the delta entry is flagged so scans read it.
    */
  def commitDelta(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      df: DataFrame,
      start: Instant,
      end: Instant,
      op: Option[String] = None,
      streamBatch: Option[(String, Long)] = None,
      branch: Option[String] = None): Unit = {
    val hasMarker = df.columns.contains(TableSchema.DeletedName)
    val (dir, fileName, stats) =
      landCommitFile(spark, lakehousePath, name, df, "delta", branch)
    commitMeta(spark, dir, branch = branch) { (snap, v) =>
      val segs = mapOpenRoot(snap.segments)(s =>
        s.copy(delta = s.delta :+
          Delta(fileName, start, end, stats, tombstone = hasMarker,
            seq = Some(v))))
      snap.copy(segments = segs, op = Some(op.getOrElse("commit-delta")),
        streamBatches = snap.streamBatches ++ streamBatch)
    }
  }

  /** A row-level statement's write-conflict validation request: fail the
    * commit if any DATA-ADDING commit whose key range may overlap
    * `[keyMin, keyMax]` (the statement's written keys) landed after
    * `readVersion` (the snapshot the statement's target scan read).
    * Rewrites (`compact`, `purge`) are logically content-preserving and
    * never conflict.
    *
    * `lineage` scopes the check to ONE lineage's commits: `None` (a main
    * statement) diffs only main documents — branch commits share the id
    * sequence but never touch main's tree — and `Some(b)` (a statement
    * on branch `b`'s view) diffs only that branch's documents, so main
    * advancing past the fork never fails a branch statement. An
    * abandoned sibling fork of the same branch (the pointer-race debris
    * commitMeta's adopted-chain walk leaves behind) can conservatively
    * count as a conflict — a spurious retry, never a missed one.
    */
  final case class DmlConflictCheck(
      readVersion: Long, keyMin: String, keyMax: String,
      lineage: Option[String] = None)

  /** Metadata-only registration of delta files ALREADY landed in the
    * table directory under collision-free unique names — the commit half
    * of the task-parallel SQL DML write path ([[AzofRowLevelOperation]]:
    * every MERGE/UPDATE/DELETE task streams its changed rows into its
    * own file, then the driver registers them all here atomically). One
    * optimistic-retry snapshot commit, same as every other write.
    *
    * With `validate` set, each commit attempt first walks the snapshot
    * log from the statement's read version to the attempt's base and
    * throws `ConcurrentModificationException` if a data-adding commit
    * whose files may contain any written key landed in between — two
    * concurrent MERGEs reading/updating the same key then fail the
    * later one instead of silently clobbering state computed from a
    * stale read (write skew). The check runs INSIDE the optimistic
    * retry, against the exact base the commit would build on, so a
    * conflicting commit can never slip between validation and commit.
    * Files without key stats are conservatively conflicting. The failed
    * statement's landed files abort-delete as usual; re-running it
    * reads the winner's state.
    */
  private[sources] def commitLandedDeltas(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      deltas: Seq[Delta],
      op: String,
      validate: Option[DmlConflictCheck] = None,
      streamBatch: Option[(String, Long)] = None,
      branch: Option[String] = None): Boolean = {
    require(deltas.nonEmpty, "commitLandedDeltas with no files")
    val table = AzofTable(spark, lakehousePath, name)
    try {
      commitMeta(spark, table.tableDir.toString, branch = branch) { (snap, v) =>
        // streaming replay guard, checked INSIDE the optimistic retry
        // against the exact commit base: a replayed micro-batch (crash
        // between sink commit and checkpoint advance — or a zombie
        // duplicate of the same query) can never double-register, even
        // racing its own successor
        streamBatch.foreach { case (app, b) =>
          if (snap.streamBatches.get(app).exists(_ >= b))
            throw new ReplayedStreamBatch
        }
        validate.foreach(chk => validateNoConflicts(table, chk, v))
        val segs = mapOpenRoot(snap.segments)(s =>
          s.copy(delta = s.delta ++ deltas.map(_.copy(seq = Some(v)))))
        snap.copy(segments = segs, op = Some(op),
          streamBatches = snap.streamBatches ++ streamBatch)
      }
      true
    } catch { case _: ReplayedStreamBatch => false }
  }

  /** Control flow only: signals [[commitLandedDeltas]] that the batch it
    * is committing already landed (its id is at or below the appId's
    * stamp in the commit-base snapshot).
    */
  private final class ReplayedStreamBatch
    extends Exception(null, null, false, false)

  /** Every (file → key stats) referenced anywhere in a snapshot tree —
    * base files and deltas alike, so a conflicting concurrent
    * `commitBase` is caught the same as a delta commit.
    */
  private def filesWithKeyStats(s: Snapshot): Map[String, Option[FileStats]] = {
    def walk(seg: Segment): Seq[(String, Option[FileStats])] =
      seg.file.map(f => f -> seg.fileStats).toSeq ++
        seg.delta.map(d => d.file -> d.stats) ++ seg.segments.flatMap(walk)
    s.segments.flatMap(walk).toMap
  }

  /** [[DmlConflictCheck]] walk: snapshots `(chk.readVersion, commitV)`
    * exclusive, consecutive-diffed for ADDED files; an added file in a
    * non-rewrite commit whose key range may overlap the statement's
    * throws. Malformed in-window documents are crash debris (never
    * committed) and are skipped, exactly like [[commitMeta]]'s base
    * selection.
    */
  private def validateNoConflicts(
      table: AzofTable, chk: DmlConflictCheck, commitV: Long): Unit = {
    val rewriteOps = Set("compact", "purge")
    var prev = filesWithKeyStats(table.snapshot(chk.readVersion.toString))
    var v = chk.readVersion + 1
    while (v < commitV) {
      table.classifySnapshot(v.toString) match {
        // only the statement's own lineage participates in the diff:
        // commits of any OTHER lineage share the id sequence but never
        // touch this lineage's tree (see DmlConflictCheck)
        case SnapshotCodec.DocClass.Valid(s) if s.branch == chk.lineage =>
          val cur = filesWithKeyStats(s)
          if (!s.op.exists(rewriteOps.contains)) {
            val conflict = cur.collectFirst {
              case (f, st) if !prev.contains(f) &&
                st.forall(x => x.keyMin <= chk.keyMax &&
                  chk.keyMin <= x.keyMax) => f
            }
            conflict.foreach { f =>
              throw new java.util.ConcurrentModificationException(
                s"concurrent ${s.op.getOrElse("commit")} landed file '$f' " +
                  s"(snapshot s$v) touching this statement's key range " +
                  s"[${chk.keyMin}, ${chk.keyMax}] after its read " +
                  s"snapshot s${chk.readVersion} — the statement's " +
                  "changes were computed from a stale read; re-run it " +
                  "(set spark.azof.dml.validateConflicts=false to allow " +
                  "last-writer-wins)")
            }
          }
          prev = cur
        case _ => () // malformed = crash debris, never a commit
      }
      v += 1
    }
  }

  /** Tombstone delete — the takedown primitive neither engine ships
    * (beyond-reference; a training-data lakehouse at scale eventually
    * needs key deletion). Commits one delta file of TOMBSTONE rows
    * `(key, event_time = at, values = NULL, _azof_deleted = true)`,
    * registered with `tombstone: true` in the snapshot (an ext field
    * the reference's serde ignores) and `op = "commit-delete"`.
    *
    * Semantics — the delete is an EVENT at `at`, resolved by the same
    * per-key dedup as every other row: it suppresses the key from any
    * scan whose winner is at-or-before `at` (Current included, when no
    * newer row exists), loses to rows with newer event_time (so a
    * later upsert resurrects the key, and pre-existing newer rows
    * survive a backdated delete), and leaves history strictly before
    * `at` fully time-travelable. Compaction at `c >= at` drops the
    * deleted key's data from the merged state WITHOUT resurrecting it;
    * physical removal of the historical bytes additionally requires
    * the closed segment's files to age out of retention (vacuum) —
    * documented, not silent.
    *
    * The file-tailing append feed (AzofStream) ignores `tombstone_*`
    * files by name pattern; the commit-exact feeds (AzofChangeFeed /
    * azof-commits) deliver tombstone rows tagged `_deleted = true`.
    */
  def commitDelete(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      keys: Seq[String],
      at: Instant,
      branch: Option[String] = None): Unit = {
    require(keys.nonEmpty, "commitDelete with no keys")
    commitDelete(spark, lakehousePath, name,
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          keys.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            TableSchema.KeyName,
            org.apache.spark.sql.types.StringType)))),
      at, branch)
  }

  /** DataFrame variant of [[commitDelete]] for large key sets (e.g. "all
    * keys matching a takedown predicate"): the first column of `keysDf`
    * is the key set; distinct is applied here.
    */
  def commitDelete(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      keysDf: DataFrame,
      at: Instant,
      // no default here: Scala forbids defaults on two overloads — the
      // Seq face carries them and delegates
      branch: Option[String]): Unit = {
    val table = AzofTable(spark, lakehousePath, name)
    val dir = table.tableDir.toString
    // `branch` STAGES the tombstones on that lineage (the takedown-audit
    // shape: size the delete set with publish_preview / changes --branch,
    // then fast-forward to make it live). Tombstone rows are schema-wide
    // NULLs under the TARGET LINEAGE's schema — a branch may have
    // additively evolved past the fork (or lag main's own evolution).
    val snap = branch.flatMap(table.branchHead) match {
      case Some(h) => table.snapshot(h.toString)
      case None => table.currentSnapshot
    }
    // NULL value columns under their PHYSICAL names (tombstone rows go
    // straight to writeDataFile, which writes columns as named)
    val valueCols = snap.schema.columns.map(c =>
      lit(null).cast(c.dataType.sparkType).as(c.physicalName))
    val rows = keysDf
      .select(col(keysDf.columns.head).cast("string").as(TableSchema.KeyName))
      .where(col(TableSchema.KeyName).isNotNull)
      .distinct()
      .select(Seq(col(TableSchema.KeyName),
        lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName)) ++
        valueCols :+ lit(true).as(TableSchema.DeletedName): _*)
    val fileName =
      uniqueFileName(s"tombstone_s${table.currentVersion.toLong + 1}")
    val stats = writeDataFile(spark, rows, dir, fileName)
    require(stats.nonEmpty, "commitDelete resolved to an empty key set")
    commitMeta(spark, dir, branch = branch) { (cur, v) =>
      val segs = mapOpenRoot(cur.segments)(s =>
        s.copy(delta = s.delta :+
          Delta(fileName, at, at, stats, tombstone = true, seq = Some(v))))
      cur.copy(segments = segs, op = Some("commit-delete"))
    }
    ()
  }

  /** Phase 1 of a single-file commit: land the data file (uniquely
    * named, so racing committers never collide on bytes) and return the
    * table dir, file name, and key stats for the metadata phase.
    */
  private def landCommitFile(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      df: DataFrame,
      kind: String,
      branch: Option[String] = None): (String, String, Option[FileStats]) = {
    val table = AzofTable(spark, lakehousePath, name)
    val dir = table.tableDir.toString
    // the version in the name is provisional (a retried metadata commit
    // may land at a later id) — names are unique and opaque, the
    // prefix is a human/debug hint only
    val fileName =
      uniqueFileName(s"${kind}_s${table.currentVersion.toLong + 1}")
    // the tombstone marker column, when present, survives the landing
    // projection (mixed data+tombstone commits); everything else not in
    // the declared schema is dropped. Columns land under their PHYSICAL
    // names ([[graft.format.ColumnDef.physical]]) so files before and
    // after a rename stay byte-compatible.
    // A BRANCH commit projects to its LINEAGE's schema (the fork schema
    // plus any additive branch evolution): projecting to main's would
    // demand columns a post-fork main evolution added, which the
    // branch's rows legitimately lack — and vice versa.
    val landSnap = branch.flatMap(table.branchHead) match {
      case Some(h) => table.snapshot(h.toString)
      case None => table.currentSnapshot
    }
    val ordered = toPhysical(landSnap.schema, df)
    val stats = writeDataFile(spark, ordered, dir, fileName)
    (dir, fileName, stats)
  }

  /** Project `df` (logical column names) to the file layout: `key,
    * event_time, values...` under PHYSICAL names, the tombstone marker
    * passing through when present.
    */
  private def toPhysical(schema: TableSchema, df: DataFrame): DataFrame = {
    val cols =
      Seq(col(TableSchema.KeyName), col(TableSchema.EventTimeName)) ++
        schema.columns.map(c => col(c.name).as(c.physicalName)) ++
        (if (df.columns.contains(TableSchema.DeletedName))
          Seq(col(TableSchema.DeletedName))
        else Seq.empty)
    df.select(cols: _*)
  }

  /** Commit a LARGE DataFrame as `numFiles` range-partitioned delta
    * files in ONE distributed write — the cluster-scale commit path.
    * [[commitBase]]/[[commitDelta]] funnel through a single-file
    * `coalesce(1)` write (correct for the reference's fixture-sized
    * tables, a non-starter for a 1000-executor ingest): here the rows
    * land via `repartitionByRange(event_time)` so every executor writes
    * its own slice in parallel, each file's delta window is derived from
    * the data it actually holds (min/max event_time per file, read back
    * from the written parquet — a columnar stats-only scan), and ONE
    * snapshot commit registers all files atomically. Delta-only tables
    * are reference precedent (test-data/table1), so the layout stays
    * format-compatible; windows are disjoint by construction, and the
    * files are named `delta_s{N}_{uuid8}_p{K}.parquet` (version-keyed +
    * unique, see [[uniqueFileName]]) so the streaming append feed tails
    * them like any other commit.
    */
  /** @param byKey range-partition the files by KEY instead of
    *               event_time. Each file then covers a narrow key slice
    *               (its snapshot stats make point lookups read ~1/numFiles
    *               of the commit) at the cost of wide, overlapping
    *               event-time windows (time pruning degrades to
    *               commit granularity). Within one commit the files
    *               partition the KEYS, so no key spans two of them —
    *               but windows of SUCCESSIVE by-key commits overlap,
    *               which this engine's event-time dedup reads correctly
    *               while a pure-precedence reference reader may surface
    *               a stale row (see the divergence note on AzofScan).
    *               The right layout for point-lookup-heavy KV tables
    *               read by this engine; keep the default for
    *               time-travel-heavy or reference-shared ones.
    */
  def commitPartitioned(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      df: DataFrame,
      numFiles: Int,
      byKey: Boolean = false,
      branch: Option[String] = None): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    require(!df.columns.contains(TableSchema.DeletedName),
      s"commitPartitioned drops columns outside the declared schema — " +
        s"route ${TableSchema.DeletedName}-carrying frames through " +
        "commitDelta (mixed) or commitDelete (pure tombstones) instead")
    val table = AzofTable(spark, lakehousePath, name)
    val nextId = (table.currentVersion.toLong + 1).toString
    // schema from the target LINEAGE's head (a branch may have
    // additively evolved past the fork, or lag main's own evolution)
    val snap = branch.flatMap(b => table.branchHead(b))
      .map(h => table.snapshot(h.toString))
      .getOrElse(table.currentSnapshot)
    val dir = table.tableDir
    val ordered = toPhysical(snap.schema, df)
    val deltas = writePartitionedFiles(spark, dir, ordered, numFiles,
      s"delta_s${nextId}_${uniqueSuffix()}_p",
      rangeCol = if (byKey) TableSchema.KeyName else TableSchema.EventTimeName)
    require(deltas.nonEmpty, "commitPartitioned of an empty DataFrame")
    // files are down; register them all in ONE snapshot commit. A
    // version conflict here retries the (cheap) metadata step against
    // the fresh snapshot instead of orphaning the whole distributed
    // write (files are uniquely named, so only this step needs redoing).
    commitMeta(spark, dir.toString, branch = branch) { (cur, v) =>
      cur.copy(
        segments = mapOpenRoot(cur.segments)(s =>
          s.copy(delta = s.delta ++ deltas.map(_.copy(seq = Some(v))))),
        op = Some("commit-delta"))
    }
  }

  /** Land `df` as up to `numFiles` range-partitioned parquet files named
    * `{filePrefix}{K}.parquet`, one distributed write; returns one
    * [[Delta]] per non-empty file with its data-derived event-time
    * window. Shared by the partitioned commit and multi-file compaction.
    */
  private def writePartitionedFiles(
      spark: SparkSession,
      dir: Path,
      ordered: DataFrame,
      numFiles: Int,
      filePrefix: String,
      rangeCol: String = TableSchema.EventTimeName,
      rangeExpr: Option[org.apache.spark.sql.Column] = None): Seq[Delta] = {
    val tmp = new Path(dir, s"_tmp_part_${UUID.randomUUID().toString}")
    val conf = spark.conf
    val prevTsType = conf.get("spark.sql.parquet.outputTimestampType")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try {
      // rangeExpr (e.g. a z-value) partitions through a scratch column
      // dropped before the write — the projection keeps the exchange's
      // partitioning, the file bytes never carry it
      (rangeExpr match {
        case Some(e) => ordered.withColumn("_azof_zr", e)
          .repartitionByRange(numFiles, col("_azof_zr"))
          .sortWithinPartitions(col(TableSchema.EventTimeName).desc)
          .drop("_azof_zr")
        case None => ordered.repartitionByRange(numFiles, col(rangeCol))
          .sortWithinPartitions(col(TableSchema.EventTimeName).desc)
      }).write.mode("overwrite").parquet(tmp.toString)
      val f = fs(spark, dir)
      val parts = f.listStatus(tmp).map(_.getPath)
        .filter(p => p.getName.startsWith("part-") &&
          p.getName.endsWith(".parquet"))
        .sortBy(_.getName)
      // event-time window + key range (+ optional key bloom) per written
      // file, one stats pass (empty partitions produce row-less part
      // files that never appear here and are dropped)
      val bc = bloomConf(spark)
      val written = spark.read.parquet(tmp.toString)
      val vcols = valueStatCols(written)
      val aggs = Seq(min(col(TableSchema.EventTimeName)).as("_mn"),
        max(col(TableSchema.EventTimeName)).as("_mx"),
        min(col(TableSchema.KeyName)).as("_kmn"),
        max(col(TableSchema.KeyName)).as("_kmx")) ++
        bloomColumn(spark, bc) ++
        vcols.flatMap { case (n, enc) =>
          Seq(enc(min(col(n))), enc(max(col(n)))) } ++
        etStatAggs ++
        Seq(count(lit(1)))
      val vOff = 5 + (if (bc.isDefined) 1 else 0)
      val stats = written
        .groupBy(input_file_name().as("_f"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
        .map(r => (new Path(r.getString(0)).getName,
          (r.getTimestamp(1).toInstant, r.getTimestamp(2).toInstant,
            FileStats(r.getString(3), r.getString(4),
              bc.map { case (bits, k) =>
                KeyBloom.fromBytes(r.getAs[Array[Byte]](5), bits, k)
              },
              colRanges(r, vOff, vcols.map(_._1)) ++
                etRange(r, vOff + 2 * vcols.size),
              rows = Some(r.getLong(vOff + 2 * vcols.size + 2))))))
        .toMap
      parts.zipWithIndex.flatMap { case (p, i) =>
        stats.get(p.getName).map { case (mn, mx, ks) =>
          val target = s"$filePrefix$i.parquet"
          if (!f.rename(p, new Path(dir, target)))
            throw new IllegalStateException(s"rename $p -> $target failed")
          Delta(target, mn, mx, Some(ks))
        }
      }.toSeq
    } finally {
      conf.set("spark.sql.parquet.outputTimestampType", prevTsType)
      val f = fs(spark, dir)
      if (f.exists(tmp)) { f.delete(tmp, true); () }
    }
  }

  /** Compaction — the reference's unchecked "Compaction" roadmap item.
    *
    * Closes the open root segment at `at` and opens a fresh segment whose
    * base file is the merged state (latest version ≤ `at` per key,
    * produced by the production as-of scan). Afterwards a `Current` scan
    * reads ONE base file instead of base+N deltas, while every
    * historical as-of still resolves through the (now closed) segment's
    * original files.
    *
    * Subtlety honored from the reference's pruning semantics
    * (crates/azof/src/metadata.rs:48-73): root segments are walked
    * unconditionally and root-level deltas pass only an `is_before`
    * check, so a closed segment that *kept* its deltas at root level
    * would leak them into `Current` scans forever. The closed state is
    * therefore wrapped as a range-checked CHILD segment (the convention
    * the reference's financials tree follows: deltas live in closed
    * leaves, never on closed roots).
    */
  /** @param numFiles with 1 (default) the merged state lands as one base
    *                  file via the single-file write; with N > 1 it lands
    *                  as N range-partitioned `compact_s{V}_{uuid8}_p{K}`
    *                  files in one distributed write, registered as
    *                  deltas of the new open segment (file-less) — the
    *                  cluster-scale compaction shape where no single-file
    *                  write sits on the critical path. Same scan results
    *                  either way.
    * @param byKey with numFiles > 1, range-partition the merged state by
    *              KEY instead of event_time — compaction then RESTORES
    *              the point-lookup layout of a [[commitPartitioned]]
    *              `byKey` table instead of destroying it: each merged
    *              file covers a disjoint key slice, so a key lookup
    *              through the per-file key stats reads ~1/numFiles of
    *              the merged state (see [[commitPartitioned]]'s byKey
    *              note for the time-window trade-off, which is harmless
    *              here for the same duplicate-winner reason as above).
    */
  /** @param zorder value columns (logical names) to Z-ORDER the merged
    *               files on, with `key` always the implicit leading
    *               dimension ([[graft.operators.Zorder]]): each merged
    *               file then bounds BOTH its key range and the named
    *               columns' value ranges, which is the only layout
    *               family under which the dedup-sound value skipping
    *               (`ValueStats` + key-range closure) prunes value
    *               predicates — key-clustered files match every value
    *               predicate, value-clustered files make the closure
    *               re-add everything. Requires `numFiles > 1`; mutually
    *               exclusive with `byKey` (z-order with no value
    *               columns IS byKey).
    */
  def compact(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      at: Instant,
      numFiles: Int = 1,
      byKey: Boolean = false,
      zorder: Seq[String] = Nil,
      branch: Option[String] = None): Unit = {
    require(numFiles >= 1, "numFiles must be >= 1")
    require(zorder.isEmpty || !byKey,
      "byKey and zorder are mutually exclusive (z-order already leads " +
        "with the key dimension)")
    require(zorder.isEmpty || numFiles > 1,
      "zorder needs numFiles > 1: one file has nothing to cluster")
    val table = AzofTable(spark, lakehousePath, name)
    // `branch` folds a STAGED lineage in place — the long-staged-replica
    // shape (a mirrored branch accumulates one small delta per
    // micro-batch; publishing thousands of tiny files onto main and
    // compacting after defeats the audit: the audited tree should BE
    // the published tree). The compact commits on the branch (main
    // untouched), the branch pointer advances, and fast-forward then
    // publishes the folded tree verbatim. A compacted branch can no
    // longer merge-publish (mergeBranch refuses a chain carrying a fold
    // op, by design — the fold re-stamps rows at a later seq) — fold
    // only in the fast-forward flow.
    val (baseId, snap) = branch match {
      case Some(b) =>
        val (head, headSnap, _, _) = branchLineage(table, b)
        (head, headSnap)
      case None =>
        val cur = table.currentVersion.toLong
        (cur, table.currentSnapshot)
    }
    // ids are shared across lineages: walk past EVERY existing document
    // (branch commits included), not just version.txt + 1 — a branch doc
    // at the next main id would otherwise collide the publish forever
    val tfs = fs(spark, table.tableDir)
    var freeId = math.max(baseId, table.currentVersion.toLong) + 1
    while (tfs.exists(new Path(table.tableDir, s"s$freeId.json"))) freeId += 1
    val nextId = freeId.toString
    val openIdx = snap.segments.indexWhere(_.end.isEmpty)
    require(openIdx >= 0, "table has no open segment to compact")
    val open = snap.segments(openIdx)
    require(at.isAfter(open.start), s"compaction point $at must be after segment start ${open.start}")

    // merged state as of `at`, via the production scan path (logical
    // names out of the scan, projected back to physical for the write)
    val merged = toPhysical(snap.schema,
      graft.operators.AzofScan.scanSnapshot(
        spark, table, snap, graft.format.AsOf.EventTime(at))
        .select(snap.schema.allColumnNames.map(col): _*))
    // distinct prefix: compaction REWRITES rows; the streaming append
    // feed (AzofStream) tails only base_/delta_ commit files by name
    val dir = table.tableDir.toString
    val (newBase, newBaseStats, mergedDeltas) =
      if (numFiles == 1) {
        val baseFile = uniqueFileName(s"compact_s$nextId")
        val st = writeDataFile(spark, merged, dir, baseFile)
        (Some(baseFile), st, Seq.empty[Delta])
      } else {
        // Merged-state deltas on the new OPEN segment are read for any
        // as-of >= their windows; for historic instants t < `at` they
        // also pass the root-delta is_before check, harmlessly: each
        // merged row duplicates the closed child's winning row for its
        // key byte-for-byte, so the per-key dedup picks identical values
        // whichever file wins precedence.
        // z-order dims: key leads (physical names — `merged` is
        // projected to the file schema), then the named value columns
        val zExpr = if (zorder.isEmpty) None else {
          val dims = (TableSchema.KeyName,
              org.apache.spark.sql.types.StringType) +:
            zorder.map { zc =>
              val cd = snap.schema.columns.find(_.name == zc).getOrElse(
                throw new IllegalArgumentException(
                  s"zorder column '$zc' does not exist; value columns: " +
                    snap.schema.columns.map(_.name).mkString(", ")))
              (cd.physicalName, cd.dataType.sparkType)
            }
          Some(graft.operators.Zorder.zValue(
            dims.map { case (n, t) => (col(n), t) }))
        }
        (None, None, writePartitionedFiles(spark, table.tableDir, merged,
          numFiles, s"compact_s${nextId}_${uniqueSuffix()}_p",
          rangeCol =
            if (byKey) TableSchema.KeyName else TableSchema.EventTimeName,
          rangeExpr = zExpr)
          // merged-state rows are the per-key WINNERS as of `at` — any
          // (key, event_time) duplicate they share with a closed child's
          // file is byte-identical (the winner itself), so the commit
          // seq here can never flip a verdict; it keeps the compacted
          // state ordered after everything it replaced. `unique`: each
          // key's single winner lands in exactly one merged file
          // (range-partitioned one-row-per-key state) — the
          // single-version provenance closure-free value pruning keys on
          .map(_.copy(seq = Some(nextId.toLong), unique = true)))
      }

    // Rows with event_time > `at` already committed into the open segment
    // (a delta whose window extends past the compaction point, or base
    // rows beyond it) would be invisible through both the closed child
    // (range-capped at `at`) and the new base (state AS OF `at`) — they
    // must carry forward as a delta on the new open segment. Every future
    // VERSION is kept; per (key, event_time) duplicates across files
    // resolve by the original file precedence, preserving scan results.
    val futEntries = open.dataFilesWithStats(graft.format.AsOf.Current)
    val futFiles = futEntries.map(_.file)
    // a tombstone with event_time > `at` (a delete "ahead of" the
    // compaction point) must survive the carry-forward WITH its marker,
    // or compaction would resurrect the key as a null-valued row; the
    // carried file can mix tombstone and data rows, so the marker rides
    // per-row and the new delta entry is flagged
    val futHasTombstones = futEntries.exists(_.tombstone)
    // raw file round-trip: read PHYSICAL names, write them back as-is —
    // no logical projection anywhere on the carry-forward path
    val futSchema =
      if (futHasTombstones)
        snap.schema.physicalStruct.add(TableSchema.DeletedName, "boolean")
      else snap.schema.physicalStruct
    val futPhysCols =
      Seq(TableSchema.KeyName, TableSchema.EventTimeName) ++
        snap.schema.columns.map(_.physicalName)
    val futCols = futPhysCols ++
      (if (futHasTombstones) Seq(TableSchema.DeletedName) else Seq.empty)
    val atTs = java.sql.Timestamp.from(at)
    val future = if (futFiles.isEmpty) None else {
      // the per-file order value mirrors the scan's DEFAULT-mode
      // exact-tie rank: (commit seq desc, precedence asc), so a
      // carried-forward duplicate crowns the same row a default scan
      // would — including the commit-recency verdicts seq introduced
      val futRanks = graft.operators.AzofScan.effectiveRanks(futEntries)
      val reads = futFiles.zip(futRanks).map { case (f, i) =>
        spark.read.schema(futSchema)
          .parquet(new Path(dir, f).toString)
          .withColumn("_prec", lit(i))
      }
      // Tiebreak mirrors the scan exactly (commit seq, then precedence,
      // then deleted-first, then content hash): the carry-forward collapses
      // (key, event_time) duplicates to one row, so it must crown the
      // SAME row the merge-dedup scan would — otherwise compaction
      // silently changes which duplicate survives. Deleted-first
      // matters in MIXED data+tombstone files, where a tombstone and a
      // data row can share (key, event_time, precedence) and the
      // content hash must not decide whether the key stays deleted.
      val deletedFirst =
        if (futHasTombstones)
          Seq(coalesce(col(TableSchema.DeletedName), lit(false)).desc)
        else Seq.empty
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(TableSchema.KeyName, TableSchema.EventTimeName)
        .orderBy(Seq(col("_prec")) ++ deletedFirst :+
          // hash over the PHYSICAL columns in declared order: same
          // values in the same order as the scan's logical-name hash,
          // so the same duplicate is crowned
          xxhash64(futPhysCols.map(col): _*): _*)
      val fut = reads.reduce(_ unionAll _)
        .where(col(TableSchema.EventTimeName) > lit(atTs))
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .select(futCols.map(col): _*)
      val maxTs = fut.agg(max(col(TableSchema.EventTimeName))).collect()(0)
      if (maxTs.isNullAt(0)) None
      else Some((fut, maxTs.getTimestamp(0).toInstant))
    }
    val futureDelta = future.map { case (fut, maxEt) =>
      val f = uniqueFileName(s"compact_s${nextId}_future")
      val st = writeDataFile(spark, fut, dir, f)
      Delta(f, at, maxEt, st, tombstone = futHasTombstones,
        seq = Some(nextId.toLong))
    }

    // The closed child ends AT the compaction point (inclusive): segment
    // ranges are start <= t <= end, so an as-of exactly at `at` resolves
    // BOTH the closed child and the new base — safe, because the new base
    // is precisely the merged state AS OF `at` and the merge-dedup scan
    // yields identical results at the shared boundary. An exclusive end
    // (`at - 1ms`) would instead leave sub-millisecond instants inside
    // (at-1ms, at) covered by neither segment (Spark timestamps are
    // microsecond-precision), returning an empty scan after compaction
    // for a point that had data before it.
    val closedEnd = at
    val closedRoot = Segment(
      id = s"${open.id}_closed",
      start = open.start,
      end = Some(closedEnd),
      file = None,
      segments = Seq(open.copy(end = Some(closedEnd))),
      delta = Seq.empty)
    val newOpen = Segment(
      id = nextId, start = at, end = None,
      file = newBase, segments = Seq.empty,
      delta = mergedDeltas ++ futureDelta.toSeq,
      fileStats = newBaseStats)
    val newSnap = snap.copy(
      segments =
        refoldClosed(snap.segments.updated(openIdx, closedRoot)) :+ newOpen,
      op = Some("compact"),
      branch = branch,
      parent = Some(baseId))
    writeSnapshot(spark, dir, nextId, newSnap)
    branch match {
      case None => writeVersion(spark, dir, nextId)
      case Some(b) =>
        // Adopted-chain verification BEFORE the pointer advances (the
        // check commitMeta's branch path runs for data commits): a
        // sibling branch delta that fully committed (doc + pointer +
        // ack) between this fold's branchLineage read and its snapshot
        // write chains onto the head the fold read — blindly advancing
        // the pointer to the fold would strand that acknowledged delta
        // BELOW the pointer, unreachable to branchHead's forward-only
        // walk: a lost committed write. The fold is safe iff its
        // document is ON the chain the self-healing walk adopts (the
        // head itself, or an ancestor of it — a fast sibling may have
        // already chained onto the fold); otherwise the fold is the
        // orphan — remove its document and fail loudly (compact does
        // not retry; the delta always wins this race). Parent ids
        // strictly decrease along a chain, so the downward walk from
        // the adopted head terminates at the fold id or below it.
        val foldId = nextId.toLong
        val adopted = table.branchHead(b)
        val onChain = adopted.exists { h =>
          var cur = h
          while (cur > foldId)
            cur = table.snapshot(cur.toString).parent.getOrElse(-1L)
          cur == foldId
        }
        if (!onChain) {
          tfs.delete(new Path(table.tableDir, s"s$nextId.json"), false)
          throw new IllegalStateException(
            s"branch '$b' advanced while the fold was running (head now " +
              s"s${adopted.getOrElse("?")}.json; the fold staged " +
              s"s$nextId.json onto s$baseId.json) — fold aborted, its " +
              "snapshot removed; re-run compact against the new head")
        }
        // forward-only pointer advance (branchHead's parent-chain walk
        // self-heals a lost advance, exactly as for data commits)
        val bp = new Path(table.tableDir, AzofTable.branchFile(b))
        val raw = scala.util.Try {
          val in = tfs.open(bp)
          try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8).trim.toLong
          finally in.close()
        }.getOrElse(0L)
        if (raw < nextId.toLong) {
          AtomicReplace.replace(tfs, table.tableDir, bp, nextId)
          ()
        }
    }
  }

  /** What [[purgeDeleted]] did: how many keys it erased, which files it
    * rewrote (old → new name), and which entries it dropped entirely
    * (every row purged). Old files stay on disk until vacuum expires
    * the pre-purge snapshots that still reference them.
    */
  final case class PurgeReport(
      purgedKeys: Long,
      rewrittenFiles: Map[String, String],
      droppedFiles: Seq[String])

  /** Physical purge of deleted history — the GDPR-erase companion of
    * the logical tombstone delete ([[commitDelete]]). A key purges iff
    * (a) it is NOT alive in the Current scan and (b) its NEWEST
    * tombstone row anywhere in the tree has `event_time <= before`.
    * Every qualifying key is rewritten OUT of every file that may
    * contain it — data rows and the tombstone rows themselves — and
    * the new snapshot references only the rewritten files
    * (`op = "purge"`, skipped by the change feed like compaction).
    * The tombstone-row criterion (not "current winner is a tombstone")
    * matters after compaction: a compacted tree drops a deleted key
    * from the merged base entirely, so it has NO current winner, but
    * its historical rows and tombstone still sit in the closed
    * children — exactly the bytes a takedown must reach.
    *
    * Chosen post-purge semantics (documented, pinned by
    * PurgePropertySpec): event-time travel through the NEW snapshot
    * returns the POST-PURGE view — live keys are identical at every
    * as-of, purged keys are simply absent from all history, as if they
    * never existed. `VERSION AS OF` a pre-purge snapshot still reads
    * the old files until [[AzofVacuum.vacuum]] expires those
    * snapshots — physical byte removal is complete only after
    * `purgeDeleted` + a vacuum that drops every pre-purge version (the
    * takedown runbook, and the vacuum-interplay spec case).
    *
    * A key deleted and later re-upserted is ALIVE (its winner is the
    * newer data row) and is never touched. A tombstone newer than
    * `before` is retained untouched — the retention window for
    * undo-able recent deletes.
    *
    * Replication: a purge does NOT propagate through
    * [[graft.streaming.AzofMirror]] — `op = "purge"` ranges deliver
    * nothing, by design (a rewrite is not data). Each mirror runs its
    * OWN `purgeDeleted` with the same cutoff, which reaches the same
    * keys because the tombstones DID replicate (AzofMirrorSpec pins
    * the full source-purge → mirror-purge parity runbook).
    *
    * Concurrency: the metadata swap goes through the optimistic
    * [[commitMeta]] retry, and the name-keyed rewrite re-applies
    * cleanly against a RACING writer's snapshot (its new files pass
    * through untouched; PurgeSpec races a concurrent delta). A
    * compaction committing DURING the purge can copy a purged key's
    * rows into its new base/carry files (built from the pre-purge
    * state), which the purge pass's file mapping doesn't know —
    * `purgeDeleted` therefore runs to FIXPOINT: after its commit lands
    * it scans the log for `op = "compact"` snapshots inside the
    * (read version, committed version] window and re-runs the
    * (idempotent) pass until a pass's window is compaction-free. The
    * carried tombstone rows keep their marker through compaction's
    * carry-forward, so the follow-up pass reaches every copied byte;
    * a compaction still in flight when the purge commits loses its
    * snapshot slot and fails loudly (compact does not retry), so it
    * can never land stale state OUTSIDE a pass's detection window. No
    * operator-driven second pass exists anymore (PurgeSpec pins the
    * injected-race case end to end).
    *
    * Scale shape: candidate keys come from ONE scan of the
    * tombstone-flagged files; the alive set from the production
    * merge-dedup scan; the purge key set is bounded by `spark.azof.purgeMaxKeys`
    * (default 1,000,000 — beyond that, purge in key-range batches) and
    * broadcast to one left-anti join per rewritten file; files whose
    * key-range/bloom stats exclude every purge key are NOT rewritten.
    * No driver materialization beyond the capped key set.
    */
  def purgeDeleted(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      before: Instant): PurgeReport = {
    val maxPasses = 10
    val keys = scala.collection.mutable.Set.empty[String]
    var rewritten = Map.empty[String, String]
    var dropped = Seq.empty[String]
    var pass = 0
    var clean = false
    while (!clean) {
      pass += 1
      require(pass <= maxPasses,
        s"purgeDeleted did not reach a compaction-free fixpoint in " +
          s"$maxPasses passes — a compactor is committing continuously " +
          "against this table; pause it and re-run the purge")
      val (passKeys, rep, window) = purgePass(spark, lakehousePath, name, before)
      keys ++= passKeys
      rewritten ++= rep.rewrittenFiles
      dropped ++= rep.droppedFiles
      clean = window match {
        case None => true // nothing committed — nothing could have raced
        case Some((readV, committedV)) =>
          !compactCommittedBetween(spark, lakehousePath, name,
            readV, committedV)
      }
    }
    PurgeReport(keys.size.toLong, rewritten, dropped)
  }

  /** True iff any snapshot in `(readV, committedV)` (exclusive both
    * ends — `committedV` is the purge's own commit) carries
    * `op = "compact"`. Malformed documents in the window are crash
    * debris (never committed) and cannot be a compaction.
    */
  private def compactCommittedBetween(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      readV: Long,
      committedV: Long): Boolean = {
    val table = AzofTable(spark, lakehousePath, name)
    ((readV + 1) until committedV).exists { v =>
      table.classifySnapshot(v.toString) match {
        case SnapshotCodec.DocClass.Valid(s) => s.op.contains("compact")
        case _                               => false
      }
    }
  }

  /** One purge pass (see [[purgeDeleted]]): returns its key set and
    * report plus, when a snapshot was committed, the
    * `(read version, committed version)` race-detection window. Key
    * sets can overlap across passes in the raced case (a key's carried
    * bytes purge again), so the driver unions them for the final count.
    */
  private def purgePass(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      before: Instant): (Set[String], PurgeReport, Option[(Long, Long)]) = {
    val table = AzofTable(spark, lakehousePath, name)
    // pin version + snapshot together: the window below must start at
    // the version the candidate files actually came from
    val readVersion = table.currentVersion.toLong
    val snap = table.snapshot(readVersion.toString)
    val dir = table.tableDir.toString
    if (snap.tombstoneFiles.isEmpty)
      return (Set.empty, PurgeReport(0L, Map.empty, Seq.empty), None)

    // 1. the purge key set: newest tombstone row (across the WHOLE
    // tree, closed children included) at-or-before `before`, minus
    // keys alive in Current (a resurrected key's tombstones stay)
    val maxKeys = spark.conf.getOption("spark.azof.purgeMaxKeys")
      .map(s => s.trim.toIntOption.filter(_ >= 1).getOrElse(
        throw new IllegalArgumentException(
          s"spark.azof.purgeMaxKeys must be a positive integer, got '$s'")))
      .getOrElse(1000000)
    // raw file read: PHYSICAL names (only system columns are consulted,
    // which never rename — but the schema must match the bytes)
    val readSchema =
      snap.schema.physicalStruct.add(TableSchema.DeletedName, "boolean")
    val tombRows = spark.read.schema(readSchema)
      .parquet(snap.tombstoneFiles.toSeq.sorted
        .map(f => new Path(dir, f).toString): _*)
      .where(coalesce(col(TableSchema.DeletedName), lit(false)))
    val alive = graft.operators.AzofScan.scanSnapshot(
        spark, table, snap, graft.format.AsOf.Current)
      .select(col(TableSchema.KeyName))
    val purgeKeys = tombRows
      .groupBy(col(TableSchema.KeyName))
      .agg(max(col(TableSchema.EventTimeName)).as("_tomb_at"))
      .where(col("_tomb_at") <= lit(java.sql.Timestamp.from(before)))
      .join(alive, Seq(TableSchema.KeyName), "left_anti")
      .select(col(TableSchema.KeyName))
      .limit(maxKeys + 1)
      .collect().map(_.getString(0)).toSet
    require(purgeKeys.size <= maxKeys,
      s"purge key set exceeds spark.azof.purgeMaxKeys=$maxKeys — " +
        "purge in key-range batches (commitDelete + purgeDeleted per range)")
    if (purgeKeys.isEmpty)
      return (Set.empty, PurgeReport(0L, Map.empty, Seq.empty), None)

    // 2. candidate files: stats that may contain any purge key, or no
    // stats (conservative)
    final case class Cand(file: String, stats: Option[FileStats])
    def cands(s: Segment): Seq[Cand] =
      s.file.map(f => Cand(f, s.fileStats)).toSeq ++
        s.delta.map(d => Cand(d.file, d.stats)) ++ s.segments.flatMap(cands)
    val candidates = snap.segments.flatMap(cands)
      .filter(c => c.stats.forall(_.mayContainAny(purgeKeys)))

    // 3. rewrite each candidate without the purged keys' rows
    val keysDf = broadcast(
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          purgeKeys.toSeq.map(org.apache.spark.sql.Row(_)), 1),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(
            TableSchema.KeyName,
            org.apache.spark.sql.types.StringType)))))
    val nextId = table.currentVersion.toLong + 1
    // old name -> Some((new name, new stats)) = rewritten,
    //             None                        = emptied, entry dropped
    val mapping: Map[String, Option[(String, Option[FileStats])]] =
      candidates.map { c =>
        val kept = spark.read
          .parquet(new Path(dir, c.file).toString)
          .join(keysDf, Seq(TableSchema.KeyName), "left_anti")
        val newName = uniqueFileName(s"purge_s$nextId")
        val stats = writeDataFile(spark, kept, dir, newName)
        if (stats.isEmpty) {
          // every row purged: drop the entry (and the empty parquet)
          val f = fs(spark, new Path(dir))
          scala.util.Try(f.delete(new Path(dir, newName), false))
          c.file -> None
        } else c.file -> Some((newName, stats))
      }.toMap

    // 4. swap the references — applied to the snapshot commitMeta hands
    // us, so files committed concurrently (not in `mapping`) pass
    // through untouched and relative precedence order is preserved
    def rewrite(s: Segment): Segment = {
      val (newFile, newFileStats) = s.file match {
        case Some(f) => mapping.get(f) match {
          case Some(Some((n, st))) => (Some(n), st)
          case Some(None)          => (None, None)
          case None                => (Some(f), s.fileStats)
        }
        case None => (None, s.fileStats)
      }
      s.copy(
        file = newFile,
        fileStats = newFileStats,
        delta = s.delta.flatMap(d => mapping.get(d.file) match {
          case Some(Some((n, st))) => Some(d.copy(file = n, stats = st))
          case Some(None)          => None
          case None                => Some(d)
        }),
        segments = s.segments.map(rewrite))
    }
    // NB: rewrite preserves each delta's original `seq` (d.copy keeps
    // it) — a purged file must keep its commit's place in the exact-tie
    // order, or a rewritten old delta would outrank newer commits
    val committedV = commitMeta(spark, dir) { (cur, _) =>
      cur.copy(segments = cur.segments.map(rewrite), op = Some("purge"))
    }
    (purgeKeys,
      PurgeReport(
        purgeKeys.size.toLong,
        mapping.collect { case (o, Some((n, _))) => o -> n },
        mapping.collect { case (o, None) => o }.toSeq.sorted),
      Some((readVersion, committedV)))
  }

  /** Rename a value column — metadata-only, like ADD and DROP: the
    * column's bytes stay in every data file under its immutable
    * PHYSICAL name ([[graft.format.ColumnDef.physical]], fixed at
    * creation); only the logical name queries see changes. Writers keep
    * writing the physical name and scans project physical → logical, so
    * files from before and after the rename read identically and
    * per-file value stats survive. Old snapshots pin their own schema,
    * so time travel sees the old name — rename is not retroactive.
    *
    * The OLD logical name joins the `retired` list: its bytes live on
    * under the physical name, so [[addColumn]] re-using it would
    * resurrect them (same guard as DROP). Renaming a column BACK to its
    * own physical name is the one exception — those bytes are its own.
    * System columns (`key`, `event_time`) never rename.
    */
  def renameColumn(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      from: String,
      to: String): Unit = {
    require(!Seq(TableSchema.KeyName, TableSchema.EventTimeName)
      .contains(from), s"cannot rename system column '$from'")
    require(!Seq(TableSchema.KeyName, TableSchema.EventTimeName)
      .contains(to) && to != TableSchema.DeletedName,
      s"cannot rename to reserved name '$to'")
    require(from != to, s"rename '$from' -> '$to' is a no-op")
    val table = AzofTable(spark, lakehousePath, name)
    commitMeta(spark, table.tableDir.toString) { (snap, _) =>
      val target = snap.schema.columns.find(_.name == from).getOrElse(
        throw new IllegalArgumentException(s"column '$from' does not exist"))
      require(!snap.schema.columns.exists(_.name == to),
        s"column '$to' already exists")
      require(!snap.retired.contains(to) || target.physicalName == to,
        s"column name '$to' was previously used and its values still " +
          "live in old data files; re-using the name would RESURRECT " +
          "them. Pick a fresh name.")
      snap.copy(
        schema = TableSchema(snap.schema.columns.map(c =>
          if (c.name == from)
            c.copy(name = to,
              physical = Some(c.physicalName).filter(_ != to))
          else c)),
        op = Some("rename-column"),
        // retire `from` only when bytes actually live under it (it is
        // the column's physical name): re-using THAT name would
        // resurrect old values. A pure logical alias (a second rename's
        // source) never had bytes and stays re-usable.
        retired =
          if (from == target.physicalName && !snap.retired.contains(from))
            snap.retired :+ from
          else snap.retired)
    }
    ()
  }

  /** Hierarchical re-segmentation: how many consecutive same-generation
    * closed roots fold into one parent (the financials-style year →
    * quarter nesting, reference test-data/financials/s1.json).
    */
  private val FoldFanout = 4
  private val FoldIdRe = "^fold(\\d+)_.*$".r

  private def foldGen(s: Segment): Int = s.id match {
    case FoldIdRe(g) => g.toInt
    case _           => 0
  }

  /** Fold runs of [[FoldFanout]] consecutive closed roots of the same
    * fold generation into one range-spanning parent, repeatedly — a
    * base-F counter, so after k compactions the root list holds
    * O(F·log_F k) segments and the tree is O(log_F k) deep instead of k
    * flat closed roots (snapshot size, parse time, and tree walk all
    * follow; the pruned FILE set for any as-of was already leaf-local
    * because closed roots carry no root-level files or deltas).
    *
    * Soundness: a fresh parent has `file = None`, `delta = ∅`, and a
    * range exactly spanning its children, and the scan walks roots
    * unconditionally while range-filtering children — a closed root's
    * own file and child segments are range-checked either way, and any
    * in-range child implies its covering parent is in range, so
    * wrapping them in a parent never changes the contributed file set
    * OR its precedence order (the parent stands at the position of its
    * oldest child). The ONE root feature that is NOT range-checked at
    * root level is root-attached deltas (`is_before` passes for any
    * `start <= asOf`, even past the root's end — metadata.rs:99-104), so
    * a root still carrying deltas must NEVER be folded: demoting it to a
    * range-filtered child would hide those deltas from Current and
    * late-as-of scans. This engine's compaction always wraps closed
    * state delta-free, so its own roots fold; a foreign writer's
    * delta-bearing closed root simply stays at top level. Generations
    * live in segment ids (`fold<g>_<suffix>`); foreign ids count as
    * generation 0.
    */
  private def refoldClosed(segments: Seq[Segment]): Seq[Segment] = {
    var segs = segments
    var changed = true
    while (changed) {
      changed = false
      var i = 0
      while (i + FoldFanout <= segs.length && !changed) {
        val run = segs.slice(i, i + FoldFanout)
        if (run.forall(s => s.end.isDefined && s.delta.isEmpty) &&
            run.map(foldGen).distinct.size == 1) {
          val parent = Segment(
            id = s"fold${foldGen(run.head) + 1}_${uniqueSuffix()}",
            start = run.map(_.start).min,
            end = Some(run.flatMap(_.end).max),
            file = None,
            segments = run,
            delta = Seq.empty)
          segs = segs.patch(i, Seq(parent), FoldFanout)
          changed = true
        }
        i += 1
      }
    }
    segs
  }

  /** Schema evolution — the reference's unchecked "Schema evolution"
    * roadmap item: append a value column to the declared schema in a new
    * snapshot (metadata-only commit; no data files touched). The column
    * must be nullable: files written before this snapshot simply lack it,
    * and the scan's explicit read schema makes Spark's parquet reader
    * surface NULL for the missing column — exactly the
    * columns-absent-are-null convention other lakehouse formats use.
    *
    * `branch` stages the evolution on that lineage — the WAP migration
    * shape (add a column + backfill on the branch, audit, publish):
    * main stays blind until publish, branch writes project to the
    * evolved branch schema, [[fastForward]] carries the evolution to
    * main verbatim, and [[mergeBranch]] reconciles additively (refusing
    * a name main independently added or retired post-fork — physical
    * names differ, so "same name" would be two different columns).
    * Branch evolution is ADD-only: drop/rename stay main-only
    * operations (a staged narrow would need publish-time column
    * un-retirement, a resurrection hazard by construction).
    */
  def addColumn(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      column: ColumnDef,
      branch: Option[String] = None): Unit = {
    require(column.nullable,
      s"added column '${column.name}' must be nullable: existing data files do not contain it")
    val table = AzofTable(spark, lakehousePath, name)
    commitMeta(spark, table.tableDir.toString, branch = branch) { (snap, _) =>
      require(!snap.schema.columns.exists(_.name == column.name) &&
        !Seq(TableSchema.KeyName, TableSchema.EventTimeName).contains(column.name),
        s"column '${column.name}' already exists")
      require(!snap.retired.contains(column.name),
        s"column '${column.name}' was previously dropped and its values " +
          "still live in pre-drop data files; re-adding the name would " +
          "RESURRECT them (this format addresses columns by name, not " +
          "physical id). Pick a fresh name, or rewrite the table.")
      snap.copy(
        schema = TableSchema(snap.schema.columns :+ column),
        op = Some("add-column"))
    }
    ()
  }

  /** Drop a value column — the other half of schema evolution, and like
    * [[addColumn]] a metadata-only commit: no data files are touched.
    * The column's bytes stay in existing files (time travel to pre-drop
    * versions still reads them, because each snapshot pins its own
    * schema); post-drop scans' explicit read schema simply omits the
    * column. The name is recorded in the snapshot's monotone `retired`
    * list so [[addColumn]] can refuse to resurrect it — see the
    * resurrection note on [[graft.format.Snapshot]].
    */
  def dropColumn(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      column: String): Unit = {
    require(!Seq(TableSchema.KeyName, TableSchema.EventTimeName)
      .contains(column),
      s"cannot drop system column '$column'")
    val table = AzofTable(spark, lakehousePath, name)
    commitMeta(spark, table.tableDir.toString) { (snap, _) =>
      require(snap.schema.columns.exists(_.name == column),
        s"column '$column' does not exist")
      snap.copy(
        schema = TableSchema(snap.schema.columns.filterNot(_.name == column)),
        op = Some("drop-column"),
        retired = snap.retired :+ column)
    }
  }

  /** Tag-name contract shared by [[tagVersion]]/[[untagVersion]]: a tag
    * must never be mistakable for a numeric version (resolution order:
    * digits → version id, else → ref lookup), must render into the
    * snapshot JSON, and must survive CLI round-trips.
    */
  private def validateTagName(tag: String): Unit = {
    require(tag.nonEmpty && tag == tag.trim,
      s"tag name '$tag' must be non-empty with no leading/trailing whitespace")
    require(!tag.forall(_.isDigit),
      s"tag name '$tag' is all digits — it would shadow snapshot version $tag " +
        "in VERSION AS OF resolution; pick a name with a non-digit")
    require(tag.forall(c => !c.isControl),
      s"tag name contains control characters")
  }

  /** Tag a snapshot version with a NAME (Iceberg-tag analogue): a
    * metadata-only commit recording `tag -> version` in the snapshot's
    * `refs` index, after which `VERSION AS OF '<tag>'` (SQL, reader
    * option, change-feed bounds) resolves through the current
    * snapshot's refs and [[graft.sources.AzofVacuum]] retains the
    * tagged document and its files regardless of `keepLast`. `version
    * = None` tags the current version. Retargeting an existing tag
    * requires `replace = true` — a silent move would repoint every
    * consumer pinned to the name. PURGE deliberately wins over tags
    * (erase-everywhere compliance contract): a purge that rewrites
    * history invalidates pre-purge tagged views like any other
    * pre-purge version.
    *
    * Returns the version the tag commit landed at.
    */
  def tagVersion(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      tag: String,
      version: Option[Long] = None,
      replace: Boolean = false): Long = {
    validateTagName(tag)
    val table = AzofTable(spark, lakehousePath, name)
    val target = version.getOrElse(table.currentVersion.toLong)
    require(target >= 1, s"cannot tag version $target")
    // idempotent re-tag: the tag already points where asked — no commit
    // (re-running a tagging script must not grow the snapshot log)
    if (table.currentSnapshot.refs.get(tag).contains(target))
      return table.currentVersion.toLong
    commitMeta(spark, table.tableDir.toString) { (snap, nextId) =>
      require(target < nextId,
        s"cannot tag version $target: the table is at ${nextId - 1}")
      // the tagged document must exist AND parse — tagging a vacuumed
      // (or crash-debris) id would mint a dangling name
      val cls =
        try table.classifySnapshot(target.toString)
        catch { case _: java.io.FileNotFoundException =>
          throw new IllegalArgumentException(
            s"cannot tag version $target: s$target.json does not exist " +
              "(expired by vacuum?)")
        }
      require(cls.isInstanceOf[SnapshotCodec.DocClass.Valid],
        s"cannot tag version $target: s$target.json is not a readable snapshot")
      snap.refs.get(tag).filter(_ != target).foreach { old =>
        require(replace,
          s"tag '$tag' already points at version $old; pass replace=true " +
            "(SQL: replace => true) to retarget it")
      }
      snap.copy(refs = snap.refs + (tag -> target), op = Some("tag"))
    }
  }

  /** Remove a named version tag — metadata-only; the formerly-tagged
    * snapshot becomes an ordinary version again (expirable by the next
    * vacuum once outside `keepLast`). Unknown tags fail loudly: a typo'd
    * untag that "succeeds" would leave the real tag pinning files
    * forever.
    */
  def untagVersion(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      tag: String): Long = {
    val table = AzofTable(spark, lakehousePath, name)
    commitMeta(spark, table.tableDir.toString) { (snap, _) =>
      require(snap.refs.contains(tag),
        s"no such tag '$tag'" + (if (snap.refs.isEmpty) ""
          else s"; known tags: ${snap.refs.keys.toSeq.sorted.mkString(", ")}"))
      snap.copy(refs = snap.refs - tag, op = Some("untag"))
    }
  }

  /** Create a BRANCH — a named write lineage forked at `version`
    * (default: the current main head). Unlike a tag (immutable pin), a
    * branch ADVANCES: `commitBase`/`commitDelta`/`commitPartitioned`
    * with `branch = Some(name)` land snapshots in the shared id
    * sequence that never touch `version.txt`, so main readers
    * (including a reference reader) are blind to the branch until
    * [[fastForward]] publishes its head — the write-audit-publish flow.
    * The branch head lives in `branch-<name>.txt` beside `version.txt`,
    * created atomically (create-if-absent through the commit guard, so
    * two racing creates serialize and the loser fails loudly).
    *
    * Branch names share `VERSION AS OF` resolution with tags (tags win),
    * so creating a branch under an existing tag's name is refused.
    */
  def createBranch(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      branchName: String,
      version: Option[Long] = None): Long = {
    validateTagName(branchName)
    require(branchName != "main", "'main' is the default lineage itself")
    require(!branchName.exists(c => c == '/' || c == '\\'),
      s"branch name '$branchName' must not contain path separators")
    val table = AzofTable(spark, lakehousePath, name)
    require(!table.currentSnapshot.refs.contains(branchName),
      s"a tag named '$branchName' exists — tags win VERSION AS OF " +
        "resolution, so the branch would be unreachable; pick another name")
    val target = version.getOrElse(table.currentVersion.toLong)
    val cls =
      try table.classifySnapshot(target.toString)
      catch { case _: java.io.FileNotFoundException =>
        throw new IllegalArgumentException(
          s"cannot branch at version $target: s$target.json does not " +
            "exist (expired by vacuum?)")
      }
    require(cls.isInstanceOf[SnapshotCodec.DocClass.Valid],
      s"cannot branch at version $target: s$target.json is not a " +
        "readable snapshot")
    val dir = table.tableDir
    val bp = new Path(dir, AzofTable.branchFile(branchName))
    val f = fs(spark, dir)
    val tmp = new Path(dir, s"_tmp_branch_${UUID.randomUUID().toString}.txt")
    writeUtf8(spark, tmp, target.toString)
    val won =
      try CommitGuard.forPath(spark, bp).publish(f, tmp, bp)
      catch { case e: Throwable => f.delete(tmp, false); throw e }
    if (!won) {
      f.delete(tmp, false)
      throw new IllegalArgumentException(
        s"branch '$branchName' already exists on $name")
    }
    target
  }

  /** Drop a branch: delete its pointer file. The lineage's snapshot
    * documents become unreachable debris the next vacuum expires (their
    * data files with them, once unreferenced). Refuses unknown names —
    * a typo'd drop that "succeeds" would leave the real branch pinning
    * files forever.
    */
  def dropBranch(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      branchName: String): Unit = {
    val table = AzofTable(spark, lakehousePath, name)
    val bp = new Path(table.tableDir, AzofTable.branchFile(branchName))
    val f = fs(spark, bp)
    if (!f.delete(bp, false)) {
      val known = table.listBranches.sorted
      throw new IllegalArgumentException(
        s"no such branch '$branchName'" + (if (known.isEmpty) ""
          else s"; known branches: ${known.mkString(", ")}"))
    }
  }

  /** FAST-FORWARD main to a branch's head — the PUBLISH step of
    * write-audit-publish: one new main commit re-registering the branch
    * head's schema + segment tree verbatim, so everything audited on
    * the branch becomes the table's current state atomically and the
    * change feed delivers the branch's files at publish time (op is NOT
    * in the feed's skip set — downstream mirrors see the data exactly
    * when it goes live, never while it was on the branch).
    *
    * Iceberg's fast_forward contract: refuses if main advanced past the
    * branch's fork point (the publish would silently discard those main
    * commits) — re-checked inside the optimistic retry against the
    * exact commit base, so a racing main commit cannot slip in.
    * Metadata merges lineage-correctly: `refs` union (main's newer tags
    * win), `streamBatches` per-key max (replay guards stay monotone for
    * sinks on either lineage), `retired` union. The branch pointer
    * itself does not move; a published branch is typically dropped and
    * a fresh one forked for the next cycle.
    *
    * Returns the version the publish commit landed at.
    */
  def fastForward(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      branchName: String): Long = {
    val table = AzofTable(spark, lakehousePath, name)
    commitMeta(spark, table.tableDir.toString) { (base, nextId) =>
      val (head, headSnap, fork, _) = branchLineage(table, branchName)
      // main must still be AT the fork: any main commit past it means
      // the publish would discard state (mergeBranch instead)
      val advanced = AzofTable.snapshotIdsOnDisk(
        fs(spark, table.tableDir), table.tableDir)
        .filter(id => id > fork && id < nextId)
        .filter(id => table.classifySnapshot(id.toString) match {
          case SnapshotCodec.DocClass.Valid(s) => s.branch.isEmpty
          case _ => false
        })
      require(advanced.isEmpty,
        s"cannot fast-forward '$branchName' (forked at s$fork.json): " +
          s"main advanced past the fork (s${advanced.mkString(".json, s")}" +
          ".json) — publishing this tree verbatim would discard those " +
          "commits. Use mergeBranch / CALL system.merge_branch to " +
          "publish onto the advanced head, or re-fork")
      val merged = (base.streamBatches.keySet ++ headSnap.streamBatches.keySet)
        .map(k => k -> math.max(
          base.streamBatches.getOrElse(k, Long.MinValue),
          headSnap.streamBatches.getOrElse(k, Long.MinValue))).toMap
      headSnap.copy(
        op = Some(s"fast-forward#$branchName"),
        refs = headSnap.refs ++ base.refs,
        streamBatches = merged,
        retired = (base.retired ++ headSnap.retired).distinct)
    }
  }

  /** (head version, head snapshot, fork version, chain) of `branchName`
    * — the chain is the branch-tagged snapshots head → fork-exclusive,
    * newest first. Refuses an unknown branch, an empty branch (head =
    * the fork itself), and a broken parent chain.
    */
  private def branchLineage(
      table: AzofTable,
      branchName: String): (Long, Snapshot, Long, List[Snapshot]) = {
    val head = table.branchHead(branchName).getOrElse(
      throw new IllegalArgumentException(
        s"no such branch '$branchName'" +
          (if (table.listBranches.isEmpty) ""
           else s"; known branches: ${table.listBranches.sorted.mkString(", ")}")))
    val headSnap = table.snapshot(head.toString)
    require(headSnap.branch.contains(branchName),
      s"branch '$branchName' has no commits (head s$head.json is the " +
        "fork itself) — nothing to publish")
    // fork point: walk the branch lineage's parents to its main base
    var fork = head
    var cur = headSnap
    var chain = List.empty[Snapshot]
    while (cur.branch.nonEmpty) {
      chain = chain :+ cur
      fork = cur.parent.getOrElse(throw new IllegalStateException(
        s"branch '$branchName' lineage broken at s$fork.json: no " +
          "parent link — cannot prove ancestry for publish"))
      cur = table.snapshot(fork.toString)
    }
    (head, headSnap, fork, chain)
  }

  /** MERGE a branch into main — the publish path for a branch whose
    * fork point main has ADVANCED past (where [[fastForward]] refuses):
    * one new main commit registering the branch lineage's delta files
    * onto main's CURRENT head tree, verbatim entries (window, stats,
    * tombstone flag, and — decisively — their original commit `seq`).
    *
    * Seq is why this merge needs no conflict resolution policy: the
    * table's id sequence is SHARED across lineages, so every file on
    * either side already carries a globally-ordered landing version,
    * and the scan's exact event-time tie-break (seq desc) resolves
    * cross-lineage collisions by TRUE landing order — a branch delta
    * that landed at s5 yields to a main delta that landed at s6,
    * exactly as two main commits would. Non-tie collisions were never
    * ambiguous: merge-on-read serves the per-key latest event time
    * regardless of which lineage wrote it.
    *
    * Main schema changes since the fork are safe by the format's own
    * old-file machinery: branch files missing a column main ADDed read
    * as absent rows for that column (the pre-ADD contract), bytes under
    * a name main DROPped ride the retired machinery, renames never
    * touch file bytes (physical names are immutable). BRANCH schema
    * changes (additive only — [[addColumn]] with `branch`) reconcile at
    * merge: the branch's added columns append onto main's current
    * schema; a name main independently added unifies when the
    * definitions agree and refuses when they cannot share bytes, and a
    * main-retired name refuses (see the inline contract). Files already on
    * main (a re-merge, or a merge after fast-forward) are skipped, so
    * merge is idempotent — a fully-published branch refuses with
    * "nothing to merge". The change feed delivers the merged files at
    * THIS commit (op `merge#<branch>` is not in the feed's skip set).
    *
    * Note the purge interplay: like rollback, a merge can re-register
    * rows for keys main purged after the fork — re-run purge if the
    * branch predates an erasure (the merge commit's files list names
    * exactly what came in).
    *
    * Returns the version the merge commit landed at.
    */
  def mergeBranch(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      branchName: String): Long = {
    val table = AzofTable(spark, lakehousePath, name)
    commitMeta(spark, table.tableDir.toString) { (base, nextId) =>
      val (_, headSnap, fork, chain) = branchLineage(table, branchName)
      // A FOLDED branch (compact on the branch lineage) must not merge:
      // the fold re-stamps fork-era rows at its own LATER commit seq, so
      // registering the fold's outputs as deltas would let pre-fold
      // values win exact event-time ties against main commits that
      // landed BEFORE the fold — silent stale-row resurrection. The
      // append-only base-file check below cannot catch a multi-file fold
      // (its outputs are Delta entries), so the fold-only-before-
      // fast-forward contract is enforced on the chain's op markers.
      val folds = chain.filter(_.op.contains("compact"))
      require(folds.isEmpty,
        s"branch '$branchName' was folded (compact on the branch " +
          "lineage) — the fold re-stamped its rows at a later commit " +
          "seq, so merging would resurrect pre-fold values over main " +
          "commits that landed before the fold. Publish a folded branch " +
          "with fastForward / CALL system.fast_forward (the fold-before-" +
          "publish flow), or re-fork and merge unfolded deltas")
      val forkFiles = table.snapshot(fork.toString).allFiles
      val baseFiles = base.allFiles
      def collect(seg: Segment): Seq[Delta] =
        seg.delta.filterNot(d =>
          forkFiles.contains(d.file) || baseFiles.contains(d.file)) ++
          seg.segments.flatMap(collect)
      val newDeltas = headSnap.segments.flatMap(collect)
      // every branch-added file must be a DELTA entry — branch commits
      // are appends by construction, so a base-file difference means a
      // foreign writer rewrote the branch tree; refuse rather than
      // silently drop it
      val unaccounted = (headSnap.allFiles -- forkFiles -- baseFiles) --
        newDeltas.map(_.file).toSet
      require(unaccounted.isEmpty,
        s"branch '$branchName' carries non-delta tree changes " +
          s"(${unaccounted.toSeq.sorted.mkString(", ")}) — only " +
          "append-only delta lineages can merge")
      require(newDeltas.nonEmpty,
        s"nothing to merge from branch '$branchName': every file is " +
          "already on main (published by an earlier merge/fast-forward?)")
      val merged = (base.streamBatches.keySet ++ headSnap.streamBatches.keySet)
        .map(k => k -> math.max(
          base.streamBatches.getOrElse(k, Long.MinValue),
          headSnap.streamBatches.getOrElse(k, Long.MinValue))).toMap
      // ADDITIVE schema reconciliation: columns the branch added since
      // the fork append onto main's current schema. This format
      // addresses columns by NAME (physical names exist only for
      // renames), so a name main independently added post-fork UNIFIES
      // when the definitions agree (same type, un-renamed — the branch
      // files' bytes serve under it directly) and refuses when they
      // cannot share bytes: a type mismatch, or a main column RENAMED
      // to that name (its bytes live under a different physical name,
      // so the branch's would silently not be read). A name main
      // retired post-fork refuses too (resurrection guard).
      val forkSchema = table.snapshot(fork.toString).schema
      val branchAdds = headSnap.schema.columns.filterNot(c =>
        forkSchema.columns.exists(_.name == c.name))
      val (sharedAdds, newCols) = branchAdds.partition(c =>
        base.schema.columns.exists(_.name == c.name))
      sharedAdds.foreach { c =>
        val b = base.schema.columns.find(_.name == c.name).get
        require(b.dataType == c.dataType && b.physicalName == c.physicalName,
          s"cannot merge branch '$branchName': its added column " +
            s"'${c.name}' collides with main's post-fork definition " +
            s"(main: ${b.dataType} under physical '${b.physicalName}'; " +
            s"branch: ${c.dataType} under physical '${c.physicalName}') " +
            "— two incompatible definitions under one name. Rename one " +
            "side, or re-fork")
      }
      newCols.foreach { c =>
        require(!base.retired.contains(c.name),
          s"cannot merge branch '$branchName': it added column " +
            s"'${c.name}', a name main retired (dropped) — merging " +
            "would resurrect the dropped name. Pick a fresh name on " +
            "the branch, or re-fork")
      }
      base.copy(
        schema = TableSchema(base.schema.columns ++ newCols),
        segments = mapOpenRoot(base.segments)(s =>
          s.copy(delta = s.delta ++ newDeltas)),
        op = Some(s"merge#$branchName"),
        refs = headSnap.refs ++ base.refs,
        streamBatches = merged,
        retired = (base.retired ++ headSnap.retired).distinct)
    }
  }

  /** Roll the table's CURRENT state back to an earlier version — as a
    * NEW commit (append-only contract: nothing is erased, the rolled-
    * back-over versions still time-travel). The new snapshot takes the
    * target version's schema and segment tree verbatim, with three
    * deliberate carry-forwards from the head being rolled back:
    *
    *   - `streamBatches` stays the HEAD's map — replay protection is
    *     monotone, and resetting it would make every streaming sink
    *     re-apply batches it already committed (silent duplicates).
    *   - `retired` is the union — the rolled-back-over columns' bytes
    *     still live in on-disk files, so their names stay refused.
    *     (Rolling back over a DROP restores the column itself: the
    *     target schema still declares it, and declared-in-schema beats
    *     retired everywhere a scan builds its read schema.)
    *   - `refs` stays the HEAD's map — tags name versions, not states.
    *
    * Refuses when any file the target snapshot references is physically
    * gone (vacuumed or purged): a rollback that "succeeds" onto missing
    * bytes would fail at first scan. Commit-seq stays consistent for
    * free: every re-registered delta keeps its original `seq`, all of
    * which precede this commit's own, so post-rollback appends still
    * win exact event-time ties against everything they should.
    *
    * CDC note: the rollback commit feeds NO rows ([[AzofChangeFeed]]
    * skips `op = "rollback"` — its files' rows were fed when first
    * committed), so downstream incremental mirrors/indexes of a
    * rolled-back table must reconcile via their epoch-rebuild escape
    * hatch (`rebuildEpoch` / `CALL system.{dedup,sem}_rebuild`).
    */
  def rollback(
      spark: SparkSession,
      lakehousePath: String,
      name: String,
      toVersion: Long): Long = {
    val table = AzofTable(spark, lakehousePath, name)
    val tableDir = table.tableDir
    commitMeta(spark, tableDir.toString) { (snap, nextId) =>
      require(toVersion >= 1 && toVersion < nextId,
        s"cannot roll back to version $toVersion: the table is at ${nextId - 1}")
      val old =
        (try table.classifySnapshot(toVersion.toString)
         catch { case _: java.io.FileNotFoundException =>
           throw new IllegalArgumentException(
             s"cannot roll back to version $toVersion: s$toVersion.json " +
               "does not exist (expired by vacuum?)")
         }) match {
          case SnapshotCodec.DocClass.Valid(s) => s
          case _ => throw new IllegalArgumentException(
            s"cannot roll back to version $toVersion: s$toVersion.json " +
              "is not a readable snapshot")
        }
      // ONE directory listing: every file the target references must
      // still exist — purge physically erases history, and a rollback
      // onto missing bytes would scan-fail later instead of refusing now
      val onDisk = fs(spark, tableDir).listStatus(tableDir)
        .map(_.getPath.getName).toSet
      val missing = old.allFiles.filterNot(onDisk.contains).toSeq.sorted
      require(missing.isEmpty,
        s"cannot roll back to version $toVersion: referenced data " +
          s"file${if (missing.size > 1) "s" else ""} " +
          s"${missing.take(5).mkString(", ")}" +
          (if (missing.size > 5) s" (+${missing.size - 5} more)" else "") +
          " no longer exist (removed by purge/vacuum)")
      old.copy(
        op = Some("rollback"),
        streamBatches = snap.streamBatches,
        retired = (snap.retired ++ old.retired.filterNot(
          snap.retired.contains)).distinct,
        refs = snap.refs)
    }
  }

  /** What [[analyzeTable]] did: which files got fresh stats, which were
    * unreadable/empty (left as-is), and the snapshot version the restamp
    * committed at (None = every referenced file already had full stats —
    * no commit, the idempotent re-run).
    */
  final case class AnalyzeReport(
      analyzed: Seq[String], skipped: Seq[String], version: Option[Long])

  /** Stats backfill — a METADATA-ONLY restamp for tables whose files
    * predate the stats generations (key ranges, then value-column
    * ranges) or were written by a foreign/reference writer: read each
    * stat-less file once, compute the same key-range (+ optional
    * bloom) and canonical value-range stats every commit path stamps,
    * and patch them into a new snapshot by file name. No data file is
    * rewritten or renamed, so every existing version still reads
    * byte-identically — only future scans' pruning improves. The
    * upgrade a compaction would deliver as a side effect, without the
    * rewrite.
    *
    * A file re-analyzes when it has no stats at all, or key-only stats
    * while the declared schema carries value columns eligible for
    * ranges (the pre-value-stats generation). Files already fully
    * stamped are untouched, so a second run is a no-op. Concurrency:
    * the patch applies name-keyed inside the optimistic commit retry —
    * files a racing commit added are untouched, files a racing
    * compaction removed no-op.
    */
  def analyzeTable(
      spark: SparkSession,
      lakehousePath: String,
      name: String): AnalyzeReport = {
    val table = AzofTable(spark, lakehousePath, name)
    val snap = table.currentSnapshot
    val dir = table.tableDir
    // stats are keyed by PHYSICAL column names (what the files hold)
    val declared = snap.schema.columns.map(_.physicalName).toSet
    val valueEligible =
      valueStatColsOf(snap.schema.physicalStruct).exists(c => declared(c._1))
    def walk(s: Segment): Seq[(String, Option[FileStats])] =
      s.file.map(f => f -> s.fileStats).toSeq ++
        s.delta.map(d => d.file -> d.stats) ++ s.segments.flatMap(walk)
    // a file needs a restamp when it has no stats at all, predates the
    // value-range generation (when any value column is eligible), or
    // predates the row-count generation
    val candidates = snap.segments.flatMap(walk).distinct.collect {
      case (f, st) if st.isEmpty ||
        (st.get.cols.isEmpty && valueEligible) || st.get.rows.isEmpty ||
        // pre-event-time-stat generation: backfill the base-file
        // event-time range the AS OF rewrite gate consumes
        !st.get.cols.contains(TableSchema.EventTimeStatName) => f
    }
    if (candidates.isEmpty)
      return AnalyzeReport(Seq.empty, Seq.empty, None)

    val bc = bloomConf(spark)
    val computed: Seq[(String, Option[FileStats])] = candidates.map { f =>
      val p = new Path(dir, f)
      val st = scala.util.Try {
        val read = spark.read.parquet(p.toString)
        // value ranges only for DECLARED columns: a pre-drop file still
        // carries retired columns' bytes, which must not re-enter the
        // metadata; the tombstone marker and system columns are
        // excluded by the eligibility rule itself
        val vcols = valueStatCols(read).filter(c => declared(c._1))
        val aggs = Seq(min(col(TableSchema.KeyName)),
          max(col(TableSchema.KeyName))) ++ bloomColumn(spark, bc) ++
          vcols.flatMap { case (n, enc) =>
            Seq(enc(min(col(n))), enc(max(col(n)))) } ++
          etStatAggs ++
          Seq(count(lit(1)))
        val mm = read.agg(aggs.head, aggs.tail: _*).collect()(0)
        val vOff = 2 + (if (bc.isDefined) 1 else 0)
        if (mm.isNullAt(0)) None
        else Some(FileStats(mm.getString(0), mm.getString(1),
          bc.map { case (bits, k) =>
            KeyBloom.fromBytes(mm.getAs[Array[Byte]](2), bits, k)
          },
          colRanges(mm, vOff, vcols.map(_._1)) ++
            etRange(mm, vOff + 2 * vcols.size),
          rows = Some(mm.getLong(vOff + 2 * vcols.size + 2))))
      }.toOption.flatten
      f -> st
    }
    val fresh = computed.collect { case (f, Some(st)) => f -> st }.toMap
    val skipped = computed.collect { case (f, None) => f }
    if (fresh.isEmpty)
      return AnalyzeReport(Seq.empty, skipped, None)
    def patch(s: Segment): Segment = s.copy(
      fileStats = s.file.flatMap(fresh.get).orElse(s.fileStats),
      delta = s.delta.map(d =>
        fresh.get(d.file).map(st => d.copy(stats = Some(st))).getOrElse(d)),
      segments = s.segments.map(patch))
    val v = commitMeta(spark, dir.toString) { (cur, _) =>
      cur.copy(segments = cur.segments.map(patch), op = Some("analyze"))
    }
    AnalyzeReport(fresh.keys.toSeq.sorted, skipped, Some(v))
  }

  private def mapOpenRoot(segments: Seq[Segment])(f: Segment => Segment): Seq[Segment] = {
    val openIdx = segments.indexWhere(_.end.isEmpty)
    require(openIdx >= 0, "table has no open segment to commit into")
    segments.updated(openIdx, f(segments(openIdx)))
  }

  /** Metadata phase of a commit: apply `update` to the latest snapshot
    * and register the result as the next version, with bounded optimistic
    * retry. On a version conflict (another writer landed the id first —
    * create-if-absent refused the write) the step is RE-READ and
    * RE-APPLIED against the winner's snapshot instead of throwing: the
    * expensive part of every commit (the data files) is already down
    * under collision-free unique names, so only this cheap step needs
    * redoing — without it, a partitioned commit losing a race orphans
    * the whole distributed write until vacuum.
    *
    * Two hardening details beyond the plain loop:
    *   - next id = one past the HIGHEST existing snapshot, not
    *     version.txt + 1 — a racing writer's s{N}.json may exist before
    *     its version.txt write lands, and building on version.txt alone
    *     would (a) conflict forever and (b) base the update on stale
    *     state, silently dropping the racer's commit from the chain;
    *   - version.txt is re-read immediately before the pointer write
    *     and only moved FORWARD. This narrows — but, being
    *     check-then-act, cannot fully close — the window where a slow
    *     winner's pointer write lands after a faster retrier's and
    *     briefly regresses the pointer; the fork is bounded (both
    *     snapshots exist, the next commit's forward probe re-converges
    *     past both) and absent entirely on single-writer deployments.
    *     A compare-and-swap pointer store would close it exactly.
    */
  /** Optimistic-retry snapshot commit; returns the VERSION the update
    * landed at (callers that need to reason about what happened
    * concurrently — e.g. [[purgeDeleted]]'s compaction-race fixpoint —
    * scan the log between their read version and this one).
    *
    * `update` receives `(base snapshot, version being committed)` — the
    * version is re-derived on every retry, so closures that stamp it
    * into the snapshot (commit-seq on new deltas) stay correct when a
    * lost race re-applies them at a later id.
    */
  private def commitMeta(
      spark: SparkSession,
      dir: String,
      maxRetries: Int = 5,
      branch: Option[String] = None)(
      update: (Snapshot, Long) => Snapshot): Long = {
    val tableDir = new Path(dir)
    val f = fs(spark, tableDir)
    // retry budget scales with writer concurrency: every lost race costs
    // one retry, so N writers racing one table need ~N retries for the
    // last to land. `spark.azof.commitRetries` overrides the default 5
    // for high-fan-in deployments (many streaming sinks / ingest jobs
    // sharing a table).
    val retryLimit = spark.conf.getOption("spark.azof.commitRetries")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .filter(_ >= 0)
      .getOrElse(maxRetries)
    var attempt = 0
    var committed = false
    var committedAt = 0L
    while (!committed) {
      val t = new AzofTable(tableDir, spark.sessionState.newHadoopConf())
      // read the pointer ONCE per attempt: currentVersion is a remote
      // read (with retry probes), and this loop may walk many ids
      val floor = t.currentVersion.toLong
      var nextId = floor + 1
      while (f.exists(new Path(tableDir, s"s$nextId.json"))) nextId += 1
      // Parse base = highest existing snapshot. The downward fallback is
      // deliberately narrow (SnapshotCodec.classify): only MALFORMED
      // documents (truncated JSON — a pre-temp+rename writer died
      // mid-write; never committed) are skipped. A well-formed JSON
      // object this codec cannot read may be a NEWER engine's committed
      // document — skipping it would fork its commit out of the chain
      // silently, so the commit refuses loudly instead. Read IOExceptions
      // propagate: a transient read failure on a racer's committed
      // snapshot must abort this commit, not base it on stale state.
      // nextId stays past any skipped name so the retry never collides
      // with it; malformed debris is dead weight vacuum expires.
      // Valid docs carrying a BRANCH tag are also skipped on the main
      // walk: they share the id sequence but belong to another lineage —
      // basing main on one would silently graft the branch's tree onto
      // main. (version.txt only ever names main documents, so the floor
      // fallback stays a main base.)
      val (baseId, baseSnap) = branch match {
        case Some(b) =>
          val headId = t.branchHead(b).getOrElse(
            throw new IllegalArgumentException(
              s"azof table $tableDir has no branch '$b'" +
                (if (t.listBranches.isEmpty)
                   " (none exist; create one with createBranch / " +
                     "CALL system.create_branch)"
                 else s"; known branches: ${t.listBranches.sorted.mkString(", ")}")))
          (headId, t.snapshot(headId.toString))
        case None =>
          var id = nextId - 1
          var found: Option[Snapshot] = None
          var foundId = floor
          while (found.isEmpty && id >= floor) {
            t.classifySnapshot(id.toString) match {
              case SnapshotCodec.DocClass.Valid(s) if s.branch.isEmpty =>
                found = Some(s); foundId = id
              case SnapshotCodec.DocClass.Valid(_) => id -= 1 // branch doc
              case SnapshotCodec.DocClass.WellFormedUnknown(e) =>
                throw new IllegalStateException(
                  s"snapshot s$id.json is well-formed JSON but not a " +
                    "snapshot this engine can read (possibly committed by " +
                    "a newer engine version) — refusing to commit past it", e)
              case SnapshotCodec.DocClass.Malformed(_) => id -= 1
            }
          }
          // reaching here with nothing found means even the pointer's own
          // document failed to classify Valid — parse it loudly
          (foundId, found.getOrElse(t.snapshot(floor.toString)))
      }
      val newSnap = update(baseSnap, nextId)
        .copy(branch = branch, parent = Some(baseId))
      val won =
        try { writeSnapshot(spark, dir, nextId.toString, newSnap); true }
        catch {
          case e: java.io.IOException
              if attempt < retryLimit &&
                f.exists(new Path(tableDir, s"s$nextId.json")) =>
            attempt += 1 // lost the race at nextId: re-read, re-apply
            false
        }
      if (won) branch match {
        case None =>
          // outside the conflict guard: a failure HERE must propagate, not
          // re-enter the retry (the snapshot is already durably placed —
          // retrying would commit the same change twice at a new id). The
          // pointer check re-reads version.txt as late as possible; see
          // the doc note on the residual check-then-act window.
          val fresh = new AzofTable(tableDir, spark.sessionState.newHadoopConf())
          if (scala.util.Try(fresh.currentVersion.toLong).getOrElse(0L) < nextId)
            writeVersion(spark, dir, nextId.toString)
          committed = true
          committedAt = nextId
        case Some(b) =>
          // Branch commits have no conditional-put adjacency guarantee
          // against SIBLING branch writers: two writers can base on the
          // same head and land at DIFFERENT ids (both puts succeed). The
          // head-recovery walk adopts exactly one child per parent
          // (lowest id), so verify OUR doc ended up on the adopted
          // chain; a forked doc is abandoned as debris (its data files
          // are re-registered by the retry, vacuum sweeps the orphan) and
          // the commit retries against the winner's head.
          val headNow = t.branchHead(b).getOrElse(
            throw new IllegalStateException(
              s"branch '$b' pointer disappeared mid-commit (concurrent " +
                "drop_branch?) — s$nextId.json is committed but " +
                "unreachable; recreate the branch at that version to " +
                "recover it"))
          val onChain = {
            var at = headNow
            var hit = at == nextId
            while (!hit && at > baseId) {
              t.classifySnapshot(at.toString) match {
                case SnapshotCodec.DocClass.Valid(s)
                    if s.parent.nonEmpty && s.branch.contains(b) =>
                  at = s.parent.get
                  hit = at == nextId
                case _ => at = baseId // broken link: not our chain
              }
            }
            hit
          }
          if (onChain) {
            // forward-only pointer advance, version.txt's protocol
            val bp = new Path(tableDir, AzofTable.branchFile(b))
            val raw = scala.util.Try {
              val in = f.open(bp)
              try new String(in.readAllBytes(),
                java.nio.charset.StandardCharsets.UTF_8).trim.toLong
              finally in.close()
            }.getOrElse(0L)
            if (raw < headNow) {
              AtomicReplace.replace(f, tableDir, bp, headNow.toString)
              ()
            }
            committed = true
            committedAt = nextId
          } else if (attempt < retryLimit) {
            attempt += 1 // forked behind a sibling: re-base, re-apply
          } else throw new java.io.IOException(
            s"branch '$b' commit lost ${attempt + 1} races and the " +
              "retry budget (spark.azof.commitRetries) is exhausted")
      }
    }
    committedAt
  }
}
