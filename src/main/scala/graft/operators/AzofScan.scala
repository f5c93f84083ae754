package graft.operators

import graft.format._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The core azof operator: the event-time as-of merge-dedup scan,
  * expressed declaratively on Catalyst instead of the reference's
  * row-at-a-time loop (reference: crates/azof/src/lakehouse.rs:29-86).
  *
  * Semantics (SURVEY.md §2.1): among rows with `event_time <= asOf`, the
  * newest `event_time` per `key` wins; exact event-time ties resolve by
  * COMMIT RECENCY first ([[graft.format.Delta.seq]] — the later commit's
  * row wins, which is what makes an UPDATE/MERGE that keeps a row's
  * original event_time stick even when the statement touched rows from
  * several earlier deltas), then by file precedence (the pruned-file
  * ordering from the segment tree — children, then deltas
  * newest-start-first, then base), and remaining full ties
  * (duplicate (key, event_time) within ONE file) by a hash of the value
  * columns, so the scan is deterministic under any partitioning or task
  * retry (the reference keeps the file's FIRST row here — row order
  * inside a file is not a contract this engine preserves through a
  * distributed scan, so a content hash is the portable tiebreak). A row
  * filtered out by the as-of predicate never claims its key
  * (lakehouse.rs:64-68).
  *
  * Known divergence (documented, intentional): for OVERLAPPING delta
  * windows the reference resolves per-key winners purely by file
  * precedence — a higher-precedence file's OLDER row beats a
  * lower-precedence file's newer row (lakehouse.rs row loop claims a key
  * on first sight). This scan keeps the globally newest event_time and
  * uses precedence only for exact event-time ties: the event-time-
  * consistent reading. The two agree on every layout this writer's
  * by-time paths or the reference's tooling produce (delta windows
  * partition time); they differ only when delta windows OVERLAP and a
  * later-window file carries older in-window rows for a key another
  * file updates. Note that `commitPartitioned(byKey = true)` layouts
  * have overlapping windows ACROSS commits by design — this scan reads
  * them correctly (newest event_time wins regardless of file), but a
  * pure-precedence reference reader may surface a stale row from the
  * later-starting file; use by-key layouts only for tables read by this
  * engine.
  *
  * Compatibility mode: `spark.azof.strictPrecedence = true` (off by
  * default) orders the dedup window by `(precedence asc, event_time
  * desc)` instead — per-key winners resolve by file precedence FIRST,
  * bit-for-bit the reference's first-seen-wins semantics on files
  * following its event-time-descending row convention
  * (lakehouse.rs:57-79). Opt in when a table is shared with a reference
  * reader/writer and its layout may carry overlapping delta windows, so
  * both engines surface identical rows in both directions. With
  * TOMBSTONES (this engine's extension — never on reference-shared
  * tables) strict mode is precedence-consistent: the tombstone delta's
  * later window start outranks every earlier file, so the delete
  * suppresses its keys outright, even past newer data rows
  * (TombstoneSpec pins the divergence from default mode).
  *
  * Spark plan shape: up to `spark.azof.precedenceJoinThreshold` (64)
  * pruned files, a union of per-file scans each stamped with a LITERAL
  * merge precedence — constant-folded, no per-row file-name work, and
  * one scan partition per file so many-small-file layouts (streaming
  * mirrors) decode in parallel; above the threshold (a delta-heavy
  * table can resolve to thousands of files, where a union would bloat
  * the plan) ONE parquet scan over the whole pruned list with the
  * precedence recovered per row by a broadcast join on the file's
  * basename over `input_file_name()`. Then one hash shuffle on `key`
  * for the window dedup, then projection. Filters/projections above
  * compose in Catalyst and push into every scan node.
  */
object AzofScan {
  private val Prec = "_azof_prec"
  private val PrecFile = "_azof_file"
  private val Rn = "_azof_rn"

  /** Above this pruned-file count the precedence lookup switches from an
    * inline literal map to a broadcast join (override with
    * `spark.azof.precedenceJoinThreshold`).
    */
  private def precJoinThreshold(spark: SparkSession): Int =
    spark.conf.getOption("spark.azof.precedenceJoinThreshold")
      .map(_.toInt).getOrElse(64)

  def scan(
      spark: SparkSession,
      lakehousePath: String,
      table: String,
      asOf: AsOf = AsOf.Current,
      projection: Option[Set[String]] = None,
      keyFilter: Option[KeyFilter] = None): DataFrame = {
    val t = AzofTable(spark, lakehousePath, table)
    val snapshot = t.currentSnapshot
    scanSnapshot(spark, t, snapshot, asOf, projection, keyFilter)
  }

  /** The pruned-file list a scan with `keyFilter` actually reads: the
    * segment tree's time pruning, then key-range data skipping against
    * each file's stats (files without stats are conservatively kept).
    * Pure — specs and operators can assert skipping without running the
    * scan.
    */
  def prunedFiles(
      snapshot: Snapshot,
      asOf: AsOf,
      keyFilter: Option[KeyFilter] = None): Seq[String] =
    prunedEntries(snapshot, asOf, keyFilter).map(_.file)

  /** [[prunedFiles]] with each file's stats and tombstone flag — the
    * scan's actual input (the flag decides whether the `_azof_deleted`
    * marker column joins the read schema).
    */
  def prunedEntries(
      snapshot: Snapshot,
      asOf: AsOf,
      keyFilter: Option[KeyFilter] = None,
      strictOrder: Boolean = false): Seq[FileEntry] =
    snapshot.dataFilesWithStats(asOf, strictOrder)
      .filter(e => keyFilter.forall(kf => e.stats.forall(kf.mayMatch)))

  /** Default-mode per-file ORDER VALUE for the dedup window's tie-break
    * slot: the file's rank under `(commit seq desc, precedence asc)` —
    * both per-file constants, so the lexicographic pair collapses into
    * ONE precomputed int and the window ordering stays a single column.
    * Seq-less files (base files, pre-seq/foreign commits) rank as the
    * OLDEST commit (−1), falling back to pure precedence among
    * themselves — exactly the pre-seq behavior. Strict mode bypasses
    * this entirely (pure precedence position, reference parity).
    */
  def effectiveRanks(entries: Seq[FileEntry]): Seq[Int] = {
    val order = entries.indices
      .sortBy(i => (-entries(i).seq.getOrElse(-1L), i))
    val ranks = new Array[Int](entries.size)
    order.zipWithIndex.foreach { case (fileIdx, rank) => ranks(fileIdx) = rank }
    ranks.toSeq
  }

  /** Residual column predicate for a [[KeyFilter]] — ALWAYS applied by
    * the scan (before the dedup window, where it is equivalent to
    * applying it after: key predicates drop whole key groups), so scan
    * results are exact even when stats are missing or conservative.
    */
  private def keyFilterColumn(kf: KeyFilter): org.apache.spark.sql.Column = {
    val k = col(TableSchema.KeyName)
    kf match {
      case KeyFilter.Keys(ks) => k.isin(ks.toSeq: _*)
      case KeyFilter.Range(lo, up) =>
        (lo.map(v => k >= lit(v)).toSeq ++ up.map(v => k <= lit(v)).toSeq)
          .reduceOption(_ && _).getOrElse(lit(true))
      case KeyFilter.AllOf(fs) =>
        fs.map(keyFilterColumn).reduceOption(_ && _).getOrElse(lit(true))
    }
  }

  /** Scan a specific (already-loaded) snapshot — used by time travel over
    * explicit snapshot ids as well as the current view.
    */
  def scanSnapshot(
      spark: SparkSession,
      table: AzofTable,
      snapshot: Snapshot,
      asOf: AsOf,
      projection: Option[Set[String]] = None,
      keyFilter: Option[KeyFilter] = None,
      valueFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil)
      : DataFrame = {
    val schema = snapshot.schema
    val outCols = schema
      .projectedStruct(projection)
      .fields.map(f => col(f.name)).toSeq

    // compatibility mode resolved up front: it changes the equal-start
    // delta order inside the pruned list (strict = the reference's
    // stable first-registered-first) AND the dedup ordering below
    val strict = spark.conf.getOption("spark.azof.strictPrecedence")
      .exists(_.trim.equalsIgnoreCase("true"))
    // time pruning (segment tree), key-range data skipping (per-file
    // stats), then the dedup-SOUND value-range skip (match + key-range
    // closure, see [[graft.format.ValueStats]]); a key point-lookup on
    // a key-partitioned layout reads one file instead of every
    // time-pruned file, and a value predicate on the same layout reads
    // only the slices that can satisfy it
    val entries = graft.format.ValueStats.prune(schema,
      prunedEntries(snapshot, asOf, keyFilter, strict), valueFilters)
    val files = entries.map(_.file)
    if (files.isEmpty) {
      // As-of before every segment, Current on a fully-closed table
      // (reference: metadata.rs:359-389 tests), or every file skipped by
      // key stats — empty result, real schema.
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema.projectedStruct(projection))
    }
    // tables with delete commits in range read the row-level tombstone
    // marker too (absent in plain data files -> null -> not deleted);
    // tombstone-free tables pay nothing
    val hasTombstones = entries.exists(_.tombstone)
    // files store PHYSICAL column names (immutable across renames);
    // the logical projection happens right after the read
    val readSchema =
      if (hasTombstones)
        schema.physicalStruct.add(TableSchema.DeletedName, "boolean")
      else schema.physicalStruct

    // Basenames are unique within a flat table directory, so the file →
    // precedence map keys on them; input_file_name() yields the full URI.
    // Snapshots MAY name files in subdirectories with colliding basenames,
    // or with characters that URI-encoding rewrites (input_file_name
    // would then disagree with the raw name and the lookup would return
    // null — silently the HIGHEST precedence under nulls-first) — in
    // either case fall back to per-file reads (plan size grows with the
    // file count, acceptable for these rare layouts).
    val paths = files.map(f =>
      new org.apache.hadoop.fs.Path(table.tableDir, f).toString)
    val basenames = files.map(f => new org.apache.hadoop.fs.Path(f).getName)
    // the per-file order value the dedup window ties on: in default
    // mode the (seq desc, precedence asc) effective rank — later
    // commits win exact event-time ties globally, not just within a
    // window start (a multi-key DML file's start is the min over its
    // rows, so start-derived position alone would let an untouched
    // delta with a newer start outrank the DML rewrite); strict mode
    // keeps the raw precedence position for reference parity
    val precVals = if (strict) entries.indices else effectiveRanks(entries)
    def uriSafe(n: String): Boolean =
      new java.net.URI(null, null, n, null).getRawPath == n
    // Few files: per-file scans unioned, each stamped with a LITERAL
    // precedence. Two measured wins over the previous single-scan +
    // element_at(literal map, regexp_extract(input_file_name())) shape
    // (r18, guide §2.5/§4): (1) no per-row regexp + linear map probe —
    // the precedence is a constant column per scan; (2) the union
    // contributes one partition PER FILE, so a delta-heavy small table
    // (the mirror/streaming shape: dozens of micro-batch files that
    // pack into one split byte-wise) decodes in parallel instead of
    // serially in one task (q38 scan stage: 1 task, 100k rows, ~600 ms
    // run — the whole query's cost). At 100 TB each per-file scan still
    // splits internally by row group, and the file count is capped by
    // the same threshold that bounds plan size. Kill switch for the
    // A/B probe: spark.azof.scan.perFileUnion=false.
    val perFileUnion = files.size <= precJoinThreshold(spark) &&
      spark.conf.get("spark.azof.scan.perFileUnion", "true").toBoolean
    val unioned = if (perFileUnion) {
      paths.zip(precVals)
        .map { case (p, i) =>
          spark.read.schema(readSchema).parquet(p).withColumn(Prec, lit(i))
        }
        .reduce(_ unionAll _)
    } else if (basenames.distinct.size == basenames.size &&
        basenames.forall(uriSafe)) {
      val single = spark.read.schema(readSchema).parquet(paths: _*)
      val baseName = regexp_extract(input_file_name(), "[^/]+$", 0)
      if (files.size <= precJoinThreshold(spark)) {
        // kill-switch arm (r17 shape): single scan, inline literal map
        val precEntries = basenames.zip(precVals).flatMap { case (n, i) =>
          Seq(lit(n), lit(i))
        }
        single.withColumn(Prec, element_at(map(precEntries: _*), baseName))
      } else {
        // Delta-heavy tables (thousands of pruned files): a per-file
        // union or a literal map would bloat the plan/codegen linearly
        // with the file count. A broadcast hash join against the tiny
        // (basename → precedence) table keeps the SINGLE scan node and
        // O(1) expression size; every row's file is in the map, so the
        // inner join drops nothing.
        val precDf = broadcast(
          spark.createDataFrame(basenames.zip(precVals).toSeq)
            .toDF(PrecFile, Prec))
        single.withColumn(PrecFile, baseName)
          .join(precDf, PrecFile)
          .drop(PrecFile)
      }
    } else {
      paths.zip(precVals)
        .map { case (p, i) =>
          spark.read.schema(readSchema).parquet(p).withColumn(Prec, lit(i))
        }
        .reduce(_ unionAll _)
    }

    // physical → logical: renamed columns surface under their logical
    // names from here on (a no-op select when nothing was renamed);
    val logical = schema.toLogicalNames(unioned)

    val timed = asOf match {
      case AsOf.Current => logical
      case AsOf.EventTime(ts) =>
        logical.where(col(TableSchema.EventTimeName) <=
          lit(java.sql.Timestamp.from(ts)))
    }
    // residual key predicate: exactness never depends on the stats (a
    // stats-less file passes pruning but its non-matching keys drop
    // here), and pre-dedup placement is sound for key predicates only —
    // they remove whole window groups
    val inRange = keyFilter.map(kf => timed.where(keyFilterColumn(kf)))
      .getOrElse(timed)

    // Final tiebreak: xxhash64 of the full row content makes the pick
    // among COMPLETE duplicates of (key, event_time, precedence) — i.e.
    // duplicate keyed rows within one file — deterministic across runs,
    // partitionings, and task retries (row_number alone would pick
    // whichever row the shuffle happened to deliver first). Identical
    // rows still tie, but then every choice is the same row.
    val allCols = schema.allColumnNames.map(col)
    // default: newest event_time wins, the (seq desc, precedence asc)
    // effective rank breaks exact ties — later commit wins globally;
    // strict mode (see the divergence note above): precedence wins
    // outright, matching the reference's first-seen-wins row loop on
    // overlapping delta windows
    // In a MIXED data+tombstone file (the mirror/AzofSink shape) a
    // tombstone and a data row can share (key, event_time, precedence);
    // the content hash must not decide that tie or the key would
    // nondeterministically survive or vanish. Deleted-first ahead of
    // the hash keeps tombstone-wins-exact-tie deterministic regardless
    // of which file carried the marker.
    val deletedFirst =
      if (hasTombstones)
        Seq(coalesce(col(TableSchema.DeletedName), lit(false)).desc)
      else Seq.empty
    val ordering =
      (if (strict) Seq(col(Prec).asc, col(TableSchema.EventTimeName).desc)
       else Seq(col(TableSchema.EventTimeName).desc, col(Prec).asc)) ++
        deletedFirst :+ xxhash64(allCols: _*).asc
    val w = Window
      .partitionBy(TableSchema.KeyName)
      .orderBy(ordering: _*)

    val winners = inRange
      .withColumn(Rn, row_number().over(w))
      .where(col(Rn) === 1)
    // tombstone suppression AFTER crowning the per-key winner: a delete
    // is an event at its event_time — it beats every row at-or-before it
    // (precedence breaks the exact tie in the tombstone's favor: the
    // tombstone delta's later window start outranks earlier deltas) and
    // LOSES to newer rows, so history before the tombstone still
    // time-travels and a later upsert resurrects the key naturally
    val alive =
      if (hasTombstones)
        winners.where(!coalesce(col(TableSchema.DeletedName), lit(false)))
      else winners
    alive.select(outCols: _*)
  }

  /** Register an as-of view so full Spark SQL composes on top — the
    * Catalyst counterpart of the reference's DataFusion table registration
    * (reference: crates/azof-datafusion/src/context.rs:26-47).
    */
  def registerView(
      spark: SparkSession,
      lakehousePath: String,
      table: String,
      viewName: String,
      asOf: AsOf = AsOf.Current): Unit =
    scan(spark, lakehousePath, table, asOf).createOrReplaceTempView(viewName)
}
