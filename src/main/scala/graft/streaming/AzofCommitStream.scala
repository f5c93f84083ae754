package graft.streaming

import graft.format.AzofTable
import graft.sources.AzofChangeFeed
import org.apache.spark.sql.{DataFrame, SparkSession, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** `spark.readStream.format("azof-commits")` — the COMMIT-EXACT
  * Structured Streaming source over the change feed, finishing the
  * reference's "Streaming in scan" roadmap item (reference:
  * README.md:158-159) with Spark-native exactly-once semantics:
  *
  *   - '''Offsets are snapshot versions.''' Each micro-batch covers the
  *     half-open version range `(lastCommitted, current]`; Spark's
  *     checkpoint WAL persists the version watermark, so a restarted
  *     query resumes at exactly the commit boundary it left — the
  *     change feed is a pure function of the version range, so replayed
  *     ranges reconstruct bit-identical batches.
  *   - '''Orphan-free by construction.''' The file-tailing stream
  *     ([[AzofStream.appends]]) surfaces data files as they LAND, so a
  *     crashed writer's orphan (file written, snapshot commit never
  *     finalized) enters downstream state and is never retracted. This
  *     source reads only files a COMMITTED snapshot references —
  *     orphans are invisible, compaction rewrites are skipped via the
  *     snapshot `op` marker, and every row carries `_commit_version`.
  *   - '''Plan shape.''' `getBatch` returns the change feed's single
  *     parquet scan over the range's new files (one scan node
  *     regardless of commit count), re-tagged as a streaming frame —
  *     the same declarative-plan-over-connector-API choice as the batch
  *     [[graft.sources.AzofDataSource]]: a DSv2 `MicroBatchStream`
  *     would need the parquet read re-implemented row-at-a-time inside
  *     a `PartitionReader`, a second slower copy of the scan.
  *
  * Options: `path` (lakehouse dir, or table dir when `table` is
  * absent), `table`, `startVersion` (first batch covers
  * `(startVersion, current]`; default 1 = everything after table
  * creation; the sentinel `earliest` auto-seeds from the retained
  * snapshot floor — [[AzofChangeFeed.earliestFeedBase]] — so a fresh
  * consumer of a VACUUMED table needs no manual probe; any other
  * non-numeric value resolves as a NAMED version ref / tag through
  * the current snapshot, like the batch reader's `changesFrom`),
  * `maxVersionsPerBatch` (bound how many commits one
  * micro-batch spans — long catch-ups proceed in bounded checkpointed
  * steps; default unbounded), `branch` (tail a STAGED lineage's
  * commits instead of main's — the audit pipeline that follows a
  * staging branch live before publish; offsets are the branch's
  * landing snapshot ids, folds/maintenance ops deliver nothing, and
  * the schema pins from the branch head). The schema is otherwise
  * pinned at stream start from the current snapshot (same rule as
  * [[AzofStream]] after schema evolution).
  *
  * A consumer lagging past vacuum retention fails loudly at planning
  * with the retained floor (the Kafka earliest-offset analogue), never
  * with a bare missing-file read.
  *
  * {{{
  * spark.readStream.format("azof-commits")
  *   .option("table", "events_kv").load("/lake")
  *   .writeStream.option("checkpointLocation", ck)
  *   .foreachBatch(...)   // or any sink; AzofSink gives end-to-end
  *   .start()             // exactly-once table-to-table
  * }}}
  */
class AzofCommitStreamProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "azof-commits"

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (lake, table, startVersion, _) =
      AzofCommitStreamProvider.resolve(parameters)
    // a tag-shaped startVersion is validated HERE, at load time, where
    // a session exists — an unknown name must fail before the stream
    // starts, exactly like a malformed number does
    if (startVersion == AzofCommitStreamProvider.Tagged) {
      graft.format.AzofTable(sqlContext.sparkSession, lake, table)
        .resolveVersion(parameters("startVersion").trim)
      ()
    }
    (shortName(),
      AzofCommitStreamProvider.feedSchema(sqlContext.sparkSession, lake,
        table, parameters.get("branch").map(_.trim)))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val (lake, table, startVersion, maxVersions) =
      AzofCommitStreamProvider.resolve(parameters)
    val start =
      if (startVersion == AzofCommitStreamProvider.Earliest)
        AzofChangeFeed.earliestFeedBase(sqlContext.sparkSession, lake, table)
      else if (startVersion == AzofCommitStreamProvider.Tagged)
        // named version ref: resolve through the current snapshot's
        // ref index, like the batch reader's changesFrom bound
        graft.format.AzofTable(sqlContext.sparkSession, lake, table)
          .resolveVersion(parameters("startVersion").trim).toLong
      else startVersion
    new AzofCommitSource(
      sqlContext.sparkSession, lake, table, start, maxVersions,
      branch = parameters.get("branch").map(_.trim).filter(_.nonEmpty))
  }
}

object AzofCommitStreamProvider {

  /** Same path/table resolution as the batch reader
    * ([[graft.sources.AzofDataSource]]): `path` is the lakehouse dir
    * with an explicit `table` option, or the table dir itself.
    */
  private[streaming] def resolve(
      parameters: Map[String, String]): (String, String, Long, Long) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "azof-commits stream needs a path: spark.readStream" +
          ".format(\"azof-commits\").load(<tableDir>) or " +
          ".option(\"table\", <name>).load(<lakehouseDir>)"))
    val (lake, table) = parameters.get("table") match {
      case Some(t) => (path, t)
      case None =>
        val p = new org.apache.hadoop.fs.Path(path)
        val parent = Option(p.getParent).getOrElse(
          throw new IllegalArgumentException(
            s"cannot split '$path' into lakehouse dir + table name; " +
              "pass .option(\"table\", <name>) explicitly"))
        (parent.toString, p.getName)
    }
    def longOpt(name: String, default: Long, min: Long): Long =
      parameters.get(name)
        .map(s => s.trim.toLongOption.filter(_ >= min).getOrElse(
          throw new IllegalArgumentException(
            s"azof-commits option '$name' must be a number >= $min, " +
              s"got '$s'")))
        .getOrElse(default)
    // startVersion floor is 1 (the data-less create snapshot): the feed
    // walk parses s{startVersion}.json as its base, and 0 names a
    // document that never exists. The `earliest` sentinel (Kafka's
    // earliest-offset analogue) resolves to the retained snapshot floor
    // at source creation — a fresh mirror of a VACUUMED table needs no
    // manual earliestFeedBase probe.
    // Non-numeric, non-earliest values resolve as NAMED version refs
    // (tags) — the same rule as the batch reader's changesFrom — via
    // the Tagged sentinel, because this static resolver has no session.
    val start = parameters.get("startVersion").map(_.trim) match {
      case Some(s) if s.equalsIgnoreCase("earliest") => Earliest
      case Some(s) if s.nonEmpty && !s.forall(_.isDigit) &&
        s.toLongOption.isEmpty => Tagged
      case _ => longOpt("startVersion", 1L, 1L)
    }
    (lake, table, start, longOpt("maxVersionsPerBatch", Long.MaxValue, 1L))
  }

  /** Marker for `startVersion=earliest`, resolved against the table's
    * retained snapshot floor when the source is created (never a legal
    * version: real offsets are >= 1).
    */
  private[streaming] val Earliest: Long = -1L

  /** Marker for a named-ref `startVersion` (resolved against the
    * table's current snapshot when the source is created, where a
    * session exists — this static resolver has none).
    */
  private[streaming] val Tagged: Long = -2L

  private[streaming] def feedSchema(
      spark: SparkSession, lake: String, table: String,
      branch: Option[String] = None): StructType = {
    val t = AzofTable(spark, lake, table)
    // a branch stream's schema is the BRANCH HEAD's (a branch forked
    // before a main evolution keeps its narrower fork schema)
    val snap = branch.filter(_.nonEmpty) match {
      case Some(b) => t.snapshot(t.branchHead(b).getOrElse(
        throw new IllegalArgumentException(
          s"no such branch '$b' on $table" +
            (if (t.listBranches.isEmpty) ""
             else s"; known branches: ${t.listBranches.sorted.mkString(", ")}")))
        .toString)
      case None => t.currentSnapshot
    }
    snap.schema.toStruct
      .add("_commit_version", "long")
      .add("_deleted", "boolean", nullable = false)
  }
}

/** One streaming query's version cursor over a table — see
  * [[AzofCommitStreamProvider]] for semantics.
  *
  * Implements [[SupportsTriggerAvailableNow]] natively: at
  * `Trigger.AvailableNow` start the current snapshot version is
  * captured as the run's fixed point, so the query drains exactly the
  * commits that existed at start and stops — commits landing mid-run
  * wait for the next invocation (the contract the engine otherwise
  * approximates with a fallback warning for plain V1 sources).
  */
class AzofCommitSource(
    spark: SparkSession,
    lakehousePath: String,
    table: String,
    startVersion: Long,
    maxVersionsPerBatch: Long = Long.MaxValue,
    branch: Option[String] = None)
  extends Source
  with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{Offset => ConnOffset, ReadLimit}

  private val t = AzofTable(spark, lakehousePath, table)

  /** The lineage's high watermark: main's version pointer, or the
    * branch head — a `branch` stream tails a STAGED lineage (the audit
    * pipeline following a staging branch live, before publish; commit-
    * exact, folds/maintenance ops skipped like main compaction). A
    * dropped branch fails the next planning cycle loudly.
    */
  private def lineageVersion(): Long = branch match {
    case None => t.currentVersion.toLong
    case Some(b) => t.branchHead(b).getOrElse(
      throw new IllegalStateException(
        s"branch '$b' on $table disappeared mid-stream " +
          "(concurrent drop_branch?) — the staged lineage this stream " +
          "tails no longer resolves"))
  }

  /** Schema pin: version and BASE schema (without the feed's meta
    * columns) captured together at source creation. A source commit
    * that changes the table schema mid-stream fails [[getBatch]]
    * LOUDLY (see there) instead of letting the range's files read
    * under a stale struct and silently drop the new column.
    */
  private val pinnedVersion: Long = lineageVersion()
  private val pinnedStruct: StructType =
    t.snapshot(pinnedVersion.toString).schema.toStruct

  @volatile private var availableNowCap: Option[Long] = None

  /** Planning cycles a behind-the-checkpoint pointer read is tolerated
    * before the stale-checkpoint error (see [[latestOffset]]).
    */
  private val StaleGrace = 2
  @volatile private var staleStrikes = 0

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(lineageVersion())

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control face of [[getOffset]]: versions carry no useful
    * row-count granularity (a commit is the atomic delivery unit), so
    * engine `ReadLimit`s map to all-available-up-to-cap — the
    * source-level bound is `maxVersionsPerBatch`, which clips how many
    * COMMITS one micro-batch may span: a consumer resuming after a
    * long gap catches up in bounded, checkpointed steps instead of one
    * giant batch (the Kafka `maxOffsetsPerTrigger` analogue at commit
    * granularity). AvailableNow still drains to the fixed point — in
    * several batches.
    */
  override def latestOffset(start: ConnOffset, limit: ReadLimit): ConnOffset = {
    val cur0 = lineageVersion()
    val base = math.max(Option(start).map(asAnyVersion)
      .getOrElse(startVersion), startVersion)
    // a committed offset AHEAD of the table is never a caught-up
    // consumer — it is a stale checkpoint from a deleted-and-recreated
    // table; waiting silently forever would skip every version up to
    // the stale offset once the table catches up (followOnce's
    // contract, applied here). But commitMeta's pointer is allowed a
    // bounded TRANSIENT regression (a slow winner's version.txt write
    // landing after a faster retrier already moved it forward), during
    // which an immediate re-read can legitimately observe the regressed
    // value twice — so under a CONTINUOUS trigger the first few
    // observations plan a NO-PROGRESS batch (return null; the next
    // cycle re-reads a healed pointer) and only a PERSISTENT regression
    // kills the query. An AvailableNow run gets NO grace: it is
    // one-shot, so "no progress" would be a silent successful
    // completion — for a genuinely stale checkpoint exactly the silent
    // skip this guard exists to prevent; the operator retries a
    // spuriously-failed sync, but nobody retries a sync that "worked".
    // No sleep ever runs on this micro-batch planning thread.
    if (base > cur0 && base > lineageVersion()) {
      val oneShot = availableNowCap.isDefined
      staleStrikes += 1
      if (!oneShot && staleStrikes <= StaleGrace) return null
      throw new IllegalStateException(
        s"checkpoint offset $base is ahead of $table's current " +
          s"version $cur0 (observed $staleStrikes time(s)): stale " +
          "checkpoint (table recreated?) — start a fresh checkpoint " +
          "with an in-range startVersion")
    }
    staleStrikes = 0
    val cur = availableNowCap.fold(cur0)(math.min(cur0, _))
    val capped =
      if (cur - base > maxVersionsPerBatch) base + maxVersionsPerBatch
      else cur
    if (capped <= base) null else LongOffset(capped)
  }

  override def reportLatestOffset(): ConnOffset =
    LongOffset(lineageVersion())

  override val schema: StructType = pinnedStruct
    .add("_commit_version", "long")
    .add("_deleted", "boolean", nullable = false)

  /** Latest available offset = the table's current snapshot version
    * (None until it moves past the stream's base — nothing to deliver).
    */
  override def getOffset: Option[V1Offset] = {
    val cur = lineageVersion()
    if (cur <= startVersion) None else Some(LongOffset(cur))
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val from = start.map(asVersion).getOrElse(startVersion)
    val to = asVersion(end)
    // Schema-evolution guard: the stream's schema is pinned at start.
    // A range ending past a schema-changing commit (end schema WIDER
    // than the pin — the mid-stream evolution case) must fail LOUDLY:
    // silently reading the range's files under the pinned struct would
    // drop the added column from every downstream consumer. The
    // restart runbook is complete: on restart the source re-pins the
    // CURRENT schema and the checkpoint resumes at the same version
    // boundary — pre-evolution files read with nulls in the
    // later-added (always-nullable) columns, and AzofMirror widens its
    // target table at start (see AzofMirror.replicate).
    //
    // The OTHER direction — pin WIDER than the range's end schema —
    // is the restart itself (a WAL-recovered batch whose end version
    // predates the latest evolution, e.g. a SECOND add-column landed
    // before the operator restarted): throwing there would wedge the
    // checkpoint permanently, so the range widens to the pin instead,
    // added columns reading null — exactly the promised restart
    // semantics. Columns only ever APPEND (addColumn), so "pin extends
    // end schema" is the compatible shape — and ONLY for ranges ending
    // at-or-before the pinned version: a recovered WAL batch always
    // ends at a version the pin already saw, while a NARROWER schema
    // at a version PAST the pin is impossible in-format (no column
    // drop exists) and therefore a deleted-and-recreated source —
    // loud, never silently null-padded.
    //
    // An unreadable end snapshot is NOT this guard's case — fall
    // through to the established loud paths (stale checkpoint in
    // latestOffset, vacuumed-range retention error below).
    // The end schema resolves through the stream's OWN lineage at `to`:
    // offsets live in the SHARED id space, so a capped offset can name
    // the OTHER lineage's document — a main stream's cap landing on a
    // branch doc (possibly narrower fork-era schema) or a branch
    // stream's cap landing on a main doc (possibly wider post-fork main
    // evolution). Reading the foreign lineage's schema there would
    // throw the mid-stream-evolution error on every restart, wedging a
    // checkpoint whose own lineage never changed — so each side rebases
    // to ITS lineage's greatest document <= `to`, exactly as the feed
    // itself diffs. Branch lineages can additively evolve, so the
    // branch side gets the same real guard as main (loud mid-stream,
    // widen-on-replay).
    val endStruct =
      try (branch match {
        case Some(b) =>
          AzofChangeFeed.branchAtOrBefore(t, b, to).schema.toStruct
        case None =>
          AzofChangeFeed.mainAtOrBefore(spark, t, to)._2.schema.toStruct
      })
      catch { case _: java.io.FileNotFoundException => pinnedStruct }
    val pinExtendsEnd = to <= pinnedVersion &&
      endStruct.fields.length <= pinnedStruct.fields.length &&
      pinnedStruct.fields.take(endStruct.fields.length).sameElements(endStruct.fields)
    if (endStruct != pinnedStruct && !pinExtendsEnd)
      throw new IllegalStateException(
        s"$table's schema changed while this stream was running: " +
          s"pinned ${pinnedStruct.map(_.name).mkString("[", ",", "]")} " +
          s"at version $pinnedVersion, but version $to has " +
          s"${endStruct.map(_.name).mkString("[", ",", "]")}. " +
          "Restart the streaming query: the source re-pins the current " +
          "schema at start and resumes from the checkpointed version " +
          "boundary (rows from pre-evolution commits read with nulls " +
          "in added columns); AzofMirror.replicate additionally widens " +
          "its target table's schema at start.")
    val feed =
      try branch match {
        case Some(b) => AzofChangeFeed.branchBetween(
          spark, lakehousePath, table, b, from, to)
        case None =>
          AzofChangeFeed.between(spark, lakehousePath, table, from, to)
      }
      catch {
        case e: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"azof-commits stream at version $from lags past snapshot " +
              s"retention for $table (current $to): a snapshot in range " +
              "was vacuumed. Re-seed from a full scan, then restart with " +
              "a fresh checkpoint and startVersion = " +
              s"${scala.util.Try(AzofChangeFeed.earliestFeedBase(
                spark, lakehousePath, table)).getOrElse("?")}.", e)
      }
    val widened =
      if (endStruct == pinnedStruct) feed
      else {
        import org.apache.spark.sql.functions.{col, lit}
        // the WAL-replay widening case: append the pin's extra columns
        // as typed nulls and order to the stream schema
        val extra = pinnedStruct.fields.drop(endStruct.fields.length)
        extra.foldLeft(feed)((df, f) =>
            df.withColumn(f.name, lit(null).cast(f.dataType)))
          .select(schema.fieldNames.map(col).toSeq: _*)
      }
    org.apache.spark.sql.graft.StreamingBridge.asStreaming(widened)
  }

  override def stop(): Unit = ()

  override def toString: String =
    s"AzofCommitSource[$lakehousePath/$table" +
      branch.fold("")(b => s".branch_$b") + s", start=$startVersion]"

  /** Offsets come back from the checkpoint WAL as [[SerializedOffset]]
    * (raw JSON), live from [[getOffset]]/[[latestOffset]] as
    * [[LongOffset]].
    */
  private def asVersion(o: V1Offset): Long = o match {
    case l: LongOffset       => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => throw new IllegalStateException(
      s"unexpected offset type ${other.getClass.getName}: ${other.json}")
  }

  /** The admission-control API hands back whatever Offset subtype the
    * WAL deserialized — a LongOffset's json IS the bare version number,
    * so the json round-trip covers every case.
    */
  private def asAnyVersion(o: ConnOffset): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLongOption.getOrElse(
      throw new IllegalStateException(
        s"unexpected offset json from ${other.getClass.getName}: ${other.json}"))
  }
}
