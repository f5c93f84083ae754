package graft.sources

import graft.format.{AsOf, AzofTable, FileStats, TableSchema}
import graft.util.SerializableHadoopConf
import java.time.Instant
import java.util.UUID
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL `UPDATE` / `MERGE INTO` / row-level `DELETE` for azof tables —
  * Spark's native DSv2 row-level machinery (`SupportsRowLevelOperations`
  * + `SupportsDelta`) mapped onto azof's merge-on-read model, where a
  * row-level operation never rewrites a data file:
  *
  *   - UPDATE / MERGE-update / MERGE-insert rows land as ordinary delta
  *     rows — the per-key event-time merge (strict precedence: equal
  *     event_time resolves to the later commit, [[graft.operators.AzofScan]])
  *     makes them the key's new winner while every pre-DML version keeps
  *     time-traveling;
  *   - MERGE-delete / DELETE rows land as tombstones
  *     (`_azof_deleted = true`, values NULL, event_time = operation
  *     time), the same rows [[AzofWriter.commitDelete]] writes.
  *
  * Delta-based (not group-based copy-on-write) is the load-bearing
  * choice: Spark hands the writer ONLY changed rows, so a MERGE touching
  * 0.1% of a 100-TB table writes 0.1% of it — the scan of the target is
  * one ordinary pruned azof scan (the operation's `newScanBuilder` is
  * the table's own builder, so stats skipping and column pruning apply),
  * and the join/condition evaluation is whatever plan Catalyst picks.
  *
  * Write path: every task streams its delta rows straight into its own
  * uniquely-named parquet file in the table directory (no driver
  * collect, no shuffle beyond the MERGE plan's own), tracking key range
  * and event-time window as it writes; the driver then registers all
  * landed files in ONE optimistic-retry snapshot commit
  * ([[AzofWriter.commitLandedDeltas]]) — the same
  * files-then-metadata atomicity as every other commit, so a crashed
  * MERGE leaves only unreferenced bytes for vacuum. Files carrying any
  * tombstone row are flagged `tombstone: true` in the snapshot (the
  * mixed data+tombstone delta shape the streaming mirror established).
  *
  * Unlike [[AzofWriter.writeDataFile]] the task writer does not sort
  * rows event_time-descending (it streams); the engine's own scan is
  * order-independent, and DML commits are beyond-reference surface.
  */
final class AzofRowLevelOperation(
    lakehousePath: String, tableName: String,
    cmd: RowLevelOperation.Command,
    branch: Option[String] = None) extends RowLevelOperation
  with SupportsDelta {

  override def command(): RowLevelOperation.Command = cmd

  /** The statement's READ VERSION, resolved once per operation: both the
    * target scan and the commit-time conflict validation use it, so the
    * validation window is exactly "what landed after the rows this
    * statement actually read" — snapshot isolation with write-conflict
    * detection, not just optimistic metadata retry.
    *
    * On a BRANCH view the read version is the branch HEAD (which may be
    * the fork itself — a main document — for a branch with no commits
    * yet): the statement reads the branch's state, its deltas land on
    * the branch lineage, and conflict validation is scoped to commits
    * of that same lineage — main advancing past the fork never
    * conflicts a branch statement, exactly as branch commits never
    * conflict a main one.
    */
  private lazy val readVersion: Long = {
    val t = AzofTable(SparkSession.active, lakehousePath, tableName)
    branch match {
      case Some(b) => t.branchHead(b).getOrElse(
        throw new IllegalArgumentException(
          s"branch '$b' of $tableName disappeared between load and " +
            "planning (concurrent drop_branch?) — re-run the statement"))
      case None => t.currentVersion.toLong
    }
  }

  /** The target's own scan builder — pinned to [[readVersion]] so the
    * statement reads one consistent snapshot; pruning and data skipping
    * apply exactly like any other read of the table.
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AzofScanBuilder(new AzofRelation(
      SparkSession.active.sqlContext, lakehousePath, tableName,
      AsOf.Current, Some(readVersion.toString)))

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new AzofDeltaWriteBuilder(lakehousePath, tableName, info, readVersion,
      branch)

  /** Row identity = the azof key (merge-on-read resolves versions). */
  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(TableSchema.KeyName))

  /** An update is ONE new row for the key, not delete+insert: a
    * tombstone at the same event_time as the replacement row would race
    * it in the per-key merge.
    */
  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def description(): String =
    s"azof row-level ${cmd.toString.toLowerCase} on $tableName"
}

private final class AzofDeltaWriteBuilder(
    lakehousePath: String, tableName: String, info: LogicalWriteInfo,
    readVersion: Long, branch: Option[String])
  extends DeltaWriteBuilder {
  override def build(): DeltaWrite =
    new AzofDeltaWrite(lakehousePath, tableName, info.schema(), readVersion,
      branch)
}

private final class AzofDeltaWrite(
    lakehousePath: String, tableName: String, rowSchema: StructType,
    readVersion: Long, branch: Option[String])
  extends DeltaWrite {

  override def toBatch: DeltaBatchWrite = {
    val spark = SparkSession.active
    val table = AzofTable(spark, lakehousePath, tableName)
    // the file schema follows the TARGET LINEAGE's head (branch schema
    // evolution is per-lineage, same rule as commitDelta's branch path)
    val headSnap = branch.flatMap(b => table.branchHead(b))
      .map(h => table.snapshot(h.toString))
      .getOrElse(table.currentSnapshot)
    val (fileSchema, logicalNames) =
      AzofDeltaFiles.aligned(headSnap.schema)
    // provisional version in the name is a debug hint, same as
    // landCommitFile — uniqueness comes from the uuid + task ids
    val prefix = s"delta_s${table.currentVersion.toLong + 1}_" +
      UUID.randomUUID().toString.take(8)
    new AzofDeltaBatchWrite(
      lakehousePath, tableName, table.tableDir.toString, prefix,
      rowSchema, fileSchema, logicalNames,
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()),
      readVersion, branch)
  }
}

/** Commit message: one task's landed file with its self-measured stats
  * (key range for snapshot data skipping, event-time window for the
  * registered [[graft.format.Delta]], tombstone presence for the
  * read-schema flag). `file == null` marks a rowless task — nothing
  * landed, nothing to register.
  */
private[sources] final case class AzofDeltaFileMessage(
    file: String, rows: Long,
    minKey: String, maxKey: String,
    minTsUs: Long, maxTsUs: Long,
    hasTombstone: Boolean,
    colRanges: Map[String, (String, String)] = Map.empty)
  extends WriterCommitMessage

private final class AzofDeltaBatchWrite(
    lakehousePath: String, tableName: String, tableDir: String,
    filePrefix: String, rowSchema: StructType, fileSchema: StructType,
    logicalNames: Array[String],
    conf: SerializableHadoopConf, readVersion: Long,
    branch: Option[String] = None) extends DeltaBatchWrite {

  // operation time, fixed once on the driver: every tombstone row of
  // this DML statement carries the same event_time, like deleteWhere
  private val opTimeUs =
    java.time.Instant.now().toEpochMilli * 1000L

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DeltaWriterFactory =
    new AzofDeltaWriterFactory(
      tableDir, filePrefix, rowSchema, fileSchema, logicalNames,
      opTimeUs, conf)

  /** Register every landed file in one snapshot commit; a DML that
    * changed no rows commits NO version (SQL no-op semantics, matching
    * the predicate-delete path).
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case m: AzofDeltaFileMessage if m.file != null => m
    }
    if (files.nonEmpty) {
      val spark = SparkSession.active
      // write-conflict validation window: every key this statement
      // wrote, checked at commit time against commits that landed after
      // the statement's read snapshot (opt out with
      // spark.azof.dml.validateConflicts=false for blind-append-style
      // MERGEs that tolerate last-writer-wins)
      val validate =
        if (spark.conf.getOption("spark.azof.dml.validateConflicts")
          .exists(_.trim.equalsIgnoreCase("false"))) None
        else Some(AzofWriter.DmlConflictCheck(
          readVersion, files.map(_.minKey).min, files.map(_.maxKey).max,
          lineage = branch))
      AzofWriter.commitLandedDeltas(
        spark, lakehousePath, tableName,
        files.map(AzofDeltaFiles.asDelta).toIndexedSeq,
        op = "sql-dml",
        validate = validate,
        branch = branch)
      ()
    }
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    AzofDeltaFiles.deleteLanded(tableDir, conf.value, messages)
}

private final class AzofDeltaWriterFactory(
    tableDir: String, filePrefix: String,
    rowSchema: StructType, fileSchema: StructType,
    logicalNames: Array[String],
    opTimeUs: Long, conf: SerializableHadoopConf)
  extends DeltaWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new AzofDeltaRowWriter(
      tableDir, s"${filePrefix}_p${partitionId}_t$taskId.parquet",
      rowSchema, fileSchema, logicalNames, opTimeUs, conf.value)
}

/** Task-side delta writer: streams rows into one parquet file via
  * Spark's own `ParquetWriteSupport` (so encodings, TIMESTAMP_MILLIS
  * parity with [[AzofWriter.writeDataFile]], and nulls match the
  * driver-written files byte-for-byte), measuring key/event-time stats
  * on the fly. The file opens lazily on the first row — a task whose
  * partition carries no changes lands nothing.
  *
  * With `markerFromRow = true` (the native streaming sink,
  * [[AzofStreamingWrite]]) the `_azof_deleted` marker is copied from the
  * incoming row when its schema carries it — the replication shape,
  * where one micro-batch holds upserts AND tombstones — instead of the
  * DML contract's null-for-data / delete()-for-tombstones split.
  */
private[sources] final class AzofDeltaRowWriter(
    tableDir: String, fileName: String,
    rowSchema: StructType, fileSchema: StructType,
    logicalNames: Array[String],
    opTimeUs: Long, hadoopConf: Configuration,
    markerFromRow: Boolean = false)
  extends DeltaWriter[InternalRow] {

  private val keyOrd = fileSchema.fieldIndex(TableSchema.KeyName)
  private val tsOrd = fileSchema.fieldIndex(TableSchema.EventTimeName)
  private val markerOrd = fileSchema.fieldIndex(TableSchema.DeletedName)
  // row-projection ordinal for each file column (marker excluded),
  // looked up by the column's LOGICAL name (the DML plan's row schema
  // speaks logical; fileSchema holds the aligned physical names);
  // resolved lazily so a pure-DELETE write (whose row schema is just
  // the row id) never asks for value columns it will not receive
  private lazy val dataMap: Array[Int] =
    (0 until markerOrd).map { fi =>
      val logical = logicalNames(fi)
      val i = rowSchema.fieldNames.indexWhere(_.equalsIgnoreCase(logical))
      if (i < 0) throw new IllegalStateException(
        s"DML row schema ${rowSchema.simpleString} lacks table column " +
          s"$logical")
      i
    }.toArray
  // the row id projection is exactly rowId() = (key)
  private val idKeyOrd = 0

  // incoming-row marker ordinal (streaming-sink mode only; -1 = the
  // stream carries no marker column and every row is a data row)
  private val rowMarkerOrd: Int =
    if (!markerFromRow) -1
    else rowSchema.fieldNames.indexWhere(
      _.equalsIgnoreCase(TableSchema.DeletedName))

  private var writer: ParquetWriter[InternalRow] = _
  private var rows = 0L
  private var minKey: UTF8String = _
  private var maxKey: UTF8String = _
  private var minTs = Long.MaxValue
  private var maxTs = Long.MinValue
  private var anyTombstone = false
  // typed per-value-column min/max, tracked in-flight like the key
  // range (same canonical encodings as the driver-side stats pass, so
  // DML-landed files skip exactly like writeDataFile-landed ones)
  private val vMin = new Array[Any](markerOrd)
  private val vMax = new Array[Any](markerOrd)

  private def trackValues(out: GenericInternalRow): Unit = {
    import org.apache.spark.sql.types._
    var i = 0
    while (i < markerOrd) {
      if (i != keyOrd && i != tsOrd && !out.isNullAt(i)) {
        fileSchema(i).dataType match {
          case StringType =>
            val v = out.getUTF8String(i)
            if (vMin(i) == null ||
              v.compareTo(vMin(i).asInstanceOf[UTF8String]) < 0)
              vMin(i) = v.clone()
            if (vMax(i) == null ||
              v.compareTo(vMax(i).asInstanceOf[UTF8String]) > 0)
              vMax(i) = v.clone()
          case LongType | TimestampType =>
            val v = out.getLong(i)
            if (vMin(i) == null || v < vMin(i).asInstanceOf[Long]) vMin(i) = v
            if (vMax(i) == null || v > vMax(i).asInstanceOf[Long]) vMax(i) = v
          case BooleanType =>
            val v = out.getBoolean(i)
            if (vMin(i) == null || (!v && vMin(i).asInstanceOf[Boolean]))
              vMin(i) = v
            if (vMax(i) == null || (v && !vMax(i).asInstanceOf[Boolean]))
              vMax(i) = v
          case _ => ()
        }
      }
      i += 1
    }
  }

  private def encodedRanges: Map[String, (String, String)] = {
    import org.apache.spark.sql.types._
    (0 until markerOrd).flatMap { i =>
      if (i == keyOrd || i == tsOrd || vMin(i) == null) None
      else {
        def enc(v: Any): String = fileSchema(i).dataType match {
          case TimestampType =>
            Math.floorDiv(v.asInstanceOf[Long], 1000L).toString
          case _ => v.toString
        }
        Some(fileSchema(i).name -> (enc(vMin(i)), enc(vMax(i))))
      }
    }.toMap
  }

  private def open(): Unit = if (writer == null) {
    val conf = new Configuration(hadoopConf)
    ParquetWriteSupport.setSchema(fileSchema, conf)
    conf.set("spark.sql.parquet.writeLegacyFormat", "false")
    conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    conf.set("spark.sql.parquet.fieldId.write.enabled", "false")
    conf.set("spark.sql.parquet.variant.annotateLogicalType.enabled", "false")
    conf.set("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
    conf.set("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
    writer = new AzofDeltaRowWriter.Builder(
      new Path(tableDir, fileName), conf)
      .withConf(conf)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
  }

  private def track(key: UTF8String, tsUs: Long): Unit = {
    if (minKey == null || key.compareTo(minKey) < 0) minKey = key.clone()
    if (maxKey == null || key.compareTo(maxKey) > 0) maxKey = key.clone()
    if (tsUs < minTs) minTs = tsUs
    if (tsUs > maxTs) maxTs = tsUs
    rows += 1
  }

  private def writeData(row: InternalRow): Unit = {
    open()
    val out = new GenericInternalRow(fileSchema.length)
    var i = 0
    while (i < markerOrd) {
      out.update(i,
        if (row.isNullAt(dataMap(i))) null
        else row.get(dataMap(i), fileSchema(i).dataType))
      i += 1
    }
    // the system columns are structurally required: a null here would
    // land in a parquet `required` field and corrupt the file — fail
    // the STATEMENT with a clear message instead (the batch aborts,
    // nothing commits)
    if (out.isNullAt(keyOrd) || out.isNullAt(tsOrd))
      throw new IllegalArgumentException(
        "azof delta row with NULL " +
          (if (out.isNullAt(keyOrd)) TableSchema.KeyName
          else TableSchema.EventTimeName) +
          ": every written row needs a key and an event_time")
    val marker: Any =
      if (rowMarkerOrd >= 0 && !row.isNullAt(rowMarkerOrd) &&
        row.getBoolean(rowMarkerOrd)) true
      else null
    out.update(markerOrd, marker)
    if (marker != null) anyTombstone = true
    track(out.getUTF8String(keyOrd), out.getLong(tsOrd))
    trackValues(out)
    writer.write(out)
  }

  override def insert(row: InternalRow): Unit = writeData(row)

  // DeltaWriter's contract passes (metadata, id, row) / (metadata, id) —
  // metadata is null here (no requiredMetadataAttributes)
  override def update(
      metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    // the key IS row identity in a merge-on-read format: an update that
    // reassigns it would land the NEW key's row while the OLD key's
    // current winner stays live — silently duplicating the row. Refuse;
    // re-keying is a DELETE + INSERT.
    val newKey = {
      val ord = dataMap(keyOrd)
      if (row.isNullAt(ord)) null else row.getUTF8String(ord)
    }
    if (newKey == null || !newKey.equals(id.getUTF8String(idKeyOrd)))
      throw new UnsupportedOperationException(
        s"azof UPDATE/MERGE may not reassign ${TableSchema.KeyName} " +
          s"(row identity): got '${id.getUTF8String(idKeyOrd)}' -> " +
          s"'$newKey'. Use DELETE + INSERT to re-key.")
    writeData(row)
  }

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    open()
    val out = new GenericInternalRow(fileSchema.length)
    out.update(keyOrd, id.getUTF8String(idKeyOrd))
    out.update(tsOrd, opTimeUs)
    out.update(markerOrd, true)
    anyTombstone = true
    track(out.getUTF8String(keyOrd), opTimeUs)
    writer.write(out)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    if (rows == 0L)
      AzofDeltaFileMessage(null, 0L, null, null, 0L, 0L, hasTombstone = false)
    else
      AzofDeltaFileMessage(fileName, rows,
        minKey.toString, maxKey.toString, minTs, maxTs, anyTombstone,
        encodedRanges)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    val p = new Path(tableDir, fileName)
    try { p.getFileSystem(hadoopConf).delete(p, false); () }
    catch { case _: java.io.IOException => () }
  }

  override def close(): Unit = ()
}

private object AzofDeltaRowWriter {
  /** parquet-mr builder plumbing for a custom `WriteSupport`. */
  private final class Builder(path: Path, conf: Configuration)
    extends ParquetWriter.Builder[InternalRow, Builder](path) {
    override def self(): Builder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }
}

/** Shared plumbing for task-landed delta files — one aligned physical
  * file schema, one message→Delta mapping, one abort cleanup. Used by
  * the SQL DML write path above and the native streaming sink
  * ([[AzofStreamingWrite]]).
  */
private[sources] object AzofDeltaFiles {

  /** Aligned (file schema, logical column names) for a task-landed
    * delta file. Value columns are written nullable regardless of
    * declaration: tombstone rows carry NULL values (same relaxation
    * commitDelete's lit(null) frame gets), and parquet-mr silently
    * corrupts a file handed a null for a `required` field. Files store
    * PHYSICAL names (renames are metadata-only); the aligned logical
    * names drive the row-schema lookup task-side.
    */
  def aligned(tschema: TableSchema): (StructType, Array[String]) = {
    val fileSchema = StructType(
      tschema.physicalStruct.fields.map { f =>
        if (f.name == TableSchema.KeyName ||
          f.name == TableSchema.EventTimeName) f
        else f.copy(nullable = true)
      })
      .add(StructField(TableSchema.DeletedName, BooleanType, nullable = true))
    val logicalNames: Array[String] =
      (Seq(TableSchema.KeyName, TableSchema.EventTimeName) ++
        tschema.columns.map(_.name)).toArray
    (fileSchema, logicalNames)
  }

  /** One landed file's commit message as the [[graft.format.Delta]] the
    * snapshot registers — self-measured key range, value ranges, row
    * count, event-time window, tombstone flag.
    */
  def asDelta(m: AzofDeltaFileMessage): graft.format.Delta =
    graft.format.Delta(
      m.file,
      Instant.ofEpochMilli(Math.floorDiv(m.minTsUs, 1000L)),
      Instant.ofEpochMilli(Math.floorDiv(m.maxTsUs, 1000L)),
      Some(FileStats(m.minKey, m.maxKey, None,
        m.colRanges.map { case (n, (lo, hi)) =>
          n -> graft.format.ColRange(lo, hi) },
        rows = Some(m.rows))),
      tombstone = m.hasTombstone)

  /** Best-effort delete of landed-but-unregistered files (an aborted or
    * replayed write); anything left over is vacuum's ordinary
    * unreferenced-bytes case.
    */
  def deleteLanded(tableDir: String, conf: Configuration,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(tableDir)
    val fs = dir.getFileSystem(conf)
    messages.foreach {
      case m: AzofDeltaFileMessage if m.file != null =>
        try { fs.delete(new Path(dir, m.file), false); () }
        catch { case _: java.io.IOException => () }
      case _ => ()
    }
  }
}
