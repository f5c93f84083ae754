package graft.sources

import graft.format.{AzofTable, TableSchema}
import graft.util.SerializableHadoopConf
import java.util.UUID
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType

/** Native Structured Streaming sink for azof tables — the DSv2
  * `StreamingWrite` behind `df.writeStream.toTable("cat.t")` (and
  * `.writeTo` streaming), so a stream lands in an azof table with no
  * `foreachBatch` wiring (the [[graft.streaming.AzofSink]] helper
  * remains the path-based programmatic equivalent; both share one
  * commit protocol and one replay index).
  *
  * Semantics per micro-batch: every task streams its rows straight into
  * its own uniquely-named parquet file in the table directory (the SQL
  * DML write path's task writers, [[AzofDeltaRowWriter]] in
  * marker-passthrough mode), then `commit(epochId, ...)` registers all
  * landed files as ONE delta commit whose event-time window is the
  * batch's own min/max — no driver collect, no extra shuffle beyond the
  * stream's plan. A batch carrying `_azof_deleted = true` rows commits
  * them as tombstones in mixed data+tombstone files (the replication
  * shape), so a CDC feed sinks natively.
  *
  * Exactly-once across restarts: Structured Streaming re-runs at most
  * the last micro-batch after a crash, and the sink is idempotent on
  * (query id, epoch id) — each commit stamps `q:<queryId> -> epochId`
  * into the snapshot's `stream_batches` replay index, and the guard is
  * checked INSIDE the optimistic commit retry against the exact commit
  * base ([[AzofWriter.commitLandedDeltas]]), so even a zombie duplicate
  * of the query racing its successor cannot double-register. The
  * streaming query id is stable across restarts from one checkpoint
  * (Spark persists it in the checkpoint's metadata file) — the same
  * idempotence scope [[graft.streaming.AzofSink.appIdFor]] derives from
  * the checkpoint path. A replayed epoch's landed files are deleted on
  * detection; a crash before that is vacuum's ordinary
  * unreferenced-bytes case.
  *
  * Update mode: the catalog's write builder is marked
  * `SupportsStreamingUpdateAsAppend`, because for a merge-on-read
  * format update-as-append is EXACT, not an approximation — an updated
  * aggregate row lands as the key's new version and the per-key merge
  * (event-time desc, commit recency on ties) serves it as the winner.
  * Streaming aggregations sink natively in `outputMode("update")`;
  * `complete` mode stays refused (azof is append-only — a mode that
  * semantically truncates cannot map onto it).
  */
private[sources] final class AzofStreamingWrite(
    lakehousePath: String, tableName: String,
    queryId: String, rowSchema: StructType,
    branch: Option[String] = None)
  extends StreamingWrite {

  private val appId = s"q:$queryId"

  /** The target LINEAGE's head snapshot — schema gate and file schema
    * follow it, and the replay guard reads its `stream_batches` (the
    * commit bases on the branch head, so the guard is per-lineage). A
    * stream sunk into a BRANCH stages invisibly until publish: the
    * streaming face of write-audit-publish.
    */
  private def headSnapshot(table: AzofTable) =
    branch.flatMap(b => table.branchHead(b))
      .map(h => table.snapshot(h.toString))
      .getOrElse(table.currentSnapshot)

  // driver-side schema gate at query start: clear refusal instead of a
  // task-side failure N stages in. The stream must carry the FULL table
  // schema (key, event_time, every value column) plus optionally the
  // tombstone marker.
  locally {
    val table = AzofTable(SparkSession.active, lakehousePath, tableName)
    val expected = Seq(TableSchema.KeyName, TableSchema.EventTimeName) ++
      headSnapshot(table).schema.columns.map(_.name)
    val got = rowSchema.fieldNames.toSeq
    val missing = expected.filterNot(c => got.exists(_.equalsIgnoreCase(c)))
    val extra = got.filterNot(c =>
      c.equalsIgnoreCase(TableSchema.DeletedName) ||
        expected.exists(_.equalsIgnoreCase(c)))
    if (missing.nonEmpty || extra.nonEmpty)
      throw new IllegalArgumentException(
        s"stream schema ${got.mkString("(", ", ", ")")} does not match " +
          s"azof table $tableName ${expected.mkString("(", ", ", ")")}" +
          (if (missing.nonEmpty) s"; missing: ${missing.mkString(", ")}"
          else "") +
          (if (extra.nonEmpty) s"; unknown: ${extra.mkString(", ")}"
          else "") +
          s" (an optional ${TableSchema.DeletedName} boolean column " +
          "marks tombstone rows)")
  }

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val spark = SparkSession.active
    // re-resolved per epoch (the factory is created per micro-batch):
    // an ADD COLUMN between batches lands in the next batch's files
    val table = AzofTable(spark, lakehousePath, tableName)
    val (fileSchema, logicalNames) =
      AzofDeltaFiles.aligned(headSnapshot(table).schema)
    val prefix = s"delta_str_${UUID.randomUUID().toString.take(8)}"
    new AzofStreamingWriterFactory(
      table.tableDir.toString, prefix, rowSchema, fileSchema, logicalNames,
      new SerializableHadoopConf(spark.sessionState.newHadoopConf()))
  }

  override def commit(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.collect {
      case m: AzofDeltaFileMessage if m.file != null => m
    }
    // an empty micro-batch commits no version and stamps nothing — a
    // replay of it is indistinguishable and equally empty
    if (files.isEmpty) return
    val spark = SparkSession.active
    val committed = AzofWriter.commitLandedDeltas(
      spark, lakehousePath, tableName,
      files.map(AzofDeltaFiles.asDelta).toIndexedSeq,
      op = s"stream-delta#$appId#$epochId",
      streamBatch = Some(appId -> epochId),
      branch = branch)
    if (!committed) {
      val table = AzofTable(spark, lakehousePath, tableName)
      AzofDeltaFiles.deleteLanded(table.tableDir.toString,
        spark.sessionState.newHadoopConf(), messages)
    }
  }

  override def abort(
      epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val table = AzofTable(spark, lakehousePath, tableName)
    AzofDeltaFiles.deleteLanded(table.tableDir.toString,
      spark.sessionState.newHadoopConf(), messages)
  }
}

private final class AzofStreamingWriterFactory(
    tableDir: String, prefix: String, rowSchema: StructType,
    fileSchema: StructType, logicalNames: Array[String],
    conf: SerializableHadoopConf)
  extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    // opTimeUs unused: marker-passthrough mode never synthesizes
    // tombstone rows (delete() is the DML contract's path)
    new AzofDeltaRowWriter(
      tableDir, s"${prefix}_e${epochId}_p${partitionId}_t$taskId.parquet",
      rowSchema, fileSchema, logicalNames, opTimeUs = 0L, conf.value,
      markerFromRow = true)
}
