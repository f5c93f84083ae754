package graft.streaming

import graft.format.{AzofTable, TableSchema}
import graft.sources.AzofWriter
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming WRITE path into an azof table — the counterpart of
  * [[AzofStream]]'s streaming scan, closing the reference's streaming
  * roadmap loop (reference: README.md:158-160): a watermarked stream of
  * `key, event_time, values...` rows lands as one delta commit per
  * micro-batch via `foreachBatch` (the memory sink cannot resume from a
  * checkpoint; foreachBatch + the file-landing commit protocol can).
  *
  * Exactly-once across restarts: Structured Streaming re-runs at most
  * the LAST micro-batch after a crash, so [[commitBatch]] is idempotent
  * on (appId, batchId) — each commit stamps
  * `op = "stream-delta#<appId>#<batchId>"` into its snapshot (Delta's
  * txn-appId pattern), and a replayed batch whose id is at or below its
  * OWN stream's latest stamp is skipped. The delta window is derived
  * from the batch's actual min/max event_time (the format contract: a
  * delta's window bounds what the file contains).
  */
object AzofSink {

  private val OpPrefix = "stream-delta#"

  /** Idempotence scope: batch ids restart at 0 for every NEW checkpoint,
    * so the stamp must carry the stream's identity — a fresh backfill
    * into a previously stream-fed table must not see the old stream's
    * batch 37 and silently drop its own batches 0..37. The appId derives
    * deterministically from the FULLY-QUALIFIED checkpoint location (the
    * batch-id namespace): the path is qualified against its filesystem
    * (`fs.makeQualified`) before hashing, so '/ck', '/ck/', 'file:/ck'
    * and 'file:///ck' all resolve to the same scheme+authority+path and
    * hash alike — a restart that spells the same checkpoint with or
    * without a scheme qualifier keeps its replay protection.
    */
  def appIdFor(checkpoint: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint)
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val q = p.getFileSystem(conf).makeQualified(p).toUri.normalize
    // rebuild scheme://authority/path explicitly: 'file:/x', 'file:///x'
    // and a bare '/x' qualify to URIs whose authority is null vs empty —
    // toString would keep that spelling difference alive
    val auth = Option(q.getAuthority).getOrElse("")
    md5id(s"${q.getScheme}://$auth${q.getPath}".stripSuffix("/"))
  }

  /** appIds this checkpoint hashed to under EARLIER derivations of
    * [[appIdFor]] (pre-qualification: the raw path URI with/without
    * scheme). Replay detection checks these too, so a stream whose table
    * carries stamps from an older build keeps its protection across the
    * derivation change instead of double-committing its first replayed
    * batch.
    */
  private[streaming] def legacyAppIdsFor(checkpoint: String): Seq[String] = {
    val raw = new org.apache.hadoop.fs.Path(checkpoint)
      .toUri.normalize.toString.stripSuffix("/")
    Seq(md5id(raw)).distinct
  }

  private def md5id(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(8)

  /** Legacy fallback only: tables written by sinks that predate the
    * snapshot's `stream_batches` replay index carry their last batch id
    * solely in historical `op` stamps, so scan a bounded window of
    * commits for it. New commits always populate the index, which is
    * exact at any interleaving depth; this scan's 50-commit bound only
    * matters for the FIRST replayed batch after upgrading such a table.
    */
  private val ReplayLookback = 50L

  private def lastBatchId(t: AzofTable, appId: String): Option[Long] = {
    val cur = t.currentSnapshot
    cur.streamBatches.get(appId).orElse {
      val prefix = s"$OpPrefix$appId#"
      val v = t.currentVersion.toLong
      (v to math.max(1L, v - ReplayLookback) by -1).iterator
        .flatMap(v => scala.util.Try(t.snapshot(v.toString)).toOption)
        .flatMap(_.op)
        .collectFirst {
          case op if op.startsWith(prefix) &&
            op.stripPrefix(prefix).toLongOption.isDefined =>
            op.stripPrefix(prefix).toLong
        }
    }
  }

  /** The last batch id `appId` stamped on the table, if any — the
    * public face of the replay guard for BATCH-style refreshers
    * ([[graft.sources.JoinView]]) that heal their cursor sidecar from
    * what was actually applied after a crash between commit and
    * cursor write.
    */
  def lastCommitted(
      spark: org.apache.spark.sql.SparkSession,
      lakehousePath: String, table: String, appId: String): Option[Long] =
    lastBatchId(AzofTable(spark, lakehousePath, table), appId)

  /** Commit one micro-batch as a delta; idempotent on (appId, batchId).
    * `appId` is REQUIRED — every independent caller (each its own
    * batch-id sequence) must use a distinct id, or a second job's
    * batches would be mistaken for replays of the first's and silently
    * dropped; streams get it from [[appIdFor]] on their checkpoint.
    * `legacyAppIds` are additional ids the same stream may have stamped
    * under older appId derivations — checked for replay, never written.
    * Returns true iff a commit happened (false: empty batch or replay).
    */
  def commitBatch(
      lakehousePath: String, table: String,
      batch: DataFrame, batchId: Long, appId: String,
      legacyAppIds: Seq[String] = Nil): Boolean = {
    val spark = batch.sparkSession
    val t = AzofTable(spark, lakehousePath, table)
    // Legacy ids are consulted ONLY while the current appId has no stamp
    // at all: any new-derivation stamp supersedes legacy ones (the first
    // post-upgrade commit writes it), and legacy ids are never in
    // `stream_batches`, so probing them unconditionally would pay the
    // 50-snapshot lookback on EVERY micro-batch forever.
    val replayed = lastBatchId(t, appId) match {
      case Some(last) => last >= batchId
      case None =>
        legacyAppIds.exists(id => lastBatchId(t, id).exists(_ >= batchId))
    }
    if (replayed) false
    else {
      val rows = batch.persist()
      try {
        // a batch carrying the tombstone marker column commits as a
        // MIXED data+tombstone delta (the replication shape) — unless
        // no row is actually deleted, in which case the column is
        // stripped so delete-free batches keep the target's scans
        // marker-free; the deletes probe rides the one stats pass the
        // commit already makes
        val hasMarkerCol = batch.columns.contains(TableSchema.DeletedName)
        val aggs = Seq(
          min(col(TableSchema.EventTimeName)),
          max(col(TableSchema.EventTimeName))) ++
          (if (hasMarkerCol)
            Seq(max(coalesce(col(TableSchema.DeletedName), lit(false))))
          else Seq.empty)
        val mm = rows.agg(aggs.head, aggs.tail: _*).collect()(0)
        if (mm.isNullAt(0)) false
        else {
          val anyDeletes = hasMarkerCol && mm.getBoolean(2)
          val toCommit =
            if (hasMarkerCol && !anyDeletes)
              rows.drop(TableSchema.DeletedName)
            else rows
          AzofWriter.commitDelta(spark, lakehousePath, table, toCommit,
            mm.getTimestamp(0).toInstant, mm.getTimestamp(1).toInstant,
            op = Some(s"$OpPrefix$appId#$batchId"),
            streamBatch = Some(appId -> batchId))
          true
        }
      } finally { rows.unpersist(); () }
    }
  }

  /** Wire a streaming DataFrame into the table. The stream's schema must
    * match the table's (`key, event_time, values...`). AvailableNow by
    * default so `start().awaitTermination()` drains what exists and
    * exits; pass a processing-time trigger for a long-running follower.
    */
  def append(
      stream: DataFrame, lakehousePath: String, table: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val appId = appIdFor(checkpoint)
    val legacy = legacyAppIdsFor(checkpoint).filterNot(_ == appId)
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        commitBatch(lakehousePath, table, batch.toDF(), id, appId, legacy)
        ()
      }
      .trigger(trigger)
      .start()
  }
}
