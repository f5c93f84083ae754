package graft.streaming

import graft.format.TableSchema
import org.apache.spark.sql.{Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Exactly-once table-to-table replication INCLUDING deletes — the
  * composition the round-6 pieces exist for:
  *
  *   `azof-commits` source (versions as offsets, orphan-free, tombstone
  *   rows tagged `_deleted`) → one MIXED data+tombstone delta commit
  *   per micro-batch through [[AzofSink.commitBatch]]'s
  *   (appId, batchId) replay index.
  *
  * Each source commit range lands atomically in the mirror: its
  * upserts and its deletes ride ONE file (per-row `_azof_deleted`
  * marker; the delta entry is flagged so the mirror's scans read it),
  * so a mirror scan never observes a half-applied range. Restarts are
  * exactly-once end to end: Spark's checkpoint WAL pins the version
  * watermark, and a replayed micro-batch is dropped by the
  * stream_batches index. The mirror's Current/as-of scans then agree
  * with the source (same rows, same tombstone suppression, same
  * event-time semantics); only VERSION AS OF numbering differs (the
  * mirror has its own commit history).
  *
  * Deployment: pass `maxVersionsPerBatch` to bound catch-up batches on
  * long-lagged mirrors; run with a processing-time trigger for a live
  * follower or the default AvailableNow for an incremental sync job.
  */
object AzofMirror {

  def replicate(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      dstLake: String, dstTable: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxVersionsPerBatch: Option[Long] = None): StreamingQuery = {
    val appId = AzofSink.appIdFor(checkpoint)
    val reader = spark.readStream.format("azof-commits")
      .option("table", srcTable)
    val bounded = maxVersionsPerBatch
      .fold(reader)(n => reader.option("maxVersionsPerBatch", n.toString))
    bounded.load(srcLake)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        // feed `_deleted` (always present, false for upserts) becomes
        // the per-row marker column; delete-free batches get it
        // stripped again inside commitBatch's stats pass
        val rows = batch
          .withColumn(TableSchema.DeletedName,
            when(col("_deleted"), lit(true)))
          .drop("_commit_version", "_deleted")
        AzofSink.commitBatch(dstLake, dstTable, rows, id, appId)
        ()
      }
      .trigger(trigger)
      .start()
  }
}
