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
      maxVersionsPerBatch: Option[Long] = None,
      startVersion: Option[Long] = None,
      sourceBranch: Option[String] = None): StreamingQuery = {
    // `sourceBranch` mirrors a STAGED lineage — materialize a staging
    // branch's accumulating state elsewhere (the audit-tooling mirror)
    // without publishing it; the commit-exact `branch` source option
    // delivers only the staged commits, folds skipped
    // Source schema evolution, pinned behavior (round-8 contract):
    // mid-stream evolution fails the query LOUDLY inside the
    // azof-commits source (schema is pinned at stream start — see
    // AzofCommitSource.getBatch), and a RESTART heals it: here, at
    // start, the mirror widens its target with every source column the
    // target lacks (added columns are nullable by the addColumn
    // contract), so the re-pinned feed's new columns land in the
    // mirror instead of silently vanishing one layer down.
    reconcileSchema(spark, srcLake, srcTable, dstLake, dstTable,
      srcBranch = sourceBranch)
    val appId = AzofSink.appIdFor(checkpoint)
    val reader0 = spark.readStream.format("azof-commits")
      .option("table", srcTable)
    val reader = sourceBranch.fold(reader0)(b => reader0.option("branch", b))
    val bounded = maxVersionsPerBatch
      .fold(reader)(n => reader.option("maxVersionsPerBatch", n.toString))
    val seeded = startVersion
      .fold(bounded)(v => bounded.option("startVersion", v.toString))
    seeded.load(srcLake)
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

  /** Replication through the NATIVE DSv2 streaming sink
    * (`writeStream.toTable`, [[graft.sources.AzofStreamingWrite]])
    * instead of [[replicate]]'s `foreachBatch` wiring: the commit-exact
    * feed's upserts and tombstones land via the task-parallel
    * landed-file path, exactly once on the sink's own
    * (query id, epoch) replay index — no checkpoint-derived appId
    * plumbing. Functionally ≡ [[replicate]] (same feed, same
    * mixed-delta semantics); the sink validates the stream's schema
    * against the target, so a target carrying columns the source lacks
    * refuses loudly instead of inventing nulls.
    */
  def replicateNative(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      dstLake: String, dstTable: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxVersionsPerBatch: Option[Long] = None,
      targetBranch: Option[String] = None): StreamingQuery = {
    // `targetBranch` STAGES the replica on a branch lineage of the
    // target — upserts and tombstones alike invisible to the target's
    // main readers until fast_forward/merge_branch publishes them: the
    // write-audit-publish shape for replication (audit the mirrored
    // state, then flip it live in one commit). Schema reconciliation
    // runs on the TARGET LINEAGE the sink writes: a staged replica of
    // an evolving source additively evolves its branch (the WAP
    // migration shape), and the publish carries the evolution to the
    // target's main.
    reconcileSchema(spark, srcLake, srcTable, dstLake, dstTable,
      dstBranch = targetBranch)
    // toTable needs a catalog identifier: register one per target lake
    // (deterministic name, idempotent re-registration)
    val cat = "azsink_" + java.security.MessageDigest.getInstance("MD5")
      .digest(dstLake.getBytes("UTF-8")).map("%02x".format(_))
      .mkString.take(8)
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.AzofCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.path", dstLake)
    val reader = spark.readStream.format("azof-commits")
      .option("table", srcTable)
    val bounded = maxVersionsPerBatch
      .fold(reader)(n => reader.option("maxVersionsPerBatch", n.toString))
    bounded.load(srcLake)
      // feed `_deleted` (always present, false for upserts) becomes the
      // sink's per-row tombstone marker; the sink maps columns by NAME
      .withColumn(TableSchema.DeletedName,
        when(col("_deleted"), lit(true)))
      .drop("_commit_version", "_deleted")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .toTable(targetBranch.fold(s"$cat.$dstTable")(b =>
        s"$cat.$dstTable.branch_$b"))
  }

  /** Start-time schema reconciliation: commit an `add-column` on the
    * target for every source column it lacks. Column ORDER may differ
    * between source and mirror after evolution (each table appends in
    * its own history); scans select by name, so order is cosmetic. A
    * source column the target lacks that is NOT nullable fails loudly
    * in [[graft.sources.AzofWriter.addColumn]] — that is a
    * differently-created target, not an evolved source, and silent
    * data invention would be worse than the error.
    */
  private def reconcileSchema(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      dstLake: String, dstTable: String,
      srcBranch: Option[String] = None,
      dstBranch: Option[String] = None): Unit = {
    // a BRANCH source reconciles against the branch head's schema (the
    // fork schema plus any additive branch evolution), so the target is
    // exactly as wide as the rows the branch feed will deliver; a
    // BRANCH target evolves ITS lineage (addColumn on the branch)
    val srcT = graft.format.AzofTable(spark, srcLake, srcTable)
    val srcSnap = srcBranch.flatMap(srcT.branchHead) match {
      case Some(h) => srcT.snapshot(h.toString)
      case None => srcT.currentSnapshot
    }
    val srcCols = srcSnap.schema.columns
    val dstT = graft.format.AzofTable(spark, dstLake, dstTable)
    val dstSnap = dstBranch.flatMap(dstT.branchHead) match {
      case Some(h) => dstT.snapshot(h.toString)
      case None => dstT.currentSnapshot
    }
    val dstByName = dstSnap.schema.columns.map(c => c.name -> c).toMap
    // shared names must agree on TYPE: a same-named column of a
    // different azof type is a differently-created target, and
    // replicating into it would commit mismatched-typed data — the
    // silent corruption this check turns into an error
    srcCols.foreach { c =>
      dstByName.get(c.name).foreach { d =>
        require(d.dataType == c.dataType,
          s"mirror $dstTable column '${c.name}' is ${d.dataType} but " +
            s"source $srcTable has ${c.dataType} — the target was " +
            "created with a different schema; replicate into a " +
            "type-compatible (or fresh) target instead")
        require(d.nullable || !c.nullable,
          s"mirror $dstTable column '${c.name}' is non-nullable but " +
            s"source $srcTable allows nulls there — replicating would " +
            "commit nulls into a column whose schema forbids them")
      }
    }
    srcCols.filterNot(c => dstByName.contains(c.name)).foreach { c =>
      graft.sources.AzofWriter.addColumn(spark, dstLake, dstTable, c,
        branch = dstBranch)
    }
  }

  /** Fresh-mirror runbook for a source whose EARLY HISTORY was
    * vacuumed: plain [[replicate]] starts the feed at version 1, which
    * lags past retention and fails loudly with the retained floor.
    * This variant SEEDS the empty mirror with one base commit of the
    * source's Current scan (delete-aware winners with their original
    * event_times), records the seed version in a checkpoint sidecar
    * (`_azof_seed_version`), and follows from there — so restarts
    * re-read the SAME seed version (never a freshly-probed one, which
    * would skip the commits between the checkpoint watermark and
    * "now").
    *
    * Post-seed semantics, documented: the mirror agrees with the
    * source at Current and at every as-of from the seed point on;
    * as-of travel BEFORE the seed resolves against the seeded winners
    * only (superseded pre-seed history was unreachable through the
    * vacuumed feed in the first place). Rows that land in both the
    * seed and the first followed range dedup harmlessly (identical
    * rows tie to themselves in the merge-dedup scan).
    *
    * A non-empty mirror WITHOUT a seed sidecar refuses loudly: the
    * seed version is unrecoverable, so resuming could silently skip a
    * range — use [[replicate]] (full-history mirror) or a fresh
    * checkpoint + target instead.
    */
  def seedAndReplicate(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      dstLake: String, dstTable: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxVersionsPerBatch: Option[Long] = None): StreamingQuery = {
    // widen the target BEFORE the seed commit, not only in replicate():
    // a fresh mirror created against a pre-evolution schema would
    // otherwise seed rows whose new column the target schema hides
    reconcileSchema(spark, srcLake, srcTable, dstLake, dstTable)
    // the sidecar rides IN the checkpoint, through the Hadoop FS like
    // the checkpoint itself — a java.io.File here would write a bogus
    // local path for hdfs://s3a:// checkpoint URIs and a restart from
    // another node would see a non-empty mirror with no seed marker
    val ckPath = new org.apache.hadoop.fs.Path(checkpoint)
    val fs = ckPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(ckPath)) { fs.mkdirs(ckPath); () }
    val sidecar = new org.apache.hadoop.fs.Path(ckPath, "_azof_seed_version")
    val seedV: Long =
      if (fs.exists(sidecar)) {
        val in = fs.open(sidecar)
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim.toLong
        finally in.close()
      } else {
        val dst = graft.format.AzofTable(spark, dstLake, dstTable)
        require(dst.currentVersion.toLong == 1L,
          s"mirror $dstTable already has commits but checkpoint " +
            s"$checkpoint carries no seed marker — its seed version is " +
            "unrecoverable; use replicate() for a full-history mirror " +
            "or start over with a fresh checkpoint and empty target")
        // capture the version BEFORE scanning: commits landing between
        // the two re-deliver through the feed and dedup harmlessly
        val v = graft.format.AzofTable(spark, srcLake, srcTable)
          .currentVersion.toLong
        val cur = graft.operators.AzofScan.scan(spark, srcLake, srcTable)
        if (!cur.isEmpty)
          graft.sources.AzofWriter.commitBase(spark, dstLake, dstTable, cur)
        val out = fs.create(sidecar, false)
        try out.write(
          v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        v
      }
    replicate(spark, srcLake, srcTable, dstLake, dstTable, checkpoint,
      trigger, maxVersionsPerBatch, startVersion = Some(seedV))
  }
}
