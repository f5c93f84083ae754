package graft.sources

import graft.format.{AzofTable, ColumnDef, ColumnType, TableSchema}
import graft.operators.{AzofScan, Blocks, Packing}
import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED incremental shard assignment — the amortized twin of the
  * one-shot export stage ([[Packing.shardAssign]]) for pipelines that
  * re-export at crawl cadence. One-shot packing is SNAPSHOT-SCOPED by
  * design: ranks are gapless, so ONE added document shifts every later
  * rank and a re-export rewrites every shard. Real corpus builds
  * freeze shards once written; this index makes membership STABLE — a
  * document's `(shuffle_rank, shard_id, shard_pos)` is minted ONCE, by
  * the refresh that first sees it, and never changes afterwards.
  *
  * '''Epoch packing.''' Each refresh ranks the crawl batch's NEW keys
  * by the SAME salted-hash order the one-shot uses (the
  * [[Packing.prefixSum]] two-phase distributed rank — never a
  * partition-less window) and appends them after the high-water rank.
  * The first refresh over a corpus therefore reproduces
  * [[Packing.shardAssign]] exactly; later refreshes fill shards
  * append-only, so shards already emitted are never touched and the
  * re-export cost at 100 TB cadence is ∝ the new crawl, not the
  * corpus. Refresh work is CDC-confined: churned keys from the
  * change feed anti-join the map — no corpus-wide scan.
  *
  * '''Insert-only map''' (the [[KeyMap]] rule: assignments are
  * permanent). A deleted document leaves a HOLE in its shard —
  * write-once artifacts cannot reclaim slots — and a re-inserted key
  * keeps its original slot, so no delete/re-add cycle can move a
  * document between shards. Deletions therefore write NOTHING here:
  * live membership is served by joining the map against the live
  * corpus ([[liveAssignment]], the applyVerdict serving shape).
  *
  * `salt` and `shardSize` freeze into a model sidecar at [[create]]
  * (the SemDedupIndex rule — mixing either across epochs would break
  * the permutation), and the HWM sidecar reserves each rank range
  * BEFORE its commit (the KeyMap rule: a crash between the two leaves
  * a permanently-empty rank gap — holes in one shard — never a
  * double-assigned slot).
  */
object ShardMap {

  val ModelFileName = "_shard_model.json"
  val HwmFileName = "_shard_hwm.json"

  val MapSchema: TableSchema = TableSchema(Seq(
    ColumnDef("shuffle_rank", ColumnType.AzInt, nullable = false),
    ColumnDef("shard_id", ColumnType.AzInt, nullable = false),
    ColumnDef("shard_pos", ColumnType.AzInt, nullable = false),
    ColumnDef("epoch", ColumnType.AzInt, nullable = false)))

  final case class Model(shardSize: Long, salt: String)

  final case class RefreshReport(
      fromVersion: Long, toVersion: Long,
      churned: Long, assigned: Long, nextRank: Long) {
    def noop: Boolean = toVersion == fromVersion
  }

  def create(
      spark: SparkSession,
      idxLake: String, idxTable: String = "shard_map",
      shardSize: Long = 1024L, salt: String = "s1",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Model = {
    require(shardSize >= 1, s"shardSize must be >= 1, got $shardSize")
    val created = AzofWriter.createTableIfAbsent(
      spark, idxLake, idxTable, MapSchema, segmentStart)
    if (created) writeModel(spark, idxLake, idxTable, Model(shardSize, salt))
    readModel(spark, idxLake, idxTable)
  }

  /** The full persisted assignment:
    * `(<key>, shuffle_rank, shard_id, shard_pos, epoch)` — including
    * slots whose documents have since been deleted (their shards were
    * already written).
    */
  def assignment(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame =
    AzofScan.scan(spark, idxLake, idxTable)
      .select(col(TableSchema.KeyName), col("shuffle_rank"),
        col("shard_id"), col("shard_pos"), col("epoch"))

  /** [[assignment]] ∩ the LIVE corpus — what an artifact reader that
    * honors deletions consumes. Deleted docs appear as holes (their
    * `shard_pos` is simply absent); everything else keeps its minted
    * slot.
    */
  def liveAssignment(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String): DataFrame =
    assignment(spark, idxLake, idxTable)
      .join(AzofScan.scan(spark, srcLake, srcTable)
          .select(col(TableSchema.KeyName)),
        Seq(TableSchema.KeyName), "left_semi")

  /** Assign slots to every key the CDC range added that has none yet.
    * Cursor-idempotent (the [[ContainIndex]] rule: the cursor advances
    * only after the commit, so a crashed refresh replays into fresh =
    * empty and commits nothing new).
    */
  def refresh(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String = "shard_map",
      at: Instant = Instant.now()): RefreshReport = {
    val model = readModel(spark, idxLake, idxTable)
    val toVersion = AzofTable(spark, srcLake, srcTable).currentVersion.toLong
    val fromVersion = DedupFlow.readCursor(spark, idxLake, idxTable)
      .getOrElse(AzofChangeFeed.earliestFeedBase(spark, srcLake, srcTable))
    if (toVersion <= fromVersion)
      return RefreshReport(fromVersion, fromVersion, 0L, 0L,
        readHwm(spark, idxLake, idxTable).getOrElse(0L))

    // churn: every key the range touched; a slot mints only for churn
    // keys LIVE at the pinned version (the as-of semi-join is the
    // engine's own liveness rule — event-time precedence decides, so a
    // historical tombstone loses to a newer row exactly as the scan
    // says, and a key upserted-then-deleted within a catch-up range
    // mints nothing: no slots for documents already dead at the
    // cursor). Checkpointed once — the report counter must not re-run
    // the CDC read.
    val churn = spark.read.format("azof")
      .option("table", srcTable)
      .option("changesFrom", fromVersion)
      .option("changesTo", toVersion)
      .load(srcLake)
      .select(col(TableSchema.KeyName))
      .distinct()
      .localCheckpoint(true)
    val fresh = churn
      .join(AzofScan.scan(spark, idxLake, idxTable)
          .select(col(TableSchema.KeyName)),
        Seq(TableSchema.KeyName), "left_anti")
      .join(spark.read.format("azof")
          .option("table", srcTable)
          .option("versionAsOf", toVersion.toString)
          .load(srcLake)
          .select(col(TableSchema.KeyName)),
        Seq(TableSchema.KeyName), "left_semi")
      .localCheckpoint(true)
    val nChurn = churn.count()
    val nFresh = fresh.count()
    var next = readHwm(spark, idxLake, idxTable).getOrElse(
      // sidecar lost: recover from the map itself
      AzofScan.scan(spark, idxLake, idxTable)
        .agg(coalesce(max(col("shuffle_rank")), lit(-1L)))
        .collect()(0).getLong(0) + 1L)
    if (nFresh > 0) {
      val base = next
      next = base + nFresh
      // reserve the range FIRST (crash ⇒ gap, never a double slot)
      writeHwm(spark, idxLake, idxTable, next)
      val sz = model.shardSize
      val rows = Packing.prefixSum(
        fresh.select(col(TableSchema.KeyName))
          .withColumn("_h", Packing.orderHash(s"shard#${model.salt}#",
            col(TableSchema.KeyName)))
          .withColumn("_tid", col(TableSchema.KeyName))
          .withColumn("_w", lit(1L)))
        .withColumn("shuffle_rank", lit(base) + col("_prefix"))
        .select(col(TableSchema.KeyName),
          lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName),
          col("shuffle_rank"),
          expr(s"shuffle_rank div ${sz}L").as("shard_id"),
          pmod(col("shuffle_rank"), lit(sz)).as("shard_pos"),
          lit(toVersion).as("epoch"))
      AzofWriter.commitDelta(spark, idxLake, idxTable, rows, at, at,
        op = Some("shard-assign"))
    }
    DedupFlow.writeCursor(spark, idxLake, idxTable, toVersion)
    Blocks.free(churn); Blocks.free(fresh)
    RefreshReport(fromVersion, toVersion, nChurn, nFresh, next)
  }

  final case class EmitReport(
      fromShard: Long, untilShard: Long, docs: Long, flushedPartial: Boolean) {
    def noop: Boolean = untilShard == fromShard && !flushedPartial
  }

  /** Write the shard artifacts that became COMPLETE since the last
    * emission — the incremental-export step the map exists for. Shards
    * are write-once: an emission appends `shard_id=N` directories
    * under `outDir` for exactly the shards in `[emit-cursor,
    * nextRank div shardSize)` and advances the cursor, so no emitted
    * byte is ever rewritten and each crawl batch's export cost is the
    * batch's own shards. Each row is `(shard_pos, <key>, <textCol>)`
    * with text joined from the live corpus at emission time — a doc
    * deleted between minting and emission is a HOLE (its `shard_pos`
    * is absent from the file); a doc deleted AFTER emission stays in
    * the immutable artifact (readers honoring deletions re-join
    * [[liveAssignment]], the p05 serving shape).
    *
    * `flush = true` additionally writes the trailing PARTIAL shard —
    * the final cut of a frozen corpus. The cursor does not advance
    * past it; if the corpus grows after a flush, the next emission
    * REPLACES the partial directory with the completed shard (dynamic
    * partition overwrite — the same mechanism that makes a crashed
    * emission's replay idempotent instead of row-duplicating).
    */
  def emitShards(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, idxTable: String,
      outDir: String, flush: Boolean = false): EmitReport = {
    val model = readModel(spark, idxLake, idxTable)
    val nextRank = readHwm(spark, idxLake, idxTable).getOrElse(
      // rank-HWM sidecar lost: recover from the map like refresh does
      // (emission must not silently stall at shard 0 forever)
      AzofScan.scan(spark, idxLake, idxTable)
        .agg(coalesce(max(col("shuffle_rank")), lit(-1L)))
        .collect()(0).getLong(0) + 1L)
    val complete = nextRank / model.shardSize
    val from = readEmitHwm(spark, idxLake, idxTable).getOrElse(0L)
    val until = math.max(from, complete)
    val partial = flush && nextRank % model.shardSize != 0
    if (until == from && !partial)
      return EmitReport(from, from, 0L, flushedPartial = false)
    val upper = if (partial) until + 1 else until
    val rows = assignment(spark, idxLake, idxTable)
      .where(col("shard_id") >= from && col("shard_id") < upper)
      .join(AzofScan.scan(spark, srcLake, srcTable)
          .select(col(TableSchema.KeyName), col(textCol)),
        Seq(TableSchema.KeyName))
      .select(col("shard_id"), col("shard_pos"),
        col(TableSchema.KeyName), col(textCol))
      .localCheckpoint(true)
    val nDocs = rows.count()
    // DYNAMIC overwrite, not append: emission ranges own their
    // shard_id partitions exclusively, so a crash between this write
    // and the cursor replays into an overwrite of the same dirs —
    // idempotent, never duplicated rows in a "write-once" artifact.
    // A flushed partial heals the same way: when its shard completes,
    // the re-emission REPLACES the partial dir with the full one.
    rows.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("shard_id").parquet(outDir)
    writeEmitHwm(spark, idxLake, idxTable, until)
    Blocks.free(rows)
    EmitReport(from, until, nDocs, flushedPartial = partial)
  }

  // ----------------------------------------- sidecars (via IndexSidecar)

  val EmitHwmFileName = "_shard_emit_hwm.json"

  def readModel(
      spark: SparkSession, idxLake: String, idxTable: String): Model = {
    val root = IndexSidecar.readNode(spark, idxLake, idxTable, ModelFileName)
      .getOrElse(throw new IllegalArgumentException(
        s"no $ModelFileName beside $idxTable — create() the shard map first"))
    Model(root.get("shardSize").asLong, root.get("salt").asText)
  }

  private def writeModel(
      spark: SparkSession, idxLake: String, idxTable: String,
      m: Model): Unit = {
    val salt = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(m.salt)
    IndexSidecar.writeOnce(spark, idxLake, idxTable, ModelFileName,
      s"""{"shardSize":${m.shardSize},"salt":$salt}""")
  }

  private def readHwm(
      spark: SparkSession, idxLake: String, idxTable: String): Option[Long] =
    IndexSidecar.readLong(spark, idxLake, idxTable, HwmFileName, "nextRank")

  private def writeHwm(
      spark: SparkSession, idxLake: String, idxTable: String,
      nextRank: Long): Unit =
    IndexSidecar.writeLong(spark, idxLake, idxTable, HwmFileName,
      "nextRank", nextRank)

  private def readEmitHwm(
      spark: SparkSession, idxLake: String, idxTable: String): Option[Long] =
    IndexSidecar.readLong(spark, idxLake, idxTable, EmitHwmFileName,
      "nextShard")

  private def writeEmitHwm(
      spark: SparkSession, idxLake: String, idxTable: String,
      nextShard: Long): Unit =
    IndexSidecar.writeLong(spark, idxLake, idxTable, EmitHwmFileName,
      "nextShard", nextShard)
}
