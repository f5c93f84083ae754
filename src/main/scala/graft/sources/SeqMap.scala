package graft.sources

import graft.format.{AzofTable, ColumnDef, ColumnType, TableSchema}
import graft.operators.{AzofScan, Blocks, Packing, TextAnalysis}
import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED incremental sequence packing — [[ShardMap]]'s
  * token-granular sibling, the amortized twin of
  * [[Packing.packSequences]]/[[Packing.emitSequences]]. One-shot
  * packing concatenates the corpus in salted-hash order and cuts
  * `budget`-token sequences; gapless token offsets mean one added
  * document shifts every later sequence, so a one-shot re-export
  * re-cuts the whole corpus. Here a document's token span
  * `[tok_offset, tok_offset + n_tokens)` is minted ONCE — each refresh
  * ranks the CDC range's new docs by the same `pack#<salt>#` hash
  * order and appends their spans after the token high-water mark, so
  * the first refresh reproduces the one-shot assignment exactly and
  * sequences already emitted never move.
  *
  * '''Frozen content via time travel.''' `n_tokens` is counted from
  * the text AS OF the refresh's pinned source version, and each map
  * row records that version as its `epoch`. [[emitSequences]] reads
  * every doc's text `versionAsOf` its epoch, so:
  *
  *  - a doc REVISED after minting keeps its original span AND its
  *    original text in the artifact (the export is a frozen cut; a
  *    re-cut is an epoch rebuild, not an in-place patch);
  *  - a doc DELETED after minting still emits — time travel to its
  *    epoch sees it (tombstones only affect later versions);
  *  - a doc PURGED (physical GDPR erase rewrites history) vanishes
  *    even as-of its epoch, leaving a HOLE: its sequences come up
  *    short, exactly the erase-everywhere contract purge promises.
  *
  * Sidecars follow the family rules: `budget`+`salt` freeze in the
  * model at [[create]]; the token HWM reserves each range pre-commit
  * (crash ⇒ a token gap — short sequences — never overlapping spans);
  * the emission cursor makes sequence artifacts write-once.
  */
object SeqMap {

  val ModelFileName = "_seq_model.json"
  val HwmFileName = "_seq_hwm.json"
  val EmitHwmFileName = "_seq_emit_hwm.json"

  val MapSchema: TableSchema = TableSchema(Seq(
    ColumnDef("tok_offset", ColumnType.AzInt, nullable = false),
    ColumnDef("n_tokens", ColumnType.AzInt, nullable = false),
    ColumnDef("epoch", ColumnType.AzInt, nullable = false)))

  final case class Model(budget: Long, salt: String)

  final case class RefreshReport(
      fromVersion: Long, toVersion: Long,
      churned: Long, assigned: Long, nextToken: Long) {
    def noop: Boolean = toVersion == fromVersion
  }

  final case class EmitReport(
      fromSeq: Long, untilSeq: Long, sequences: Long,
      flushedPartial: Boolean) {
    def noop: Boolean = untilSeq == fromSeq && !flushedPartial
  }

  def create(
      spark: SparkSession,
      idxLake: String, idxTable: String = "seq_map",
      budget: Long = 2048L, salt: String = "s1",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Model = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val created = AzofWriter.createTableIfAbsent(
      spark, idxLake, idxTable, MapSchema, segmentStart)
    if (created) writeModel(spark, idxLake, idxTable, Model(budget, salt))
    readModel(spark, idxLake, idxTable)
  }

  /** The full persisted assignment with the derived sequence range:
    * `(<key>, n_tokens, tok_offset, start_seq, end_seq, n_seqs,
    * epoch)` — [[Packing.packSequences]]' columns plus the epoch.
    */
  def assignment(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame = {
    val b = readModel(spark, idxLake, idxTable).budget
    AzofScan.scan(spark, idxLake, idxTable)
      .select(col(TableSchema.KeyName), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div ${b}L").as("start_seq"),
        expr(s"(tok_offset + n_tokens - 1) div ${b}L").as("end_seq"),
        col("epoch"))
      .withColumn("n_seqs", col("end_seq") - col("start_seq") + 1)
  }

  /** [[assignment]] ∩ the LIVE corpus (the [[ShardMap.liveAssignment]]
    * serving shape). Offsets stay frozen — a deleted doc's span is
    * simply absent from the listing, not reclaimed.
    */
  def liveAssignment(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String): DataFrame =
    assignment(spark, idxLake, idxTable)
      .join(AzofScan.scan(spark, srcLake, srcTable)
          .select(col(TableSchema.KeyName)),
        Seq(TableSchema.KeyName), "left_semi")

  /** Mint token spans for every key the CDC range added that has none
    * yet, counting tokens from the text at the range's pinned source
    * version. Cursor-idempotent like every index refresh.
    */
  def refresh(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, idxTable: String = "seq_map",
      at: Instant = Instant.now()): RefreshReport = {
    val model = readModel(spark, idxLake, idxTable)
    val toVersion = AzofTable(spark, srcLake, srcTable).currentVersion.toLong
    val fromVersion = DedupFlow.readCursor(spark, idxLake, idxTable)
      .getOrElse(AzofChangeFeed.earliestFeedBase(spark, srcLake, srcTable))
    if (toVersion <= fromVersion)
      return RefreshReport(fromVersion, fromVersion, 0L, 0L,
        readHwm(spark, idxLake, idxTable, HwmFileName, "nextToken")
          .getOrElse(0L))

    // churn: every key the range touched (checkpointed once — the
    // report counter must not re-run the CDC read). The inner join
    // against the PINNED as-of view is both the liveness rule (a key
    // absent at toVersion — dead per event-time precedence, the
    // engine's own scan semantics — mints nothing) and the text
    // source: exactly what the epoch will re-read at emission, so the
    // counted and emitted tokens cannot drift.
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
          .select(col(TableSchema.KeyName), col(textCol)),
        Seq(TableSchema.KeyName))
      .where(col(textCol).isNotNull)
      .select(col(TableSchema.KeyName),
        size(TextAnalysis.words(col(textCol))).cast("long").as("n_tokens"))
      .localCheckpoint(true)
    val nChurn = churn.count()
    val nFresh = fresh.count()
    var next = readHwm(spark, idxLake, idxTable, HwmFileName, "nextToken")
      .getOrElse(
        AzofScan.scan(spark, idxLake, idxTable)
          .agg(coalesce(max(col("tok_offset") + col("n_tokens")), lit(0L)))
          .collect()(0).getLong(0))
    if (nFresh > 0) {
      val base = next
      val batchTokens = fresh.agg(sum(col("n_tokens")))
        .collect()(0).getLong(0)
      next = base + batchTokens
      // reserve the token range FIRST (crash ⇒ gap, never overlap)
      writeHwm(spark, idxLake, idxTable, HwmFileName, "nextToken", next)
      val rows = Packing.prefixSum(
        fresh
          .withColumn("_h", Packing.orderHash(s"pack#${model.salt}#",
            col(TableSchema.KeyName)))
          .withColumn("_tid", col(TableSchema.KeyName))
          .withColumn("_w", col("n_tokens")))
        .select(col(TableSchema.KeyName),
          lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName),
          (lit(base) + col("_prefix")).as("tok_offset"),
          col("n_tokens"),
          lit(toVersion).as("epoch"))
      AzofWriter.commitDelta(spark, idxLake, idxTable, rows, at, at,
        op = Some("seq-assign"))
    }
    DedupFlow.writeCursor(spark, idxLake, idxTable, toVersion)
    Blocks.free(churn); Blocks.free(fresh)
    RefreshReport(fromVersion, toVersion, nChurn, nFresh, next)
  }

  /** Materialize the sequences that became COMPLETE since the last
    * emission: each doc's text is read AS OF its mint epoch (the
    * frozen cut — see the class doc for the revise/delete/purge
    * contract), tokens land at their absolute positions, and exactly
    * the sequences in `[emit-cursor, nextToken div budget)` group out
    * as `(seq_id, seq_text, n_tokens)` appended under `outDir`.
    * `flush = true` also cuts the trailing partial sequence (terminal
    * export; the cursor does not advance past it).
    *
    * Backlog-bounded by construction: a long-idle flush spanning many
    * epochs proceeds in SLICES of at most `maxEpochsPerEmit` epochs —
    * token offsets are epoch-monotone (each refresh mints from the
    * running HWM), so capping the epoch span is capping a token
    * prefix, and each slice advances the cursor before the next (a
    * crash resumes at the next slice; each slice owns its own
    * `emit=<from>` partition, so the idempotence story is per-slice).
    * Within a slice, each epoch's as-of read is KEY-CONFINED to that
    * epoch's touching docs (key-stats point reads) when the touching
    * set is measured small — emission I/O is touching-doc-bounded,
    * never corpus × epochs.
    */
  def emitSequences(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, idxTable: String,
      outDir: String, flush: Boolean = false,
      maxEpochsPerEmit: Int = 32,
      broadcastKeyMax: Long = DedupFlow.DefaultBroadcastKeyMax): EmitReport = {
    require(maxEpochsPerEmit >= 1, "maxEpochsPerEmit must be >= 1")
    val model = readModel(spark, idxLake, idxTable)
    val nextTok = readHwm(spark, idxLake, idxTable, HwmFileName, "nextToken")
      .getOrElse(
        // token-HWM sidecar lost: recover from the map like refresh
        // does (emission must not silently stall at seq 0 forever)
        AzofScan.scan(spark, idxLake, idxTable)
          .agg(coalesce(max(col("tok_offset") + col("n_tokens")), lit(0L)))
          .collect()(0).getLong(0))
    val complete = nextTok / model.budget
    val first = readHwm(spark, idxLake, idxTable, EmitHwmFileName, "nextSeq")
      .getOrElse(0L)
    var from = first
    var total = 0L
    var lastPartial = false
    var done = false
    while (!done) {
      val untilAll = math.max(from, complete)
      val partialWanted = flush && nextTok % model.budget != 0
      if (untilAll == from && !partialWanted) done = true
      else {
        val lo = from * model.budget
        val hiAll = if (partialWanted) nextTok else untilAll * model.budget
        val touchingAll = AzofScan.scan(spark, idxLake, idxTable)
          .where(col("tok_offset") < hiAll &&
            col("tok_offset") + col("n_tokens") > lo)
          .select(col(TableSchema.KeyName), col("tok_offset"),
            col("n_tokens"), col("epoch"))
          .localCheckpoint(true)
        val epochsAll = touchingAll.select("epoch").distinct()
          .collect().map(_.getLong(0)).sorted
        // slice cut: keep at most maxEpochsPerEmit epochs; offsets are
        // epoch-monotone, so the excluded epochs' minimum offset bounds
        // the slice's token prefix. A single sequence spanning more
        // epochs than the cap forces one over-cap slice (progress wins)
        val (hi, until, partial, capped) =
          if (epochsAll.length <= maxEpochsPerEmit)
            (hiAll, untilAll, partialWanted, false)
          else {
            val cutEpoch = epochsAll(maxEpochsPerEmit)
            val cutTok = touchingAll.where(col("epoch") >= cutEpoch)
              .agg(min(col("tok_offset"))).collect()(0).getLong(0)
            val u = math.max(from + 1, cutTok / model.budget)
            // the cut landing past the last COMPLETE sequence means the
            // remainder is the partial tail — final (uncapped) pass
            if (u > untilAll) (hiAll, untilAll, partialWanted, false)
            else (u * model.budget, u, false, true)
          }
        val touching = touchingAll
          .where(col("tok_offset") < hi &&
            col("tok_offset") + col("n_tokens") > lo)
          .select(col(TableSchema.KeyName), col("tok_offset"), col("epoch"))
          .localCheckpoint(true)
        // one as-of read per touched epoch in THIS slice, each confined
        // to its own docs via key-stats point reads when the touching
        // set fits the driver budget (bootstrap catch-ups fall back to
        // the join shape). A token range with NO map rows (the
        // crash-gap a reserved-but-uncommitted mint leaves) emits
        // nothing for those positions but still advances the cursor —
        // short/empty sequences, never a wedged export.
        val nTouch = touching.count()
        val keysByEpoch: Map[Long, Set[String]] =
          if (nTouch <= broadcastKeyMax)
            touching.select(col("epoch"), col(TableSchema.KeyName))
              .collect()
              .groupBy(_.getLong(0))
              .map { case (e, rs) => e -> rs.map(_.getString(1)).toSet }
          else Map.empty
        val epochs = touching.select("epoch").distinct()
          .collect().map(_.getLong(0)).sorted
        val srcT = graft.format.AzofTable(spark, srcLake, srcTable)
        val nSeqs =
          if (epochs.isEmpty) 0L
          else {
            val perEpoch = epochs.map { e =>
              val docsE = keysByEpoch.get(e) match {
                case Some(ks) =>
                  AzofScan.scanSnapshot(spark, srcT,
                    srcT.snapshot(e.toString), graft.format.AsOf.Current,
                    projection = Some(Set(TableSchema.KeyName, textCol)),
                    keyFilter = Some(graft.format.KeyFilter.Keys(ks)))
                case None =>
                  spark.read.format("azof")
                    .option("table", srcTable)
                    .option("versionAsOf", e.toString)
                    .load(srcLake)
                    .select(col(TableSchema.KeyName), col(textCol))
              }
              docsE
                .select(col(TableSchema.KeyName), col(textCol))
                .join(touching.where(col("epoch") === e)
                    .select(col(TableSchema.KeyName), col("tok_offset")),
                  Seq(TableSchema.KeyName))
            }
            val rows = perEpoch.reduce(_ unionAll _)
              .select(col("tok_offset"),
                posexplode(TextAnalysis.words(col(textCol)))
                  .as(Seq("_p", "_tok")))
              .withColumn("_tp", col("tok_offset") + col("_p"))
              .where(col("_tp") >= lo && col("_tp") < hi)
              .withColumn("seq_id", expr(s"_tp div ${model.budget}L"))
              .groupBy("seq_id")
              .agg(
                array_join(transform(
                  array_sort(collect_list(struct(col("_tp"), col("_tok")))),
                  x => x("_tok")), " ").as("seq_text"),
                count(lit(1)).as("n_tokens"))
              .withColumn("emit", lit(from))
              .localCheckpoint(true)
            val n = rows.count()
            // each slice owns its emit=<from> partition exclusively, so
            // a crash between this write and the cursor replays into a
            // DYNAMIC overwrite of the same partition — idempotent,
            // never duplicated rows. (A flushed partial lives in its
            // range's partition; growing the corpus after a flush
            // re-cuts that sequence into the NEXT partition, which is
            // why flush stays documented as the terminal cut.)
            rows.write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy("emit").parquet(outDir)
            Blocks.free(rows)
            n
          }
        writeHwm(spark, idxLake, idxTable, EmitHwmFileName, "nextSeq", until)
        Blocks.free(touching); Blocks.free(touchingAll)
        total += nSeqs
        from = until
        lastPartial = partial
        if (!capped) done = true
      }
    }
    EmitReport(first, from, total, flushedPartial = lastPartial)
  }

  // ----------------------------------------- sidecars (via IndexSidecar)

  def readModel(
      spark: SparkSession, idxLake: String, idxTable: String): Model = {
    val root = IndexSidecar.readNode(spark, idxLake, idxTable, ModelFileName)
      .getOrElse(throw new IllegalArgumentException(
        s"no $ModelFileName beside $idxTable — create() the seq map first"))
    Model(root.get("budget").asLong, root.get("salt").asText)
  }

  private def writeModel(
      spark: SparkSession, idxLake: String, idxTable: String,
      m: Model): Unit = {
    val salt = new com.fasterxml.jackson.databind.ObjectMapper()
      .writeValueAsString(m.salt)
    IndexSidecar.writeOnce(spark, idxLake, idxTable, ModelFileName,
      s"""{"budget":${m.budget},"salt":$salt}""")
  }

  private def readHwm(
      spark: SparkSession, idxLake: String, idxTable: String,
      file: String, field: String): Option[Long] =
    IndexSidecar.readLong(spark, idxLake, idxTable, file, field)

  private def writeHwm(
      spark: SparkSession, idxLake: String, idxTable: String,
      file: String, field: String, value: Long): Unit =
    IndexSidecar.writeLong(spark, idxLake, idxTable, file, field, value)
}
