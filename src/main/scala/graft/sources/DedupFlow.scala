package graft.sources

import graft.format.{AzofTable, TableSchema}
import graft.operators.{AzofScan, Dedup}
import java.time.Instant
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The END-TO-END incremental near-duplicate pipeline over an azof
  * document table — the production crawl-batch flow that composes the
  * three persisted indexes:
  *
  * {{{
  *   source commits since last ingest          (azof batch CDC read)
  *     → signature catch-up                    (MinHashIndex.refresh)
  *     → churn-confined LSH candidate pairs    (candidatesTouching)
  *     → n-gram Jaccard verify ≥ threshold     (shingles of INVOLVED
  *                                              docs only)
  *     → component merge, changed labels only  (CcIndex.refreshWithPairs)
  * }}}
  *
  * Each [[ingest]] costs work proportional to the BATCH's neighborhood
  * — signatures for churned docs, pairs in churn-touched buckets,
  * shingles for pair-involved docs, component merges confined to
  * touched clusters — never a corpus-wide recompute. At 100 TB this is
  * the difference between "a crawl batch lands in minutes" and
  * "re-cluster five billion documents nightly".
  *
  * '''Cursor.''' The last-ingested source version rides as a one-line
  * sidecar (`_dedup_cursor.json`) in the components table dir, through
  * the Hadoop FS like every other table artifact. An ingest that finds
  * no new versions touches nothing and reports a no-op. The signature
  * catch-up is separately exactly-once through its own streaming
  * checkpoint, so a crash between the signature catch-up and the
  * component merge replays the CDC range idempotently: re-verified
  * pairs re-derive the same labels and [[CcIndex.refreshWithPairs]]
  * commits nothing when nothing changed.
  *
  * '''Monotonicity contract.''' Pair evidence accumulates: a doc
  * REVISION that breaks an old similarity does not split its
  * component (union-find-style dedup is merge-only — the standard
  * production posture), and a DELETE tombstones the doc's signature
  * (no future pairs) while its past merges stand. Serving handles
  * both: [[survivors]] elects each cluster's minimum LIVE doc, so
  * deleted canonicals hand off to the next member instead of dropping
  * their cluster. A corpus that needs splits re-clusters into a fresh
  * components table (an epoch rebuild) — cheap to run beside the live
  * one and swap.
  */
object DedupFlow {

  val CursorFileName = "_dedup_cursor.json"

  /** Churn/pair-count ceiling up to which [[ingest]] FORCES its
    * batch-derived join sides (churn ids, hot buckets, pair-involved
    * docs, CC batch vertices) to broadcast. 4M long keys ≈ 32 MB on the
    * driver — comfortably a broadcast. Past it the hints are withdrawn
    * and every batch-side join is a plain shuffle semi-join (AQE still
    * broadcasts what it MEASURES to be small): a steady-state crawl
    * batch keeps the fast path, while a BOOTSTRAP ingest over an
    * existing corpus — where the CDC range is the whole corpus and
    * `broadcast()` would be obeyed right into a driver OOM — degrades
    * to the shuffle shape that scales.
    */
  val DefaultBroadcastKeyMax: Long = 4L * 1000 * 1000

  /** What one [[ingest]] did: the CDC range consumed, and the funnel
    * row counts (churned keys → candidate pairs → verified pairs →
    * relabeled docs) — the observability a pipeline run reports.
    */
  final case class IngestReport(
      fromVersion: Long, toVersion: Long,
      churned: Long, candidates: Long, verified: Long, relabeled: Long) {
    def noop: Boolean = toVersion == fromVersion
  }

  /** Create the signature and components index tables a flow needs
    * (idempotent — a re-run against existing tables is a no-op, via
    * [[AzofWriter.createTableIfAbsent]]; `idxLake` holds both).
    */
  def create(
      spark: SparkSession, idxLake: String,
      sigTable: String = "minhash_sig",
      ccTable: String = "components",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z"),
      keyMap: Option[String] = None): Unit = {
    MinHashIndex.create(spark, idxLake, sigTable, segmentStart)
    CcIndex.create(spark, idxLake, ccTable, segmentStart)
    keyMap.foreach(km => KeyMap.create(spark, idxLake, km, segmentStart))
  }

  /** Ingest every source commit since the last ingest into the dedup
    * indexes: signature catch-up, churn-confined candidate generation,
    * Jaccard verification at `minJaccard`, component merge at event
    * time `at`. Returns the funnel report (a no-op report when the
    * source has no new versions). `retain >= 1` bounds the index
    * tables' version history after each ingest ([[vacuumIndexes]]).
    */
  def ingest(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String,
      checkpoint: String,
      at: Instant,
      sigTable: String = "minhash_sig",
      ccTable: String = "components",
      minJaccard: Double = 0.5,
      cap: Int = Dedup.DefaultBucketCap,
      broadcastKeyMax: Long = DefaultBroadcastKeyMax,
      retain: Int = 0,
      retainMinAgeMs: Long = AzofVacuum.DefaultMinAgeMs,
      keyMap: Option[String] = None): IngestReport = {
    val toVersion = AzofTable(spark, srcLake, srcTable).currentVersion.toLong
    // first ingest starts at the source's retained feed floor (the
    // `startVersion=earliest` resolution); afterwards the cursor is the
    // exclusive lower bound of the next CDC range
    val fromVersion = readCursor(spark, idxLake, ccTable).getOrElse(
      AzofChangeFeed.earliestFeedBase(spark, srcLake, srcTable))
    if (toVersion <= fromVersion)
      return IngestReport(fromVersion, fromVersion, 0L, 0L, 0L, 0L)

    // 1. signatures catch up (exactly-once via the streaming checkpoint)
    MinHashIndex.refresh(spark, srcLake, srcTable, textCol,
      idxLake, sigTable, checkpoint).awaitTermination()

    // 2. the batch's churn keys: every key in the CDC range — upserts
    // gain/lose/change signatures, deletes tombstone them; all three
    // can only create or retire pairs TOUCHING the key. changesFrom is
    // EXCLUSIVE (commits in (from, to]), so the cursor value itself is
    // the right lower bound.
    // with a keyMap the whole blocking/verify half runs on the RAW
    // source keys (the machinery is key-type-agnostic); numeric ids
    // appear only at the clustering boundary below
    val keyExpr =
      if (keyMap.isEmpty)
        coalesce(col(TableSchema.KeyName).try_cast("long"),
          raise_error(concat(
            lit("DedupFlow.ingest needs long-castable keys (got '"),
            col(TableSchema.KeyName),
            lit("') — pass keyMap = Some(table) for string-keyed " +
              "corpora"))).cast("long"))
      else col(TableSchema.KeyName)
    val churn = spark.read.format("azof")
      .option("table", srcTable)
      .option("changesFrom", fromVersion)
      .option("changesTo", toVersion)
      .load(srcLake)
      .select(keyExpr.as("id"))
      .distinct()
      // eager localCheckpoint, not persist: every stage below reuses
      // its predecessor SEVERAL times (pair emit × touch filter ×
      // jaccard join × CC edge symmetrization), so an uncut lineage
      // compounds multiplicatively and the plan itself becomes the
      // bottleneck (AQE renders plan strings per reoptimization)
      .localCheckpoint(true)
    val nChurn = churn.count()

    // 3. candidate pairs confined to churn-touched buckets, answered
    // from the persisted signatures (deleted docs' signatures are
    // tombstoned by step 1, so they emit no pairs). Broadcast hints are
    // gated on the MEASURED churn: a bootstrap ingest (churn = the
    // whole corpus) must not force corpus-sized broadcasts.
    val sigs =
      if (keyMap.isEmpty) MinHashIndex.signatures(spark, idxLake, sigTable)
      else MinHashIndex.signaturesRaw(spark, idxLake, sigTable)
    val cands = MinHashIndex.candidatesTouchingFrom(
      sigs, churn, cap,
      hintBroadcast = nChurn <= broadcastKeyMax).localCheckpoint(true)
    val nCands = cands.count()

    // 4. exact n-gram Jaccard over the candidates: re-shingle ONLY the
    // docs a candidate pair involves (semi-join narrows the source
    // scan before the shingle explode). The scan is pinned AS OF
    // `toVersion` — a writer racing past the cursor must not leak
    // future text into THIS ingest's verdicts (the next ingest owns
    // those commits); racing docs whose signatures already landed drop
    // out here via the inner sizes join and re-candidate as churn next
    // time.
    val involved = cands.select(col("doc_a").as("doc_id"))
      .unionAll(cands.select(col("doc_b").as("doc_id"))).distinct()
    val docs = spark.read.format("azof")
      .option("table", srcTable)
      .option("versionAsOf", toVersion.toString)
      .load(srcLake)
      .select(keyExpr.as("doc_id"), col(textCol))
      // involved ≤ 2·nCands ids — hint only when that bound is measured
      // small (bootstrap candidates can be corpus-scale)
      .join(if (nCands * 2 <= broadcastKeyMax) broadcast(involved)
            else involved,
        Seq("doc_id"), "left_semi")
    val verified = Dedup.ngramJaccard(
        cands, Dedup.shingles(docs, col(textCol), col("doc_id")))
      .where(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    val nVerified = verified.count()

    // 5. merge into the components index; advance the cursor only
    // after the merge committed (a crash in between replays this CDC
    // range, and the replayed merge is a no-op)
    val relabeled =
      if (nVerified == 0) 0L
      else CcIndex.refreshWithPairs(
        spark, idxLake, ccTable,
        mapPairsToIds(spark, idxLake, keyMap, verified, at),
        "doc_a", "doc_b", at,
        hintBroadcast = nVerified * 2 <= broadcastKeyMax)
    writeCursor(spark, idxLake, ccTable, toVersion)
    if (retain >= 1)
      vacuumIndexes(spark, idxLake, retain, sigTable, ccTable,
        retainMinAgeMs, keyMap)

    // Blocks.free, not Dataset.unpersist: these are localCheckpoint
    // frames, invisible to the CacheManager — plain unpersist would
    // silently leak one block set per stage per ingest
    graft.operators.Blocks.free(churn)
    graft.operators.Blocks.free(cands)
    graft.operators.Blocks.free(verified)
    IngestReport(fromVersion, toVersion, nChurn, nCands, nVerified, relabeled)
  }

  /** CONTINUOUS maintenance driver — the self-maintaining form of
    * [[ingest]], the way [[graft.streaming.AzofMirror]] is for
    * replication: a Structured Streaming query on the commit-exact
    * `azof-commits` source whose every micro-batch (a range of source
    * commits) triggers one full ingest pass. Instead of an external
    * scheduler invoking [[ingest]] per crawl batch, the indexes FOLLOW
    * the source table: `Trigger.AvailableNow` catches up and stops
    * (the cron shape), a processing-time trigger keeps following until
    * the query is stopped (the daemon shape).
    *
    * Exactly-once is LAYERED, which is what makes the wiring safe: the
    * outer stream's checkpoint only bounds WHEN ingests fire; the
    * ingest itself remains idempotent through its own cursor (a
    * replayed batch finds the cursor already advanced and no-ops) and
    * the signature catch-up through ITS streaming checkpoint — so a
    * crash anywhere replays harmlessly. The micro-batch's rows are
    * deliberately unused: [[ingest]] re-reads its CDC range from the
    * cursor, so the two offset systems can never disagree about what
    * was processed.
    *
    * `checkpoint` is the SIGNATURE catch-up checkpoint (the same one
    * [[ingest]] takes — share it with any interleaved manual ingests);
    * the outer stream's own checkpoint lives beside the components
    * table by default. Each pass stamps its index commits at the wall
    * clock of its trigger, and `retain` passes through to
    * [[vacuumIndexes]] so a long-running follow keeps bounded
    * snapshot history.
    *
    * `containTable` additionally refreshes a [[ContainIndex]] (in
    * `idxLake`, over the same source table and text column) each pass,
    * so ONE follow maintains both the near-dup family and the
    * asymmetric containment family. The same layering keeps it safe:
    * the containment refresh is idempotent through its own cursor, and
    * follow() runs one EAGER catch-up refresh before starting the
    * stream — a containment index enabled on an existing follow closes
    * its gap immediately, even though the reused outer checkpoint's
    * committed offsets would fire no batch until the next source
    * commit. `shardTable` and `seqTable` ride the driver the same
    * way — the persisted export membership ([[ShardMap]]) and packing
    * ([[SeqMap]]) mint slots/spans for each batch's new docs as they
    * land — and so does `lmTable` ([[LmIndex]]: the bigram stats
    * upsert their touched keys per pass; its streaming checkpoint IS
    * its cursor, so the layering stays replay-safe) and `mvTable` +
    * `mvView` (a [[MatView]] maintained per pass, the same
    * checkpoint-as-cursor rule). (SemDeDup follows
    * its own
    * embedding table as a sibling [[SemDedupIndex.refresh]] stream —
    * different source, same pattern — rather than riding this one.)
    *
    * `compactSourceEvery` / `compactSourceMaxFiles` extend the
    * self-maintenance to the SOURCE table itself: the driver folds it
    * (into `compactSourceFiles` files) after every N data-carrying
    * batches, or whenever its live file count exceeds the threshold —
    * see the layering note at the implementation.
    */
  def follow(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String,
      checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      followCheckpoint: Option[String] = None,
      sigTable: String = "minhash_sig",
      ccTable: String = "components",
      minJaccard: Double = 0.5,
      cap: Int = Dedup.DefaultBucketCap,
      broadcastKeyMax: Long = DefaultBroadcastKeyMax,
      retain: Int = 0,
      retainMinAgeMs: Long = AzofVacuum.DefaultMinAgeMs,
      keyMap: Option[String] = None,
      onReport: IngestReport => Unit = _ => (),
      containTable: Option[String] = None,
      containMinShared: Int = 3,
      containMaxDf: Int = 20,
      containMinContainment: Double = 0.9,
      containKeyed: Boolean = false,
      containPostings: Option[String] = None,
      onContainReport: ContainIndex.RefreshReport => Unit = _ => (),
      shardTable: Option[String] = None,
      onShardReport: ShardMap.RefreshReport => Unit = _ => (),
      seqTable: Option[String] = None,
      onSeqReport: SeqMap.RefreshReport => Unit = _ => (),
      lmTable: Option[String] = None,
      mvTable: Option[String] = None,
      mvView: Option[ViewDef] = None,
      termTable: Option[String] = None,
      jvTable: Option[String] = None,
      jvDef: Option[JoinViewDef] = None,
      jvDimTable: Option[String] = None,
      jvDimLake: Option[String] = None,
      compactSourceEvery: Int = 0,
      compactSourceMaxFiles: Int = 0,
      compactSourceFiles: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val outerCkpt = followCheckpoint.getOrElse(
      new Path(AzofTable(spark, idxLake, ccTable).tableDir,
        "_follow_checkpoint").toString)
    // SOURCE-table maintenance: under crawl cadence the source's live
    // file count grows one delta per micro-batch forever unless an
    // operator schedules CALL system.compact externally — the one
    // manual task the self-maintaining story used to leave. With
    // `compactSourceEvery = N` the driver folds the source after every
    // N data-carrying batches (and/or whenever the live file count
    // exceeds `compactSourceMaxFiles`), into `compactSourceFiles`
    // range-partitioned files (1 = single base). Safe by layering: the
    // fold is a `compact` commit, which the commit-exact feed SKIPS, so
    // every index cursor is unaffected; the fold's own commit surfaces
    // as one empty outer batch (churn 0), which never re-triggers a
    // fold — folds cannot self-oscillate. A fold losing its one-shot id
    // claim to a racing writer fails loudly per contract; here that is
    // routine maintenance, so it is logged and retried next batch.
    var batchesSinceFold = 0
    def maybeCompactSource(churned: Long): Unit = {
      if (churned > 0 && (compactSourceEvery > 0 || compactSourceMaxFiles > 0)) {
        batchesSinceFold += 1
        val live = AzofTable(spark, srcLake, srcTable)
          .currentSnapshot.dataFiles(graft.format.AsOf.Current).size
        val due =
          (compactSourceEvery > 0 && batchesSinceFold >= compactSourceEvery) ||
          (compactSourceMaxFiles > 0 && live > compactSourceMaxFiles)
        if (due && live > math.max(1, compactSourceFiles))
          try {
            AzofWriter.compact(spark, srcLake, srcTable, Instant.now(),
              numFiles = compactSourceFiles)
            batchesSinceFold = 0
          } catch {
            case scala.util.control.NonFatal(e) =>
              org.slf4j.LoggerFactory.getLogger(getClass).warn(
                s"source compaction of $srcTable lost its commit slot " +
                  s"(retrying next batch): ${e.getMessage}")
          }
      }
    }
    val reader = spark.readStream.format("azof-commits")
      .option("table", srcTable)
    def refreshContain(ct: String): ContainIndex.RefreshReport = {
      val cr = ContainIndex.refresh(spark, srcLake, srcTable,
        textCol, idxLake, ct, Instant.now(),
        minShared = containMinShared, maxDf = containMaxDf,
        minContainment = containMinContainment,
        broadcastKeyMax = broadcastKeyMax, keyed = containKeyed,
        postings = containPostings)
      if (retain > 0)
        AzofVacuum.vacuum(spark, idxLake, ct, retain,
          minAgeMs = retainMinAgeMs)
      onContainReport(cr)
      cr
    }
    def refreshShard(st: String): ShardMap.RefreshReport = {
      val sr = ShardMap.refresh(spark, srcLake, srcTable, idxLake, st,
        Instant.now())
      if (retain > 0)
        AzofVacuum.vacuum(spark, idxLake, st, retain,
          minAgeMs = retainMinAgeMs)
      onShardReport(sr)
      sr
    }
    def refreshSeq(st: String): SeqMap.RefreshReport = {
      val qr = SeqMap.refresh(spark, srcLake, srcTable, textCol,
        idxLake, st, Instant.now())
      if (retain > 0)
        AzofVacuum.vacuum(spark, idxLake, st, retain,
          minAgeMs = retainMinAgeMs)
      onSeqReport(qr)
      qr
    }
    // the LM stats ride the same driver through their OWN streaming
    // refresh (its checkpoint doubles as its cursor — the layering rule
    // from the scaladoc applies: a replayed pass no-ops)
    def refreshLm(lt: String): Unit = {
      val q = LmIndex.refresh(spark, srcLake, srcTable, textCol,
        idxLake, lt,
        new Path(AzofTable(spark, idxLake, lt).tableDir,
          "_refresh_checkpoint").toString)
      q.awaitTermination()
      if (retain > 0)
        AzofVacuum.vacuum(spark, idxLake, lt, retain,
          minAgeMs = retainMinAgeMs)
    }
    // materialized views ride the same way as the LM stats: their
    // streaming checkpoint doubles as their cursor, a replayed pass
    // no-ops through the stream_batches guard
    def refreshMv(mt: String): Unit = {
      val vd = mvView.getOrElse(throw new IllegalArgumentException(
        "follow(mvTable = ...) needs mvView (the ViewDef to maintain)"))
      val q = MatView.refresh(spark, srcLake, srcTable, idxLake, mt, vd,
        new Path(AzofTable(spark, idxLake, mt).tableDir,
          "_refresh_checkpoint").toString)
      q.awaitTermination()
      if (retain > 0)
        AzofVacuum.vacuum(spark, idxLake, mt, retain,
          minAgeMs = retainMinAgeMs)
    }
    // the inverted index rides like the LM stats and the views
    def refreshTerm(tt: String): Unit = {
      val q = TermIndex.refresh(spark, srcLake, srcTable, textCol,
        idxLake, tt,
        new Path(AzofTable(spark, idxLake, tt).tableDir,
          "_refresh_checkpoint").toString)
      q.awaitTermination()
      if (retain > 0)
        AzofVacuum.vacuum(spark, idxLake, tt, retain,
          minAgeMs = retainMinAgeMs)
    }
    // join views ride as synchronous refreshes (their cursor pair is
    // their replay guard); the followed source is the FACT side
    def refreshJv(jt: String): Unit = {
      val jd = jvDef.getOrElse(throw new IllegalArgumentException(
        "follow(jvTable = ...) needs jvDef"))
      val dt = jvDimTable.getOrElse(throw new IllegalArgumentException(
        "follow(jvTable = ...) needs jvDimTable"))
      JoinView.refresh(spark, srcLake, srcTable,
        Seq((jvDimLake.getOrElse(srcLake), dt)), idxLake, jt, jd,
        broadcastKeyMax = broadcastKeyMax)
      if (retain > 0)
        AzofVacuum.vacuum(spark, idxLake, jt, retain,
          minAgeMs = retainMinAgeMs)
      ()
    }
    // eager catch-up: an index enabled on an existing follow (outer
    // checkpoint already past the history) would wait for the next
    // source commit; each index's own cursor makes this a no-op
    // whenever it is already current
    lmTable.foreach(lt => LmIndex.create(spark, idxLake, lt))
    containTable.foreach(refreshContain)
    shardTable.foreach(refreshShard)
    seqTable.foreach(refreshSeq)
    lmTable.foreach(refreshLm)
    mvTable.foreach(refreshMv)
    termTable.foreach(refreshTerm)
    jvTable.foreach(refreshJv)
    // seed at the ingest cursor: commits the indexes already consumed
    // need not even surface as (ignored) outer batches
    val seeded = readCursor(spark, idxLake, ccTable)
      .fold(reader)(v => reader.option("startVersion", v.toString))
    seeded.load(srcLake)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", outerCkpt)
      .foreachBatch {
        (_: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          val r = ingest(spark, srcLake, srcTable, textCol, idxLake,
            checkpoint, Instant.now(), sigTable, ccTable, minJaccard,
            cap, broadcastKeyMax, retain, retainMinAgeMs, keyMap)
          onReport(r)
          containTable.foreach(refreshContain)
          shardTable.foreach(refreshShard)
          seqTable.foreach(refreshSeq)
          lmTable.foreach(refreshLm)
          mvTable.foreach(refreshMv)
          termTable.foreach(refreshTerm)
          jvTable.foreach(refreshJv)
          maybeCompactSource(r.churned)
      }
      .trigger(trigger)
      .start()
  }

  /** EPOCH REBUILD — the escape hatch from the monotone-merge
    * contract: pair evidence only accumulates under [[ingest]], so a
    * revision that BREAKS an old similarity (or a delete that empties
    * a cluster) never splits a component. Production systems reconcile
    * periodically; this re-clusters the CURRENT corpus from scratch —
    * candidates answered corpus-wide from the persisted signature
    * index (no re-shingling for signatures), Jaccard re-verified,
    * components recomputed — into a FRESH components table
    * (`newCcTable`), cursor seeded at the source version the rebuild
    * saw. The old epoch's table stays queryable (its own time travel
    * included) until vacuumed; serving swaps by table name. Labels
    * restart from the true current fixpoint, so post-rebuild ingests
    * merge against reconciled state.
    */
  def rebuildEpoch(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String,
      checkpoint: String,
      at: Instant,
      sigTable: String = "minhash_sig",
      newCcTable: String = "components_next",
      minJaccard: Double = 0.5,
      cap: Int = Dedup.DefaultBucketCap,
      keyMap: Option[String] = None): Long = {
    // a rebuild clusters into a FRESH table: merging into a previous
    // epoch's assignment would re-apply exactly the monotone history the
    // rebuild exists to drop — so an existing target is refused loudly
    // (before the expensive signature catch-up), not silently reused
    require(!AzofWriter.tableExists(spark, idxLake, newCcTable),
      s"epoch table '$newCcTable' already exists in $idxLake — pick an " +
        "unused epoch name (or remove the stale epoch) and re-run")
    val srcVersion = AzofTable(spark, srcLake, srcTable).currentVersion.toLong
    // signatures first: the rebuild must not cluster from signatures
    // older than the source version its cursor will claim (same
    // checkpoint as ingest — the catch-up is exactly-once either way)
    MinHashIndex.refresh(spark, srcLake, srcTable, textCol,
      idxLake, sigTable, checkpoint).awaitTermination()
    val sigs =
      if (keyMap.isEmpty) MinHashIndex.signatures(spark, idxLake, sigTable)
      else MinHashIndex.signaturesRaw(spark, idxLake, sigTable)
    val cands = Dedup.lshCandidates(sigs, MinHashIndex.NBands, cap)
      .localCheckpoint(true)
    val involved = cands.select(col("doc_a").as("doc_id"))
      .unionAll(cands.select(col("doc_b").as("doc_id"))).distinct()
    val keyExpr =
      if (keyMap.isEmpty) col(TableSchema.KeyName).cast("long")
      else col(TableSchema.KeyName)
    // pinned AS OF the version the new epoch's cursor will claim — a
    // racing writer must not leak post-cursor text into the rebuild
    val docs = spark.read.format("azof")
      .option("table", srcTable)
      .option("versionAsOf", srcVersion.toString)
      .load(srcLake)
      .select(keyExpr.as("doc_id"), col(textCol))
      .join(involved, Seq("doc_id"), "left_semi")
    val pairs = Dedup.ngramJaccard(
        cands, Dedup.shingles(docs, col(textCol), col("doc_id")))
      .where(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    CcIndex.create(spark, idxLake, newCcTable)
    // a rebuild's pair batch IS the corpus's full pair graph — never
    // force it to broadcast; AQE broadcasts what it measures small
    val n = CcIndex.refreshWithPairs(
      spark, idxLake, newCcTable,
      mapPairsToIds(spark, idxLake, keyMap, pairs, at),
      "doc_a", "doc_b", at,
      hintBroadcast = false)
    writeCursor(spark, idxLake, newCcTable, srcVersion)
    graft.operators.Blocks.free(cands)
    graft.operators.Blocks.free(pairs)
    n
  }

  /** Verified pairs → numeric CC edges. Native mode passes through;
    * keyed mode first MINTS surrogate ids for the pair-involved keys
    * ([[KeyMap.mint]] — the mapping grows with the near-dup
    * neighborhood, not the corpus) and then maps both endpoints. Both
    * joins are pair-bounded on one side, so AQE broadcasts them when
    * they measure small.
    */
  private def mapPairsToIds(
      spark: SparkSession, idxLake: String, keyMap: Option[String],
      verified: DataFrame, at: Instant): DataFrame = keyMap match {
    case None => verified
    case Some(km) =>
      KeyMap.mint(spark, idxLake, km,
        verified.select(col("doc_a").as("k"))
          .unionAll(verified.select(col("doc_b").as("k"))).distinct(),
        at)
      val m = KeyMap.ids(spark, idxLake, km)
      verified
        .join(m.select(col(TableSchema.KeyName).as("doc_a"),
          col("doc_id").as("_sa")), Seq("doc_a"))
        .join(m.select(col(TableSchema.KeyName).as("doc_b"),
          col("doc_id").as("_sb")), Seq("doc_b"))
        .select(col("_sa").as("doc_a"), col("_sb").as("doc_b"))
  }

  /** RETENTION for continuously-refreshed index tables: every ingest
    * commits a version to the signature and components tables, which at
    * hourly crawl cadence is ~9k snapshots/year/table — vacuum both
    * down to the `keepLast` trailing versions in one call. Wire it into
    * the flow with [[ingest]]'s `retain` knob (each committing ingest
    * then self-vacuums), or run it stand-alone on an operator's
    * maintenance cadence. Time travel over clustering generations
    * shrinks to the retained window — that is the point; epochs that
    * must stay auditable belong in a rebuilt table, not in an unbounded
    * version history. `minAgeMs` keeps the Delta-style in-flight-commit
    * guard (see [[AzofVacuum.DefaultMinAgeMs]]).
    */
  def vacuumIndexes(
      spark: SparkSession, idxLake: String, keepLast: Int,
      sigTable: String = "minhash_sig",
      ccTable: String = "components",
      minAgeMs: Long = AzofVacuum.DefaultMinAgeMs,
      keyMap: Option[String] = None): Unit = {
    AzofVacuum.vacuum(spark, idxLake, sigTable, keepLast,
      minAgeMs = minAgeMs)
    AzofVacuum.vacuum(spark, idxLake, ccTable, keepLast,
      minAgeMs = minAgeMs)
    // the surrogate key map commits a snapshot per minting batch and
    // is append-only CURRENT state — old versions carry no epoch
    // semantics, so it vacuums on the same knob
    keyMap.foreach(km => AzofVacuum.vacuum(spark, idxLake, km, keepLast,
      minAgeMs = minAgeMs))
    ()
  }

  /** The deduplicated corpus as of the index's last ingest: the
    * source's live docs with each cluster's minimum LIVE member as the
    * survivor ([[Dedup.keepCanonical]]'s election). One Current scan +
    * one join against the persisted assignment.
    */
  def survivors(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String, ccTable: String = "components"): DataFrame =
    Dedup.keepCanonical(
      AzofScan.scan(spark, srcLake, srcTable)
        .select(col(TableSchema.KeyName).cast("long").as("doc_id")),
      col("doc_id"),
      CcIndex.assignment(spark, idxLake, ccTable))

  /** [[survivors]] for a surrogate-keyed corpus: live keys join the
    * key map and the persisted assignment, and each component elects
    * its lexicographically-smallest LIVE key — id-AGNOSTIC, so the
    * verdict does not depend on minting order (only component
    * membership does, and that is connectivity, which ids cannot
    * change). Output: `(doc_key, is_canonical)` where `is_canonical`
    * marks clustered survivors (matching [[survivors]]' contract).
    * Deleted canonicals hand off to the next live key exactly like the
    * numeric path.
    */
  def survivorsKeyed(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String,
      keyMapTable: String = "key_map",
      ccTable: String = "components"): DataFrame = {
    val labeled = AzofScan.scan(spark, srcLake, srcTable)
      .select(col(TableSchema.KeyName).as("doc_key"))
      .join(KeyMap.ids(spark, idxLake, keyMapTable)
          .withColumnRenamed(TableSchema.KeyName, "doc_key"),
        Seq("doc_key"), "left")
      .join(CcIndex.assignment(spark, idxLake, ccTable),
        Seq("doc_id"), "left")
    val canon = labeled.where(col("component_id").isNotNull)
      .groupBy(col("component_id")).agg(min(col("doc_key")).as("_ck"))
    labeled.join(canon, Seq("component_id"), "left")
      .where(col("component_id").isNull || col("doc_key") === col("_ck"))
      .select(col("doc_key"),
        col("component_id").isNotNull.as("is_canonical"))
  }

  /** Apply the dedup verdict TO the corpus: tombstone-delete every live
    * doc the persisted indexes mark non-canonical — the step that turns
    * "survivors can be served" into "the table IS the deduplicated
    * corpus" (downstream consumers, exports, and the change feed then
    * see deletes as first-class events). One anti-join (live keys minus
    * served survivors) and one [[AzofWriter.commitDelete]]; history
    * before the apply still time-travels, and a later re-upload
    * resurrects a key exactly like any other delete. Idempotent: a
    * second apply over unchanged indexes deletes nothing and commits no
    * version. Returns the number of deleted keys.
    */
  /** @param semIndex additionally drop docs a persisted SemDeDup index
    *                  ([[SemDedupIndex]]) marks `kept = false` — the
    *                  p02 export gate's near-dup ∩ semantic composition
    *                  applied to the table itself. `(lake, table)` of
    *                  the verdict index; numeric or keyed mode is
    *                  auto-detected from its frozen model.
    * @param containIndex additionally drop the CONTAINED side of every
    *                  persisted containment pair ([[ContainIndex]]
    *                  `(lake, table)`): the excerpt drops, the
    *                  container stays; mutual containment keeps the
    *                  smaller key (the p04 rule). With this, one apply
    *                  composes all three dedup families — near-dup
    *                  clusters, semantic duplicates, and
    *                  quote/subset containment.
    * @param containThreshold containment at-or-above which a side
    *                  drops (pairs below it on BOTH sides are kept
    *                  pairs, not verdicts).
    */
  def applyVerdict(
      spark: SparkSession,
      srcLake: String, srcTable: String,
      idxLake: String,
      ccTable: String = "components",
      keyMapTable: Option[String] = None,
      semIndex: Option[(String, String)] = None,
      at: java.time.Instant = java.time.Instant.now(),
      containIndex: Option[(String, String)] = None,
      containThreshold: Double = 0.9,
      branch: Option[String] = None): Long = {
    val live = AzofScan.scan(spark, srcLake, srcTable)
      .select(col(TableSchema.KeyName))
    val keep = keyMapTable match {
      case Some(km) =>
        survivorsKeyed(spark, srcLake, srcTable, idxLake, km, ccTable)
          .select(col("doc_key").as(TableSchema.KeyName))
      case None =>
        survivors(spark, srcLake, srcTable, idxLake, ccTable)
          .select(col("doc_id").cast("string").as(TableSchema.KeyName))
    }
    val ccDrop = live.join(keep, Seq(TableSchema.KeyName), "left_anti")
    val withSem = semIndex match {
      case Some((sl, st)) =>
        val v = SemDedupIndex.verdictsAuto(spark, sl, st)
          .where(!col("kept"))
        val semKeys = v.select(
          (if (v.columns.contains("vec_key")) col("vec_key")
          else col("vec_id").cast("string")).as(TableSchema.KeyName))
        ccDrop.unionByName(
          live.join(semKeys, Seq(TableSchema.KeyName), "left_semi"))
      case None => ccDrop
    }
    val drop = (containIndex match {
      case Some((cl, ct)) =>
        val t = containThreshold
        val sides = ContainIndex.pairsKeyed(spark, cl, ct)
          .where(greatest(col("cont_a"), col("cont_b")) >= t)
          .select(
            when(col("cont_a") >= t && col("cont_b") >= t, col("doc_b"))
              .when(col("cont_a") >= t, col("doc_a"))
              .otherwise(col("doc_b")).as(TableSchema.KeyName),
            when(col("cont_a") >= t && col("cont_b") >= t, col("doc_a"))
              .when(col("cont_a") >= t, col("doc_b"))
              .otherwise(col("doc_a")).as("_container"))
        // the CONTAINER must be LIVE for its excerpt to drop: a stale
        // pair whose container was deleted or rolled back (the feed
        // skips rollback, so the index cannot have retired it yet)
        // would otherwise tombstone the corpus's ONLY remaining copy
        // of that content
        val containKeys = sides
          .join(live.select(col(TableSchema.KeyName).as("_container")),
            Seq("_container"), "left_semi")
          .select(col(TableSchema.KeyName))
        withSem.unionByName(
          live.join(containKeys, Seq(TableSchema.KeyName), "left_semi"))
          .distinct()
      case None => if (semIndex.isEmpty) withSem else withSem.distinct()
    }).persist()
    try {
      val n = drop.count()
      // `branch` stages the takedown for audit-then-publish: the drop
      // set is still computed against MAIN's live corpus (the branch
      // forks at main's head), but the tombstones land on the branch —
      // size them with publish_preview, then fast-forward
      if (n > 0)
        AzofWriter.commitDelete(spark, srcLake, srcTable, drop, at, branch)
      n
    } finally { drop.unpersist(); () }
  }

  // ------------------------------------------------------ cursor sidecar

  private def cursorPath(
      spark: SparkSession, idxLake: String, ccTable: String): Path =
    new Path(AzofTable(spark, idxLake, ccTable).tableDir, CursorFileName)

  def readCursor(
      spark: SparkSession, idxLake: String, ccTable: String): Option[Long] = {
    val p = cursorPath(spark, idxLake, ccTable)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      Some(root.get("sourceVersion").asLong)
    }
  }

  private[sources] def writeCursor(
      spark: SparkSession, idxLake: String, ccTable: String,
      version: Long): Unit = {
    val p = cursorPath(spark, idxLake, ccTable)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true) // overwrite: the cursor only advances
    try out.write(s"""{"sourceVersion":$version}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
