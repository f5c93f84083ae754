package graft.sources

import graft.format.{AzofTable, ColumnDef, ColumnType, TableSchema}
import graft.operators.Similarity
import graft.streaming.AzofSink
import java.time.Instant
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** PERSISTED SemDeDup verdict index over an azof-tabled embedding
  * corpus — the EMBEDDING-modality member of the incremental index
  * family ([[MinHashIndex]] signatures, [[CcIndex]] components,
  * [[PqIndex]] codes): `(vec_id → cluster_id, kept)` as an azof table,
  * refreshed incrementally from the source's commit feed so a crawl
  * batch's semantic-dedup verdicts land without re-clustering the
  * corpus.
  *
  * '''Frozen model.''' [[graft.operators.Dedup.semDedup]]'s seed
  * centroids are corpus-dependent (salted-md5 order over all ids), so
  * an index that re-seeded per refresh would reshuffle every cluster.
  * [[create]] freezes the centroids (and the cosine threshold) from
  * the source's THEN-CURRENT corpus into a `_sem_model.json` sidecar —
  * the [[PqIndex]] train-once contract; refreshes assign against the
  * frozen model only.
  *
  * '''The verdict-flip.''' SemDeDup's rule is order-anchored: doc `i`
  * drops iff a LOWER-id same-cluster doc has cosine ≥ eps. New docs
  * usually carry higher ids (crawls append), but a late-arriving
  * LOWER-id doc must flip existing keeps to drops. Each refresh batch
  * therefore commits (a) verdicts for the batch's docs — against
  * lower-id docs in the index AND within the batch — and (b) flips of
  * existing kept docs that a new lower-id batch doc now dominates.
  * Verdicts only harden (kept → dropped, never back), so commits carry
  * the batch's rows plus actual flips, never a table rewrite.
  *
  * '''Exactness.''' Same-cluster comparisons read the SOURCE as of the
  * batch's max commit version (the feed tags `_commit_version`), so a
  * live follower racing new commits stays commit-exact. Comparison
  * cost is confined to the batch's TOUCHED clusters by a broadcast
  * semi-join — the per-batch analogue of SemDeDup's per-cluster
  * quadratic (linear overall when k scales with N).
  *
  * Monotone contract (same as [[DedupFlow]]): revisions and deletes
  * never resurrect a dropped verdict — a batch verdict is ANDed with
  * the key's existing one, so a revised doc whose new vector escapes
  * its old dominator stays dropped. Reconcile with [[rebuildEpoch]]: a
  * fresh epoch (newly frozen centroids, one-shot verdicts over the
  * CURRENT corpus, refresh cursor seeded at the rebuild's source
  * version) beside the old one; serving swaps by table name.
  */
object SemDedupIndex {

  val ModelFileName = "_sem_model.json"
  val CursorFileName = "_sem_cursor.json"

  final case class SemModel(
      k: Int, threshold: Double, cents: Array[Array[Double]],
      keyed: Boolean = false)

  /** Per-refresh-batch quadratic-risk signal — the [[graft.operators
    * .Dedup.bucketPairsObserved]] analogue for the within-cluster
    * compare: SemDeDup's per-cluster cost is quadratic BY DEFINITION
    * (linear overall only when k scales with N — see docs/SCALE.md), so
    * a k frozen too small for a grown corpus surfaces here as a mega
    * touched-cluster long before it surfaces as a runaway refresh.
    * `pairComparisons` is the pair-join input volume
    * Σ,,touched c,, |comparison docs in c| · |batch docs in c|.
    */
  final case class RefreshStats(
      batchDocs: Long, touchedClusters: Long, maxTouchedCluster: Long,
      pairComparisons: Long)

  val VerdictSchema: TableSchema = TableSchema(Seq(
    ColumnDef("cluster_id", ColumnType.AzInt, nullable = false),
    ColumnDef("kept", ColumnType.AzBoolean, nullable = false)))

  /** Create the index table and freeze its model: `k` seed centroids
    * in salted-md5 order over the source's current vectors (ties to
    * the lower id — bit-identical to [[graft.operators.Dedup.semDedup]]
    * with `lloydIters = 0` semantics) plus the verdict threshold.
    */
  def create(
      spark: SparkSession,
      srcLake: String, srcTable: String, vecCol: String,
      idxLake: String, idxTable: String,
      k: Int, threshold: Double, salt: String = "sem",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z"),
      keyed: Boolean = false)
      : SemModel = {
    import spark.implicits._
    val cents = embFrame(
        graft.operators.AzofScan.scan(spark, srcLake, srcTable), vecCol)
      .orderBy(md5(concat(lit(salt + "#"), col("_id"))),
        ordered(col("_id"), keyed))
      .limit(k)
      .select(col("_v")).as[Array[Double]].collect()
    require(cents.nonEmpty, "source corpus is empty — nothing to seed from")
    val model = SemModel(k, threshold, cents, keyed)
    AzofWriter.createTable(spark, idxLake, idxTable, VerdictSchema,
      segmentStart)
    writeModel(spark, idxLake, idxTable, model)
    model
  }

  /** Incrementally refresh verdicts from the source's commit feed
    * (AvailableNow by default). Exactly-once via the (appId, batchId)
    * replay index; a redelivered batch recomputes identical rows and
    * the commit is skipped. An index built by [[rebuildEpoch]] carries a
    * cursor sidecar naming the source version the rebuild verdicted —
    * a FRESH checkpoint then starts the feed there instead of replaying
    * pre-rebuild history (an existing checkpoint's offsets always win).
    * `onStats` fires once per micro-batch with the quadratic-risk
    * signal ([[RefreshStats]]).
    */
  def refresh(
      spark: SparkSession,
      srcLake: String, srcTable: String, vecCol: String,
      idxLake: String, idxTable: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      onStats: RefreshStats => Unit = _ => (),
      retain: Int = 0,
      retainMinAgeMs: Long = AzofVacuum.DefaultMinAgeMs): StreamingQuery = {
    val model = readModel(spark, idxLake, idxTable)
    val appId = AzofSink.appIdFor(checkpoint)
    val reader = spark.readStream.format("azof-commits")
      .option("table", srcTable)
    val seeded = readCursor(spark, idxLake, idxTable)
      .fold(reader)(v => reader.option("startVersion", v.toString))
    seeded.load(srcLake)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val rows = verdictBatch(spark, batch, vecCol, model,
          srcLake, srcTable, idxLake, idxTable, onStats)
        val committed = AzofSink.commitBatch(idxLake, idxTable,
          rows, id, appId)
        // release verdictBatch's internal checkpoints (assignment,
        // index state, comparison subtree) — per-batch orphans
        // otherwise
        graft.operators.Blocks.freeReferenced(rows)
        // retention: a continuously-refreshed verdict table otherwise
        // accretes one snapshot per batch forever ([[DedupFlow
        // .vacuumIndexes]] is the flow-level twin)
        if (committed && retain >= 1)
          AzofVacuum.vacuum(spark, idxLake, idxTable, retain,
            minAgeMs = retainMinAgeMs)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** The index's current verdicts as the `(vec_id, cluster_id, kept)`
    * frame — the d14 shape, served from the persisted table.
    */
  def verdicts(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame =
    graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(
        coalesce(col(TableSchema.KeyName).try_cast("long"),
          raise_error(concat(
            lit("SemDedupIndex.verdicts needs long-castable keys; got '"),
            col(TableSchema.KeyName),
            lit("' — use verdictsKeyed for a keyed-mode index")))
            .cast("long")).as("vec_id"),
        col("cluster_id"), col("kept"))

  /** [[verdicts]] for a string-keyed (keyed-mode) index: the raw key is
    * the identity — `(vec_key, cluster_id, kept)`.
    */
  def verdictsKeyed(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame =
    graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(col(TableSchema.KeyName).as("vec_key"),
        col("cluster_id"), col("kept"))

  /** Serve by the index's own frozen mode: [[verdictsKeyed]] when the
    * model sidecar says keyed, [[verdicts]] otherwise — the CLI seam.
    */
  def verdictsAuto(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame =
    if (readModel(spark, idxLake, idxTable).keyed)
      verdictsKeyed(spark, idxLake, idxTable)
    else verdicts(spark, idxLake, idxTable)

  // ------------------------------------------------------------ batch

  /** One feed micro-batch → verdict upserts (batch docs), flips
    * (existing keeps a new lower-id doc dominates), tombstones.
    */
  private def verdictBatch(
      spark: SparkSession, batch: Dataset[Row], vecCol: String,
      model: SemModel,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String,
      onStats: RefreshStats => Unit = _ => ()): DataFrame = {
    import spark.implicits._
    val data = batch.where(!col("_deleted"))
    // batch rows: per key keep the LAST version in the range (a key
    // committed twice in one range resolves to its newest event_time,
    // matching the source's per-key winner)
    val newest = data
      .select(col(TableSchema.KeyName).as("_id"),
        col(TableSchema.EventTimeName).as("_ts"),
        from_json(col(vecCol), ArrayType(DoubleType)).as("_v"),
        col("_commit_version"))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("_id")
          .orderBy(col("_ts").desc, col("_commit_version").desc)))
      .where(col("_rn") === 1)
      .drop("_rn")
    if (batch.isEmpty) return emptyRows(spark)
    val assigned = assign(spark, newest, model).localCheckpoint(true)

    // one driver action for both batch markers (max commit version for
    // the as-of pin, max event_time for flip rows)
    val marks = batch.agg(max(col("_commit_version")),
      max(col(TableSchema.EventTimeName))).collect()(0)

    // the index's current rows, read once: comparison state for
    // `existing` below, and the old verdicts the monotone AND consults
    val idxCur = graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(col(TableSchema.KeyName).as("_id"),
        col(TableSchema.EventTimeName).as("_its"),
        col("cluster_id").as("_cid"), col("kept"))

    // commit-exact comparison state: the source AS OF the batch's max
    // version, restricted to the batch's touched clusters, with
    // clusters taken from the INDEX (assignments are frozen-model
    // deterministic, but reading them back avoids re-assigning the
    // whole corpus per batch)
    val existing: DataFrame =
      (if (marks.isNullAt(0)) emptyAssigned(spark)
       else {
         val srcAsOf = spark.read.format("azof")
           .option("table", srcTable)
           .option("versionAsOf", marks.getLong(0).toString)
           .load(srcLake)
         val touched = assigned.select(col("_cid")).distinct()
         embFrame(srcAsOf, vecCol)
           .join(idxCur, Seq("_id"))
           .join(broadcast(touched), Seq("_cid"), "left_semi")
           // the batch's own keys compare through their BATCH vectors
           .join(assigned.select(col("_id")), Seq("_id"), "left_anti")
       })
      // three consumers below (batch-verdict pairs, flip pairs, the
      // flip join-back) — cut the scan+3-join subtree once
      .localCheckpoint(true)

    // verdicts for the batch's docs: dropped iff a lower-id
    // same-cluster doc (existing or earlier in this batch) has
    // cosine ≥ threshold
    val lowers = existing
      .select(col("_id"), col("_cid"), col("_v"), col("_n"))
      .unionByName(assigned
        .select(col("_id"), col("_cid"), col("_v"), col("_n")))

    // quadratic-risk observability, BEFORE the expensive joins run: one
    // tiny aggregation over the two already-checkpointed inputs (no
    // recompute) reports the batch's touched-cluster sizes and the pair
    // volume the compare joins are about to move — the signal that k
    // was frozen too small for the corpus (see [[RefreshStats]])
    val st = lowers.groupBy("_cid").agg(count(lit(1)).as("_n"))
      .join(assigned.groupBy("_cid").agg(count(lit(1)).as("_bn")),
        Seq("_cid"))
      .agg(coalesce(sum(col("_bn")), lit(0L)).as("batch_docs"),
        count(lit(1)).as("touched_clusters"),
        coalesce(max(col("_n")), lit(0L)).as("max_touched_cluster"),
        coalesce(sum(col("_n") * col("_bn")), lit(0L)).as("comparisons"))
      .collect()(0)
    onStats(RefreshStats(st.getLong(0), st.getLong(1), st.getLong(2),
      st.getLong(3)))

    val newPairs = lowers
      .select(col("_id").as("vec_a"), col("_cid"),
        col("_v").as("_va"), col("_n").as("_na"))
      .join(assigned
        .select(col("_id").as("vec_b"), col("_cid"),
          col("_v").as("_vb"), col("_n").as("_nb")), Seq("_cid"))
      .where(ordered(col("vec_a"), model.keyed) <
        ordered(col("vec_b"), model.keyed))
      // listener-visible exact comparison count (the bucketPairs
      // observe-metric pattern) — rides the commit action, no extra job
      .observe("sem_cmp_new", count(lit(1)).as("comparisons"))
    val droppedNew = Similarity.cosineFilterPairsStr(newPairs, model.threshold)
      .select(col("vec_b").as("_id")).distinct()
    val verdictRows = assigned
      .join(droppedNew.withColumn("_dropped", lit(true)), Seq("_id"), "left")
      // the monotone contract made revision-proof: the fresh verdict is
      // ANDed with the key's existing one, so a revised doc whose new
      // vector escapes its old dominator cannot resurrect kept=true —
      // only rebuildEpoch reconciles
      .join(idxCur.select(col("_id"), col("kept").as("_old_kept")),
        Seq("_id"), "left")
      .select(col("_id").as(TableSchema.KeyName),
        col("_ts").as(TableSchema.EventTimeName),
        col("_cid").as("cluster_id"),
        (coalesce(!col("_dropped"), lit(true)) &&
          coalesce(col("_old_kept"), lit(true))).as("kept"),
        lit(null).cast("boolean").as(TableSchema.DeletedName))

    // flips: existing KEPT docs now dominated by a lower-id batch doc.
    // The flip row's event_time must WIN the per-key merge against the
    // row it replaces, whatever that row carried — greatest(old ts,
    // batch max ts); at equal ts the later commit's file precedence
    // breaks the tie toward the flip.
    val flipPairs = assigned
      .select(col("_id").as("vec_a"), col("_cid"),
        col("_v").as("_va"), col("_n").as("_na"))
      .join(existing.where(col("kept"))
        .select(col("_id").as("vec_b"), col("_cid"),
          col("_v").as("_vb"), col("_n").as("_nb")), Seq("_cid"))
      .where(ordered(col("vec_a"), model.keyed) <
        ordered(col("vec_b"), model.keyed))
      .observe("sem_cmp_flip", count(lit(1)).as("comparisons"))
    val flips =
      if (marks.isNullAt(1)) emptyRows(spark)
      else Similarity.cosineFilterPairsStr(flipPairs, model.threshold)
        .select(col("vec_b").as("_id")).distinct()
        .join(existing.select(col("_id"), col("_its"), col("_cid")),
          Seq("_id"))
        .select(col("_id").as(TableSchema.KeyName),
          greatest(col("_its"), lit(marks.getTimestamp(1)))
            .as(TableSchema.EventTimeName),
          col("_cid").as("cluster_id"),
          lit(false).as("kept"),
          lit(null).cast("boolean").as(TableSchema.DeletedName))

    val tombs = batch.where(col("_deleted"))
      .select(col(TableSchema.KeyName), col(TableSchema.EventTimeName),
        lit(null).cast("long").as("cluster_id"),
        lit(null).cast("boolean").as("kept"),
        lit(true).as(TableSchema.DeletedName))
      // only keys the index holds (the MinHashIndex tombstone guard)
      .join(graft.operators.AzofScan.scan(spark, idxLake, idxTable)
          .select(col(TableSchema.KeyName)),
        Seq(TableSchema.KeyName), "left_semi")

    verdictRows.unionByName(flips).unionByName(tombs)
  }

  /** The DOMINANCE order on document ids — the "lower id wins" in
    * SemDeDup's verdict rule, frozen with the model: NUMERIC for
    * long-castable keys (the paper's order, d14/d17's oracle-pinned
    * semantics; a non-castable key fails LOUDLY — a silent null would
    * vanish from the pair joins and read as "kept"), LEXICOGRAPHIC on
    * the raw key for keyed corpora (URLs/UUIDs/hashes — the
    * [[DedupFlow]] `survivorsKeyed` min-key convention). A single
    * mixed rule ("numeric when castable else string") is NOT a total
    * order ("2" < "10" numerically but "10" < "1z" < "2" as strings —
    * a cycle), which is why the mode is explicit and frozen.
    */
  private def ordered(c: org.apache.spark.sql.Column, keyed: Boolean)
      : org.apache.spark.sql.Column =
    if (keyed) c
    else coalesce(c.try_cast("long"),
      raise_error(concat(
        lit("SemDedupIndex: non-long-castable key '"), c,
        lit("' in a NUMERIC-dominance index — create the index with " +
          "keyed = true for string-keyed corpora"))).cast("long"))

  /** `(_id, _v double[], _n)` from an azof scan's JSON vector column. */
  private def embFrame(src: DataFrame, vecCol: String): DataFrame =
    src.select(
        col(TableSchema.KeyName).as("_id"),
        from_json(col(vecCol), ArrayType(DoubleType)).as("_v"))
      .withColumn("_n", sqrt(aggregate(col("_v"), lit(0.0d),
        (acc, x) => acc + x * x)))

  /** Frozen-centroid argmin assignment — the
    * [[graft.operators.Dedup.semDedup]] kernel (strict less-than,
    * ties to the lower centroid index), zero shuffle.
    */
  private def assign(
      spark: SparkSession, newest: DataFrame, model: SemModel): DataFrame = {
    import spark.implicits._
    val centB = spark.sparkContext.broadcast(model.cents)
    newest
      .select(col("_id"), col("_ts"), col("_v"))
      .as[(String, java.sql.Timestamp, Array[Double])]
      .mapPartitions { it =>
        val cs = centB.value
        it.map { case (vid, ts, v) =>
          var best = 0
          var bestD = Double.PositiveInfinity
          var c = 0
          while (c < cs.length) {
            val cv = cs(c)
            var acc = 0.0
            var j = 0
            while (j < v.length) {
              val d = v(j) - cv(j); acc += d * d; j += 1
            }
            if (acc < bestD) { bestD = acc; best = c }
            c += 1
          }
          var n = 0.0
          var j = 0
          while (j < v.length) { n += v(j) * v(j); j += 1 }
          (vid, ts, best.toLong, v, math.sqrt(n))
        }
      }
      .toDF("_id", "_ts", "_cid", "_v", "_n")
  }

  private def emptyRows(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(String, java.sql.Timestamp, java.lang.Long,
        java.lang.Boolean, java.lang.Boolean)]
      .toDF(TableSchema.KeyName, TableSchema.EventTimeName,
        "cluster_id", "kept", TableSchema.DeletedName)
  }

  private def emptyAssigned(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.emptyDataset[(String, java.sql.Timestamp, Long, Array[Double],
        Double, Boolean)]
      .toDF("_id", "_its", "_cid", "_v", "_n", "kept")
  }

  /** EPOCH REBUILD — the [[DedupFlow.rebuildEpoch]] counterpart for the
    * verdict index, and the one reconciliation for everything the
    * monotone contract refuses: dropped verdicts whose dominator was
    * deleted or drifted away, and a `k` frozen too small for the grown
    * corpus ([[RefreshStats]]'s signal). One call: freeze a NEW model
    * from the source's CURRENT vectors into a FRESH index table,
    * verdict that corpus one-shot against it (the per-batch kernel run
    * once with the whole pinned corpus as the batch and an empty
    * index), and seed the refresh cursor at the source version the
    * rebuild saw — a follow-up [[refresh]] with a fresh checkpoint
    * continues from there instead of replaying pre-rebuild history.
    * The old epoch stays fully queryable (its time travel included)
    * until vacuumed; serving swaps by table name. Returns the new
    * frozen model.
    */
  def rebuildEpoch(
      spark: SparkSession,
      srcLake: String, srcTable: String, vecCol: String,
      idxLake: String, newIdxTable: String,
      k: Int, threshold: Double, salt: String = "sem",
      onStats: RefreshStats => Unit = _ => (),
      keyed: Boolean = false): SemModel = {
    require(!AzofWriter.tableExists(spark, idxLake, newIdxTable),
      s"epoch table '$newIdxTable' already exists in $idxLake — pick an " +
        "unused epoch name (or remove the stale epoch) and re-run")
    val model = create(spark, srcLake, srcTable, vecCol,
      idxLake, newIdxTable, k, threshold, salt, keyed = keyed)
    // pin AFTER create: the pinned corpus is ≥ what seeding saw (seeds
    // are a model, not a verdict), and everything past the pin belongs
    // to the first post-rebuild refresh
    val srcVersion = AzofTable(spark, srcLake, srcTable).currentVersion.toLong
    val snap = spark.read.format("azof")
      .option("table", srcTable)
      .option("versionAsOf", srcVersion.toString)
      .load(srcLake)
      .withColumn("_deleted", lit(false))
      .withColumn("_commit_version", lit(srcVersion))
    val rows = verdictBatch(spark, snap, vecCol, model,
      srcLake, srcTable, idxLake, newIdxTable, onStats)
    AzofSink.commitBatch(idxLake, newIdxTable, rows,
      batchId = 0L, appId = s"sem-rebuild-$newIdxTable")
    graft.operators.Blocks.freeReferenced(rows)
    writeCursor(spark, idxLake, newIdxTable, srcVersion)
    model
  }

  // ------------------------------------------------------ cursor sidecar

  private def cursorPath(
      spark: SparkSession, idxLake: String, idxTable: String): Path =
    new Path(AzofTable(spark, idxLake, idxTable).tableDir, CursorFileName)

  /** The source version a [[rebuildEpoch]] verdicted up to (absent on
    * indexes built by create+refresh alone).
    */
  def readCursor(
      spark: SparkSession, idxLake: String, idxTable: String): Option[Long] = {
    val p = cursorPath(spark, idxLake, idxTable)
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

  private def writeCursor(
      spark: SparkSession, idxLake: String, idxTable: String,
      version: Long): Unit = {
    val p = cursorPath(spark, idxLake, idxTable)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(s"""{"sourceVersion":$version}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  // ------------------------------------------------------- model sidecar

  private def writeModel(
      spark: SparkSession, idxLake: String, idxTable: String,
      model: SemModel): Unit = {
    val sb = new StringBuilder
    sb.append(s"""{"k":${model.k},"threshold":${model.threshold},""")
    sb.append(s""""keyed":${model.keyed},"cents":[""")
    model.cents.zipWithIndex.foreach { case (cv, ci) =>
      if (ci > 0) sb.append(',')
      sb.append(cv.map(java.lang.Double.toString).mkString("[", ",", "]"))
    }
    sb.append("]}")
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val p = new Path(dir, ModelFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, false) // the model freezes once, at create
    try out.write(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def readModel(
      spark: SparkSession, idxLake: String, idxTable: String): SemModel = {
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val p = new Path(dir, ModelFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"$p missing — not a SemDeDup index table (create() freezes the model)")
    val in = fs.open(p)
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    val cents = (0 until root.get("cents").size).map { c =>
      val cn = root.get("cents").get(c)
      Array.tabulate(cn.size)(j => cn.get(j).asDouble)
    }.toArray
    SemModel(root.get("k").asInt, root.get("threshold").asDouble, cents,
      keyed = Option(root.get("keyed")).exists(_.asBoolean))
  }
}
