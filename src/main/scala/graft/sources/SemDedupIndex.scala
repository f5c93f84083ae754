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
  * never resurrect a dropped verdict; reconcile by re-creating the
  * index (a fresh epoch with newly frozen centroids) when drift
  * warrants.
  */
object SemDedupIndex {

  val ModelFileName = "_sem_model.json"

  final case class SemModel(
      k: Int, threshold: Double, cents: Array[Array[Double]])

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
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z"))
      : SemModel = {
    import spark.implicits._
    val cents = embFrame(
        graft.operators.AzofScan.scan(spark, srcLake, srcTable), vecCol)
      .orderBy(md5(concat(lit(salt + "#"), col("_id").cast("string"))),
        col("_id"))
      .limit(k)
      .select(col("_v")).as[Array[Double]].collect()
    require(cents.nonEmpty, "source corpus is empty — nothing to seed from")
    val model = SemModel(k, threshold, cents)
    AzofWriter.createTable(spark, idxLake, idxTable, VerdictSchema,
      segmentStart)
    writeModel(spark, idxLake, idxTable, model)
    model
  }

  /** Incrementally refresh verdicts from the source's commit feed
    * (AvailableNow by default). Exactly-once via the (appId, batchId)
    * replay index; a redelivered batch recomputes identical rows and
    * the commit is skipped.
    */
  def refresh(
      spark: SparkSession,
      srcLake: String, srcTable: String, vecCol: String,
      idxLake: String, idxTable: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val model = readModel(spark, idxLake, idxTable)
    val appId = AzofSink.appIdFor(checkpoint)
    spark.readStream.format("azof-commits")
      .option("table", srcTable).load(srcLake)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        AzofSink.commitBatch(idxLake, idxTable,
          verdictBatch(spark, batch, vecCol, model,
            srcLake, srcTable, idxLake, idxTable), id, appId)
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
        coalesce(col(TableSchema.KeyName).cast("long"),
          raise_error(concat(
            lit("SemDedupIndex.verdicts needs long-castable keys; got '"),
            col(TableSchema.KeyName), lit("'"))).cast("long")).as("vec_id"),
        col("cluster_id"), col("kept"))

  // ------------------------------------------------------------ batch

  /** One feed micro-batch → verdict upserts (batch docs), flips
    * (existing keeps a new lower-id doc dominates), tombstones.
    */
  private def verdictBatch(
      spark: SparkSession, batch: Dataset[Row], vecCol: String,
      model: SemModel,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String): DataFrame = {
    import spark.implicits._
    val data = batch.where(!col("_deleted"))
    // batch rows: per key keep the LAST version in the range (a key
    // committed twice in one range resolves to its newest event_time,
    // matching the source's per-key winner)
    val newest = data
      .select(col(TableSchema.KeyName).cast("long").as("_id"),
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
         val idxCur = graft.operators.AzofScan.scan(spark, idxLake, idxTable)
           .select(col(TableSchema.KeyName).cast("long").as("_id"),
             col(TableSchema.EventTimeName).as("_its"),
             col("cluster_id").as("_cid"), col("kept"))
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
    val newPairs = lowers
      .select(col("_id").as("vec_a"), col("_cid"),
        col("_v").as("_va"), col("_n").as("_na"))
      .join(assigned
        .select(col("_id").as("vec_b"), col("_cid"),
          col("_v").as("_vb"), col("_n").as("_nb")), Seq("_cid"))
      .where(col("vec_a") < col("vec_b"))
    val droppedNew = Similarity.cosineFilterPairs(newPairs, model.threshold)
      .select(col("vec_b").as("_id")).distinct()
    val verdictRows = assigned
      .join(droppedNew.withColumn("_dropped", lit(true)), Seq("_id"), "left")
      .select(col("_id").cast("string").as(TableSchema.KeyName),
        col("_ts").as(TableSchema.EventTimeName),
        col("_cid").as("cluster_id"),
        coalesce(!col("_dropped"), lit(true)).as("kept"),
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
      .where(col("vec_a") < col("vec_b"))
    val flips =
      if (marks.isNullAt(1)) emptyRows(spark)
      else Similarity.cosineFilterPairs(flipPairs, model.threshold)
        .select(col("vec_b").as("_id")).distinct()
        .join(existing.select(col("_id"), col("_its"), col("_cid")),
          Seq("_id"))
        .select(col("_id").cast("string").as(TableSchema.KeyName),
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

  /** `(_id, _v double[], _n)` from an azof scan's JSON vector column. */
  private def embFrame(src: DataFrame, vecCol: String): DataFrame =
    src.select(
        col(TableSchema.KeyName).cast("long").as("_id"),
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
      .as[(Long, java.sql.Timestamp, Array[Double])]
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
    spark.emptyDataset[(Long, java.sql.Timestamp, Long, Array[Double],
        Double, Boolean)]
      .toDF("_id", "_its", "_cid", "_v", "_n", "kept")
  }

  // ------------------------------------------------------- model sidecar

  private def writeModel(
      spark: SparkSession, idxLake: String, idxTable: String,
      model: SemModel): Unit = {
    val sb = new StringBuilder
    sb.append(s"""{"k":${model.k},"threshold":${model.threshold},"cents":[""")
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
    SemModel(root.get("k").asInt, root.get("threshold").asDouble, cents)
  }
}
