package graft.sources

import graft.format.{AzofTable, ColumnDef, ColumnType, TableSchema}
import graft.streaming.AzofSink
import graft.operators.Similarity
import graft.operators.Similarity.PqModel
import java.time.Instant
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** PERSISTED product-quantization code index over an azof-tabled
  * embedding corpus — the amortization a 100-TB pipeline needs: instead
  * of re-encoding every vector on every search job
  * ([[Similarity.pqTopK]] recomputes codes from scratch per call), the
  * codes live as an azof table keyed by the source's doc id and refresh
  * INCREMENTALLY from the source's commit-exact change feed
  * (`azof-commits` → encode-the-changed-rows → exactly-once
  * [[AzofSink.commitBatch]]). Everything the writer stack already
  * provides composes for free: time travel over index states, vacuum,
  * mirroring of the index itself, tombstone deletes following source
  * deletes.
  *
  * '''Model freezing.''' Codebooks are trained ONCE at [[create]] from
  * the source's then-current vectors and frozen in a `_pq_model.json`
  * sidecar in the index table dir — the FAISS train-once contract.
  * Refreshes encode against the frozen model, so codes stay comparable
  * across index versions (a retrained codebook would silently change
  * every unchanged vector's meaning). With `lloydIters = 0` (the
  * default here) the model is the md5-deterministic seed sample:
  * fully replayable by any engine, which is what puts the s07 oracle
  * row on this surface.
  *
  * '''Scale shape.''' Training scans the source once (seed is a
  * TakeOrdered over md5 rank; each optional Lloyd pass is one narrow
  * scan with tiny partial-sum shuffles). A refresh touches ONLY the
  * changed rows of the commit range — the encode kernel is a narrow
  * map over the feed's single scan, and the commit is one delta file.
  * Search ([[topK]]) scans the CODES (numSub bytes/vector, 32×
  * smaller than the raw floats at the defaults) with broadcast ADC
  * tables — the raw vector table is touched only by an optional
  * refine join.
  *
  * The source table stores vectors as JSON double arrays (azof columns
  * are scalar): doubles round-trip exactly through shortest-repr JSON,
  * so codes from the JSON path equal codes from the original float
  * embeddings cast to double.
  */
object PqIndex {

  /** Index-table value schema: the code word as a comma-joined decimal
    * string (engine-portable and oracle-checkable; numSub bytes of
    * payload at the defaults).
    */
  val CodesSchema: TableSchema = TableSchema(Seq(
    ColumnDef("codes", ColumnType.AzString, nullable = false)))

  val ModelFileName = "_pq_model.json"

  /** Create the index table and freeze its model, trained on the
    * SOURCE's current vectors. The index starts empty — run [[refresh]]
    * with `startVersion` defaulted (everything after source creation)
    * to backfill; subsequent refreshes are incremental from the
    * checkpoint.
    */
  def create(
      spark: SparkSession,
      srcLake: String, srcTable: String, vecCol: String,
      idxLake: String, idxTable: String,
      numSub: Int, codebookBits: Int, lloydIters: Int = 0,
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): PqModel = {
    val cur = graft.operators.AzofScan.scan(spark, srcLake, srcTable)
    val e = cur.select(
      col(TableSchema.KeyName).cast("long").as("_id"),
      from_json(col(vecCol), ArrayType(DoubleType)).as("_v"))
    val model = Similarity.pqTrain(e, numSub, codebookBits, lloydIters)
    AzofWriter.createTable(spark, idxLake, idxTable, CodesSchema, segmentStart)
    writeModel(spark, idxLake, idxTable, model)
    model
  }

  /** Incrementally refresh the index from the source's commit feed:
    * one streaming query (AvailableNow by default — drains what exists
    * and stops; pass a processing-time trigger for a live follower).
    * Upserts encode against the frozen model and land with their
    * SOURCE event_times, so per-key winners resolve in the index
    * exactly as in the source; source tombstones propagate as index
    * tombstones. Exactly-once end to end via the (appId, batchId)
    * replay index; a source schema change fails loudly through the
    * azof-commits pin.
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
          encodeBatch(batch, vecCol, model), id, appId)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** Encode one feed micro-batch: data rows → code strings through the
    * SHARED kernel ([[Similarity.encodeOne]] — the same object code
    * [[Similarity.pqEncode]] runs, so persisted codes ≡ recomputed
    * codes by construction), tombstone rows → index tombstones.
    */
  private def encodeBatch(
      batch: Dataset[Row], vecCol: String, model: PqModel): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    val booksB = spark.sparkContext.broadcast(model.books)
    val enc = batch.where(!col("_deleted"))
      .select(col(TableSchema.KeyName), col(TableSchema.EventTimeName),
        from_json(col(vecCol), ArrayType(DoubleType)).as("_v"))
      .as[(String, java.sql.Timestamp, Array[Double])]
      .mapPartitions { it =>
        val bs = booksB.value
        it.map { case (key, ts, v) =>
          (key, ts, Similarity.encodeOne(bs, v)
            .map(b => (b & 0xff).toString).mkString(","))
        }
      }
      .toDF(TableSchema.KeyName, TableSchema.EventTimeName, "codes")
      .withColumn(TableSchema.DeletedName, lit(null).cast("boolean"))
    val tombs = batch.where(col("_deleted"))
      .select(col(TableSchema.KeyName), col(TableSchema.EventTimeName),
        lit(null).cast("string").as("codes"),
        lit(true).as(TableSchema.DeletedName))
    enc.unionAll(tombs)
  }

  /** The index's current codes as the `(_id, _codes)` frame
    * [[Similarity.pqSearchBatch]] consumes. The ANN surface addresses
    * vectors by NUMERIC id (like every Similarity entry point), so keys
    * must cast to long here; string-keyed corpora can still store and
    * refresh codes and run their own search over the `codes` column.
    */
  def codesFrame(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame = {
    import spark.implicits._
    graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(coalesce(col(TableSchema.KeyName).try_cast("long"),
        raise_error(concat(
          lit("PqIndex search needs long-castable keys; got '"),
          col(TableSchema.KeyName), lit("'"))).cast("long")).as("_id"),
        col("codes"))
      .as[(Long, String)]
      .map { case (id, cs) => (id, cs.split(",").map(_.toInt.toByte)) }
      .toDF("_id", "_codes")
  }

  /** ADC top-k answered FROM the persisted index — no re-encoding, the
    * raw vector table untouched unless `rerank > 0` (then `rawVectors`
    * must supply the `(_id, _v)` frame for the exact refine join).
    */
  def topK(
      spark: SparkSession, idxLake: String, idxTable: String,
      queries: Array[(Long, Array[Double])], k: Int,
      rerank: Int = 0, rawVectors: Option[DataFrame] = None): DataFrame = {
    require(rerank <= 0 || rawVectors.nonEmpty,
      "rerank > 0 needs rawVectors for the exact refine join")
    val model = readModel(spark, idxLake, idxTable)
    Similarity.pqSearchBatch(
      rawVectors.getOrElse(spark.emptyDataFrame),
      codesFrame(spark, idxLake, idxTable), model, queries, k, rerank)
  }

  // ------------------------------------------------------- model sidecar

  /** The frozen model rides as JSON in the index table dir, through the
    * Hadoop FS like every other table artifact (object-store safe).
    * Doubles print shortest-repr, which round-trips exactly.
    */
  private def writeModel(
      spark: SparkSession, idxLake: String, idxTable: String,
      model: PqModel): Unit = {
    val sb = new StringBuilder
    sb.append(s"""{"numSub":${model.numSub},"subDim":${model.subDim},"books":[""")
    model.books.zipWithIndex.foreach { case (book, bi) =>
      if (bi > 0) sb.append(',')
      sb.append('[')
      book.zipWithIndex.foreach { case (cv, ci) =>
        if (ci > 0) sb.append(',')
        sb.append(cv.map(java.lang.Double.toString).mkString("[", ",", "]"))
      }
      sb.append(']')
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
      spark: SparkSession, idxLake: String, idxTable: String): PqModel = {
    val dir = AzofTable(spark, idxLake, idxTable).tableDir
    val p = new Path(dir, ModelFileName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(p),
      s"$p missing — not a PQ index table (create() writes the frozen model)")
    val in = fs.open(p)
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
      finally in.close()
    val books = (0 until root.get("books").size).map { s =>
      val bn = root.get("books").get(s)
      (0 until bn.size).map { c =>
        val cn = bn.get(c)
        Array.tabulate(cn.size)(j => cn.get(j).asDouble)
      }.toArray
    }.toArray
    PqModel(root.get("numSub").asInt, root.get("subDim").asInt, books)
  }
}
