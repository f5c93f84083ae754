package graft.sources

import graft.format.{AzofTable, ColumnDef, ColumnType, TableSchema}
import graft.operators.Dedup
import graft.streaming.AzofSink
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** PERSISTED MinHash-LSH signature index over an azof-tabled document
  * corpus — the signatures companion of [[PqIndex]]: a 100-TB dedup
  * pipeline re-runs candidate generation on every ingest batch, and
  * the expensive half (shingle → k minhashes → banded signatures, a
  * full-corpus scan + aggregation) is a pure per-document function —
  * so it amortizes as an azof table keyed by doc id, refreshed
  * INCREMENTALLY from the source's commit-exact change feed. Candidate
  * pairs for the WHOLE corpus then come from one scan of the (tiny)
  * signature table through the same bucket-grouped pair emit as d02
  * ([[candidates]]), never from re-shingling the documents.
  *
  * No frozen model is needed: the minhash family
  * ([[Dedup.minhashCoefs]]) is a fixed md5-derived constant, so
  * signatures are comparable across engines and index versions by
  * construction (the property the s08 oracle row checks end to end).
  *
  * Documents with fewer than 3 words have NO 3-gram shingle and thus
  * no signature (d02 drops them identically). A refresh handles the
  * shrinking-document edge: an upserted doc that no longer yields a
  * signature gets an index TOMBSTONE, so its stale signature cannot
  * keep generating candidates. Source deletes propagate as tombstones
  * the same way.
  */
object MinHashIndex {

  val K = 8
  val BandSize = 2
  val NBands: Int = K / BandSize

  /** Index-table value schema: the four band signatures (the only part
    * candidate generation needs), engine-portable strings.
    */
  val SigSchema: TableSchema = TableSchema(
    (0 until NBands).map(b =>
      ColumnDef(s"band_$b", ColumnType.AzString, nullable = false)))

  def create(
      spark: SparkSession,
      idxLake: String, idxTable: String,
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    AzofWriter.createTableIfAbsent(
      spark, idxLake, idxTable, SigSchema, segmentStart)
    ()
  }

  /** Incrementally refresh from the source's commit feed (AvailableNow
    * by default). `textCol` names the source's document-text column.
    */
  def refresh(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, idxTable: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val appId = AzofSink.appIdFor(checkpoint)
    spark.readStream.format("azof-commits")
      .option("table", srcTable).load(srcLake)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val rows = signBatch(spark, batch, textCol, idxLake, idxTable)
        AzofSink.commitBatch(idxLake, idxTable, rows, id, appId)
        // release signBatch's internal checkpoint — one orphaned
        // block set per micro-batch otherwise (a live follower never
        // GCs them fast enough to matter)
        graft.operators.Blocks.freeReferenced(rows)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** One feed micro-batch → signature upserts + tombstones. The
    * signature pipeline is the EXPRESSION form ([[Dedup.shingles]] →
    * [[Dedup.minhashSignatures]]) because the batch keys on a
    * (key, event_time) STRUCT; live d02 runs the per-document kernel
    * ([[Dedup.minhashBands]]), and the two are pinned bit-identical by
    * DedupSpec's randomized kernel ≡ expression property — the s08
    * oracle row then holds the persisted-index ≡ d02 equivalence end
    * to end. Run over the batch's rows only, so the aggregation
    * shuffles batch-sized data. Tombstones: source deletes AND
    * upserted docs that no longer yield a signature (< 3 words).
    */
  private def signBatch(
      spark: SparkSession, batch: Dataset[Row], textCol: String,
      idxLake: String, idxTable: String): DataFrame = {
    // one feed batch can carry SEVERAL versions of a key (several
    // commits in range), so the signature pipeline keys on
    // (key, event_time) — grouping on the key alone would merge the
    // versions' shingle sets into one bogus signature
    val kv = struct(col(TableSchema.KeyName), col(TableSchema.EventTimeName))
    val data = batch.where(!col("_deleted"))
      .select(kv.as("_kv"), col(textCol))
    // the signature aggregation feeds THREE consumers below (signed,
    // the unsignable anti-join, the knownKeys union) — checkpoint it
    // eagerly so the shingle→minhash work runs once per micro-batch,
    // not once per consumer (the Similarity.pqTopK codes pattern)
    val sigs = Dedup.minhashSignatures(
      Dedup.shingles(data, col(textCol), col("_kv")), K, BandSize)
      .localCheckpoint(true)
    def unpack(c: String) = Seq(
      col(s"$c.${TableSchema.KeyName}").as(TableSchema.KeyName),
      col(s"$c.${TableSchema.EventTimeName}").as(TableSchema.EventTimeName))
    val signed = sigs.select(unpack("doc_id") ++
      (0 until NBands).map(b => col(s"band_$b")) :+
      lit(null).cast("boolean").as(TableSchema.DeletedName): _*)
    def tombs(rows: DataFrame, c: String) = rows
      .select(unpack(c) ++
        (0 until NBands).map(b => lit(null).cast("string").as(s"band_$b")) :+
        lit(true).as(TableSchema.DeletedName): _*)
    // a tombstone only matters for keys the index could actually be
    // holding: ones in its Current scan, or ones SIGNED EARLIER IN
    // THIS BATCH (an upsert-then-shrink pair in one range — Current
    // cannot see those yet). Without this filter, a corpus full of
    // <3-word docs floods the index with tombstones for keys that
    // never had a signature, flipping every scan into the
    // marker-resolution path for nothing.
    val knownKeys = graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(col(TableSchema.KeyName))
      .unionAll(signed.select(col(TableSchema.KeyName)))
    val unsignable = tombs(
      data.join(sigs.withColumnRenamed("doc_id", "_kv"), Seq("_kv"),
        "left_anti"), "_kv")
    val deleted = tombs(batch.where(col("_deleted"))
      .select(kv.as("_kv")), "_kv")
    signed.unionAll(
      unsignable.unionAll(deleted)
        .join(knownKeys, Seq(TableSchema.KeyName), "left_semi"))
  }

  /** The index's current signatures as the `(doc_id, band_0..)` frame
    * the LSH blockers consume. The blocker surface addresses docs by
    * NUMERIC id, so keys must cast to long — a non-numeric key fails
    * LOUDLY here (a silent null doc_id would vanish from the pair
    * emit and read as "no candidates"); string-keyed corpora can
    * still store/refresh signatures and run their own blocking over
    * the band columns.
    */
  def signatures(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame =
    graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(coalesce(col(TableSchema.KeyName).try_cast("long"),
        raise_error(concat(
          lit("MinHashIndex.signatures needs long-castable keys; got '"),
          col(TableSchema.KeyName), lit("'"))).cast("long")).as("doc_id") +:
        (0 until NBands).map(b => col(s"band_$b")): _*)

  /** The current signatures keyed by the RAW source key
    * (`doc_id` string, `band_*`) — the frame the surrogate-keyed flow
    * blocks on: the bucket machinery is key-type-agnostic, so URL/UUID
    * corpora run candidate generation on their own keys and only map
    * to numeric ids at the clustering boundary ([[KeyMap]]).
    */
  def signaturesRaw(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame =
    graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(col(TableSchema.KeyName).as("doc_id") +:
        (0 until NBands).map(b => col(s"band_$b")): _*)

  /** d02-shaped LSH candidate pairs for the WHOLE corpus, answered
    * FROM the persisted signatures — one scan of the signature table,
    * no document re-shingling.
    */
  def candidates(
      spark: SparkSession, idxLake: String, idxTable: String,
      cap: Int = Dedup.DefaultBucketCap): DataFrame =
    Dedup.lshCandidates(signatures(spark, idxLake, idxTable), NBands, cap)

  /** Candidate pairs TOUCHING a churn set, answered from the persisted
    * signatures — the incremental-ingest shape: after a crawl batch
    * lands, only pairs with a churned endpoint can be NEW, so pair
    * generation is confined to the buckets a churned doc occupies.
    * `churn` is a one-column frame of numeric doc ids.
    *
    * Two prunes against the full bucket build: (1) the signature scan
    * keeps only buckets CONTAINING a churned doc (semi-join on the
    * band cell), so the sort/collect shuffle moves churn-neighborhood
    * rows, not the corpus; (2) the pair emit keeps only pairs with a
    * churned endpoint — within-bucket pairs among old members were
    * emitted by earlier ingests.
    *
    * '''`hintBroadcast`''' — whether to FORCE the churn/hot-bucket
    * sides to broadcast. A steady-state crawl batch is genuinely small
    * and the hint skips three shuffles; but `broadcast()` is obeyed
    * regardless of size, and on a BOOTSTRAP ingest (first run against a
    * populated source, where churn = the whole corpus) a forced
    * broadcast is a driver/executor OOM at scale. Callers that measured
    * the churn (e.g. [[DedupFlow.ingest]]'s `nChurn` action) pass
    * `false` past their threshold and the joins fall back to plain
    * shuffle semi-joins, with AQE still free to broadcast what it
    * MEASURES to be small.
    *
    * Boundary (by cap design): the per-bucket cap keeps the SMALLEST
    * `cap` ids, so a capped bucket's pair set can differ between
    * one-shot and incremental builds when more than `cap` docs share a
    * bucket; [[Dedup.bucketPairsObserved]]'s `dropped_ids` is the
    * production signal that the cap actually bit.
    */
  def candidatesTouching(
      spark: SparkSession, idxLake: String, idxTable: String,
      churn: DataFrame,
      cap: Int = Dedup.DefaultBucketCap,
      hintBroadcast: Boolean = true): DataFrame =
    candidatesTouchingFrom(
      signatures(spark, idxLake, idxTable), churn, cap, hintBroadcast)

  /** [[candidatesTouching]] over a caller-supplied `(doc_id, band_*)`
    * signatures frame — the seam the surrogate-keyed flow uses (its
    * doc ids come from a key-map join, not a cast).
    */
  def candidatesTouchingFrom(
      sigs: DataFrame,
      churn: DataFrame,
      cap: Int = Dedup.DefaultBucketCap,
      hintBroadcast: Boolean = true): DataFrame = {
    def hinted(df: DataFrame) = if (hintBroadcast) broadcast(df) else df
    val churnIds = churn.select(churn.columns.head).toDF("id")
    val unpivoted = sigs
      .select(col("doc_id"), posexplode(
        array((0 until NBands).map(b => col(s"band_$b")): _*)))
      .toDF("id", "bidx", "bval")
    val hotBuckets = unpivoted
      .join(hinted(churnIds), Seq("id"), "left_semi")
      .select(col("bidx"), col("bval")).distinct()
    val confined = unpivoted
      .join(hinted(hotBuckets), Seq("bidx", "bval"), "left_semi")
    // both touch-side filters read the same pair frame — materialize
    // the bucket-group shuffle once instead of per side
    val pairs = Dedup.bucketPairs(confined, cap, "dedup_ingest_bucket_cap")
      .toDF("doc_a", "doc_b")
      .localCheckpoint(true)
    pairs
      .join(hinted(churnIds.select(col("id").as("doc_a"))),
        Seq("doc_a"), "left_semi")
      .unionAll(pairs
        .join(hinted(churnIds.select(col("id").as("doc_b"))),
          Seq("doc_b"), "left_semi")
        .select(col("doc_a"), col("doc_b")))
      .distinct()
  }
}
