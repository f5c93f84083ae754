package graft.sources

import graft.format.{ColumnDef, ColumnType, TableSchema}
import graft.operators.TextAnalysis
import graft.streaming.AzofSink
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** PERSISTED corpus bigram-LM statistics — the amortized twin of the
  * one-shot [[TextAnalysis.lmScore]] (the d15/d17 move for the LM
  * family): a 100-TB quality-filter pipeline re-trains the corpus
  * bigram table on every run, yet the statistic is a pure ADDITIVE
  * aggregate — so it persists as an azof table keyed by bigram
  * (`cnt` = corpus occurrence count) and refreshes INCREMENTALLY from
  * the source's commit-exact change feed: each micro-batch counts only
  * ITS documents' bigrams and upserts `old + new` for exactly the
  * touched keys. Scoring then reads the (vocabulary-bounded) stats
  * table instead of re-tokenizing the corpus.
  *
  * Consistency contract (the [[CcIndex]] family rule, stated for an
  * aggregate index): after every refresh the stats equal the one-shot
  * retrain over the source's LIVE corpus at the batch's end version —
  * under inserts, RE-UPSERTS, and DELETES alike. The feed's tombstone
  * carries no text to subtract with, but the feed is COMMIT-EXACT, so
  * the refresh reads each churned key's PRE-IMAGE (its live text at
  * the batch's predecessor version — one time-travel scan, key-stats
  * pruned to the churned keys) and upserts `old − pre + new` for
  * exactly the touched bigrams. The engine's own staged-takedown flow
  * (`DedupFlow.applyVerdict` → tombstones) therefore keeps the LM
  * stats exact with no epoch rebuild. The one remaining
  * reconciliation case is [[AzofWriter.rollback]] (which changes live
  * state with NO feed event, the feed's documented epoch-rebuild
  * contract) — [[rebuildEpoch]] stays as that hatch.
  *
  * Scale shape: a refresh shuffles batch-sized bigram counts and
  * merges them against the index's Current scan (vocabulary-bounded —
  * the stats table is the distinct-bigram set, orders of magnitude
  * smaller than the corpus); the merge is MEASUREMENT-GUARDED
  * (`broadcastKeyMax`): a steady-state batch broadcast-semi-filters
  * the stats scan in one pass with no stats shuffle, a bootstrap
  * catch-up falls back to the plain shuffle join. The pre-image read
  * is guarded the same way: a steady-state batch's churned keys pass
  * to the time-travel scan as a `KeyFilter` (key-range/bloom file
  * skipping confines the read to the churn neighborhood), a bootstrap
  * catch-up falls back to one full scan semi-joined map-side. One
  * exactly-once delta commits through the `stream_batches` replay
  * guard. [[score]] is two scans (live docs + stats) and the t19 join
  * shape with the corpus-wide aggregation replaced by the index read.
  */
object LmIndex {

  /** Index value schema: the bigram's corpus occurrence count. */
  val StatsSchema: TableSchema = TableSchema(Seq(
    ColumnDef("cnt", ColumnType.AzInt, nullable = false)))

  def create(
      spark: SparkSession,
      idxLake: String, idxTable: String = "lm_stats",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    AzofWriter.createTableIfAbsent(
      spark, idxLake, idxTable, StatsSchema, segmentStart)
    ()
  }

  /** Incrementally refresh the stats from the source's commit feed
    * (AvailableNow by default). `textCol` names the document text.
    */
  def refresh(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, idxTable: String,
      checkpoint: String,
      trigger: Trigger = Trigger.AvailableNow(),
      broadcastKeyMax: Long = DedupFlow.DefaultBroadcastKeyMax)
      : StreamingQuery = {
    create(spark, idxLake, idxTable) // idempotent
    val appId = AzofSink.appIdFor(checkpoint)
    spark.readStream.format("azof-commits")
      .option("table", srcTable).load(srcLake)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], id: Long) =>
        val rows = countBatch(spark, batch, textCol, srcLake, srcTable,
          idxLake, idxTable, broadcastKeyMax)
        AzofSink.commitBatch(idxLake, idxTable, rows, id, appId)
        // release countBatch's eager checkpoint of the batch counts
        graft.operators.Blocks.freeReferenced(rows)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** `(bigram, n)` multiset counts over `rows`' `textCol`, keyed as the
    * index's key column.
    */
  private def bigramCounts(
      rows: DataFrame, textCol: String, as: String): DataFrame = {
    val w = split(lower(col(textCol)), "\\s+")
    rows
      .select(w.as("_w"))
      .where(size(col("_w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(_w) - 1), " +
          "i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))"))
        .as(TableSchema.KeyName))
      .groupBy(TableSchema.KeyName)
      .agg(count(lit(1)).as(as))
  }

  /** One feed micro-batch → `(bigram, old − pre + new)` upserts for
    * exactly the touched bigrams. Per churned key, `new` counts the
    * batch's NEWEST version's bigrams (nothing for a tombstone) and
    * `pre` the key's live text at the batch's PREDECESSOR version (one
    * time-travel scan, churn-confined; nothing for a key that did not
    * exist, or was already deleted, before the batch) — so after the
    * upsert the stats equal a retrain over the live corpus at the
    * batch's end version. Intermediate versions inside one catch-up
    * batch never count: only the end-state does, exactly like the
    * retrain. A net-zero bigram (revision that keeps a phrase) upserts
    * nothing.
    */
  private def countBatch(
      spark: SparkSession, batch: Dataset[Row], textCol: String,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String,
      broadcastKeyMax: Long): DataFrame = {
    val K = TableSchema.KeyName
    // one eager materialization of the slim batch: every derivation
    // below (newest-per-key, churned keys, min version) reads it
    val slim = batch
      .select(col(K), col(textCol), col("_commit_version"), col("_deleted"))
      .localCheckpoint(true)
    // the key's POST-batch state: its newest row in the batch
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(K)).orderBy(col("_commit_version").desc)
    val newest = slim
      .withColumn("_rn", row_number().over(wKey))
      .where(col("_rn") === 1)
    val adds = bigramCounts(
      newest.where(!col("_deleted")).select(col(textCol)), textCol, "_add")
    // the churned keys' PRE-image: live text at the batch's predecessor
    // version (the greatest MAIN document below the batch's first
    // commit — feed versions are main by construction, and every
    // feed-visible state change lands as a feed commit, so this names
    // exactly the state the previous refresh saw). Guarded like the
    // merge below: a steady-state batch's keys ride a KeyFilter into
    // the scan (key-stats file skipping → churn-confined read), a
    // bootstrap catch-up falls back to one full scan semi-joined.
    val churned = slim.select(col(K)).distinct()
    val nChurned = churned.count()
    val subs =
      if (nChurned == 0)
        adds.select(col(K), col("_add").as("_sub")).limit(0)
      else {
        val minV = slim.agg(min(col("_commit_version"))).collect()(0).getLong(0)
        val src = graft.format.AzofTable(spark, srcLake, srcTable)
        val (_, preSnap) = AzofChangeFeed.mainAtOrBefore(spark, src, minV - 1)
        val pre =
          if (nChurned <= broadcastKeyMax) {
            val keys = churned.collect().map(_.getString(0)).toSet
            graft.operators.AzofScan.scanSnapshot(spark, src, preSnap,
              graft.format.AsOf.Current,
              projection = Some(Set(K, textCol)),
              keyFilter = Some(graft.format.KeyFilter.Keys(keys)))
          } else
            graft.operators.AzofScan.scanSnapshot(spark, src, preSnap,
              graft.format.AsOf.Current,
              projection = Some(Set(K, textCol)))
              .join(churned, Seq(K), "left_semi")
        bigramCounts(pre.select(col(textCol)), textCol, "_sub")
      }
    val delta = adds.join(subs, Seq(K), "full_outer")
      .select(col(K),
        (coalesce(col("_add"), lit(0L)) - coalesce(col("_sub"), lit(0L)))
          .as("_delta"))
      .where(col("_delta") =!= 0L)
    val existing = graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(col(K), col("cnt").as("_old"))
    // The merge must not shuffle the WHOLE stats table for a small
    // batch (steady-state crawl cadence): when the batch's distinct
    // bigrams fit the broadcast budget, ONE streaming pass over the
    // stats scan (broadcast left-semi) extracts the touched old counts
    // and the final merge is small↔small. Past the budget (a bootstrap
    // catch-up whose bigrams approach vocabulary size anyway) fall back
    // to the plain shuffle join — the measured-guard rule from
    // DedupFlow's bootstrap fix, never an unconditional hint. The
    // eager checkpoint keeps the batch aggregation to one computation
    // across the count, the join, and the commit (freed by refresh).
    val counted = delta.localCheckpoint(true)
    val nFresh = counted.count()
    // slim is fully consumed into `counted` now — release its blocks
    // (refresh's freeReferenced(rows) only reaches `counted`)
    graft.operators.Blocks.freeReferenced(slim.toDF())
    val touchedOld =
      if (nFresh <= broadcastKeyMax)
        existing.join(broadcast(counted.select(col(K))),
          Seq(K), "left_semi")
      else existing
    // a FIXED event_time for every stats row: successive upserts of one
    // bigram tie on (key, event_time) and the engine's pinned default-
    // mode tie-break (commit seq desc — the later refresh's count wins)
    // serves the newest total; a wall clock here would be the only
    // nondeterminism in an otherwise replayable index. `greatest(0)`
    // never fires under the exactness contract (pre counts are always
    // backed by earlier adds); it bounds the damage of OUT-OF-CONTRACT
    // histories (a rollback, whose documented hatch is rebuildEpoch)
    // to the same stale-stats class instead of negative counts.
    counted.join(touchedOld, Seq(K), "left")
      .select(
        col(K),
        lit(java.sql.Timestamp.from(StatsStamp))
          .as(TableSchema.EventTimeName),
        greatest(lit(0L), coalesce(col("_old"), lit(0L)) + col("_delta"))
          .as("cnt"))
  }

  /** The one event_time every stats row carries (see [[countBatch]]). */
  val StatsStamp: Instant = Instant.parse("2024-01-02T00:00:00Z")

  /** Bigram-LM surprise scores for the source's LIVE documents, served
    * from the persisted stats — [[TextAnalysis.lmScore]]'s exact output
    * shape `(doc_id, n_bigrams, sum_surprise, avg_surprise)` with the
    * corpus-wide training aggregation replaced by one read of the
    * vocabulary-bounded index. A bigram the index has never seen (a doc
    * inserted after the last refresh) scores with count 0 — smoothing
    * covers it, no row is lost.
    */
  def score(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, idxTable: String): DataFrame = {
    // cnt = 0 rows are fully-subtracted bigrams (every occurrence
    // deleted/revised away): a retrain has NO row for them, and serving
    // them would inflate the vocabulary count — filter to positives so
    // the served scores stay retrain-exact
    val stats = graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .where(col("cnt") > 0L)
      .select(col(TableSchema.KeyName).as("bg"), col("cnt").as("_c_bg"))
    val ctx = stats
      .select(substring_index(col("bg"), " ", 1).as("_w1"), col("_c_bg"))
      .groupBy("_w1").agg(sum(col("_c_bg")).as("_c_ctx"))
    val vocabSize = ctx.agg(count(lit(1)).as("_v"))
    val docs = graft.operators.AzofScan.scan(spark, srcLake, srcTable)
      .select(col(TableSchema.KeyName).as("doc_id"),
        split(lower(col(textCol)), "\\s+").as("_w"))
    val pairs = docs
      .where(size(col("_w")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(_w) - 1), " +
          "i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))"))
        .as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("n_occ"))
    pairs
      .join(stats, Seq("bg"), "left")
      .withColumn("_w1", substring_index(col("bg"), " ", 1))
      .join(ctx, Seq("_w1"), "left")
      .crossJoin(broadcast(vocabSize))
      .withColumn("_surprise",
        length(bin(coalesce(col("_c_ctx"), lit(0L)) + col("_v")))
          .cast("long") -
          length(bin(coalesce(col("_c_bg"), lit(0L)) + lit(1L)))
            .cast("long"))
      .groupBy("doc_id")
      .agg(sum(col("n_occ")).as("n_bigrams"),
        sum(col("n_occ") * col("_surprise")).as("sum_surprise"))
      .withColumn("avg_surprise",
        col("sum_surprise").cast("double") / col("n_bigrams"))
  }

  /** Reconciliation hatch after a source ROLLBACK — the one state
    * change that lands with NO feed event ([[AzofChangeFeed]] skips
    * `op = "rollback"`), so the pre-image-subtracting refresh cannot
    * see it: retrain the stats from the CURRENT live corpus into
    * `newTable`, then serve from it — the SemDedupIndex epoch shape,
    * one atomic table swap for the operator. (Deletes and revisions no
    * longer need this: the refresh subtracts their pre-images exactly.)
    */
  def rebuildEpoch(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, newTable: String,
      at: Instant): Long = {
    create(spark, idxLake, newTable)
    val live = graft.operators.AzofScan.scan(spark, srcLake, srcTable)
      .select(col(textCol))
    val w = split(lower(col(textCol)), "\\s+")
    val counts = live
      .select(w.as("_w"))
      .where(size(col("_w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(_w) - 1), " +
          "i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))"))
        .as(TableSchema.KeyName))
      .groupBy(TableSchema.KeyName)
      .agg(count(lit(1)).as("cnt"))
      .select(col(TableSchema.KeyName),
        lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName),
        col("cnt"))
    val n = counts.count()
    if (n > 0)
      AzofWriter.commitDelta(spark, idxLake, newTable, counts, at, at)
    n
  }
}
