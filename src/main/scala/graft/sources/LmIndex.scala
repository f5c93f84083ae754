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
  * aggregate index): the additive refresh counts every INSERTED
  * document exactly once — on an append-only corpus the index equals
  * the one-shot retrain at every refresh point (the oracle row's
  * pinned equivalence). A re-UPSERTED document's older version and a
  * DELETED document's counts are NOT subtracted (the feed's tombstone
  * carries no text to subtract with); after revisions or takedowns the
  * stats drift stale-high and the documented reconciliation hatch is
  * [[rebuildEpoch]] — retrain from the live corpus into a fresh table,
  * one atomic swap, exactly the SemDedupIndex epoch shape. Stale-HIGH
  * counts degrade gracefully for a quality filter (surprise drifts
  * LOW, never inventing improbability for text the corpus really
  * held).
  *
  * Scale shape: a refresh shuffles batch-sized bigram counts and
  * merges them against the index's Current scan (vocabulary-bounded —
  * the stats table is the distinct-bigram set, orders of magnitude
  * smaller than the corpus); the merge is MEASUREMENT-GUARDED
  * (`broadcastKeyMax`): a steady-state batch broadcast-semi-filters
  * the stats scan in one pass with no stats shuffle, a bootstrap
  * catch-up falls back to the plain shuffle join. One exactly-once
  * delta commits through the `stream_batches` replay guard. [[score]] is two scans (live docs + stats) and the t19 join
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
        val rows = countBatch(spark, batch, textCol, idxLake, idxTable,
          broadcastKeyMax)
        AzofSink.commitBatch(idxLake, idxTable, rows, id, appId)
        // release countBatch's eager checkpoint of the batch counts
        graft.operators.Blocks.freeReferenced(rows)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** One feed micro-batch → `(bigram, old + batch)` upserts for exactly
    * the touched bigrams. Tombstoned feed rows carry no text and add
    * nothing (see the consistency contract above). The batch's rows can
    * span several versions of one key; EVERY inserted version's bigrams
    * count, matching what a one-shot retrain over the same append-only
    * history would see at each point (azof serves the newest version,
    * but an append-only corpus has one version per key — the exact-
    * equality case the oracle pins).
    */
  private def countBatch(
      spark: SparkSession, batch: Dataset[Row], textCol: String,
      idxLake: String, idxTable: String,
      broadcastKeyMax: Long): DataFrame = {
    val w = split(lower(col(textCol)), "\\s+")
    val fresh = batch.where(!col("_deleted"))
      .select(w.as("_w"))
      .where(size(col("_w")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(_w) - 1), " +
          "i -> concat(element_at(_w, i), ' ', element_at(_w, i + 1)))"))
        .as(TableSchema.KeyName))
      .groupBy(TableSchema.KeyName)
      .agg(count(lit(1)).as("_add"))
    val existing = graft.operators.AzofScan.scan(spark, idxLake, idxTable)
      .select(col(TableSchema.KeyName), col("cnt").as("_old"))
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
    val counted = fresh.localCheckpoint(true)
    val nFresh = counted.count()
    val touchedOld =
      if (nFresh <= broadcastKeyMax)
        existing.join(broadcast(counted.select(col(TableSchema.KeyName))),
          Seq(TableSchema.KeyName), "left_semi")
      else existing
    // a FIXED event_time for every stats row: successive upserts of one
    // bigram tie on (key, event_time) and the engine's pinned default-
    // mode tie-break (commit seq desc — the later refresh's count wins)
    // serves the newest total; a wall clock here would be the only
    // nondeterminism in an otherwise replayable index
    counted.join(touchedOld, Seq(TableSchema.KeyName), "left")
      .select(
        col(TableSchema.KeyName),
        lit(java.sql.Timestamp.from(StatsStamp))
          .as(TableSchema.EventTimeName),
        (coalesce(col("_old"), lit(0L)) + col("_add")).as("cnt"))
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
    val stats = graft.operators.AzofScan.scan(spark, idxLake, idxTable)
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

  /** Reconciliation hatch after source revisions / deletes (whose
    * counts the additive refresh cannot subtract): retrain the stats
    * from the CURRENT live corpus into `newTable`, then serve from it —
    * the SemDedupIndex epoch shape, one atomic table swap for the
    * operator.
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
