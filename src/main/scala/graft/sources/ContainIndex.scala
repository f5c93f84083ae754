package graft.sources

import graft.format.{AzofTable, ColumnDef, ColumnType, TableSchema}
import graft.operators.{AzofScan, Blocks, Dedup}
import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED asymmetric-containment pair index — the amortized twin of
  * the one-shot quote/subset detector ([[Dedup.containmentPairs]],
  * d20), completing the index family: [[MinHashIndex]] amortizes
  * signatures/candidates, [[CcIndex]] clustering, [[SemDedupIndex]]
  * semantic verdicts, and this table the containment verdicts — so
  * export-time containment gating is an INDEX SCAN, not a corpus
  * re-shingle. Containment is exactly the operator minhash cannot
  * block (it estimates Jaccard, which is ~0 for a short doc quoted
  * inside a long one), making its one-shot recompute the most
  * expensive query in the suite — at crawl cadence the recompute cost
  * is what this index amortizes.
  *
  * '''Table shape.''' One row per verified pair, keyed
  * `"<doc_a>|<doc_b>"` (doc_a < doc_b numerically) with the EXACT
  * counts `(n_inter, n_a, n_b)` as values — containments re-derive as
  * `n_inter/n_a`, and storing counts keeps the row oracle-checkable
  * integers. Versioned, time-travelable, vacuumable, mirrorable like
  * every index table.
  *
  * '''Refresh = churn-confined re-derivation.''' Each refresh consumes
  * the CDC range since its cursor:
  *
  *  1. churned docs re-shingle (small); the corpus pass is ONE scan
  *     with a map-side semi-join against the churn's shingle set —
  *     NO corpus-wide shuffle: only buckets containing a churned
  *     shingle enter the df-guarded grouping, and those buckets carry
  *     the TRUE global df (every corpus doc holding the shingle
  *     matches), so the guard decides exactly as the one-shot does;
  *  2. pair emit is bucket-local and kept only where ≥ 1 side churned
  *     (both-old pairs are already decided in the index);
  *  3. exact verification is the SAME code path as the one-shot
  *     ([[Dedup.containmentVerify]]) over the involved docs' full
  *     shingle sets;
  *  4. ONE mixed commit: stale rows (pairs touching churn that no
  *     longer verify — revised or deleted docs) land as tombstones,
  *     new/changed pairs as data rows; unchanged pairs write nothing
  *     (the [[CcIndex]] bounded-writes contract).
  *
  * Broadcast hints are gated on the MEASURED churn (the
  * [[DedupFlow]] bootstrap rule): a steady-state crawl batch
  * broadcasts its shingle set and endpoint ids; a BOOTSTRAP refresh
  * (churn = the corpus) degrades every hint to a shuffle join that
  * scales, with AQE still broadcasting whatever it measures small.
  *
  * Scale note: the refresh still READS the corpus once (shingles are
  * derived, not persisted); a posting-list index (shingle → docs)
  * would trade that read for index storage ≈ the tokenized corpus —
  * deliberately not paid here, since the read is map-side-pruned and
  * shuffle-free.
  */
object ContainIndex {

  val PairSchema: TableSchema = TableSchema(Seq(
    ColumnDef("n_inter", ColumnType.AzInt, nullable = true),
    ColumnDef("n_a", ColumnType.AzInt, nullable = true),
    ColumnDef("n_b", ColumnType.AzInt, nullable = true)))

  def create(
      spark: SparkSession,
      idxLake: String, idxTable: String = "contain_pairs",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    AzofWriter.createTableIfAbsent(spark, idxLake, idxTable, PairSchema,
      segmentStart)
    ()
  }

  /** The persisted verdicts in [[Dedup.containmentPairs]]'s output
    * shape: `(doc_a, doc_b, n_inter, n_a, n_b, cont_a, cont_b)` —
    * index-served ≡ one-shot recompute, pair by pair.
    */
  def pairs(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame =
    pairsKeyed(spark, idxLake, idxTable)
      .withColumn("doc_a", col("doc_a").cast("long"))
      .withColumn("doc_b", col("doc_b").cast("long"))

  /** [[pairs]] for a KEYED index (raw string document keys — URLs,
    * UUIDs; `doc_a < doc_b` lexicographically): the key is the
    * identity, no numeric cast.
    */
  def pairsKeyed(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame =
    AzofScan.scan(spark, idxLake, idxTable)
      .select(
        split(col(TableSchema.KeyName), "\\|").getItem(0).as("doc_a"),
        split(col(TableSchema.KeyName), "\\|").getItem(1).as("doc_b"),
        col("n_inter"), col("n_a"), col("n_b"),
        (col("n_inter").cast("double") / col("n_a")).as("cont_a"),
        (col("n_inter").cast("double") / col("n_b")).as("cont_b"))

  /** What one [[refresh]] did: the CDC range, the funnel counts, and
    * the committed row split (upserted data rows / tombstoned stale
    * pairs).
    */
  final case class RefreshReport(
      fromVersion: Long, toVersion: Long,
      churned: Long, candidates: Long, verified: Long,
      upserted: Long, retired: Long) {
    def noop: Boolean = toVersion == fromVersion
  }

  /** Refresh the index from every source commit since the last refresh
    * (cursor sidecar per index table, the [[DedupFlow]] rule: advanced
    * only AFTER the commit lands, so a crash replays the range and the
    * replay commits nothing new). Parameters mirror
    * [[Dedup.containmentPairs]] so index ≡ one-shot holds verbatim.
    */
  /** @param keyed run on RAW string document keys (URLs, UUIDs — the
    *              blocking/verify machinery is key-type-agnostic, so
    *              keys flow through verbatim and pairs order
    *              LEXICOGRAPHICALLY; keys containing the `|` pair-key
    *              delimiter are refused loudly). Default: keys must be
    *              long-castable and pairs order numerically, matching
    *              [[Dedup.containmentPairs]] on numeric ids.
    */
  def refresh(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, idxTable: String = "contain_pairs",
      at: Instant = Instant.now(),
      minShared: Int = 3, maxDf: Int = 20, minContainment: Double = 0.9,
      broadcastKeyMax: Long = DedupFlow.DefaultBroadcastKeyMax,
      keyed: Boolean = false)
      : RefreshReport = {
    val toVersion = AzofTable(spark, srcLake, srcTable).currentVersion.toLong
    val fromVersion = DedupFlow.readCursor(spark, idxLake, idxTable)
      .getOrElse(AzofChangeFeed.earliestFeedBase(spark, srcLake, srcTable))
    if (toVersion <= fromVersion)
      return RefreshReport(fromVersion, fromVersion, 0L, 0L, 0L, 0L, 0L)

    val idExpr =
      if (keyed)
        when(col(TableSchema.KeyName).contains("|"),
          raise_error(concat(
            lit("ContainIndex keyed mode: key contains the '|' " +
              "pair-key delimiter: '"),
            col(TableSchema.KeyName), lit("'"))))
          .otherwise(col(TableSchema.KeyName))
      else coalesce(col(TableSchema.KeyName).try_cast("long"),
        raise_error(concat(
          lit("ContainIndex.refresh needs long-castable keys (got '"),
          col(TableSchema.KeyName),
          lit("') — pass keyed = true for string-keyed corpora")))
          .cast("long"))

    // 1. churn: every key the CDC range touched (upserts + deletes)
    val churn = spark.read.format("azof")
      .option("table", srcTable)
      .option("changesFrom", fromVersion)
      .option("changesTo", toVersion)
      .load(srcLake)
      .select(idExpr.as("doc_id"))
      .distinct()
      .localCheckpoint(true)
    val nChurn = churn.count()
    val small = nChurn <= broadcastKeyMax
    def hinted(df: DataFrame) = if (small) broadcast(df) else df

    // corpus pinned AS OF the consumed version (deleted docs absent)
    val corpus = spark.read.format("azof")
      .option("table", srcTable)
      .option("versionAsOf", toVersion.toString)
      .load(srcLake)
      .select(idExpr.as("doc_id"), col(textCol))
    val corpusSh = Dedup.shingles(corpus, col(textCol), col("doc_id"))

    // 2. blocking confined to churn-touched buckets: only shingles a
    // churned doc carries enter the grouping (map-side semi-join when
    // the churn is measured small), the df-guard sees each such
    // shingle's FULL corpus posting, pair emit keeps churn-touching
    // pairs only
    val churnSh = corpusSh
      .join(hinted(churn), Seq("doc_id"), "left_semi")
      .select(col("sh")).distinct()
    val matched = corpusSh.join(hinted(churnSh), Seq("sh"), "left_semi")
    val emitted = matched.groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .where(size(col("ids")).between(2, maxDf))
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select("doc_a", "doc_b")
    val cands = emitted
      .join(hinted(churn.withColumnRenamed("doc_id", "doc_a")),
        Seq("doc_a"), "left_semi")
      .select("doc_a", "doc_b")
      .unionAll(emitted
        .join(hinted(churn.withColumnRenamed("doc_id", "doc_b")),
          Seq("doc_b"), "left_semi")
        .select("doc_a", "doc_b"))
      .distinct()
      .localCheckpoint(true)
    val nCands = cands.count()

    // 3. exact verify over the involved docs' full shingle sets — the
    // one-shot's own code path
    val involved = cands.select(col("doc_a").as("doc_id"))
      .unionAll(cands.select(col("doc_b").as("doc_id"))).distinct()
    val verifyInput = corpusSh.join(
      if (nCands * 2 <= broadcastKeyMax) broadcast(involved) else involved,
      Seq("doc_id"), "left_semi")
    val fresh = Dedup.containmentVerify(cands, verifyInput, minContainment)
      .localCheckpoint(true)
    val nVerified = fresh.count()

    // 4. delta vs the current index, bounded writes: stale = indexed
    // pairs touching churn that did not re-verify (tombstones); upsert
    // = verified pairs that are new or changed
    // mode-matched id types: joining the numeric view against keyed
    // string ids would type-coerce the keys to bigint and fail ANSI
    val cur = (if (keyed) pairsKeyed(spark, idxLake, idxTable)
               else pairs(spark, idxLake, idxTable))
      .select(col("doc_a"), col("doc_b"),
        col("n_inter").as("_ci"), col("n_a").as("_ca"), col("n_b").as("_cb"))
    val curTouching = cur
      .join(hinted(churn.withColumnRenamed("doc_id", "doc_a")),
        Seq("doc_a"), "left_semi")
      .select(cur.columns.map(col): _*)
      .unionAll(cur
        .join(hinted(churn.withColumnRenamed("doc_id", "doc_b")),
          Seq("doc_b"), "left_semi")
        .select(cur.columns.map(col): _*))
      .distinct()
    val stale = curTouching
      .join(fresh.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"),
        "left_anti")
    val upserts = fresh
      .join(cur, Seq("doc_a", "doc_b"), "left")
      .where(col("_ci").isNull || col("_ci") =!= col("n_inter") ||
        col("_ca") =!= col("n_a") || col("_cb") =!= col("n_b"))
    val ts = lit(java.sql.Timestamp.from(at))
    def pairKey = concat(col("doc_a").cast("string"), lit("|"),
      col("doc_b").cast("string")).as(TableSchema.KeyName)
    // ONE mixed data+tombstone commit (the replication shape)
    val rows = upserts.select(pairKey, ts.as(TableSchema.EventTimeName),
        col("n_inter"), col("n_a"), col("n_b"),
        lit(null).cast("boolean").as(TableSchema.DeletedName))
      .unionAll(stale.select(pairKey, ts.as(TableSchema.EventTimeName),
        lit(null).cast("long"), lit(null).cast("long"),
        lit(null).cast("long"), lit(true).as(TableSchema.DeletedName)))
      .localCheckpoint(true)
    val nUpsert = rows.where(col(TableSchema.DeletedName).isNull).count()
    val nRetired = rows.count() - nUpsert
    if (nUpsert + nRetired > 0)
      AzofWriter.commitDelta(spark, idxLake, idxTable, rows, at, at,
        op = Some("contain-refresh"))
    DedupFlow.writeCursor(spark, idxLake, idxTable, toVersion)

    Blocks.free(churn); Blocks.free(cands); Blocks.free(fresh)
    Blocks.free(rows)
    RefreshReport(fromVersion, toVersion, nChurn, nCands, nVerified,
      nUpsert, nRetired)
  }
}
