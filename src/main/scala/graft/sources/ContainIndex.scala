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
  *     (both-old pairs are already decided in the index) — PLUS the
  *     guard-transition class: a bucket whose df crossed `maxDf`
  *     because OTHER docs churned changes verdicts for pairs among
  *     docs that never churned themselves, so those pairs are
  *     re-decided exactly (true guard-passing n_shared from the
  *     endpoints' full shingle sets, then the same exact verify) and
  *     retire or surface exactly when the one-shot's output does;
  *     detecting transitions needs the churn's PRE-image shingles, one
  *     churn-confined time-travel read at the range's base version;
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
  * Scale note: the DEFAULT refresh still READS the corpus once
  * (shingles are derived, not persisted) — map-side-pruned and
  * shuffle-free, the storage-lean default. The `postings` option
  * trades that read for a persisted posting-list table (shingle →
  * document ids, storage ≈ the tokenized corpus): with it, a refresh
  * reads only the churned docs (key-stats point reads), the churn
  * shingles' posting buckets (key-stats pruned), and the candidates'
  * endpoint docs — NO corpus pass at any cadence. See
  * [[createPostings]] for the posting table's own contract.
  */
object ContainIndex {

  val PairSchema: TableSchema = TableSchema(Seq(
    ColumnDef("n_inter", ColumnType.AzInt, nullable = true),
    ColumnDef("n_a", ColumnType.AzInt, nullable = true),
    ColumnDef("n_b", ColumnType.AzInt, nullable = true)))

  /** Posting-table value schema: `df` = the shingle's EXACT document
    * frequency in the live corpus; `ids` = the member doc ids as a
    * sorted JSON string array, or NULL when `df` exceeds the table's
    * `idsCap` (a stop-shingle — every blocking pass skips it anyway,
    * since `maxDf <= idsCap` is required, so its members need not be
    * stored; the exact `df` keeps the under-cap transition detectable).
    */
  val PostingSchema: TableSchema = TableSchema(Seq(
    ColumnDef("df", ColumnType.AzInt, nullable = true),
    ColumnDef("ids", ColumnType.AzString, nullable = true)))

  def create(
      spark: SparkSession,
      idxLake: String, idxTable: String = "contain_pairs",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    AzofWriter.createTableIfAbsent(spark, idxLake, idxTable, PairSchema,
      segmentStart)
    ()
  }

  /** Create the optional posting-list table (see [[refresh]]'s
    * `postings`). Keyed by shingle; one row per shingle with its exact
    * `df` and (while `df <= idsCap`) the member ids. Maintained
    * EXACTLY-ONCE per consumed version range through the
    * `stream_batches` replay guard — posting arithmetic (the overflow
    * rows' `df` deltas) is not idempotent, so a crash-replayed range
    * must skip the already-applied posting commit rather than re-apply
    * it.
    */
  def createPostings(
      spark: SparkSession,
      idxLake: String, postTable: String = "contain_postings",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    AzofWriter.createTableIfAbsent(spark, idxLake, postTable, PostingSchema,
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
  /** @param postings with Some(table), serve blocking from the
    *                  persisted posting-list table (created via
    *                  [[createPostings]], maintained by this same
    *                  refresh from the same cursor): the refresh reads
    *                  NO corpus pass — churned docs, churn-bucket
    *                  postings, and candidate endpoints only, all
    *                  key-stats pruned. Default None = the storage-lean
    *                  one-scan path.
    * @param idsCap   posting rows stop storing member ids past this df
    *                  (stop-shingles; `maxDf <= idsCap` required). Use
    *                  ONE value per posting table across refreshes.
    */
  def refresh(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, idxTable: String = "contain_pairs",
      at: Instant = Instant.now(),
      minShared: Int = 3, maxDf: Int = 20, minContainment: Double = 0.9,
      broadcastKeyMax: Long = DedupFlow.DefaultBroadcastKeyMax,
      keyed: Boolean = false,
      postings: Option[String] = None,
      idsCap: Int = 64)
      : RefreshReport = {
    val toVersion = AzofTable(spark, srcLake, srcTable).currentVersion.toLong
    val fromVersion = DedupFlow.readCursor(spark, idxLake, idxTable)
      .getOrElse(AzofChangeFeed.earliestFeedBase(spark, srcLake, srcTable))
    if (toVersion <= fromVersion)
      return RefreshReport(fromVersion, fromVersion, 0L, 0L, 0L, 0L, 0L)
    postings match {
      case Some(postTable) =>
        return refreshViaPostings(spark, srcLake, srcTable, textCol,
          idxLake, idxTable, postTable, at, minShared, maxDf,
          minContainment, broadcastKeyMax, keyed, idsCap,
          fromVersion, toVersion)
      case None => ()
    }

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

    // 1. churn: every key the CDC range touched (upserts + deletes) —
    // raw strings for the churn-confined pre-image read, typed ids for
    // everything downstream
    val churnRaw = spark.read.format("azof")
      .option("table", srcTable)
      .option("changesFrom", fromVersion)
      .option("changesTo", toVersion)
      .load(srcLake)
      .select(col(TableSchema.KeyName))
      .distinct()
      .localCheckpoint(true)
    val churn = churnRaw.select(idExpr.as("doc_id")).localCheckpoint(true)
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

    // the churn's PRE-image shingles (text at the range's base version,
    // churn-confined read): a shingle the churn REMOVED can drop its
    // bucket's df across the maxDf guard, changing verdicts for pairs
    // among docs that themselves never churned — the guard-transition
    // class, re-decided exactly below
    val src = AzofTable(spark, srcLake, srcTable)
    val preDocs = churnConfinedDocs(spark, src, fromVersion, textCol,
      churnRaw, small)
    val preSh = Dedup.shingles(preDocs, col(textCol), idExpr)

    // 2. blocking confined to churn-touched buckets: shingles a churned
    // doc CARRIES or REMOVED enter the grouping (map-side semi-join
    // when the churn is measured small), the df-guard sees each such
    // shingle's FULL corpus posting, pair emit keeps churn-touching
    // pairs (plus the transition re-decisions)
    val churnDocSh = corpusSh
      .join(hinted(churn), Seq("doc_id"), "left_semi")
      .localCheckpoint(true)
    val churnSh = churnDocSh.select(col("sh")).distinct()
    val rem = preSh.join(churnDocSh, Seq("doc_id", "sh"), "left_anti")
      .localCheckpoint(true)
    val addDoc = churnDocSh.join(preSh, Seq("doc_id", "sh"), "left_anti")
    val blockShAll = churnSh.unionAll(rem.select("sh")).distinct()
    val matched = corpusSh.join(hinted(blockShAll), Seq("sh"), "left_semi")
    val idElem: org.apache.spark.sql.types.DataType =
      if (keyed) org.apache.spark.sql.types.StringType
      else org.apache.spark.sql.types.LongType
    val emptyTyped =
      array().cast(org.apache.spark.sql.types.ArrayType(idElem))
    val bucketAgg = matched.groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .join(rem.groupBy("sh").agg(collect_set(col("doc_id")).as("_remIds")),
        Seq("sh"), "left")
      .join(addDoc.groupBy("sh").agg(collect_set(col("doc_id")).as("_addIds")),
        Seq("sh"), "left")
      .withColumn("_dfn", size(col("ids")).cast("long"))
      .withColumn("_dfo", col("_dfn")
        - coalesce(size(col("_addIds")), lit(0)).cast("long")
        + coalesce(size(col("_remIds")), lit(0)).cast("long"))
    val emitted = pairEmit(
      bucketAgg.where(col("_dfn").between(2L, maxDf.toLong))
        .select(col("ids")), minShared)
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

    // guard-transition pairs: a bucket whose df crossed maxDf because
    // OTHER docs churned — pairs among its (non-churned) members enter
    // or leave the one-shot's output without being churn-touching
    val xIds = bucketAgg
      .where(col("_dfo") > maxDf.toLong &&
        col("_dfn").between(2L, maxDf.toLong))
      .select(col("ids"))
      .unionAll(bucketAgg
        .where(col("_dfo").between(2L, maxDf.toLong) &&
          col("_dfn") > maxDf.toLong)
        .select(array_sort(array_union(
          array_except(col("ids"), coalesce(col("_addIds"), emptyTyped)),
          coalesce(col("_remIds"), emptyTyped))).as("ids")))
    val xPairs = pairEmit(xIds, minShared = 1)
      .join(hinted(churn.withColumnRenamed("doc_id", "doc_a")),
        Seq("doc_a"), "left_anti")
      .join(hinted(churn.withColumnRenamed("doc_id", "doc_b")),
        Seq("doc_b"), "left_anti")
      .localCheckpoint(true)
    val nX = xPairs.count()

    // 3. exact verify over the involved docs' full shingle sets — the
    // one-shot's own code path
    val involved = cands.select(col("doc_a").as("doc_id"))
      .unionAll(cands.select(col("doc_b").as("doc_id"))).distinct()
    val verifyInput = corpusSh.join(
      if (nCands * 2 <= broadcastKeyMax) broadcast(involved) else involved,
      Seq("doc_id"), "left_semi")
    val mainFresh = Dedup.containmentVerify(cands, verifyInput, minContainment)
    val xFresh =
      if (nX == 0L) mainFresh.limit(0)
      else decideTransitionPairs(xPairs,
        ids => corpusSh.join(
          if (nX * 2 <= broadcastKeyMax) broadcast(ids) else ids,
          Seq("doc_id"), "left_semi"),
        shs => corpusSh.join(
          if (nX * 2 <= broadcastKeyMax) broadcast(shs) else shs,
          Seq("sh"), "left_semi")
          .groupBy("sh").agg(count(lit(1)).as("df")),
        minShared, maxDf, minContainment)
    val fresh = mainFresh.unionAll(xFresh).localCheckpoint(true)
    val nVerified = fresh.count()

    // 4. delta vs the current index (shared with the postings path)
    val (nUpsert, nRetired) = commitPairsDelta(spark, idxLake, idxTable,
      keyed, fresh, churn, small, at,
      extraPairs = if (nX == 0L) None else Some(xPairs))
    DedupFlow.writeCursor(spark, idxLake, idxTable, toVersion)

    Seq(churnRaw, churn, churnDocSh, rem, cands, xPairs, fresh)
      .foreach(Blocks.free)
    RefreshReport(fromVersion, toVersion, nChurn, nCands + nX, nVerified,
      nUpsert, nRetired)
  }

  /** Churn-confined `(key, textCol)` state of `src` at `version`:
    * key-stats point reads for a measured-small churn (the KeyFilter
    * pushdown), one full-scan semi-join for a bootstrap catch-up.
    * Fails loudly when the snapshot was vacuumed.
    */
  private def churnConfinedDocs(
      spark: SparkSession, src: AzofTable, version: Long, textCol: String,
      churnRaw: DataFrame, small: Boolean): DataFrame = {
    val K = TableSchema.KeyName
    val snap =
      try src.snapshot(version.toString)
      catch {
        case e: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"containment refresh needs snapshot $version of " +
              s"${src.tableDir} for the churn pre-image, but it was " +
              "vacuumed — rebuild the index from a fresh cursor", e)
      }
    if (small) {
      val ks = churnRaw.collect().map(_.getString(0)).toSet
      AzofScan.scanSnapshot(spark, src, snap, graft.format.AsOf.Current,
        projection = Some(Set(K, textCol)),
        keyFilter = Some(graft.format.KeyFilter.Keys(ks)))
    } else
      AzofScan.scanSnapshot(spark, src, snap, graft.format.AsOf.Current,
        projection = Some(Set(K, textCol)))
        .join(churnRaw, Seq(K), "left_semi")
  }

  /** Bucket-local i<j pair emit over sorted member arrays, keeping
    * pairs sharing at least `minShared` buckets — the one-shot's
    * blocking shape over an explicit `ids`-array column.
    */
  private def pairEmit(idsFrame: DataFrame, minShared: Int): DataFrame =
    idsFrame
      .select(explode(flatten(transform(col("ids"), (a, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))), b =>
          struct(a.as("doc_a"), b.as("doc_b")))))).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select("doc_a", "doc_b")

  /** Exact re-decision for GUARD-TRANSITION pairs: pairs among docs
    * none of which churned, whose verdict still changes because OTHER
    * docs' churn moved a shared bucket's df across the maxDf guard.
    * Recomputes each pair's TRUE guard-passing shared-shingle count
    * (the one-shot's n_shared) from the endpoints' full shingle sets
    * plus a per-shingle df lookup, then exact-verifies — so these
    * pairs enter (a bucket shrank under the guard) or leave (grew past
    * it) the index exactly when the one-shot's verdict does. `shFor`
    * maps a doc-id frame to its `(doc_id, sh)` shingles; `dfFor` maps
    * a shingle frame to `(sh, df)` — corpus-derived on the scan path,
    * posting-served on the postings path.
    */
  private def decideTransitionPairs(
      xPairs: DataFrame,
      shFor: DataFrame => DataFrame,
      dfFor: DataFrame => DataFrame,
      minShared: Int, maxDf: Int, minContainment: Double): DataFrame = {
    val inv = xPairs.select(col("doc_a").as("doc_id"))
      .unionAll(xPairs.select(col("doc_b").as("doc_id"))).distinct()
    val sh = shFor(inv)
    val dfs = dfFor(sh.select(col("sh")).distinct())
    val pairDocs = xPairs
      .select(struct(col("doc_a"), col("doc_b")).as("_p"))
      .select(col("_p"), explode(array(col("_p.doc_a"), col("_p.doc_b")))
        .as("doc_id"))
      .withColumn("_isA", col("doc_id") === col("_p.doc_a"))
    val passing = pairDocs.join(sh, Seq("doc_id"))
      .groupBy(col("_p"), col("sh"))
      .agg(max(when(col("_isA"), 1L).otherwise(0L)).as("_a"),
        max(when(!col("_isA"), 1L).otherwise(0L)).as("_b"))
      .where(col("_a") === 1L && col("_b") === 1L)
      .join(dfs.where(col("df").between(2L, maxDf.toLong)),
        Seq("sh"), "left_semi")
      .groupBy(col("_p")).agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
      .select(col("_p.doc_a").as("doc_a"), col("_p.doc_b").as("doc_b"))
    Dedup.containmentVerify(passing, sh, minContainment)
  }

  /** The postings-backed refresh: NO corpus pass — the posting table
    * (shingle → exact `df` + member ids while `df <= idsCap`) is
    * maintained from the same cursor's CDC range and then serves the
    * blocking buckets directly. Per refresh the reads are: the churned
    * docs at the range's two endpoint versions (pre-image + new state,
    * key-stats point reads), the touched/blocking shingles' posting
    * rows (key-stats pruned buckets), and the candidates' endpoint
    * docs. Posting maintenance is exact set algebra per shingle:
    * `ids' = ids − removed + added` with `df' = |ids'|`; stop-shingles
    * past `idsCap` keep only the exact `df` (every blocking pass skips
    * them since `maxDf <= idsCap`), updated by churn deltas — valid
    * because pre-image membership is an invariant of the table (a
    * removal's doc IS a member, an addition's doc is NOT). A
    * stop-shingle dropping back under the cap re-derives its members
    * from one corpus scan confined map-side to exactly those shingles
    * (rare — logged in no report field; the spec pins the common path
    * corpus-scan-free). The posting commit is EXACTLY-ONCE per
    * consumed range (`stream_batches` guard keyed by `toVersion`):
    * overflow `df` arithmetic is not idempotent, so a crash-replayed
    * range skips the already-applied commit, then re-derives the
    * (idempotent) pairs delta as usual.
    *
    * Default (numeric) mode requires CANONICAL numeric keys (cast
    * round-trip, e.g. "7" not "007") — posting members are stored as
    * strings and looked back up by key, so a non-canonical key would
    * silently miss; refused loudly instead.
    */
  private def refreshViaPostings(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, idxTable: String, postTable: String,
      at: Instant, minShared: Int, maxDf: Int, minContainment: Double,
      broadcastKeyMax: Long, keyed: Boolean, idsCap: Int,
      fromVersion: Long, toVersion: Long): RefreshReport = {
    require(maxDf <= idsCap,
      s"maxDf ($maxDf) must be <= the posting table's idsCap ($idsCap): " +
        "blocking needs member ids for every bucket it may keep")
    // postings are a CREATE-TIME choice per index: enabling them on an
    // index whose cursor already advanced (scan-path refreshes consumed
    // ranges the posting table never saw) would leave the postings
    // permanently blind to the pre-cursor corpus — silent missed pairs
    require(
      DedupFlow.readCursor(spark, idxLake, idxTable).isEmpty ||
        AzofTable(spark, idxLake, postTable).currentVersion.toLong > 1L ||
        fromVersion <= AzofChangeFeed.earliestFeedBase(
          spark, srcLake, srcTable),
      s"posting table '$postTable' is empty but the index cursor is " +
        s"already at v$fromVersion — earlier refreshes ran WITHOUT " +
        "postings, so the posting table would miss the pre-cursor " +
        "corpus. Rebuild the index from a fresh cursor with postings " +
        "enabled from the start (or keep the scan-based refresh)")
    val K = TableSchema.KeyName
    val src = AzofTable(spark, srcLake, srcTable)
    import org.apache.spark.sql.types.{ArrayType, StringType}

    // typed doc id (long in default mode, raw string keyed) with the
    // same loud validation as the scan path, plus the canonical-form
    // check the posting lookback needs
    val idTyped =
      if (keyed)
        when(col(K).contains("|"),
          raise_error(concat(
            lit("ContainIndex keyed mode: key contains the '|' " +
              "pair-key delimiter: '"), col(K), lit("'"))))
          .otherwise(col(K))
      else coalesce(col(K).try_cast("long"),
        raise_error(concat(
          lit("ContainIndex.refresh needs long-castable keys (got '"),
          col(K),
          lit("') — pass keyed = true for string-keyed corpora")))
          .cast("long"))
    val idStr =
      if (keyed) idTyped
      else when(idTyped.cast("string") =!= col(K),
        raise_error(concat(
          lit("ContainIndex postings mode needs CANONICAL numeric " +
            "keys (cast round-trip): got '"), col(K), lit("'"))))
        .otherwise(col(K))

    // churned keys from the CDC range (raw strings, for KeyFilter reads)
    val churnKeys = spark.read.format("azof")
      .option("table", srcTable)
      .option("changesFrom", fromVersion)
      .option("changesTo", toVersion)
      .load(srcLake)
      .select(col(K))
      .distinct()
      .localCheckpoint(true)
    val nChurn = churnKeys.count()
    val small = nChurn <= broadcastKeyMax

    // churn-confined (key, text) state at the range's two endpoint
    // versions — key-stats point reads, full-scan semi-join bootstrap
    val pre = Dedup.shingles(
      churnConfinedDocs(spark, src, fromVersion, textCol, churnKeys, small),
      col(textCol), idStr).localCheckpoint(true)
    val neu = Dedup.shingles(
      churnConfinedDocs(spark, src, toVersion, textCol, churnKeys, small),
      col(textCol), idStr).localCheckpoint(true)

    // posting set algebra per touched shingle
    val rem = pre.join(neu, Seq("doc_id", "sh"), "left_anti")
    val add = neu.join(pre, Seq("doc_id", "sh"), "left_anti")
    val emptyArr = array().cast(ArrayType(StringType))
    val touched = rem.groupBy("sh")
      .agg(collect_set(col("doc_id")).as("_rem"))
      .join(add.groupBy("sh").agg(collect_set(col("doc_id")).as("_add")),
        Seq("sh"), "full_outer")
      .select(col("sh"),
        coalesce(col("_rem"), emptyArr).as("_rem"),
        coalesce(col("_add"), emptyArr).as("_add"))
      .localCheckpoint(true)
    val nTouched = touched.count()

    // posting rows for a shingle set — bucket-pruned read (Keys filter
    // when measured small, full posting scan semi-joined bootstrap)
    def postingRead(shFrame: DataFrame, n: Long): DataFrame = {
      val pt = AzofTable(spark, idxLake, postTable)
      if (n <= broadcastKeyMax) {
        val shs = shFrame.select("sh").collect().map(_.getString(0)).toSet
        AzofScan.scanSnapshot(spark, pt, pt.currentSnapshot,
          graft.format.AsOf.Current,
          keyFilter = Some(graft.format.KeyFilter.Keys(shs)))
      } else
        AzofScan.scan(spark, idxLake, postTable)
          .join(shFrame.select(col("sh").as(K)), Seq(K), "left_semi")
    }

    val oldPost = postingRead(touched, nTouched)
      .select(col(K).as("sh"), col("df").as("_df_o"), col("ids").as("_ids_o"))
    val mergedPost = touched.join(oldPost, Seq("sh"), "left")
      .withColumn("_ids_o_arr",
        when(col("_ids_o").isNotNull,
          from_json(col("_ids_o"), ArrayType(StringType))))
      // a row is KNOWN when its members are stored (or it never
      // existed); an overflow row keeps only the exact df
      .withColumn("_known", col("_df_o").isNull || col("_ids_o").isNotNull)
      .withColumn("_ids_n",
        when(col("_known"),
          array_sort(array_union(
            array_except(coalesce(col("_ids_o_arr"), emptyArr), col("_rem")),
            col("_add")))))
      .withColumn("_df_n",
        when(col("_known"), size(col("_ids_n")).cast("long"))
          .otherwise(col("_df_o") - size(col("_rem")) + size(col("_add"))))
      .localCheckpoint(true)

    // RARE: an overflow shingle dropped back under the cap — its
    // members were never stored; re-derive exactly those postings from
    // one corpus scan confined map-side to the recovering shingles
    val recoverSh = mergedPost
      .where(!col("_known") && col("_df_n") <= idsCap)
      .select("sh").localCheckpoint(true)
    val nRecover = recoverSh.count()
    val withRec =
      if (nRecover == 0L)
        mergedPost.withColumn("_ids_r", lit(null).cast(ArrayType(StringType)))
      else {
        val corpus = spark.read.format("azof")
          .option("table", srcTable)
          .option("versionAsOf", toVersion.toString)
          .load(srcLake)
          .select(col(K), col(textCol))
        val hintR =
          if (nRecover <= broadcastKeyMax) broadcast(recoverSh) else recoverSh
        mergedPost.join(
          Dedup.shingles(corpus, col(textCol), idStr)
            .join(hintR, Seq("sh"), "left_semi")
            .groupBy("sh")
            .agg(array_sort(collect_set(col("doc_id"))).as("_ids_r")),
          Seq("sh"), "left")
      }
    val stampTs = lit(java.sql.Timestamp.from(at))
    val postRows = withRec.select(
      col("sh").as(K),
      stampTs.as(TableSchema.EventTimeName),
      when(col("_df_n") <= 0L, lit(null).cast("long"))
        .otherwise(col("_df_n")).as("df"),
      when(col("_df_n") <= 0L, lit(null).cast("string"))
        .when(col("_ids_r").isNotNull, to_json(col("_ids_r")))
        .when(col("_known") && col("_df_n") <= idsCap, to_json(col("_ids_n")))
        .otherwise(lit(null).cast("string")).as("ids"),
      when(col("_df_n") <= 0L, lit(true))
        .otherwise(lit(null).cast("boolean")).as(TableSchema.DeletedName))
    // EXACTLY-ONCE posting commit per consumed range (see scaladoc)
    graft.streaming.AzofSink.commitBatch(idxLake, postTable, postRows,
      toVersion, s"contain-postings#$postTable")
    ()

    // typed, sorted member array from a JSON ids string
    def typedIds(jsonIds: org.apache.spark.sql.Column) = {
      val s = from_json(jsonIds, ArrayType(StringType))
      if (keyed) array_sort(s)
      else array_sort(transform(s, x => x.cast("long")))
    }

    // blocking buckets: every shingle the churned docs currently carry,
    // served from the UPDATED posting table (bucket-pruned read); the
    // df guard sees the shingle's TRUE corpus frequency, so it decides
    // exactly as the one-shot does, and every shared shingle of a
    // churn-touching pair is itself a churn shingle — candidate
    // completeness matches the scan path argument verbatim
    val blockSh = neu.select("sh").distinct().localCheckpoint(true)
    val nBlock = blockSh.count()
    val buckets = postingRead(blockSh, nBlock)
      .where(col("df").between(2L, maxDf.toLong))
      .select(
        when(col("ids").isNull, raise_error(concat(
          lit("contain posting for shingle '"), col(K),
          lit("' has df <= maxDf but no stored member ids — posting " +
            "invariant broken (mixed idsCap values across refreshes?)")))
          .cast("string"))
          .otherwise(col("ids")).as("_j"))
      .select(typedIds(col("_j")).as("ids"))
    val emitted = pairEmit(buckets, minShared)
    val churnIds = churnKeys.select(idTyped.as("doc_id"))
    def hinted(df: DataFrame) = if (small) broadcast(df) else df
    val cands = emitted
      .join(hinted(churnIds.withColumnRenamed("doc_id", "doc_a")),
        Seq("doc_a"), "left_semi")
      .select("doc_a", "doc_b")
      .unionAll(emitted
        .join(hinted(churnIds.withColumnRenamed("doc_id", "doc_b")),
          Seq("doc_b"), "left_semi")
        .select("doc_a", "doc_b"))
      .distinct()
      .localCheckpoint(true)
    val nCands = cands.count()

    // guard-transition pairs (see decideTransitionPairs): the posting
    // rows carry old-vs-new df directly, so transitions read off the
    // merge — shrink re-decides the CURRENT members, growth the OLD
    val typedArr = (c: org.apache.spark.sql.Column) =>
      if (keyed) array_sort(c)
      else array_sort(transform(c, x => x.cast("long")))
    val xIds = withRec
      .where(col("_df_o").isNotNull && col("_df_o") > maxDf.toLong &&
        col("_df_n").between(2L, maxDf.toLong))
      .select(typedArr(coalesce(col("_ids_r"), col("_ids_n"))).as("ids"))
      .unionAll(withRec
        .where(col("_df_o").isNotNull &&
          col("_df_o").between(2L, maxDf.toLong) &&
          col("_df_n") > maxDf.toLong)
        .select(typedArr(col("_ids_o_arr")).as("ids")))
    val xPairs = pairEmit(xIds, minShared = 1)
      .join(hinted(churnIds.withColumnRenamed("doc_id", "doc_a")),
        Seq("doc_a"), "left_anti")
      .join(hinted(churnIds.withColumnRenamed("doc_id", "doc_b")),
        Seq("doc_b"), "left_anti")
      .localCheckpoint(true)
    val nX = xPairs.count()

    // endpoint docs' shingles read churn-confined from the source
    // (canonical keys), never a corpus pass — shared by the main
    // verify and the transition re-decision
    def shForIds(ids: DataFrame): DataFrame = {
      val keysF = ids.select(col("doc_id").cast("string").as(K))
        .distinct().localCheckpoint(true)
      val n = keysF.count()
      val docs =
        if (n <= broadcastKeyMax) {
          val ks = keysF.collect().map(_.getString(0)).toSet
          AzofScan.scanSnapshot(spark, src, src.snapshot(toVersion.toString),
            graft.format.AsOf.Current,
            projection = Some(Set(K, textCol)),
            keyFilter = Some(graft.format.KeyFilter.Keys(ks)))
        } else
          AzofScan.scanSnapshot(spark, src, src.snapshot(toVersion.toString),
            graft.format.AsOf.Current,
            projection = Some(Set(K, textCol)))
            .join(keysF, Seq(K), "left_semi")
      Dedup.shingles(docs, col(textCol), idTyped)
    }
    val invSh = shForIds(cands.select(col("doc_a").as("doc_id"))
      .unionAll(cands.select(col("doc_b").as("doc_id"))))
    val mainFresh = Dedup.containmentVerify(cands, invSh, minContainment)
    val xFresh =
      if (nX == 0L) mainFresh.limit(0)
      else decideTransitionPairs(xPairs, shForIds,
        shs => {
          val shF = shs.localCheckpoint(true)
          postingRead(shF, shF.count())
            .select(col(K).as("sh"), col("df"))
        },
        minShared, maxDf, minContainment)
    val fresh = mainFresh.unionAll(xFresh).localCheckpoint(true)
    val nVerified = fresh.count()

    val (nUpsert, nRetired) = commitPairsDelta(spark, idxLake, idxTable,
      keyed, fresh, churnIds, small, at,
      extraPairs = if (nX == 0L) None else Some(xPairs))
    DedupFlow.writeCursor(spark, idxLake, idxTable, toVersion)

    Seq(churnKeys, pre, neu, touched, mergedPost, recoverSh, blockSh,
      cands, xPairs, fresh).foreach(Blocks.free)
    RefreshReport(fromVersion, toVersion, nChurn, nCands + nX, nVerified,
      nUpsert, nRetired)
  }

  /** Step 4 of a refresh, shared by the scan and postings paths: stale
    * = indexed pairs touching churn that did not re-verify
    * (tombstones); upsert = verified pairs that are new or changed —
    * ONE mixed data+tombstone commit, bounded writes.
    */
  private def commitPairsDelta(
      spark: SparkSession, idxLake: String, idxTable: String,
      keyed: Boolean, fresh: DataFrame, churn: DataFrame,
      small: Boolean, at: Instant,
      extraPairs: Option[DataFrame] = None): (Long, Long) = {
    def hinted(df: DataFrame) = if (small) broadcast(df) else df
    // mode-matched id types: joining the numeric view against keyed
    // string ids would type-coerce the keys to bigint and fail ANSI
    val cur = (if (keyed) pairsKeyed(spark, idxLake, idxTable)
               else pairs(spark, idxLake, idxTable))
      .select(col("doc_a"), col("doc_b"),
        col("n_inter").as("_ci"), col("n_a").as("_ca"), col("n_b").as("_cb"))
    // eligible for retirement: indexed pairs touching churn, plus any
    // guard-transition pairs (re-decided this refresh, so an indexed
    // one that no longer passes must tombstone even though neither
    // endpoint churned)
    val curTouching = cur
      .join(hinted(churn.withColumnRenamed("doc_id", "doc_a")),
        Seq("doc_a"), "left_semi")
      .select(cur.columns.map(col): _*)
      .unionAll(cur
        .join(hinted(churn.withColumnRenamed("doc_id", "doc_b")),
          Seq("doc_b"), "left_semi")
        .select(cur.columns.map(col): _*))
      .unionAll(extraPairs.fold(cur.limit(0))(x =>
        cur.join(x.select("doc_a", "doc_b"), Seq("doc_a", "doc_b"),
            "left_semi")
          .select(cur.columns.map(col): _*)))
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
    Blocks.free(rows)
    (nUpsert, nRetired)
  }
}
