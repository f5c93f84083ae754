package graft.sources

import graft.format.{AsOf, ColumnDef, ColumnType, KeyFilter, TableSchema}
import graft.format.AzofTable
import graft.streaming.AzofSink
import java.time.Instant
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** PERSISTED full-text inverted index — term search over a 100-TB
  * corpus without a corpus scan per query. One azof ROW PER POSTING
  * (`key = term ⊕ docKey`, values `(term, doc, tf)`), not one row per
  * term: a stop word's posting list is millions of DISTRIBUTED rows
  * instead of one unbounded array cell, updates touch exactly the
  * churned documents' postings, and a by-key compaction gives the
  * layout term-range locality so a query's posting read FILE-SKIPS to
  * its terms' key ranges ([[KeyFilter.Range]] on `term ⊕ …`).
  *
  * Incremental maintenance is the family's commit-exact shape: each
  * micro-batch tokenizes only ITS documents (newest version per key;
  * nothing for tombstones), reads the churned keys' PRE-image text via
  * one time-travel scan (key-stats confined under the broadcast
  * guard — [[LmIndex]]'s move), and commits ONE mixed delta: postings
  * whose term frequency changed or appeared upsert, postings whose
  * term vanished from the document land as tombstone rows
  * (`_azof_deleted` — the replication shape [[AzofSink.commitBatch]]
  * already speaks). Unchanged postings write nothing, so steady-state
  * refresh I/O is churn-sized. Exactly-once through the
  * `stream_batches` replay guard; the fixed posting stamp + the pinned
  * commit-seq tie-break make delete→re-insert histories serve the
  * newest state. Source ROLLBACK keeps the family's documented
  * epoch-rebuild hatch ([[rebuildEpoch]]).
  *
  * Tokenization is [[TextAnalysis]]'s whitespace/lowercase contract
  * (`split(lower(text), "\\s+")`) — the same tokens the LM stats
  * count, and expressible in the oracle's SQL dialect for the hash
  * gate.
  */
object TermIndex {

  /** Posting-key separator: `term ⊕ docKey`. Terms are
    * whitespace-split so they cannot contain U+0001 in practice;
    * doc keys must not (the engine-wide reserved-byte contract).
    */
  val Sep = "\u0001"

  /** One posting: the term, its document, its in-document frequency
    * (`tf` — ranking evidence, maintained exactly), and its token
    * POSITIONS as a delta-encoded comma-joined string (`"3,10,4"` =
    * positions 3, 13, 17 in the whitespace token sequence) — the
    * classic positional-postings layout that makes phrase and
    * proximity queries index-servable. A string cell, not an array:
    * positions per (term, doc) are tf-bounded (a cell, not a posting
    * list — the distribution stays one ROW per posting), and deltas
    * keep the bytes small on dense terms.
    */
  val PostingSchema: TableSchema = TableSchema(Seq(
    ColumnDef("term", ColumnType.AzString, nullable = true),
    ColumnDef("doc", ColumnType.AzString, nullable = true),
    ColumnDef("tf", ColumnType.AzInt, nullable = true),
    ColumnDef("pos", ColumnType.AzString, nullable = true)))

  /** The one event_time every posting carries ([[LmIndex.StatsStamp]]'s
    * reasoning: replayable index, ties resolved by commit seq).
    */
  val PostingStamp: Instant = Instant.parse("2024-01-02T00:00:00Z")

  /** DOC-LENGTH side table (`key = docKey`): one slim row per live
    * NON-EMPTY document with its total token count — the `|d|` a
    * length-normalized ranking (BM25) needs, derived per batch from
    * the SAME checkpointed posting join the refresh already pays
    * (`Σ tf` new vs pre — zero extra source reads). An emptied or
    * deleted document's row tombstones.
    */
  def dlTableName(idxTable: String): String = s"${idxTable}__dl"

  val DlSchema: TableSchema = TableSchema(Seq(
    ColumnDef("doc", ColumnType.AzString, nullable = true),
    ColumnDef("len", ColumnType.AzInt, nullable = true)))

  /** CORPUS-STATS side table: ONE row (`key = "corpus"`) carrying the
    * live non-empty document count and total token count — `N` and
    * `avgdl`'s ingredients, served by one single-row read instead of
    * an O(n_docs) aggregate per query. Updated per batch as
    * `old + delta` under its own replay guard (exactly-once: the
    * value depends only on its OWN old state plus the batch).
    */
  def stTableName(idxTable: String): String = s"${idxTable}__st"

  val StSchema: TableSchema = TableSchema(Seq(
    ColumnDef("n_docs", ColumnType.AzInt, nullable = true),
    ColumnDef("total_len", ColumnType.AzInt, nullable = true)))

  def create(
      spark: SparkSession,
      idxLake: String, idxTable: String = "term_postings",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    // an index whose postings PREDATE the length/stats side tables has
    // history those tables never saw — refreshing forward would serve
    // silently wrong lengths to ranked search; the epoch rebuild is
    // the documented upgrade. Checked BEFORE creating, so the throw
    // repeats until the operator actually rebuilds.
    val pExists = scala.util.Try(
      AzofTable(spark, idxLake, idxTable).currentVersion).isSuccess
    val sExists = scala.util.Try(
      AzofTable(spark, idxLake, stTableName(idxTable)).currentVersion)
      .isSuccess
    if (pExists && !sExists) throw new IllegalStateException(
      s"term index '$idxTable' predates doc-length maintenance — " +
        "rebuild it via TermIndex.rebuildEpoch (CLI: term-rebuild) " +
        "before refreshing")
    AzofWriter.createTableIfAbsent(
      spark, idxLake, idxTable, PostingSchema, segmentStart)
    AzofWriter.createTableIfAbsent(
      spark, idxLake, stTableName(idxTable), StSchema, segmentStart)
    AzofWriter.createTableIfAbsent(
      spark, idxLake, dlTableName(idxTable), DlSchema, segmentStart)
    ()
  }

  /** `(doc, term, tf, pos)` for every token of `rows`' `textCol` —
    * positions are the token's index in the whitespace split (a
    * leading-whitespace empty token is filtered AFTER position
    * assignment, so offsets between real tokens are stable), sorted
    * and delta-encoded. The `IF(i = 0, …)` keeps `element_at` away
    * from index 0 (ANSI-safe); for `i ≥ 1`, 1-based `element_at(ps, i)`
    * is exactly the previous (0-based `i−1`) element.
    */
  private def postings(
      rows: DataFrame, docCol: String, textCol: String): DataFrame =
    rows
      .select(col(docCol).as("doc"),
        split(lower(col(textCol)), "\\s+").as("_w"))
      .select(col("doc"), posexplode(col("_w")).as(Seq("_p", "term")))
      .where(col("term") =!= "")
      .groupBy("doc", "term")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("_p").cast("long"))).as("_ps"))
      .withColumn("pos", array_join(
        expr("transform(_ps, (x, i) -> " +
          "IF(i = 0, x, x - element_at(_ps, i)))"), ","))
      .drop("_ps")

  /** Incrementally refresh the postings from the source's commit feed
    * (AvailableNow by default).
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
        val (rows, dlRows, stRows) = deltaBatch(spark, batch, textCol,
          srcLake, srcTable, idxLake, idxTable, broadcastKeyMax)
        AzofSink.commitBatch(idxLake, idxTable, rows, id, appId)
        // each side table's delta depends only on ITS OWN old state
        // plus the batch, so a crash between the three commits replays
        // exactly-once on all of them (the MatView dv reasoning)
        dlRows.foreach(dl => AzofSink.commitBatch(idxLake,
          dlTableName(idxTable), dl, id, s"$appId#dl"))
        stRows.foreach(st => AzofSink.commitBatch(idxLake,
          stTableName(idxTable), st, id, s"$appId#st"))
        graft.operators.Blocks.freeReferenced(rows)
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** One feed micro-batch → one mixed upsert/tombstone delta over the
    * touched postings: per churned key, `new` postings come from its
    * newest batch version (nothing for a tombstone), `pre` postings
    * from its live text at the batch's predecessor version; postings
    * whose `tf` changed (or appeared) upsert, postings whose term
    * vanished tombstone, unchanged postings write NOTHING.
    */
  private def deltaBatch(
      spark: SparkSession, batch: Dataset[Row], textCol: String,
      srcLake: String, srcTable: String,
      idxLake: String, idxTable: String,
      broadcastKeyMax: Long)
      : (DataFrame, Option[DataFrame], Option[DataFrame]) = {
    val K = TableSchema.KeyName
    val slim = batch
      .select(col(K), col(textCol), col("_commit_version"), col("_deleted"))
      .localCheckpoint(true)
    val bounds = slim.agg(
      min(col("_commit_version")), count_distinct(col(K))).collect()(0)
    def outRow(df: DataFrame, deleted: Boolean): DataFrame =
      df.select(
        concat(col("term"), lit(Sep), col("doc")).as(K),
        lit(java.sql.Timestamp.from(PostingStamp))
          .as(TableSchema.EventTimeName),
        col("term"), col("doc"), col("tf"), col("pos"),
        lit(deleted).as(TableSchema.DeletedName))
    if (bounds.isNullAt(1) || bounds.getLong(1) == 0L) {
      graft.operators.Blocks.freeReferenced(slim.toDF())
      return (outRow(postings(slim.limit(0), K, textCol), deleted = false),
        None, None)
    }
    val (minV, nChurned) = (bounds.getLong(0), bounds.getLong(1))
    val wKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col(K)).orderBy(col("_commit_version").desc)
    val newRows = slim
      .withColumn("_rn", row_number().over(wKey))
      .where(col("_rn") === 1 && !col("_deleted"))
      .select(col(K), col(textCol))
    val src = AzofTable(spark, srcLake, srcTable)
    val (_, preSnap) = AzofChangeFeed.mainAtOrBefore(spark, src, minV - 1)
    val churned = slim.select(col(K)).distinct()
    val preRows =
      (if (nChurned <= broadcastKeyMax) {
        val keys = churned.collect().map(_.getString(0)).toSet
        graft.operators.AzofScan.scanSnapshot(spark, src, preSnap,
          AsOf.Current, projection = Some(Set(K, textCol)),
          keyFilter = Some(KeyFilter.Keys(keys)))
      } else
        graft.operators.AzofScan.scanSnapshot(spark, src, preSnap,
          AsOf.Current, projection = Some(Set(K, textCol)))
          .join(churned, Seq(K), "left_semi"))
        .select(col(K), col(textCol))
    val newP = postings(newRows, K, textCol)
    val preP = postings(preRows, K, textCol)
      .withColumnRenamed("tf", "_tf_pre")
      .withColumnRenamed("pos", "_pos_pre")
    val joined = newP.join(preP, Seq("doc", "term"), "full_outer")
      .localCheckpoint(true)
    graft.operators.Blocks.freeReferenced(slim.toDF())
    // a posting rewrites when its tf OR its position list moved (a
    // token relocation with equal tf still changes phrase truth);
    // unchanged postings — same tf, same positions — write NOTHING
    val upserts = joined
      .where(col("tf").isNotNull &&
        !(col("tf") <=> col("_tf_pre") && col("pos") <=> col("_pos_pre")))
      .select(col("term"), col("doc"), col("tf"), col("pos"))
    val removals = joined
      .where(col("tf").isNull)
      .select(col("term"), col("doc"), lit(null).cast("long").as("tf"),
        lit(null).cast("string").as("pos"))
    // DOC LENGTHS + CORPUS STATS off the SAME checkpointed join: a
    // doc's new/pre length is Σ tf over its new/pre postings (null =
    // absent/emptied on that side) — zero extra source reads
    val lens = joined.groupBy("doc").agg(
      sum(col("tf")).as("_ln"), sum(col("_tf_pre")).as("_lp"))
    val dlStamp = lit(java.sql.Timestamp.from(PostingStamp))
      .as(TableSchema.EventTimeName)
    val dlRows = lens
      .where(!(col("_ln") <=> col("_lp"))) // unchanged lengths write NOTHING
      .select(col("doc").as(TableSchema.KeyName), dlStamp,
        col("doc"), col("_ln").as("len"),
        col("_ln").isNull.as(TableSchema.DeletedName))
    // stats delta from the churned docs alone; new row = old + delta
    // (exactly-once under its own replay guard)
    val d = lens.agg(
      sum(coalesce(col("_ln"), lit(0L)) - coalesce(col("_lp"), lit(0L))),
      sum(when(col("_ln").isNotNull && col("_lp").isNull, 1L)
        .when(col("_ln").isNull && col("_lp").isNotNull, -1L)
        .otherwise(0L))).collect()(0)
    val (dLen, dDocs) =
      (if (d.isNullAt(0)) 0L else d.getLong(0),
        if (d.isNullAt(1)) 0L else d.getLong(1))
    val old = graft.operators.AzofScan
      .scan(spark, idxLake, stTableName(idxTable))
      .select(col("n_docs"), col("total_len")).collect()
    val (oDocs, oLen) =
      if (old.isEmpty) (0L, 0L) else (old(0).getLong(0), old(0).getLong(1))
    val stRows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("corpus",
        java.sql.Timestamp.from(PostingStamp),
        oDocs + dDocs, oLen + dLen))),
      StSchema.toStruct)
    (outRow(upserts, deleted = false)
      .unionByName(outRow(removals, deleted = true)),
      Some(dlRows), Some(stRows))
  }

  /** The documents matching EVERY query term (`AND`) or ANY (`OR`),
    * with the summed term frequency as ranking evidence — served from
    * the posting table alone: one key-range read per term (file-skipped
    * on a by-key-compacted layout), never a corpus scan. Output
    * `(doc, n_terms, sum_tf)` sorted by nothing (compose ordering
    * above).
    */
  def search(
      spark: SparkSession,
      idxLake: String, idxTable: String,
      terms: Seq[String], requireAll: Boolean = true): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    val normed = terms.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    val scans = normed.map { t =>
      graft.operators.AzofScan.scan(spark, idxLake, idxTable,
        projection = Some(Set("term", "doc", "tf")),
        keyFilter = Some(KeyFilter.Range(
          Some(t + Sep), Some(t + Sep + "\uffff"))))
        .where(col("term") === t)
    }
    val all = scans.reduce(_.unionByName(_))
    val agg = all.groupBy("doc")
      .agg(count_distinct(col("term")).as("n_terms"),
        sum(col("tf")).as("sum_tf"))
    if (requireAll) agg.where(col("n_terms") === normed.size.toLong)
    else agg
  }

  /** PHRASE search: documents containing the query terms CONSECUTIVELY,
    * with the exact occurrence count — served from the positional
    * postings alone (one key-range read per term, file-skipped on a
    * by-key-compacted layout), never a corpus scan. Per document, the
    * per-term delta-encoded positions rebuild to absolutes (an
    * `aggregate` prefix-sum — tf-bounded cells, codegen'd), and the
    * match set folds left: start positions `S₀ = pos(t₀)`,
    * `Sᵢ = Sᵢ₋₁ ∩ (pos(tᵢ) − i)` — a document survives with
    * `n_hits = |S_{k−1}|` phrase occurrences. Output `(doc, n_hits)`.
    */
  def searchPhrase(
      spark: SparkSession,
      idxLake: String, idxTable: String,
      terms: Seq[String]): DataFrame = {
    val normed = terms.map(_.toLowerCase.trim).filter(_.nonEmpty)
    require(normed.nonEmpty, "searchPhrase needs at least one term")
    // decode "d0,d1,d2" deltas to absolute positions: running prefix sum
    val decode = "aggregate(transform(split(pos, ','), " +
      "x -> CAST(x AS BIGINT)), " +
      "struct(CAST(0 AS BIGINT) AS s, CAST(array() AS ARRAY<BIGINT>) AS a), " +
      "(acc, x) -> struct(acc.s + x AS s, " +
      "concat(acc.a, array(acc.s + x)) AS a), acc -> acc.a)"
    def scanTerm(t: String, i: Int): DataFrame =
      graft.operators.AzofScan.scan(spark, idxLake, idxTable,
        projection = Some(Set("term", "doc", "pos")),
        keyFilter = Some(KeyFilter.Range(
          Some(t + Sep), Some(t + Sep + "\uffff"))))
        .where(col("term") === t)
        .select(col("doc"), expr(decode).as(s"_pos_$i"))
    val joined = normed.zipWithIndex
      .map { case (t, i) => scanTerm(t, i) }
      .reduce((a, b) => a.join(b, "doc")) // inner: every term present
    val matches = normed.indices.tail.foldLeft(col("_pos_0"))((s, i) =>
      array_intersect(s, expr(s"transform(_pos_$i, x -> x - $i)")))
    joined.select(col("doc"), size(matches).cast("long").as("n_hits"))
      .where(col("n_hits") > 0L)
  }

  /** PROXIMITY (NEAR) search: documents where `a` and `b` occur within
    * `maxDist` token positions, with the pair count and the MINIMUM
    * distance as ranking evidence — two key-range posting reads, the
    * pair arithmetic over tf-bounded decoded position arrays (nested
    * `transform`/`filter`, codegen'd; no explode, no corpus scan).
    * Output `(doc, n_pairs, min_dist)`.
    */
  def searchNear(
      spark: SparkSession,
      idxLake: String, idxTable: String,
      a: String, b: String, maxDist: Int): DataFrame = {
    require(maxDist >= 1, "searchNear needs maxDist >= 1")
    val (na, nb) = (a.toLowerCase.trim, b.toLowerCase.trim)
    require(na.nonEmpty && nb.nonEmpty && na != nb,
      "searchNear needs two distinct non-empty terms")
    val decode = "aggregate(transform(split(pos, ','), " +
      "x -> CAST(x AS BIGINT)), " +
      "struct(CAST(0 AS BIGINT) AS s, CAST(array() AS ARRAY<BIGINT>) AS a), " +
      "(acc, x) -> struct(acc.s + x AS s, " +
      "concat(acc.a, array(acc.s + x)) AS a), acc -> acc.a)"
    def scanTerm(t: String, out: String): DataFrame =
      graft.operators.AzofScan.scan(spark, idxLake, idxTable,
        projection = Some(Set("term", "doc", "pos")),
        keyFilter = Some(KeyFilter.Range(
          Some(t + Sep), Some(t + Sep + "\uffff"))))
        .where(col("term") === t)
        .select(col("doc"), expr(decode).as(out))
    scanTerm(na, "_pa").join(scanTerm(nb, "_pb"), "doc")
      .select(col("doc"),
        expr(s"aggregate(transform(_pa, x -> size(filter(_pb, " +
          s"y -> abs(y - x) <= ${maxDist}L))), 0, (s, n) -> s + n)")
          .cast("long").as("n_pairs"),
        expr("array_min(transform(_pa, x -> " +
          "array_min(transform(_pb, y -> abs(y - x)))))")
          .cast("long").as("min_dist"))
      .where(col("n_pairs") > 0L)
  }

  /** PREFIX term search: documents containing ANY term starting with
    * `prefix`, with the matched-term count and summed tf — ONE
    * `KeyFilter.Range(prefix, prefix ⊕ U+FFFF)` posting read (the
    * `term ⊕ doc` key layout makes every prefix a contiguous key
    * range; on a by-key-compacted layout the scan file-skips to it),
    * never a term enumeration or a corpus scan. Output
    * `(doc, n_terms, sum_tf)`.
    */
  def searchPrefix(
      spark: SparkSession,
      idxLake: String, idxTable: String,
      prefix: String): DataFrame = {
    val p = prefix.toLowerCase.trim
    require(p.nonEmpty, "searchPrefix needs a non-empty prefix")
    graft.operators.AzofScan.scan(spark, idxLake, idxTable,
      projection = Some(Set("term", "doc", "tf")),
      keyFilter = Some(KeyFilter.Range(Some(p), Some(p + "\uffff"))))
      .where(col("term").startsWith(p))
      .groupBy("doc")
      .agg(count_distinct(col("term")).as("n_terms"),
        sum(col("tf")).as("sum_tf"))
  }

  /** Relevance-RANKED search: tf·idf in the exact INTEGER bit-magnitude
    * space ([[graft.operators.TextAnalysis.lmScore]]'s reasoning — a
    * float `ln` hash-differs on evaluation order alone, `length(bin(x))`
    * is exact in every engine): per query term its idf weight is
    * `mag(nDocs) − mag(df)` with `df` COUNTED FROM THE POSTINGS (one
    * key-range read per term — never a corpus scan), and a document
    * scores `Σ tf · idf` over the terms it matches. `nDocs` is the live
    * corpus size — pass it from a registered count [[MatView]] (the
    * composition that keeps ranking corpus-scan-free end to end) or any
    * cheaper-than-scan source of truth.
    */
  def searchRanked(
      spark: SparkSession,
      idxLake: String, idxTable: String,
      terms: Seq[String], nDocs: Long): DataFrame = {
    val normed = terms.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    require(normed.nonEmpty, "searchRanked needs at least one term")
    val rows = normed.map { t =>
      graft.operators.AzofScan.scan(spark, idxLake, idxTable,
        projection = Some(Set("term", "doc", "tf")),
        keyFilter = Some(KeyFilter.Range(
          Some(t + Sep), Some(t + Sep + "\uffff"))))
        .where(col("term") === t)
    }.reduce(_.unionByName(_))
    // df per term from the SAME posting rows (each live posting is one
    // distinct (term, doc)), idf = mag(N) − mag(df), score = Σ tf·idf
    val withDf = rows.join(
      rows.groupBy("term").agg(count(lit(1)).as("_df")), Seq("term"))
    def mag(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      length(bin(c)).cast("long")
    withDf
      .withColumn("_w", mag(lit(nDocs)) - mag(col("_df")))
      .groupBy("doc")
      .agg(count_distinct(col("term")).as("n_terms"),
        sum(col("tf") * col("_w")).as("score"))
  }

  /** Reconciliation hatch after a source ROLLBACK: re-tokenize the
    * CURRENT live corpus into `newTable` (the SemDedupIndex epoch
    * shape). Returns the posting count.
    */
  def rebuildEpoch(
      spark: SparkSession,
      srcLake: String, srcTable: String, textCol: String,
      idxLake: String, newTable: String,
      at: Instant): Long = {
    create(spark, idxLake, newTable, at)
    val live = graft.operators.AzofScan.scan(spark, srcLake, srcTable)
      .select(col(TableSchema.KeyName), col(textCol))
    val p = postings(live, TableSchema.KeyName, textCol)
      .localCheckpoint(true)
    val rows = p.select(
      concat(col("term"), lit(Sep), col("doc")).as(TableSchema.KeyName),
      lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName),
      col("term"), col("doc"), col("tf"), col("pos"))
    val n = rows.count()
    if (n > 0) AzofWriter.commitDelta(spark, idxLake, newTable, rows, at, at)
    // doc lengths + corpus stats off the same retrained postings
    val lens = p.groupBy("doc").agg(sum(col("tf")).as("len"))
    val dlRows = lens.select(
      col("doc").as(TableSchema.KeyName),
      lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName),
      col("doc"), col("len"))
    if (n > 0) AzofWriter.commitDelta(spark, idxLake,
      dlTableName(newTable), dlRows, at, at)
    val tot = lens.agg(count(lit(1)), sum(col("len"))).collect()(0)
    val stRows = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row("corpus",
        java.sql.Timestamp.from(at),
        if (tot.isNullAt(0)) 0L else tot.getLong(0),
        if (tot.isNullAt(1)) 0L else tot.getLong(1)))),
      StSchema.toStruct)
    AzofWriter.commitDelta(spark, idxLake, stTableName(newTable),
      stRows, at, at)
    graft.operators.Blocks.freeReferenced(p)
    n
  }

  /** BM25-RANKED search, exactly length-normalized and exactly
    * reproducible cross-engine: the classic BM25 shape with
    * `k1 = 6/5`, `b = 3/4`, and the family's integer bit-magnitude
    * idf, shifted positive (`1 + mag(N) − mag(df)` —
    * [[searchRanked]]'s reasoning: a float `ln` hash-differs across
    * engines, `length(bin(x))` is exact; the +1 keeps a
    * same-bit-length `df ≈ N` term contributing instead of zeroing
    * out). With integer constants the per-term factor reduces to one
    * rational,
    *
    *   `tf·(k1+1) / (tf + k1·(1 − b + b·dl·N/L))
    *      = 44·tf·L / (20·L·tf + 6·L + 18·dl·N)`,
    *
    * evaluated in double with a FIXED operand order and summed over
    * the (fixed, small) query term list left-to-right — every step an
    * IEEE correctly-rounded op on exact-integer inputs, so Spark and
    * any IEEE SQL engine produce the identical bits (only
    * transcendentals and unordered SUMs diverge; this uses neither).
    *
    * `requireAll = true` is conjunctive (documents matching EVERY
    * term); `false` is the standard IR disjunctive top-k shape —
    * documents matching ANY term, a missing term contributing exactly
    * `0.0` (tf coalesces to 0, so the per-term rational is a true
    * IEEE zero and the left-to-right sum keeps its fixed operand
    * order — bit-exactness survives the OR).
    *
    * Served index-only: one key-range posting read per term, EVERY
    * term's document frequency from ONE unioned aggregate job over
    * the same pruned ranges (not one count() barrier per term), the
    * doc-length join against the slim one-row-per-live-doc `__dl`
    * table, and `N`/`L` from the ONE-ROW `__st` stats table — never a
    * corpus scan, no O(n_docs) aggregate at query time. Output
    * `(doc, dl, score)`.
    */
  def searchBm25(
      spark: SparkSession,
      idxLake: String, idxTable: String,
      terms: Seq[String], requireAll: Boolean = true): DataFrame = {
    val normed = terms.map(_.toLowerCase.trim).filter(_.nonEmpty).distinct
    require(normed.nonEmpty, "searchBm25 needs at least one term")
    val st = graft.operators.AzofScan
      .scan(spark, idxLake, stTableName(idxTable))
      .select(col("n_docs"), col("total_len")).collect()
    // a MISSING stats row is an index that was never refreshed (or a
    // pre-doc-length build) — loud, naming the remedy; n_docs == 0 is a
    // legitimately empty / fully-deleted corpus — SQL semantics, an
    // empty result, not an error
    if (st.isEmpty) throw new IllegalStateException(
      s"term index '$idxTable' has no corpus stats — refresh it (or " +
        "rebuild a pre-doc-length index via term-rebuild) before " +
        "ranked search")
    if (st(0).getLong(0) == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("dl",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType))))
    val (nDocs, totLen) = (st(0).getLong(0), st(0).getLong(1))
    def mag(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    def scanTerm(t: String, i: Int): DataFrame =
      graft.operators.AzofScan.scan(spark, idxLake, idxTable,
        projection = Some(Set("term", "doc", "tf")),
        keyFilter = Some(KeyFilter.Range(
          Some(t + Sep), Some(t + Sep + "\uffff"))))
        .where(col("term") === t)
        .select(col("doc"), col("tf").as(s"_tf_$i"))
    val frames = normed.zipWithIndex.map { case (t, i) => scanTerm(t, i) }
    // EVERY term's df in ONE job (each live posting is one distinct
    // (term, doc)): a unioned aggregate over the same pruned ranges —
    // one count() action per term would pay one scheduler barrier per
    // term, 20 sequential job launches for a 20-term query
    val dfRows = normed.indices.map(i =>
      frames(i).select(lit(i).as("_ti")))
      .reduce(_.unionByName(_))
      .groupBy(col("_ti")).agg(count(lit(1)).as("_df"))
      .collect()
    val dfByTerm = dfRows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dfs = normed.indices.map(i => dfByTerm.getOrElse(i, 0L))
    // AND: inner joins — every term present. OR: full-outer joins — a
    // document matching ANY term survives, its missing terms' tf
    // coalescing to 0 below
    val cand =
      if (requireAll) frames.reduce((a, b) => a.join(b, "doc"))
      else frames.reduce((a, b) => a.join(b, Seq("doc"), "full_outer"))
    val dl = graft.operators.AzofScan
      .scan(spark, idxLake, dlTableName(idxTable))
      .select(col("doc"), col("len"))
    val scored = cand.join(dl, "doc")
    val L = lit(totLen.toDouble)
    val N = lit(nDocs.toDouble)
    def termScore(i: Int): org.apache.spark.sql.Column = {
      val w = lit((1L + mag(nDocs) - mag(math.max(dfs(i), 1L))).toDouble)
      val tf = coalesce(col(s"_tf_$i"), lit(0L)).cast("double")
      w * (lit(44.0) * tf * L) /
        (lit(20.0) * L * tf + lit(6.0) * L +
          lit(18.0) * col("len").cast("double") * N)
    }
    scored.select(col("doc"), col("len").as("dl"),
      normed.indices.map(termScore).reduce(_ + _).as("score"))
  }
}
