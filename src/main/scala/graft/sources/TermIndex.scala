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

  def create(
      spark: SparkSession,
      idxLake: String, idxTable: String = "term_postings",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    AzofWriter.createTableIfAbsent(
      spark, idxLake, idxTable, PostingSchema, segmentStart)
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
        val rows = deltaBatch(spark, batch, textCol, srcLake, srcTable,
          broadcastKeyMax)
        AzofSink.commitBatch(idxLake, idxTable, rows, id, appId)
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
      broadcastKeyMax: Long): DataFrame = {
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
      return outRow(postings(slim.limit(0), K, textCol), deleted = false)
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
    outRow(upserts, deleted = false)
      .unionByName(outRow(removals, deleted = true))
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
    val rows = postings(live, TableSchema.KeyName, textCol)
      .select(
        concat(col("term"), lit(Sep), col("doc")).as(TableSchema.KeyName),
        lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName),
        col("term"), col("doc"), col("tf"), col("pos"))
    val n = rows.count()
    if (n > 0) AzofWriter.commitDelta(spark, idxLake, newTable, rows, at, at)
    n
  }
}
