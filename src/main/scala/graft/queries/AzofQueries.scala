package graft.queries

import graft.Tables
import graft.format._
import graft.operators.AzofScan
import graft.sources.AzofWriter
import java.nio.file.Files
import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end exercise of the azof format itself inside the driver's
  * correctness gate: build a real azof table (base + two deltas) from the
  * `events` table, scan it AS OF a cut point through the production scan
  * path, and let DuckDB verify the equivalent latest-row-per-key query on
  * the raw events. This proves snapshot commit, segment/delta pruning,
  * file-precedence dedup, and ms-timestamp fidelity in one query.
  */
object AzofQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q18_azof_roundtrip" -> roundtrip,
    "q32_key_lookup" -> keyLookup,
    "q33_sql_insert" -> sqlInsert,
    "q46_sql_ctas" -> sqlCtas,
    "q34_bykey_lookup" -> byKeyLookup,
    "q40_sql_merge" -> sqlMerge,
    "q47_branch_merge" -> branchMerge,
    "q41_value_skip" -> valueSkip,
    "q35_change_feed" -> changeFeed,
    "q49_publish_preview" -> publishPreview,
    "q42_version_tag" -> versionTag,
    "q43_rollback" -> rollbackView,
    "q44_zorder_skip" -> zorderSkip,
    "q36_strict_precedence" -> strictPrecedence,
    "q37_tombstone_delete" -> tombstoneDelete,
    "q38_mirror_delete" -> mirrorDelete,
    "q45_native_mirror" -> nativeMirror,
    "q48_wap_mirror" -> wapMirror,
    "q50_wap_fold_publish" -> wapFoldPublish,
    "q39_predicate_delete" -> predicateDelete,
    "s07_pq_codes_index" -> pqCodesIndex,
    "s08_minhash_sig_index" -> minhashSigIndex,
    "t20_lm_index" -> lmStatsIndex,
    "q51_matview" -> matViewServe,
    "q52_matview_rebuild" -> matViewRebuild,
    "q53_mv_rewrite" -> matViewRewrite,
    "q54_join_view" -> joinViewServe,
    "q55_join_rewrite" -> joinViewRewrite,
    "q56_mv_avg_rewrite" -> matViewAvgRewrite,
    "q57_star_view" -> starViewRewrite,
    "q58_mv_nullable" -> matViewNullable,
    "q59_mv_pinned_rewrite" -> matViewPinnedRewrite,
    "q60_mv_distinct" -> matViewDistinctRewrite,
    "q61_star_distinct" -> starDistinctRewrite,
    "q62_star_pinned_rewrite" -> starPinnedRewrite,
    "q63_mv_timebucket" -> matViewTimeBucket,
    "q64_star_timebucket" -> starDayRewrite,
    "q65_mv_histogram" -> matViewHistogram,
    "q66_mv_histogram_rewrite" -> matViewHistogramRewrite,
    "q67_mv_pinned_histogram" -> matViewPinnedHistogram,
    "q68_mv_bucket_slice" -> matViewBucketSlice,
    "q69_star_pinned_histogram" -> starPinnedHistogram,
    "q70_mv_sum_histogram" -> matViewSumHistogram,
    "q71_star_sum_histogram" -> starSumHistogram,
    "q72_mv_tuple_distinct" -> matViewTupleDistinct,
    "q73_star_tuple_distinct" -> starTupleDistinct,
    "q74_mv_asof_rewrite" -> matViewAsOfRewrite,
    "q75_mv_auto_rewrite" -> matViewAutoRewrite,
    "q76_star_asof_rewrite" -> starAsOfRewrite,
    "q77_mv_tuple_histogram" -> matViewTupleHistogram,
    "q78_star_tuple_histogram" -> starTupleHistogram,
    "q79_mv_ddl_rewrite" -> matViewDdlRewrite,
    "q80_star_ddl_rewrite" -> starDdlRewrite,
    "q81_star_mixed_asof" -> starMixedAsOfRewrite,
    "q82_mv_nullable_tuple" -> matViewNullableTupleHistogram,
    "q83_star_nullable_tuple" -> starNullableTupleHistogram,
    "q84_mv_filtered_rewrite" -> matViewFilteredRewrite,
    "q85_star_filtered_rewrite" -> starFilteredRewrite,
    "q86_snowflake_rewrite" -> snowflakeRewrite,
    "q87_mv_variance" -> matViewVariance,
    "q88_star_variance" -> starVariance,
    "x03_hll_mv" -> matViewHllApprox,
    "x04_hll_star" -> starHllApprox,
    "x05_approx_rewrite" -> matViewApproxRewrite,
    "x06_star_approx_rewrite" -> starApproxRewrite)

  /** Materialize a CONF-SCOPED query's rows while its confs still
    * hold. The driver's Verify writes a returned frame through a FRESH
    * QueryExecution (`.write` re-plans the logical tree), by which
    * time the session confs are unset and the optimizer falls back to
    * the corpus plan. For value-identical queries that is invisible
    * (the rewrite's exactness contract), but estimator- or
    * rounding-order-sensitive outputs — HLL estimates, the
    * fixed-operand-order variance rational — must ship the GATED
    * plan's own rows. The collect is driver-sized by construction:
    * bounded by the query's group cardinality (a handful of rows),
    * never corpus rows.
    */
  private def pinned(s: SparkSession, q: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    s.createDataFrame(q.collect().toSeq.asJava, q.schema)
  }

  /** Re-root a conf-scoped rewrite query on its REWRITTEN optimized
    * plan, so the returned frame EXECUTES the view-served plan.
    *
    * The rewrite confs (`spark.azof.mv.rewrite` & co.) are set only
    * inside the query function; every LATER action on the returned
    * Dataset — the bench's `count()`, Verify's parquet write — builds a
    * NEW QueryExecution from the logical plan, re-running the optimizer
    * with the confs already unset. Returning `q` itself therefore
    * silently executed the ORIGINAL corpus scan+join plan (identical
    * rows — the rewrite is exactness-gated — but none of the served
    * plan's cost profile; measured: q69 count 1.07 s corpus vs 0.57 s
    * served, min-of-5 interleaved). Wrapping the already-rewritten
    * optimizedPlan keeps the conf scoping AND makes execution read the
    * view: the serve is version-pinned inside the rewrite (the
    * freshness gate's ordering argument), so no conf needs to survive,
    * and re-optimization of the wrapped plan is inert (no azof
    * aggregate remains for the rule to match).
    */
  private def servedFrame(q: DataFrame): DataFrame =
    org.apache.spark.sql.graft.StreamingBridge.ofRows(
      q.sparkSession, q.queryExecution.optimizedPlan)

  /** Cache-key hash of a scale-factor dir. */
  private def dirKey(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)

  /** Build-once lakehouse cache under java.io.tmpdir: resolve (or build)
    * the lakehouse tagged `tag` for scale-factor `dir` and return its
    * path. Each committed table is a deterministic function of its
    * inputs, so it is cached per dir and rebuilt only when the
    * `_COMMITTED` marker under `table` is absent. Tags carry a format
    * generation (e.g. "rt-v2": key stats in the snapshot) so a cache
    * from an older build never masks newer snapshot metadata.
    *
    * `build` receives the lakehouse path to populate. With
    * `inPlace = false` it runs against a fresh temp dir that is
    * atomically renamed into the cache slot (losing the rename race
    * falls back to the winner's or the just-built copy). Builders that
    * must know the FINAL path up front (a registered catalog points at
    * it) pass `inPlace = true`: any partial previous attempt is cleared
    * and the cache dir is built directly.
    */
  private[queries] def cachedLake(
      dir: String, tag: String, table: String, inPlace: Boolean = false)(
      build: String => Unit): String = {
    val cached = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft-azof-$tag-${dirKey(dir)}")
    val marker = new java.io.File(new java.io.File(cached, table), "_COMMITTED")
    if (marker.isFile) return cached.toString
    if (inPlace) {
      if (cached.isDirectory) {
        import scala.reflect.io.Directory
        new Directory(cached).deleteRecursively()
        ()
      }
      cached.mkdirs()
      build(cached.toString)
      Files.createFile(marker.toPath)
      cached.toString
    } else {
      val tmp = Files.createTempDirectory("azof-build").toString
      build(tmp)
      Files.createFile(java.nio.file.Paths.get(tmp, table, "_COMMITTED"))
      if (new java.io.File(tmp).renameTo(cached) || marker.isFile)
        cached.toString
      else tmp // lost a race or cross-device rename failed; use as built
    }
  }

  /** events as azof rows: ms-truncated timestamps up front so engine and
    * oracle agree on event_time values and as-of cuts.
    */
  private def eventsKv(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .withColumn("ts", date_trunc("millisecond", col("ts")))
      .select(
        col("user_id").cast("string").as("key"),
        col("ts").as("event_time"),
        col("event_type"),
        col("props"))

  private val eventsSchema = TableSchema(Seq(
    ColumnDef("event_type", ColumnType.AzString, nullable = false),
    ColumnDef("props", ColumnType.AzString, nullable = false)))

  /** The events_kv lakehouse (base + two deltas split by time). */
  private def ensureLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "rt-v2", "events_kv") { lake =>
      val kv = eventsKv(s, dir)
      AzofWriter.createTable(s, lake, "events_kv", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))

      val d10 = "2024-01-10 00:00:00"
      val d20 = "2024-01-20 00:00:00"
      AzofWriter.commitBase(s, lake, "events_kv",
        kv.where(col("event_time") < expr(s"TIMESTAMP '$d10'")))
      AzofWriter.commitDelta(s, lake, "events_kv",
        kv.where(col("event_time") >= expr(s"TIMESTAMP '$d10'") &&
          col("event_time") < expr(s"TIMESTAMP '$d20'")),
        Instant.parse("2024-01-10T00:00:00Z"), Instant.parse("2024-01-20T00:00:00Z"))
      AzofWriter.commitDelta(s, lake, "events_kv",
        kv.where(col("event_time") >= expr(s"TIMESTAMP '$d20'")),
        Instant.parse("2024-01-20T00:00:00Z"), Instant.parse("2024-02-01T00:00:00Z"))
    }

  private def roundtrip(s: SparkSession, dir: String): DataFrame =
    AzofScan.scan(s, ensureLake(s, dir), "events_kv",
        AsOf.EventTime(Instant.parse("2024-01-25T00:00:00Z")))
      .select("key", "event_time", "event_type")

  /** The events lake split base / delta / delta at Jan 10 and Jan 20
    * (version 3 = base + first delta = everything before Jan 20), on a
    * DEDICATED cached table so tag/rollback commits cannot couple to
    * the shared q18 lake's version numbering.
    */
  private def ensureVtLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "vt-v1", "events_vt") { lake =>
      val kv = eventsKv(s, dir)
      AzofWriter.createTable(s, lake, "events_vt", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val d10 = "2024-01-10 00:00:00"
      val d20 = "2024-01-20 00:00:00"
      AzofWriter.commitBase(s, lake, "events_vt",
        kv.where(col("event_time") < expr(s"TIMESTAMP '$d10'")))
      AzofWriter.commitDelta(s, lake, "events_vt",
        kv.where(col("event_time") >= expr(s"TIMESTAMP '$d10'") &&
          col("event_time") < expr(s"TIMESTAMP '$d20'")),
        Instant.parse("2024-01-10T00:00:00Z"),
        Instant.parse("2024-01-20T00:00:00Z"))
      AzofWriter.commitDelta(s, lake, "events_vt",
        kv.where(col("event_time") >= expr(s"TIMESTAMP '$d20'")),
        Instant.parse("2024-01-20T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"))
      // tag the pre-Jan-20 state (part of the cached build: the tag
      // commit lands exactly once per cache slot)
      AzofWriter.tagVersion(s, lake, "events_vt", "jan-cut", Some(3L))
      ()
    }

  /** Z-ORDER-compacted lake under the oracle gate: all events land in
    * one partitioned commit, compaction z-orders the merged state on
    * `(key, event_type)` into 8 `unique`-flagged files, and the value-
    * predicate scan then takes the SINGLE-VERSION closure-free pruning
    * path ([[graft.format.ValueStats.prune]]) through the public
    * reader — the one layout/provenance combination where an
    * uncorrelated value predicate prunes files at all. The oracle is
    * q41's winner-is-purchase recomputation over the full corpus: a
    * pruning bug that drops a winner, or a z-write that loses a row,
    * cannot hash-match.
    */
  private def zorderSkip(s: SparkSession, dir: String): DataFrame = {
    val lake = cachedLake(dir, "zc-v1", "events_zc") { tmp =>
      AzofWriter.createTable(s, tmp, "events_zc", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitPartitioned(s, tmp, "events_zc", eventsKv(s, dir),
        numFiles = 8)
      AzofWriter.compact(s, tmp, "events_zc",
        Instant.parse("2024-06-01T00:00:00Z"), numFiles = 8,
        zorder = Seq("event_type"))
    }
    s.read.format("azof").option("table", "events_zc").load(lake)
      .where(col("event_type") === "purchase")
      .select("key", "event_time", "event_type")
  }

  /** NAMED version ref under the oracle gate: `versionAsOf = 'jan-cut'`
    * through the public reader resolves the tag via the current
    * snapshot's ref index ([[graft.format.AzofTable.resolveVersion]])
    * and must read exactly version 3's view — latest-row-per-key over
    * events before Jan 20 — even though the table has moved on. A
    * resolution bug (wrong version, refs not carried forward by the
    * later delta commit) cannot hash-match.
    */
  private def versionTag(s: SparkSession, dir: String): DataFrame =
    s.read.format("azof").option("table", "events_vt")
      .option("versionAsOf", "jan-cut")
      .load(ensureVtLake(s, dir))
      .select("key", "event_time", "event_type")

  /** Append-only ROLLBACK under the oracle gate: a copy of the vt lake
    * rolls back to version 3, and the CURRENT scan afterwards must read
    * exactly the pre-Jan-20 view — same oracle as q42 but through a
    * different mechanism (rollback commit restores the old segment
    * tree; q42 time-travels to it). A rollback that dropped files,
    * carried the head's segments, or broke precedence cannot
    * hash-match.
    */
  private def rollbackView(s: SparkSession, dir: String): DataFrame = {
    val lake = cachedLake(dir, "rb-v1", "events_rb") { tmp =>
      val kv = eventsKv(s, dir)
      AzofWriter.createTable(s, tmp, "events_rb", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val d10 = "2024-01-10 00:00:00"
      val d20 = "2024-01-20 00:00:00"
      AzofWriter.commitBase(s, tmp, "events_rb",
        kv.where(col("event_time") < expr(s"TIMESTAMP '$d10'")))
      AzofWriter.commitDelta(s, tmp, "events_rb",
        kv.where(col("event_time") >= expr(s"TIMESTAMP '$d10'") &&
          col("event_time") < expr(s"TIMESTAMP '$d20'")),
        Instant.parse("2024-01-10T00:00:00Z"),
        Instant.parse("2024-01-20T00:00:00Z"))
      AzofWriter.commitDelta(s, tmp, "events_rb",
        kv.where(col("event_time") >= expr(s"TIMESTAMP '$d20'")),
        Instant.parse("2024-01-20T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"))
      AzofWriter.rollback(s, tmp, "events_rb", 3L)
      ()
    }
    s.read.format("azof").option("table", "events_rb").load(lake)
      .select("key", "event_time", "event_type")
  }

  /** Key point-lookup through the PUBLIC reader surface with a WHERE on
    * `key`: the filter flows through the relation's pushdown into
    * stats-based file skipping ([[graft.format.FileStats]]) and the
    * residual predicate, so this gates both the skip logic and its
    * exactness against DuckDB. (This layout partitions files by time,
    * not key — numeric-string user ids spread across every file — so the
    * query exercises the conservative keep-everything path end to end;
    * DataSkippingSpec pins the actually-skips-files cases on
    * key-partitioned layouts.)
    */
  private def keyLookup(s: SparkSession, dir: String): DataFrame =
    s.read.format("azof").option("table", "events_kv")
      .option("asOf", "2024-01-25T00:00:00Z")
      .load(ensureLake(s, dir))
      .where(col("key").isin("7", "23", "41"))
      .select("key", "event_time", "event_type")

  /** The by-key distributed commit under the oracle gate: all events
    * land in ONE `commitPartitioned(byKey = true)` commit (files
    * range-partitioned by key, disjoint per-file key stats), then a
    * point lookup through the public reader — which prunes to the one
    * file whose range covers each key — must still match the brute
    * latest-row-per-key oracle.
    */
  private def byKeyLookup(s: SparkSession, dir: String): DataFrame = {
    val lake = cachedLake(dir, "bk-v1", "events_bk") { tmp =>
      AzofWriter.createTable(s, tmp, "events_bk", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitPartitioned(s, tmp, "events_bk", eventsKv(s, dir),
        numFiles = 8, byKey = true)
    }
    s.read.format("azof").option("table", "events_bk").load(lake)
      .where(col("key").isin("7", "23", "41", "103"))
      .select("key", "event_time", "event_type")
  }

  /** A VALUE-predicate scan over the by-key-clustered lake, under the
    * oracle gate: exercises the dedup-sound value-range pruning path
    * ([[graft.format.ValueStats]]) through the production reader — the
    * match + key-range-closure logic must return exactly the unpruned
    * answer (winners resolve BEFORE the predicate applies, so a key
    * whose newest event is not a purchase must stay absent even though
    * older purchase rows exist in kept files).
    */
  private def valueSkip(s: SparkSession, dir: String): DataFrame = {
    val lake = cachedLake(dir, "bk-v1", "events_bk") { tmp =>
      AzofWriter.createTable(s, tmp, "events_bk", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitPartitioned(s, tmp, "events_bk", eventsKv(s, dir),
        numFiles = 8, byKey = true)
    }
    s.read.format("azof").option("table", "events_bk").load(lake)
      .where(col("event_type") === "purchase")
      .select("key", "event_time", "event_type")
  }

  /** The batch CDC surface under the oracle gate: the change feed over
    * `(base commit, current]` of the events_kv lakehouse is exactly the
    * two delta commits' raw rows — every event at or after the first
    * cut, tagged with the version that committed it (delta windows
    * partition time, so the tag is a pure function of event_time). No
    * dedup: the feed is commit contents, not table state.
    */
  private def changeFeed(s: SparkSession, dir: String): DataFrame =
    graft.sources.AzofChangeFeed
      .between(s, ensureLake(s, dir), "events_kv", 2L, 4L)
      .select(col("key"), col("event_time"), col("event_type"),
        col("_commit_version"))

  /** The write-audit-publish AUDIT primitive under the oracle gate
    * ([[graft.sources.AzofChangeFeed.branchDiff]]): a branch stages one
    * upsert delta ([Jan 10, Jan 20) events, s3) and one tombstone delta
    * (keys 7 and 23 at Mar 1, s4) over a main base of the earlier
    * events — the publish preview must surface EXACTLY those staged
    * rows, upserts flagged `_deleted = false` and tombstones
    * `_deleted = true` with NULL values, each tagged with the branch
    * commit that staged it. Nothing from main's base may leak in
    * (the preview is files-since-fork, not a state diff), and a
    * dropped tombstone or missed staged file cannot hash-match.
    */
  private def publishPreview(s: SparkSession, dir: String): DataFrame = {
    val lake = cachedLake(dir, "pubprev-v1", "events_pp") { l =>
      val kv = eventsKv(s, dir)
      AzofWriter.createTable(s, l, "events_pp", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val d10 = "2024-01-10 00:00:00"
      val d20 = "2024-01-20 00:00:00"
      AzofWriter.commitBase(s, l, "events_pp",
        kv.where(col("event_time") < expr(s"TIMESTAMP '$d10'")))   // s2
      AzofWriter.createBranch(s, l, "events_pp", "stage")          // fork 2
      AzofWriter.commitDelta(s, l, "events_pp",
        kv.where(col("event_time") >= expr(s"TIMESTAMP '$d10'") &&
          col("event_time") < expr(s"TIMESTAMP '$d20'")),
        Instant.parse("2024-01-10T00:00:00Z"),
        Instant.parse("2024-01-20T00:00:00Z"),
        branch = Some("stage"))                                    // s3
      val at = java.sql.Timestamp.from(Instant.parse("2024-03-01T00:00:00Z"))
      val marks = s.createDataFrame(Seq(Tuple1("7"), Tuple1("23")))
        .select(col("_1").as("key"), lit(at).as("event_time"),
          lit(null).cast("string").as("event_type"),
          lit(null).cast("string").as("props"),
          lit(true).as(TableSchema.DeletedName))
      AzofWriter.commitDelta(s, l, "events_pp", marks,
        Instant.parse("2024-03-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"),
        branch = Some("stage"))                                    // s4
      ()
    }
    graft.sources.AzofChangeFeed.branchDiff(s, lake, "events_pp", "stage")
      .select(col("key"), col("event_time"), col("event_type"),
        col("_deleted"), col("_commit_version"))
  }

  /** The SQL WRITE surface under the oracle gate: CREATE TABLE + INSERT
    * INTO through the DSv2 catalog (→ partitioned delta commit), read
    * back through catalog SQL. The catalog name carries the sf-dir hash
    * because Spark caches catalog instances per name — one session
    * touching two scale factors (the bench's warmup) must not alias
    * their lakehouses.
    */
  private def sqlInsert(s: SparkSession, dir: String): DataFrame = {
    val key = dirKey(dir)
    val cat = s"azsql_$key"
    // inPlace: the registered catalog must point at the FINAL path
    // before the CREATE/INSERT statements run against it
    val lake = cachedLake(dir, "sqlins-v2", "events_sql", inPlace = true) { l =>
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.AzofCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.path", l)
      s.sql(
        s"""CREATE TABLE $cat.events_sql
            (key STRING, event_time TIMESTAMP, event_type STRING, props STRING)
            USING azof TBLPROPERTIES ('start'='2024-01-01T00:00:00Z')""")
      Tables(s, dir, "events").createOrReplaceTempView(s"ev_src_$key")
      s.sql(
        s"""INSERT INTO $cat.events_sql
            SELECT CAST(user_id AS STRING), date_trunc('millisecond', ts),
                   event_type, props
            FROM ev_src_$key
            WHERE date_trunc('millisecond', ts) < TIMESTAMP'2024-01-10 00:00:00'""")
      ()
    }
    // idempotent re-registration covers the cache-hit path
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.AzofCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.path", lake)
    s.sql(s"SELECT key, event_time, event_type FROM $cat.events_sql")
  }

  /** Atomic CTAS under the oracle gate
    * ([[graft.sources.AzofCatalog.stageCreate]]): the whole events
    * corpus lands through `CREATE TABLE ... USING azof AS SELECT` — the
    * table materializes in a staging directory and publishes by one
    * rename, so no reader can observe a half-written CTAS — and the
    * published table's Current scan must be the latest-row-per-key view
    * over exactly the selected rows.
    */
  private def sqlCtas(s: SparkSession, dir: String): DataFrame = {
    val key = dirKey(dir)
    val cat = s"azctas_$key"
    // inPlace: the registered catalog must point at the FINAL path
    // before the CTAS statement runs against it
    val lake = cachedLake(dir, "ctas-v1", "events_ctas", inPlace = true) { l =>
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.AzofCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.path", l)
      Tables(s, dir, "events").createOrReplaceTempView(s"ev_ctas_src_$key")
      s.sql(
        s"""CREATE TABLE $cat.events_ctas
            USING azof TBLPROPERTIES ('start'='2024-01-01T00:00:00Z')
            AS SELECT CAST(user_id AS STRING) AS key,
                      date_trunc('millisecond', ts) AS event_time,
                      event_type
               FROM ev_ctas_src_$key""")
      ()
    }
    // idempotent re-registration covers the cache-hit path
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.AzofCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.path", lake)
    s.sql(s"SELECT key, event_time, event_type FROM $cat.events_ctas")
  }

  /** SQL `MERGE INTO` through the row-level DML path
    * ([[graft.sources.AzofRowLevelOperation]]) under the oracle gate:
    * the table is seeded with every pre-Jan-10 event, then ONE MERGE
    * applies the [Jan 10, Jan 20) per-key newest event — 'view' events
    * revoke the key (tombstone delete), other matched keys update
    * (tagged `_m`), unseen keys insert (tagged `_i`). The DuckDB oracle
    * recomputes the same final state relationally (outer joins over the
    * raw events), so merge-on-read DML semantics — updates win by
    * event-time, tombstones suppress, inserts appear — are hash-checked
    * end to end.
    */
  private def sqlMerge(s: SparkSession, dir: String): DataFrame = {
    val key = dirKey(dir)
    val cat = s"azmg_$key"
    val lake = cachedLake(dir, "sqlmerge-v1", "events_mg", inPlace = true) { l =>
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.AzofCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.path", l)
      AzofWriter.createTable(s, l, "events_mg", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(s, l, "events_mg",
        eventsKv(s, dir).where(
          col("event_time") < expr("TIMESTAMP '2024-01-10 00:00:00'")))
      Tables(s, dir, "events").createOrReplaceTempView(s"mg_ev_$key")
      s.sql(
        s"""MERGE INTO $cat.events_mg t USING (
              SELECT CAST(user_id AS STRING) AS key, event_time,
                     event_type, props
              FROM (SELECT *, date_trunc('millisecond', ts) AS event_time,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY date_trunc('millisecond', ts) DESC,
                                      event_id DESC) AS rn
                    FROM mg_ev_$key
                    WHERE date_trunc('millisecond', ts) >=
                            TIMESTAMP'2024-01-10 00:00:00'
                      AND date_trunc('millisecond', ts) <
                            TIMESTAMP'2024-01-20 00:00:00')
              WHERE rn = 1) s
            ON t.key = s.key
            WHEN MATCHED AND s.event_type = 'view' THEN DELETE
            WHEN MATCHED THEN UPDATE SET event_time = s.event_time,
                 event_type = concat(s.event_type, '_m'), props = s.props
            WHEN NOT MATCHED THEN INSERT (key, event_time, event_type, props)
                 VALUES (s.key, s.event_time, concat(s.event_type, '_i'),
                         s.props)""")
      ()
    }
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.AzofCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.path", lake)
    s.sql(s"SELECT key, event_time, event_type FROM $cat.events_mg")
  }

  /** The whole branch lifecycle under the oracle gate: fork, row-level
    * DML staged ON the branch ([[graft.sources.AzofRowLevelOperation]]
    * with a lineage), main diverging past the fork, and
    * [[AzofWriter.mergeBranch]] publishing the audited state onto the
    * advanced head. The table is seeded with every pre-Jan-10 event;
    * main then commits the [Jan 20, ∞) events (divergence); a MERGE on
    * the BRANCH VIEW applies the [Jan 10, Jan 20) per-key newest event
    * as `_m` updates / `_i` inserts — matched-ness is decided against
    * the branch's fork state, NOT main's advanced state, so a lineage
    * -isolation bug (branch statement reading main's delta) flips tags
    * and cannot hash-match. After merge-branch, Current is the per-key
    * newest row across all three sources; the DuckDB oracle recomputes
    * that relationally.
    */
  private def branchMerge(s: SparkSession, dir: String): DataFrame = {
    val key = dirKey(dir)
    val cat = s"azbm_$key"
    val lake = cachedLake(dir, "brmerge-v1", "events_br", inPlace = true) { l =>
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.AzofCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.path", l)
      AzofWriter.createTable(s, l, "events_br", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(s, l, "events_br",
        eventsKv(s, dir).where(
          col("event_time") < expr("TIMESTAMP '2024-01-10 00:00:00'")))
      AzofWriter.createBranch(s, l, "events_br", "enrich")       // fork 2
      // main diverges first: the [Jan 20, ∞) events land on main
      AzofWriter.commitDelta(s, l, "events_br",
        eventsKv(s, dir).where(
          col("event_time") >= expr("TIMESTAMP '2024-01-20 00:00:00'")),
        Instant.parse("2024-01-20T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"))                   // s3 main
      Tables(s, dir, "events").createOrReplaceTempView(s"br_ev_$key")
      s.sql(
        s"""MERGE INTO $cat.events_br.branch_enrich t USING (
              SELECT CAST(user_id AS STRING) AS key, event_time,
                     event_type, props
              FROM (SELECT *, date_trunc('millisecond', ts) AS event_time,
                           row_number() OVER (PARTITION BY user_id
                             ORDER BY date_trunc('millisecond', ts) DESC,
                                      event_id DESC) AS rn
                    FROM br_ev_$key
                    WHERE date_trunc('millisecond', ts) >=
                            TIMESTAMP'2024-01-10 00:00:00'
                      AND date_trunc('millisecond', ts) <
                            TIMESTAMP'2024-01-20 00:00:00')
              WHERE rn = 1) s
            ON t.key = s.key
            WHEN MATCHED THEN UPDATE SET event_time = s.event_time,
                 event_type = concat(s.event_type, '_m'), props = s.props
            WHEN NOT MATCHED THEN INSERT (key, event_time, event_type, props)
                 VALUES (s.key, s.event_time, concat(s.event_type, '_i'),
                         s.props)""")                            // s4 branch
      AzofWriter.mergeBranch(s, l, "events_br", "enrich")        // s5
      ()
    }
    s.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.AzofCatalog].getName)
    s.conf.set(s"spark.sql.catalog.$cat.path", lake)
    s.sql(s"SELECT key, event_time, event_type FROM $cat.events_br")
  }

  /** The strict-precedence compatibility mode under the oracle gate
    * (reference semantics: lakehouse.rs:57-79 — per-key winners resolve
    * by file PRECEDENCE first, the row loop's first-seen-wins). The lake
    * is built so the two modes PROVABLY diverge: delta1 (window = the
    * full event range, committed first) holds every event; delta2
    * (window [Jan 5, Jan 15), LATER start -> higher merge precedence)
    * re-commits that inner window's events with a `_d2`-tagged
    * event_type. For every key with an event inside the inner window AND
    * a later event outside it, default mode surfaces delta1's newest
    * untagged row while strict mode surfaces delta2's tagged (older)
    * row — first-seen-wins by precedence. The DuckDB oracle expresses
    * exactly that: rank by (file precedence, event_time DESC).
    */
  private def strictPrecedence(s: SparkSession, dir: String): DataFrame = {
    val lake = cachedLake(dir, "strict-v1", "events_ov") { l =>
      val kv = eventsKv(s, dir)
      AzofWriter.createTable(s, l, "events_ov", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitDelta(s, l, "events_ov", kv,
        Instant.parse("2024-01-01T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"))
      val d5 = "2024-01-05 00:00:00"
      val d15 = "2024-01-15 00:00:00"
      AzofWriter.commitDelta(s, l, "events_ov",
        kv.where(col("event_time") >= expr(s"TIMESTAMP '$d5'") &&
            col("event_time") < expr(s"TIMESTAMP '$d15'"))
          .withColumn("event_type", concat(col("event_type"), lit("_d2"))),
        Instant.parse("2024-01-05T00:00:00Z"),
        Instant.parse("2024-01-15T00:00:00Z"))
    }
    // the mode flag is read at PLAN-CONSTRUCTION time, so scope it to
    // the scan() call and restore — the session is shared across queries
    val prev = s.conf.getOption("spark.azof.strictPrecedence")
    s.conf.set("spark.azof.strictPrecedence", "true")
    try AzofScan.scan(s, lake, "events_ov")
      .select("key", "event_time", "event_type")
    finally prev match {
      case Some(v) => s.conf.set("spark.azof.strictPrecedence", v)
      case None    => s.conf.unset("spark.azof.strictPrecedence")
    }
  }

  /** Tombstone deletes under the oracle gate: the full events history
    * lands (base + two deltas, the ensureLake layout), then two delete
    * commits — keys 7/23 at Jan 25 (mid-history: a key whose NEWEST
    * event is later survives, the event-time delete semantics) and keys
    * 41/103 at Feb 1 (past every event: unconditionally suppressed).
    * The DuckDB oracle states the rule directly: the per-key winner is
    * dropped iff its key is deleted and its event_time is at-or-before
    * that key's tombstone.
    */
  private def ensureDelLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "del-v1", "events_del") { l =>
      val kv = eventsKv(s, dir)
      AzofWriter.createTable(s, l, "events_del", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val d10 = "2024-01-10 00:00:00"
      val d20 = "2024-01-20 00:00:00"
      AzofWriter.commitBase(s, l, "events_del",
        kv.where(col("event_time") < expr(s"TIMESTAMP '$d10'")))
      AzofWriter.commitDelta(s, l, "events_del",
        kv.where(col("event_time") >= expr(s"TIMESTAMP '$d10'") &&
          col("event_time") < expr(s"TIMESTAMP '$d20'")),
        Instant.parse("2024-01-10T00:00:00Z"),
        Instant.parse("2024-01-20T00:00:00Z"))
      AzofWriter.commitDelta(s, l, "events_del",
        kv.where(col("event_time") >= expr(s"TIMESTAMP '$d20'")),
        Instant.parse("2024-01-20T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"))
      AzofWriter.commitDelete(s, l, "events_del", Seq("7", "23"),
        Instant.parse("2024-01-25T00:00:00Z"))
      AzofWriter.commitDelete(s, l, "events_del", Seq("41", "103"),
        Instant.parse("2024-02-01T00:00:00Z"))
    }

  private def tombstoneDelete(s: SparkSession, dir: String): DataFrame =
    AzofScan.scan(s, ensureDelLake(s, dir), "events_del")
      .select("key", "event_time", "event_type")

  /** The whole replication pipeline under the oracle gate: the q37 lake
    * (full history + two delete commits) mirrors TABLE-TO-TABLE through
    * the `azof-commits` streaming source and the mixed data+tombstone
    * sink ([[graft.streaming.AzofMirror]]), and the MIRROR's Current
    * scan must hash-match the same latest-row-per-key-minus-deletes
    * oracle as the source's — replication preserved every upsert, every
    * tombstone, and the event-time delete semantics at scale.
    */
  private def mirrorDelete(s: SparkSession, dir: String): DataFrame = {
    val src = ensureDelLake(s, dir)
    val lake = cachedLake(dir, "mir-v1", "events_mirror") { l =>
      AzofWriter.createTable(s, l, "events_mirror", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val q = graft.streaming.AzofMirror.replicate(s,
        src, "events_del", l, "events_mirror",
        new java.io.File(l, "_mirror_ck").toString)
      // a timed-out (still-running) replication must THROW: cachedLake
      // would otherwise cache the half-replicated mirror as complete
      // and q38 would fail its oracle forever with no hint why
      if (!q.awaitTermination(300000))
        throw new IllegalStateException(
          "mirror replication did not terminate within 300s — " +
            "refusing to cache an incomplete mirror lake")
      ()
    }
    AzofScan.scan(s, lake, "events_mirror")
      .select("key", "event_time", "event_type")
  }

  /** q38's replication pipeline through the NATIVE DSv2 streaming sink
    * ([[graft.streaming.AzofMirror.replicateNative]] →
    * `writeStream.toTable` → [[graft.sources.AzofStreamingWrite]])
    * instead of the foreachBatch helper: same commit-exact feed, same
    * mixed upsert+tombstone micro-batches, but the landing path is the
    * sink's task-parallel writers with the (query id, epoch) replay
    * guard. The mirror's Current scan must hash-match the identical
    * latest-row-per-key-minus-deletes oracle — proving the two sink
    * paths are interchangeable end to end.
    */
  private def nativeMirror(s: SparkSession, dir: String): DataFrame = {
    val src = ensureDelLake(s, dir)
    val lake = cachedLake(dir, "nmir-v1", "events_nmirror") { l =>
      AzofWriter.createTable(s, l, "events_nmirror", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val q = graft.streaming.AzofMirror.replicateNative(s,
        src, "events_del", l, "events_nmirror",
        new java.io.File(l, "_nmirror_ck").toString)
      // same timeout contract as q38: caching a half-replicated mirror
      // would fail the oracle forever with no hint why
      if (!q.awaitTermination(300000))
        throw new IllegalStateException(
          "native-sink replication did not terminate within 300s — " +
            "refusing to cache an incomplete mirror lake")
      ()
    }
    AzofScan.scan(s, lake, "events_nmirror")
      .select("key", "event_time", "event_type")
  }

  /** STREAMING write-audit-publish under the oracle gate: q45's native
    * replication, but the replica STAGES on a branch lineage of the
    * target (`replicateNative(targetBranch = ...)` →
    * `writeStream.toTable(cat.m.branch_stage)`) — every upsert and
    * tombstone invisible to the target's main readers — and goes live
    * only when `fastForward` publishes the branch head as one main
    * commit. The published Current scan must hash-match the same
    * latest-row-per-key-minus-deletes oracle as q45: a lineage-routing
    * bug (epochs leaking to main, tombstones dropped on the branch, a
    * publish that loses files) cannot hash-match. The guard inside
    * `cachedLake` additionally pins main's BLINDNESS before publish —
    * version.txt still at 1 with the full replica staged.
    */
  private def wapMirror(s: SparkSession, dir: String): DataFrame = {
    val src = ensureDelLake(s, dir)
    val lake = cachedLake(dir, "wapmir-v1", "events_wapm") { l =>
      AzofWriter.createTable(s, l, "events_wapm", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createBranch(s, l, "events_wapm", "stage")
      val q = graft.streaming.AzofMirror.replicateNative(s,
        src, "events_del", l, "events_wapm",
        new java.io.File(l, "_wapm_ck").toString,
        targetBranch = Some("stage"))
      if (!q.awaitTermination(300000))
        throw new IllegalStateException(
          "staged replication did not terminate within 300s — " +
            "refusing to cache an incomplete mirror lake")
      val t = graft.format.AzofTable(s, l, "events_wapm")
      if (t.currentVersion != "1")
        throw new IllegalStateException(
          s"staged replica leaked to main (version ${t.currentVersion})")
      AzofWriter.fastForward(s, l, "events_wapm", "stage")
      ()
    }
    AzofScan.scan(s, lake, "events_wapm")
      .select("key", "event_time", "event_type")
  }

  /** q48's staged replication with a BRANCH FOLD before publish, under
    * the same oracle contract: the native mirror stages one small delta
    * per micro-batch on the branch (the long-staged-replica shape), a
    * branch compaction folds the staged lineage into one merged tree
    * (main still blind, pointer untouched), and fast-forward publishes
    * the FOLDED tree. The published Current must hash-match the exact
    * q48/q45 latest-per-key-minus-deletes contract — so a fold that
    * loses rows, resurrects a tombstoned key, or leaks to main before
    * publish cannot hash-match. The fold point sits after every staged
    * event time, so staged tombstones fold into the tree as key absence
    * (the Current contract is unchanged; the guard inside pins both
    * main's blindness and the fold actually shrinking the file set).
    */
  private def wapFoldPublish(s: SparkSession, dir: String): DataFrame = {
    val src = ensureDelLake(s, dir)
    val lake = cachedLake(dir, "wapfold-v1", "events_wapf") { l =>
      AzofWriter.createTable(s, l, "events_wapf", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createBranch(s, l, "events_wapf", "stage")
      val q = graft.streaming.AzofMirror.replicateNative(s,
        src, "events_del", l, "events_wapf",
        new java.io.File(l, "_wapf_ck").toString,
        maxVersionsPerBatch = Some(1L),       // one delta per source commit
        targetBranch = Some("stage"))
      if (!q.awaitTermination(300000))
        throw new IllegalStateException(
          "staged replication did not terminate within 300s — " +
            "refusing to cache an incomplete mirror lake")
      val t = graft.format.AzofTable(s, l, "events_wapf")
      val headBefore = t.branchHead("stage").getOrElse(
        throw new IllegalStateException("no staged commits"))
      val filesBefore = t.snapshot(headBefore.toString)
        .dataFiles(graft.format.AsOf.Current).size
      // fold point after every staged event (source tombstones land at
      // 'now' during the lake build; one year ahead is safely past)
      AzofWriter.compact(s, l, "events_wapf",
        Instant.now().plusSeconds(365L * 24 * 3600),
        branch = Some("stage"))
      if (t.currentVersion != "1")
        throw new IllegalStateException(
          s"staged replica or fold leaked to main (version ${t.currentVersion})")
      val filesAfter = t.snapshot(t.branchHead("stage").get.toString)
        .dataFiles(graft.format.AsOf.Current).size
      if (filesAfter >= filesBefore)
        throw new IllegalStateException(
          s"fold did not shrink the staged tree ($filesBefore -> $filesAfter)")
      AzofWriter.fastForward(s, l, "events_wapf", "stage")
      ()
    }
    AzofScan.scan(s, lake, "events_wapf")
      .select("key", "event_time", "event_type")
  }

  /** The SQL predicate-delete (takedown) shape under the oracle gate:
    * the full events history lands in one base commit, then
    * `DELETE FROM cat.events_pd WHERE event_type = 'error'` through the
    * DSv2 catalog — a VALUE predicate, so the keys resolve through the
    * Current merge-dedup scan (a key is deleted iff its current winner
    * matches) and commit as one tombstone delta. The DuckDB oracle
    * states the semantics directly: the surviving rows are exactly the
    * per-key winners whose event_type is NOT 'error'.
    */
  private def predicateDelete(s: SparkSession, dir: String): DataFrame = {
    val key = dirKey(dir)
    val cat = s"azpd_$key"
    // inPlace: the registered catalog must point at the FINAL path
    // before the DELETE statement runs against it
    val lake = cachedLake(dir, "pd-v1", "events_pd", inPlace = true) { l =>
      AzofWriter.createTable(s, l, "events_pd", eventsSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(s, l, "events_pd", eventsKv(s, dir))
      s.conf.set(s"spark.sql.catalog.$cat",
        classOf[graft.sources.AzofCatalog].getName)
      s.conf.set(s"spark.sql.catalog.$cat.path", l)
      s.sql(s"DELETE FROM $cat.events_pd WHERE event_type = 'error'")
      ()
    }
    AzofScan.scan(s, lake, "events_pd")
      .select("key", "event_time", "event_type")
  }

  /** The PERSISTED PQ-code index under the oracle gate: the embeddings
    * table lands as an azof source (vectors as exact-double JSON), the
    * index trains its FROZEN seed codebooks on the INITIAL slice
    * (vec_id % 5 != 0, lloydIters = 0 — engine-replayable), and then
    * follows the source's change feed through real churn: the
    * remaining vectors arrive as a delta, one key deletes and
    * resurrects with its original vector. The final Current scan of
    * the CODES TABLE must equal DuckDB's direct replay of
    * seed → books → encode over the full embeddings table — a broken
    * incremental refresh (missed delta, stale code after resurrect,
    * undeleted tombstone) breaks the hash.
    */
  private def pqCodesIndex(s: SparkSession, dir: String): DataFrame = {
    val lake = cachedLake(dir, "pqidx-v1", "emb_codes") { l =>
      val vecSchema = TableSchema(Seq(
        ColumnDef("vec", ColumnType.AzString, nullable = false)))
      val emb = Tables(s, dir, "embeddings")
      def rows(filter: org.apache.spark.sql.Column, at: String) =
        emb.where(filter).select(
          col("vec_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          to_json(transform(col("embedding"), x => x.cast("double")))
            .as("vec"))
      AzofWriter.createTable(s, l, "emb_kv", vecSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(s, l, "emb_kv",
        rows(col("vec_id") % 5 =!= 0, "2024-01-02T00:00:00Z"))       // v2
      graft.sources.PqIndex.create(s, l, "emb_kv", "vec",
        l, "emb_codes", numSub = 8, codebookBits = 4, lloydIters = 0)
      val ck = new java.io.File(l, "_idx_ck").toString
      def refresh(): Unit = {
        val q = graft.sources.PqIndex.refresh(
          s, l, "emb_kv", "vec", l, "emb_codes", ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "index refresh did not terminate within 300s — refusing " +
              "to cache a half-refreshed index lake")
      }
      refresh()
      AzofWriter.commitDelta(s, l, "emb_kv",
        rows(col("vec_id") % 5 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))                       // v3
      AzofWriter.commitDelete(s, l, "emb_kv", Seq("7"),
        Instant.parse("2024-03-02T00:00:00Z"))                       // v4
      AzofWriter.commitDelta(s, l, "emb_kv",
        rows(col("vec_id") === 7, "2024-04-05T00:00:00Z"),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))                       // v5
      refresh()
    }
    AzofScan.scan(s, lake, "emb_codes")
      .select(col("key").cast("long").as("vec_id"), col("codes"))
  }

  /** The PERSISTED MinHash signature index under the oracle gate — the
    * signatures companion of s07: documents land as an azof source,
    * the index backfills from the change feed, then follows churn (the
    * remaining docs as a delta, one key deleted and resurrected with
    * its original text), and d02-shaped LSH candidates answered FROM
    * the persisted signatures must hash-match d02's own oracle over
    * the raw documents table — a stale, missed, or undeleted signature
    * changes the pair set.
    */
  private def minhashSigIndex(s: SparkSession, dir: String): DataFrame = {
    val lake = cachedLake(dir, "mhidx-v1", "doc_sigs") { l =>
      val docSchema = TableSchema(Seq(
        ColumnDef("text", ColumnType.AzString, nullable = false)))
      val docs = Tables(s, dir, "documents")
      def rows(filter: org.apache.spark.sql.Column, at: String) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          col("text"))
      AzofWriter.createTable(s, l, "docs_kv", docSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(s, l, "docs_kv",
        rows(col("doc_id") % 4 =!= 0, "2024-01-02T00:00:00Z"))       // v2
      graft.sources.MinHashIndex.create(s, l, "doc_sigs")
      val ck = new java.io.File(l, "_sig_ck").toString
      def refresh(): Unit = {
        val q = graft.sources.MinHashIndex.refresh(
          s, l, "docs_kv", "text", l, "doc_sigs", ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "signature refresh did not terminate within 300s — refusing " +
              "to cache a half-refreshed index lake")
      }
      refresh()
      AzofWriter.commitDelta(s, l, "docs_kv",
        rows(col("doc_id") % 4 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))                       // v3
      AzofWriter.commitDelete(s, l, "docs_kv", Seq("6"),
        Instant.parse("2024-03-02T00:00:00Z"))                       // v4
      AzofWriter.commitDelta(s, l, "docs_kv",
        rows(col("doc_id") === 6, "2024-04-05T00:00:00Z"),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))                       // v5
      refresh()
    }
    graft.sources.MinHashIndex.candidates(s, lake, "doc_sigs")
  }

  /** The PERSISTED bigram-LM stats index under the oracle gate
    * ([[graft.sources.LmIndex]]): the documents corpus lands in an azof
    * lake across TWO commits, the stats table refreshes incrementally
    * after each (the second refresh counts ONLY the second commit's
    * docs and upserts `old + new` for the touched bigrams), and the
    * scores are served from the index. The DuckDB oracle retrains the
    * whole bigram LM from scratch (t19's SQL verbatim) — so a refresh
    * that drops an increment, double-counts a replay, or mis-merges a
    * touched bigram's total cannot hash-match: index-served ≡ one-shot
    * retrain on an append-only corpus, the family's d15 equivalence.
    */
  private def lmStatsIndex(s: SparkSession, dir: String): DataFrame = {
    val lake = lmLake(s, dir)
    graft.sources.LmIndex.score(s, lake, "docs_lm", "text", lake, "lm_stats")
      .select(col("doc_id").cast("long").as("doc_id"), col("n_bigrams"),
        col("sum_surprise"), col("avg_surprise"))
  }

  /** The two-commit, twice-refreshed [[graft.sources.LmIndex]] lake
    * over the documents corpus (see [[lmStatsIndex]]) — shared with
    * Pipeline's p07 composition.
    */
  private[queries] def lmLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "lmidx-v1", "lm_stats") { l =>
      val docSchema = TableSchema(Seq(
        ColumnDef("text", ColumnType.AzString, nullable = false)))
      val docs = Tables(s, dir, "documents")
      def rows(filter: org.apache.spark.sql.Column, at: String) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          col("text"))
      AzofWriter.createTable(s, l, "docs_lm", docSchema,
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(s, l, "docs_lm",
        rows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))       // v2
      graft.sources.LmIndex.create(s, l)
      val ck = new java.io.File(l, "_lm_ck").toString
      def refresh(): Unit = {
        val q = graft.sources.LmIndex.refresh(
          s, l, "docs_lm", "text", l, "lm_stats", ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "lm-stats refresh did not terminate within 300s — refusing " +
              "to cache a half-refreshed index lake")
      }
      refresh()
      AzofWriter.commitDelta(s, l, "docs_lm",
        rows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))                       // v3
      refresh()
    }

  /** The [[graft.sources.ViewDef]] q51/q52 maintain: per-source document
    * counts, char sums, and char extrema.
    */
  private val mvDef = graft.sources.ViewDef(Seq("source"),
    sumCols = Seq("n_chars"), minMaxCols = Seq("n_chars"))

  /** Four-commit, four-times-refreshed [[graft.sources.MatView]] lake
    * over the documents corpus: base (⅔ of the docs, Jan), delta (the
    * rest, Feb — the insert-only monoid refresh), a REVISION batch that
    * moves every `doc_id % 5 = 0` doc to source `rev12` with `n_chars
    * + 4` (Apr — pre-image subtraction + min/max rescan of every group
    * that lost rows), and a tombstone delete of docs 6 and 7 (May).
    * The epoch-rebuild twin (`doc_mv_e2`, q52's table) retrains the
    * same view one-shot from the final live corpus.
    */
  private[queries] def mvLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "mv-v5", "doc_mv") { l =>
      import graft.sources.MatView
      val schema = TableSchema(Seq(
        ColumnDef("source", ColumnType.AzString, nullable = false),
        ColumnDef("n_chars", ColumnType.AzInt, nullable = false)))
      val docs = Tables(s, dir, "documents")
      def rows(filter: org.apache.spark.sql.Column, at: String,
          src: org.apache.spark.sql.Column = col("source"),
          nc: org.apache.spark.sql.Column = col("n_chars")) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          src.as("source"), nc.as("n_chars"))
      AzofWriter.createTable(s, l, "docs_mv", schema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val ck = new java.io.File(l, "_mv_ck").toString
      def refresh(): Unit = {
        val q = MatView.refresh(s, l, "docs_mv", l, "doc_mv", mvDef, ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "matview refresh did not terminate within 300s — refusing " +
              "to cache a half-refreshed view lake")
      }
      AzofWriter.commitBase(s, l, "docs_mv",
        rows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))       // v2
      refresh()
      AzofWriter.commitDelta(s, l, "docs_mv",
        rows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))                       // v3
      refresh()
      AzofWriter.commitDelta(s, l, "docs_mv",
        rows(col("doc_id") % 5 === 0, "2024-04-05T00:00:00Z",
          src = lit("rev12"), nc = col("n_chars") + 4),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))                       // v4
      refresh()
      AzofWriter.commitDelete(s, l, "docs_mv", Seq("6", "7"),
        Instant.parse("2024-05-05T00:00:00Z"))                       // v5
      refresh()
      MatView.rebuildEpoch(s, l, "docs_mv", l, "doc_mv_e2", mvDef,
        Instant.parse("2024-06-01T00:00:00Z"))
      ()
    }

  /** The INCREMENTALLY-maintained materialized view, served: per-source
    * live-doc counts/sums/extrema plus the derived mean. The oracle
    * recomputes the GROUP BY one-shot over the final live corpus — a
    * refresh that dropped an increment, double-counted a replay,
    * monoid-merged past a delete, or missed a group-move rescan cannot
    * hash-match (incremental ≡ retrain, the d15/t20 equivalence for
    * arbitrary declared aggregates).
    */
  private def matViewServe(s: SparkSession, dir: String): DataFrame = {
    val lake = mvLake(s, dir)
    graft.sources.MatView.serve(s, lake, "doc_mv", mvDef)
      .withColumn("avg_chars",
        col("sum_n_chars").cast("double") / col("n_rows"))
  }

  /** The epoch-rebuild hatch under the same oracle: `doc_mv_e2` was
    * retrained ONE-SHOT from the final live corpus (the rollback
    * reconciliation path), so it must serve byte-identically to the
    * incrementally-maintained q51 — deliberately the same oracle
    * through a different engine mechanism, the q42/q43 pairing.
    */
  private def matViewRebuild(s: SparkSession, dir: String): DataFrame = {
    val lake = mvLake(s, dir)
    graft.sources.MatView.serve(s, lake, "doc_mv_e2", mvDef)
      .withColumn("avg_chars",
        col("sum_n_chars").cast("double") / col("n_rows"))
  }

  /** The AUTOMATIC REWRITE under the oracle gate: a plain SQL GROUP BY
    * over the source table — no mention of the view — is answered FROM
    * the fresh view by [[graft.plans.MvRewriteRule]]. The function
    * REFUSES to return a plan that still aggregates the corpus (an
    * optimized-plan pin), so this row certifies rewrite-fired AND
    * rewrite-exact in one hash check against the same one-shot
    * recompute oracle as q51.
    */
  private def matViewRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = mvLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_mv")
    try {
      val q = s.sql(
        "SELECT source, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, min(n_chars) AS min_n_chars, " +
          "max(n_chars) AS max_n_chars FROM azof.docs_mv GROUP BY source")
      val aggs = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      if (aggs.nonEmpty) throw new IllegalStateException(
        "materialized-view rewrite did not fire — refusing to pass the " +
          "row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q60 [[graft.sources.ViewDef]]: per-source counts, an EXACT
    * `COUNT(DISTINCT b)` backed by the refcounted support table, and a
    * declared measure `v` whose pair-grain sum/nn totals ride the same
    * support rows (q70's sum-weighted histograms).
    */
  private val dvvDef = graft.sources.ViewDef(Seq("source"),
    sumCols = Seq("v"), distinctCols = Seq("b"),
    distinctTuples = Seq(Seq("b", "v")))

  /** Four-commit, per-commit-refreshed DISTINCT-support lake: source
    * docs with a nullable bucket `b = doc_id % 7` (NULL for every 4th
    * doc) and a nullable measure `v = n_chars` (NULL for every 9th
    * doc); a revision moving every 5th doc to source `rev12` with
    * `b + 1` and `v + 2` (value moves change refcounts AND pair sums);
    * docs 6/7 deleted (zero-crossing retirement).
    */
  private[queries] def dvLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "dvv-v3", "doc_dvv") { l =>
      import graft.sources.{AzofWriter, MatView}
      val docs = Tables(s, dir, "documents")
      AzofWriter.createTable(s, l, "docs_dv",
        TableSchema(Seq(
          ColumnDef("source", ColumnType.AzString, nullable = false),
          ColumnDef("b", ColumnType.AzInt, nullable = true),
          ColumnDef("v", ColumnType.AzInt, nullable = true))),
        Instant.parse("2024-01-01T00:00:00Z"))
      val ck = new java.io.File(l, "_dvv_ck").toString
      def refresh(): Unit = {
        val q = MatView.refresh(s, l, "docs_dv", l, "doc_dvv", dvvDef, ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "distinct-view refresh did not terminate within 300s")
      }
      val baseV =
        when(col("doc_id") % 9 === 0, lit(null)).otherwise(col("n_chars"))
      def rows(filter: org.apache.spark.sql.Column, at: String,
          src: org.apache.spark.sql.Column = col("source"),
          b: org.apache.spark.sql.Column =
            when(col("doc_id") % 4 === 0, lit(null))
              .otherwise(col("doc_id") % 7),
          v: org.apache.spark.sql.Column = null) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          src.as("source"), b.cast("long").as("b"),
          Option(v).getOrElse(baseV).cast("long").as("v"))
      AzofWriter.commitBase(s, l, "docs_dv",
        rows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "docs_dv",
        rows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "docs_dv",
        rows(col("doc_id") % 5 === 0, "2024-04-05T00:00:00Z",
          src = lit("rev12"),
          b = when(col("doc_id") % 4 === 0, lit(null))
            .otherwise((col("doc_id") % 7) + 1),
          v = when(col("doc_id") % 9 === 0, lit(null))
            .otherwise(col("n_chars") + 2)),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelete(s, l, "docs_dv", Seq("6", "7"),
        Instant.parse("2024-05-05T00:00:00Z"))
      refresh()
      ()
    }

  /** The COUNT(DISTINCT) rewrite under the oracle gate: a plain SQL
    * `count(distinct b)` — no view mentioned — served from the
    * refcounted support table by the optimizer rule. The plan gate
    * refuses any surviving azof RELATION (the corpus scan); Aggregate
    * nodes remain by design — they aggregate the index-sized support
    * table, not the corpus.
    */
  private def matViewDistinctRewrite(
      s: SparkSession, dir: String): DataFrame = {
    val lake = dvLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_dvv")
    try {
      val q = s.sql(
        "SELECT source, count(*) AS n_rows, count(DISTINCT b) AS dv_b " +
          "FROM azof.docs_dv GROUP BY source")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "distinct rewrite did not fire — refusing to pass the row " +
          "off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** Exact VALUE HISTOGRAM served from the refcounted support table:
    * `COUNT(*)` per live `b` value per source — INCLUDING the NULL
    * bucket, derived as the view's `Σ n_rows` minus the non-null refs —
    * equal to the one-shot `GROUP BY source, b` over the live corpus,
    * with zero corpus access (the query function never touches the
    * source table: pairs + view reads only). Composing
    * `ORDER BY n_rows DESC LIMIT k` above gives exact per-group heavy
    * hitters.
    */
  private def matViewHistogram(s: SparkSession, dir: String): DataFrame = {
    val lake = dvLake(s, dir)
    graft.sources.MatView.valueHistogram(s, lake, "doc_dvv", dvvDef,
      "b", Seq("source"))
  }

  /** The HISTOGRAM rewrite under the oracle gate: plain SQL grouping
    * by the DECLARED DISTINCT COLUMN itself
    * (`GROUP BY source, b … count(*)`) — the high-cardinality value
    * count — served from the refcounted support pairs plus the view's
    * row totals (NULL bucket included, value cast back to the query
    * column's Int type) by the optimizer rule. The plan gate refuses
    * any surviving azof relation (the corpus scan); Aggregates remain
    * by design — they aggregate the index-sized pair/total frames.
    */
  private def matViewHistogramRewrite(
      s: SparkSession, dir: String): DataFrame = {
    val lake = dvLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_dvv")
    try {
      val q = s.sql(
        "SELECT source, b, count(*) AS n_rows " +
          "FROM azof.docs_dv GROUP BY source, b")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "histogram rewrite did not fire — refusing to pass the row " +
          "off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The PINNED HISTOGRAM rewrite under the oracle gate: the
    * reproducible-report histogram — `VERSION AS OF <current>` grouped
    * by the distinct column — gates through the pinned walk and serves
    * from the support pairs with BOTH index snapshots pinned. Refuses
    * any surviving azof relation.
    */
  private def matViewPinnedHistogram(
      s: SparkSession, dir: String): DataFrame = {
    val lake = dvLake(s, dir)
    val v = graft.format.AzofTable(s, lake, "docs_dv").currentVersion
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_dvv")
    try {
      val q = s.sql(
        "SELECT source, b, count(*) AS n_rows " +
          s"FROM azof.docs_dv VERSION AS OF $v GROUP BY source, b")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "pinned histogram rewrite did not fire — refusing to pass the " +
          "row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The SUM-WEIGHTED histogram rewrite under the oracle gate (round
    * 14's Missing #1, closed): plain SQL grouping by the declared
    * distinct column with `count(*)`, `sum(v)`, AND `avg(v)` — the
    * measure-per-category-value dashboard — served from the support
    * pairs' per-pair `sum_v`/`nn_v` totals plus the view's row/sum
    * totals for the NULL bucket, all maintained by the same
    * `old + new − pre` arithmetic under the same replay guard.
    * Exactness rides value-moving revisions (`v + 2` on every fifth
    * doc), measure nulls (every ninth doc), distinct-column nulls, and
    * deletes. Refuses any surviving azof relation.
    */
  private def matViewSumHistogram(
      s: SparkSession, dir: String): DataFrame = {
    val lake = dvLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_dvv")
    try {
      val q = s.sql(
        "SELECT source, b, count(*) AS n_rows, sum(v) AS sum_v, " +
          "avg(v) AS avg_v FROM azof.docs_dv GROUP BY source, b")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "sum-weighted histogram rewrite did not fire — refusing to " +
          "pass the row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** [[matViewSumHistogram]]'s STAR twin (single + star in the same
    * round — the symmetry contract): per-(tier, author) counts, char
    * sums, and the derived mean over `fact ⋈ dim1 ⋈ dim2`, served from
    * the star view's pair-grain measure totals incl. the NULL author
    * bucket's sums. Refuses any surviving azof relation.
    */
  private def starSumHistogram(s: SparkSession, dir: String): DataFrame = {
    val lake = starLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_star")
    try {
      val q = s.sql(
        "SELECT tier, author, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, avg(n_chars) AS avg_n_chars " +
          "FROM azof.facts_star f " +
          "JOIN azof.src_star d1 ON f.src = d1.key " +
          "JOIN azof.bkt_star d2 ON f.bk = d2.key " +
          "GROUP BY tier, author")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "star sum-weighted histogram rewrite did not fire — refusing " +
          "to pass the row off the corpus scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The DISTINCT-TUPLE rewrite under the oracle gate:
    * `COUNT(DISTINCT b, v)` — SQL's multi-argument distinct (any-null
    * rows skipped) — served from the declared tuple's refcounted
    * support pairs (value = the components' canonical strings joined
    * by the reserved separator, injective under the loud separator
    * guard), exact under the same value-moving/null-flipping/delete
    * churn as q70. Refuses any surviving azof relation.
    */
  private def matViewTupleDistinct(
      s: SparkSession, dir: String): DataFrame = {
    val lake = dvLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_dvv")
    try {
      val q = s.sql(
        "SELECT source, count(*) AS n_rows, " +
          "count(DISTINCT b, v) AS dv_b_v " +
          "FROM azof.docs_dv GROUP BY source")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "distinct-tuple rewrite did not fire — refusing to pass the " +
          "row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** [[matViewTupleDistinct]]'s STAR twin (single + star in one
    * round): `COUNT(DISTINCT author, n_chars)` over
    * `fact ⋈ dim1 ⋈ dim2` at the tier rollup grain, served from the
    * star view's tuple support pairs — exact under the dim re-tiers
    * that move pairs across groups. Refuses any surviving azof
    * relation.
    */
  private def starTupleDistinct(s: SparkSession, dir: String): DataFrame = {
    val lake = starLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_star")
    try {
      val q = s.sql(
        "SELECT tier, count(*) AS n_rows, " +
          "count(DISTINCT author, n_chars) AS dv_an " +
          "FROM azof.facts_star f " +
          "JOIN azof.src_star d1 ON f.src = d1.key " +
          "JOIN azof.bkt_star d2 ON f.bk = d2.key " +
          "GROUP BY tier")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "star distinct-tuple rewrite did not fire — refusing to pass " +
          "the row off the corpus scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The EVENT-TIME STAR rewrite under the oracle gate (q74's join
    * twin — single + star in one round): every table read
    * `TIMESTAMP AS OF` a coordinate at-or-above its whole consumed
    * corpus; each table gates through
    * [[graft.sources.MatView.unchangedSinceAsOf]]'s per-table walk
    * inside [[graft.sources.JoinView.freshViewVersions]]. Refuses a
    * plan that still joins or aggregates.
    */
  private def starAsOfRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = starLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_star")
    try {
      val t = "2024-07-01T00:00:00Z"
      val q = s.sql(
        "SELECT tier, label, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, min(n_chars) AS min_n_chars, " +
          "max(n_chars) AS max_n_chars " +
          s"FROM azof.facts_star TIMESTAMP AS OF '$t' AS f " +
          s"JOIN azof.src_star TIMESTAMP AS OF '$t' AS d1 " +
          "ON f.src = d1.key " +
          s"JOIN azof.bkt_star TIMESTAMP AS OF '$t' AS d2 " +
          "ON f.bk = d2.key " +
          "GROUP BY tier, label")
      val residual = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "event-time star rewrite did not fire — refusing to pass the " +
          "row off the scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q77 [[graft.sources.ViewDef]]: per-source sums over `w` plus
    * a declared NON-NULLABLE tuple `(cat, sub)` — the two-dimension
    * histogram's support.
    */
  private val tupDef = graft.sources.ViewDef(Seq("source"),
    sumCols = Seq("w"), distinctTuples = Seq(Seq("cat", "sub")))

  /** Three-commit tuple-histogram lake: non-nullable dimensions
    * `cat = 'c' || doc_id % 3` / `sub = doc_id % 2` with measure
    * `w = n_chars`; the revision moves every fifth doc to `cat = 'c9'`
    * with `w + 1` (tuples move across values AND groups); docs 6/7
    * deleted.
    */
  private[queries] def tupLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "tup-v1", "doc_tup") { l =>
      import graft.sources.MatView
      val docs = Tables(s, dir, "documents")
      AzofWriter.createTable(s, l, "docs_tup",
        TableSchema(Seq(
          ColumnDef("source", ColumnType.AzString, nullable = false),
          ColumnDef("cat", ColumnType.AzString, nullable = false),
          ColumnDef("sub", ColumnType.AzInt, nullable = false),
          ColumnDef("w", ColumnType.AzInt, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      val ck = new java.io.File(l, "_tup_ck").toString
      def refresh(): Unit = {
        val q = MatView.refresh(s, l, "docs_tup", l, "doc_tup", tupDef, ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "tuple-view refresh did not terminate within 300s")
      }
      def rows(filter: org.apache.spark.sql.Column, at: String,
          cat: org.apache.spark.sql.Column =
            concat(lit("c"), (col("doc_id") % 3).cast("string")),
          w: org.apache.spark.sql.Column = col("n_chars")) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          col("source"), cat.as("cat"),
          (col("doc_id") % 2).cast("long").as("sub"),
          w.cast("long").as("w"))
      AzofWriter.commitBase(s, l, "docs_tup",
        rows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "docs_tup",
        rows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "docs_tup",
        rows(col("doc_id") % 5 === 0, "2024-04-05T00:00:00Z",
          cat = lit("c9"), w = col("n_chars") + 1),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelete(s, l, "docs_tup", Seq("6", "7"),
        Instant.parse("2024-05-05T00:00:00Z"))
      refresh()
      ()
    }

  /** The MULTI-COLUMN histogram rewrite under the oracle gate: plain
    * SQL `GROUP BY cat, sub` — a declared tuple's NON-NULLABLE
    * components — with counts, sums, and the derived mean, served from
    * the tuple's support pairs with the encoded value split back into
    * typed components. Exactness rides tuple-moving revisions and
    * deletes. Refuses any surviving azof relation (nullable components
    * refuse shape-side — spec-pinned).
    */
  private def matViewTupleHistogram(
      s: SparkSession, dir: String): DataFrame = {
    val lake = tupLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_tup")
    try {
      val q = s.sql(
        "SELECT cat, sub, count(*) AS n_rows, sum(w) AS sum_w, " +
          "avg(w) AS avg_w FROM azof.docs_tup GROUP BY cat, sub")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "tuple-histogram rewrite did not fire — refusing to pass the " +
          "row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** [[matViewTupleHistogram]]'s STAR twin: `GROUP BY tier, bk,
    * n_chars` over `fact ⋈ dims` — the declared `(bk, n_chars)` tuple
    * (both components non-nullable fact columns) plus a dim attribute —
    * served from the star view's tuple pairs. Refuses any surviving
    * azof relation.
    */
  private def starTupleHistogram(s: SparkSession, dir: String): DataFrame = {
    val lake = starLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_star")
    try {
      val q = s.sql(
        "SELECT tier, bk, n_chars, count(*) AS n_rows " +
          "FROM azof.facts_star f " +
          "JOIN azof.src_star d1 ON f.src = d1.key " +
          "JOIN azof.bkt_star d2 ON f.bk = d2.key " +
          "GROUP BY tier, bk, n_chars")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "star tuple-histogram rewrite did not fire — refusing to pass " +
          "the row off the corpus scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The BUCKET-SLICE rewrite under the oracle gate (the dashboard
    * day-slice): `WHERE date_trunc('day', t) = X GROUP BY source` —
    * the filter's derived subtree substitutes to the view's STORED
    * bucket column and confines the (group-cardinality) view scan;
    * the grain is a subset rollup, so the plan keeps an Aggregate over
    * the view but must carry no corpus relation.
    */
  private def matViewBucketSlice(s: SparkSession, dir: String): DataFrame = {
    val lake = mvtLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_mvt")
    try {
      val q = s.sql(
        "SELECT source, count(*) AS n_rows, sum(v) AS sum_v " +
          "FROM azof.docs_mvt " +
          "WHERE date_trunc('day', t) = TIMESTAMP '2024-03-01 00:00:00' " +
          "GROUP BY source")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "bucket-slice rewrite did not fire — refusing to pass the row " +
          "off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The VERSION-PINNED rewrite under the oracle gate (the
    * reproducible-report shape): `… VERSION AS OF <current>` — a pin
    * provably view-identical ([[graft.sources.MatView
    * .freshViewVersionAt]]'s walk) — is answered FROM the view; the
    * plan gate refuses a corpus scan exactly like q53, so the row
    * certifies pinned-rewrite-fired AND pinned-rewrite-exact. (A pin
    * below a state-changing commit refuses and time-travels — the
    * MvRewriteSpec pinned cases cover that half.)
    */
  private def matViewPinnedRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = mvLake(s, dir)
    val v = graft.format.AzofTable(s, lake, "docs_mv").currentVersion
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_mv")
    try {
      val q = s.sql(
        "SELECT source, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, min(n_chars) AS min_n_chars, " +
          "max(n_chars) AS max_n_chars " +
          s"FROM azof.docs_mv VERSION AS OF $v GROUP BY source")
      val aggs = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      if (aggs.nonEmpty) throw new IllegalStateException(
        "version-pinned rewrite did not fire — refusing to pass the " +
          "row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The EVENT-TIME `TIMESTAMP AS OF` rewrite under the oracle gate
    * (the reference's flagship coordinate, round 14's Missing #2): an
    * as-of aggregate at a coordinate at-or-above the whole consumed
    * corpus — every delta window and the base file's recorded
    * event-time range end at-or-below it — is answered FROM the view
    * through [[graft.sources.MatView.unchangedSinceAsOf]]'s
    * metadata-only walk. Refusal cases (a backdated delete, data above
    * the coordinate consumed by the view) are spec-side
    * (MvRewriteSpec); this row certifies asof-rewrite-fired AND exact
    * under the same reconstruction oracle as q59.
    */
  private def matViewAsOfRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = mvLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_mv")
    try {
      val q = s.sql(
        "SELECT source, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, min(n_chars) AS min_n_chars, " +
          "max(n_chars) AS max_n_chars " +
          "FROM azof.docs_mv TIMESTAMP AS OF '2024-06-01T00:00:00Z' " +
          "GROUP BY source")
      val aggs = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      if (aggs.nonEmpty) throw new IllegalStateException(
        "event-time as-of rewrite did not fire — refusing to pass the " +
          "row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** AUTO-DISCOVERY under the oracle gate: the same plain SQL as q53
    * with `spark.azof.mv.rewrite=auto` — NO view named anywhere; the
    * rule lists the lake's definition sidecars once (session-cached)
    * and serves from the discovered view. Refuses a corpus-scan plan
    * like q53, so the row certifies discovery-fired AND exact.
    */
  private def matViewAutoRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = mvLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "auto")
    try {
      val q = s.sql(
        "SELECT source, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, min(n_chars) AS min_n_chars, " +
          "max(n_chars) AS max_n_chars FROM azof.docs_mv GROUP BY source")
      val aggs = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      if (aggs.nonEmpty) throw new IllegalStateException(
        "auto-discovered rewrite did not fire — refusing to pass the " +
          "row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The DERIVED-aggregate rewrite under the oracle gate: `AVG`,
    * `COUNT(*)`, `SUM`, and an arithmetic combination over aggregates
    * in ONE plain SQL statement — no view mentioned — all served from
    * the stored totals by [[graft.plans.MvRewriteRule]]'s
    * expression-tree decomposition (`AVG(c)` = `sum_c / nn_c`, the
    * same i64 totals Spark's own Average produces, divided once in
    * double). Refuses a corpus-scan plan exactly like q53, so the row
    * certifies rewrite-fired AND avg-exact in one hash.
    */
  private def matViewAvgRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = mvLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_mv")
    try {
      val q = s.sql(
        "SELECT source, avg(n_chars) AS avg_chars, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, " +
          "100 * sum(n_chars) / count(*) AS pct_chars " +
          "FROM azof.docs_mv GROUP BY source")
      val aggs = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      if (aggs.nonEmpty) throw new IllegalStateException(
        "avg rewrite did not fire — refusing to pass the row off the " +
          "corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q58 [[graft.sources.ViewDef]]: per-source counts + the
    * null-skipping sum/count pair over a NULLABLE measure.
    */
  private val mvnDef = graft.sources.ViewDef(Seq("source"),
    sumCols = Seq("score"))

  /** Four-commit [[graft.sources.MatView]] lake over a NULLABLE
    * measure: `score` is NULL for every `doc_id % 4 = 0` doc; the Apr
    * revision batch flips every `doc_id % 5 = 0` doc's nullness
    * (null → `n_chars + 7`, non-null → NULL — both directions of the
    * null transition must subtract/add exactly); docs 6/7 deleted.
    */
  private[queries] def mvnLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "mvn-v1", "doc_mvn") { l =>
      import graft.sources.MatView
      val schema = TableSchema(Seq(
        ColumnDef("source", ColumnType.AzString, nullable = false),
        ColumnDef("score", ColumnType.AzInt, nullable = true)))
      val docs = Tables(s, dir, "documents")
      val baseScore =
        when(col("doc_id") % 4 === 0, lit(null).cast("long"))
          .otherwise(col("n_chars"))
      val revScore =
        when(col("doc_id") % 4 === 0, col("n_chars") + 7)
          .otherwise(lit(null).cast("long"))
      def rows(filter: org.apache.spark.sql.Column, at: String,
          score: org.apache.spark.sql.Column) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          col("source"), score.as("score"))
      AzofWriter.createTable(s, l, "docs_mvn", schema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val ck = new java.io.File(l, "_mvn_ck").toString
      def refresh(): Unit = {
        val q = MatView.refresh(s, l, "docs_mvn", l, "doc_mvn", mvnDef, ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "nullable matview refresh did not terminate within 300s")
      }
      AzofWriter.commitBase(s, l, "docs_mvn",
        rows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z",
          baseScore))                                                // v2
      refresh()
      AzofWriter.commitDelta(s, l, "docs_mvn",
        rows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z",
          baseScore),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))                       // v3
      refresh()
      AzofWriter.commitDelta(s, l, "docs_mvn",
        rows(col("doc_id") % 5 === 0, "2024-04-05T00:00:00Z",
          revScore),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))                       // v4
      refresh()
      AzofWriter.commitDelete(s, l, "docs_mvn", Seq("6", "7"),
        Instant.parse("2024-05-05T00:00:00Z"))                       // v5
      refresh()
      ()
    }

  /** NULLABLE-measure view, served: SQL's null-skipping SUM/COUNT are
    * maintained exactly through both directions of the null transition
    * (the `nn_score` non-null count is what makes the subtraction
    * arithmetic exact), and the derived mean divides by `COUNT(score)`,
    * not `COUNT(*)`. The oracle recomputes one-shot over the
    * reconstructed final live state.
    */
  private def matViewNullable(s: SparkSession, dir: String): DataFrame = {
    val lake = mvnLake(s, dir)
    graft.sources.MatView.serve(s, lake, "doc_mvn", mvnDef)
      .withColumn("avg_score",
        col("sum_score").cast("double") / col("nn_score"))
  }

  /** The DAY-BUCKETED STAR rewrite under the oracle gate (q63's join
    * sibling): plain SQL grouping `fact ⋈ dim` by a dim attribute AND
    * a `date_trunc` bucket of a FACT timestamp — no stored bucket
    * column anywhere — served as a pure projection of the derived-key
    * join view, whose single catch-up leg absorbed the whole
    * seven-commit history (bucket-moving fact revisions + the dim
    * re-tier in one delta). Refuses a plan that still joins or
    * aggregates.
    */
  private def starDayRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = starLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_star_day")
    try {
      val q = s.sql(
        "SELECT tier, date_trunc('day', ts) AS day, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars " +
          "FROM azof.facts_star f JOIN azof.src_star d1 " +
          "ON f.src = d1.key GROUP BY tier, date_trunc('day', ts)")
      val residual = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "day-bucketed star rewrite did not fire — refusing to pass " +
          "the row off the scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The PINNED STAR HISTOGRAM under the oracle gate (the last cell of
    * the rewrite matrix: histogram × star × pins): every table read
    * `VERSION AS OF` its current version, grouped by a dim attribute
    * AND the declared distinct FACT column — served from the star
    * view's support pairs + row totals (NULL author bucket included)
    * through [[graft.sources.JoinView.freshViewVersionAt]]'s per-table
    * walks. Refuses any surviving azof relation or Join.
    */
  private def starPinnedHistogram(s: SparkSession, dir: String): DataFrame = {
    val lake = starLake(s, dir)
    val vf = graft.format.AzofTable(s, lake, "facts_star").currentVersion
    val v1 = graft.format.AzofTable(s, lake, "src_star").currentVersion
    val v2 = graft.format.AzofTable(s, lake, "bkt_star").currentVersion
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_star")
    try {
      val q = s.sql(
        "SELECT tier, author, count(*) AS n_rows " +
          s"FROM azof.facts_star VERSION AS OF $vf AS f " +
          s"JOIN azof.src_star VERSION AS OF $v1 AS d1 " +
          "ON f.src = d1.key " +
          s"JOIN azof.bkt_star VERSION AS OF $v2 AS d2 " +
          "ON f.bk = d2.key " +
          "GROUP BY tier, author")
      // the gate refuses CORPUS relations only: the served plan
      // legitimately joins index-sized frames (the NULL bucket is
      // totals − refs), so a Join check would false-positive
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "pinned star histogram did not fire — refusing to pass the " +
          "row off the corpus scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q63 [[graft.sources.ViewDef]]: the TIME-BUCKETED rollup — a
    * DERIVED `date_trunc('day', t)` group key stored in the view, plus
    * the physical `source` group; sums and extrema over `v`.
    */
  private val mvtDef = graft.sources.ViewDef(Seq("day", "source"),
    sumCols = Seq("v"), minMaxCols = Seq("v"),
    derivedGroups = Seq(graft.sources.DerivedGroup("day",
      "date_trunc('day', t)", ColumnType.AzDateTime)))

  /** Four-commit time-series lake: every doc carries an event timestamp
    * `t` spread over ~2 days (`2024-03-01 + (doc_id % 40) hours`); the
    * Apr revision shifts every fifth doc by +36 h — MOVING it across
    * day buckets — and bumps `v`; docs 6/7 deleted. The view maintains
    * the day-bucketed rollup incrementally.
    */
  private[queries] def mvtLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "mvt-v1", "doc_mvt") { l =>
      import graft.sources.MatView
      val schema = TableSchema(Seq(
        ColumnDef("source", ColumnType.AzString, nullable = false),
        ColumnDef("t", ColumnType.AzDateTime, nullable = false),
        ColumnDef("v", ColumnType.AzInt, nullable = false)))
      val docs = Tables(s, dir, "documents")
      val baseT = expr("timestamp'2024-03-01 00:00:00' + " +
        "make_interval(0, 0, 0, 0, CAST(doc_id % 40 AS INT), 0, 0)")
      val revT = expr("timestamp'2024-03-01 00:00:00' + " +
        "make_interval(0, 0, 0, 0, CAST(doc_id % 40 AS INT) + 36, 0, 0)")
      def rows(filter: org.apache.spark.sql.Column, at: String,
          t: org.apache.spark.sql.Column,
          v: org.apache.spark.sql.Column) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          col("source"), t.as("t"), v.cast("long").as("v"))
      AzofWriter.createTable(s, l, "docs_mvt", schema,
        Instant.parse("2024-01-01T00:00:00Z"))
      val ck = new java.io.File(l, "_mvt_ck").toString
      def refresh(): Unit = {
        val q = MatView.refresh(s, l, "docs_mvt", l, "doc_mvt", mvtDef, ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "time-bucket view refresh did not terminate within 300s")
      }
      AzofWriter.commitBase(s, l, "docs_mvt",
        rows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z",
          baseT, col("n_chars")))                                    // v2
      refresh()
      AzofWriter.commitDelta(s, l, "docs_mvt",
        rows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z",
          baseT, col("n_chars")),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))                       // v3
      refresh()
      AzofWriter.commitDelta(s, l, "docs_mvt",
        rows(col("doc_id") % 5 === 0, "2024-04-05T00:00:00Z",
          revT, col("n_chars") + 7),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))                       // v4
      refresh()
      AzofWriter.commitDelete(s, l, "docs_mvt", Seq("6", "7"),
        Instant.parse("2024-05-05T00:00:00Z"))                       // v5
      refresh()
      ()
    }

  /** The TIME-BUCKET rewrite under the oracle gate: a plain SQL
    * `GROUP BY date_trunc('day', t), source` — no view mentioned, no
    * stored bucket column on the table — is matched CANONICALLY against
    * the view's derived group expression and served as a pure
    * projection of the bucketed view. Exactness rides the maintenance
    * through revisions that MOVE rows across buckets (the pre-image
    * subtraction evaluates the expression on both sides) and deletes
    * (the min/max rescan runs at the bucketed grain). Refuses a
    * corpus-scan plan exactly like q53.
    */
  private def matViewTimeBucket(s: SparkSession, dir: String): DataFrame = {
    val lake = mvtLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_mvt")
    try {
      val q = s.sql(
        "SELECT date_trunc('day', t) AS day, source, " +
          "count(*) AS n_rows, sum(v) AS sum_v, " +
          "min(v) AS min_v, max(v) AS max_v " +
          "FROM azof.docs_mvt GROUP BY date_trunc('day', t), source")
      val aggs = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      if (aggs.nonEmpty) throw new IllegalStateException(
        "time-bucket rewrite did not fire — refusing to pass the row " +
          "off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q54 [[graft.sources.JoinViewDef]]: per-TIER (a dim attribute)
    * document counts, char sums, and char extrema over
    * `docs ⋈ sources`.
    */
  private val jvDef = graft.sources.JoinViewDef(Seq("tier"),
    sumCols = Seq("n_chars"), minMaxCols = Seq("n_chars"),
    dims = Seq(graft.sources.DimJoin("src", Seq("tier"))))

  /** Six-commit, six-times-refreshed [[graft.sources.JoinView]] lake:
    * dim `sources_jv` (key = the source name, attr `tier` = number
    * parity) + fact `docs_jv` (fk = source, `n_chars`). Churn on BOTH
    * sides: fact base (⅔, Jan) + delta (rest, Feb); a DIM revision
    * moving every fifth source to tier `vip` (Apr — unchanged facts
    * must move groups); a DIM delete of `src7` (its facts leave the
    * join); a FACT revision pointing every `doc_id % 7 = 0` doc at
    * `src1` with `n_chars + 3` (May); a fact delete of docs 6/7 (Jun).
    */
  private[queries] def jvLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "jv-v3", "doc_jv") { l =>
      import graft.sources.{AzofWriter, JoinView}
      val docs = Tables(s, dir, "documents")
      val srcs = docs.select("source").distinct()
      val num = expr("CAST(substring(source, 4, 10) AS INT)")
      AzofWriter.createTable(s, l, "sources_jv",
        TableSchema(Seq(
          ColumnDef("tier", ColumnType.AzString, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(s, l, "docs_jv",
        TableSchema(Seq(
          ColumnDef("src", ColumnType.AzString, nullable = false),
          ColumnDef("n_chars", ColumnType.AzInt, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      def refresh(): Unit = {
        JoinView.refresh(s, l, "docs_jv", Seq((l, "sources_jv")),
          l, "doc_jv", jvDef)
        ()
      }
      def factRows(filter: org.apache.spark.sql.Column, at: String,
          src: org.apache.spark.sql.Column = col("source"),
          nc: org.apache.spark.sql.Column = col("n_chars")) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          src.as("src"), nc.as("n_chars"))
      AzofWriter.commitBase(s, l, "sources_jv",
        srcs.select(col("source").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-01-02T00:00:00Z"))).as("event_time"),
          when(num % 2 === 0, "even").otherwise("odd").as("tier")))
      AzofWriter.commitBase(s, l, "docs_jv",
        factRows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "docs_jv",
        factRows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "sources_jv",
        srcs.where(num % 5 === 0).select(col("source").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-04-05T00:00:00Z"))).as("event_time"),
          lit("vip").as("tier")),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelete(s, l, "sources_jv", Seq("src7"),
        Instant.parse("2024-05-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "docs_jv",
        factRows(col("doc_id") % 7 === 0, "2024-05-05T00:00:00Z",
          src = lit("src1"), nc = col("n_chars") + 3),
        Instant.parse("2024-05-01T00:00:00Z"),
        Instant.parse("2024-06-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelete(s, l, "docs_jv", Seq("6", "7"),
        Instant.parse("2024-06-05T00:00:00Z"))
      refresh()
      ()
    }

  /** The incrementally-maintained JOIN view, served. The oracle
    * recomputes the fact⋈dim GROUP BY one-shot over both tables'
    * reconstructed final states — a refresh that failed to move
    * unchanged facts on a dim re-tier, kept a deleted dim's facts,
    * adopted a dangling fk late, or mis-merged any total cannot
    * hash-match.
    */
  private def joinViewServe(s: SparkSession, dir: String): DataFrame = {
    val lake = jvLake(s, dir)
    graft.sources.JoinView.serve(s, lake, "doc_jv", jvDef)
  }

  /** The JOIN-shape rewrite under the oracle gate (q53's two-table
    * twin): a plain SQL `fact JOIN dim GROUP BY` — no view mentioned —
    * is answered FROM the fresh [[graft.sources.JoinView]] by the
    * optimizer rule. Refuses to return a plan that still joins or
    * aggregates (both nodes must be gone), so the row certifies
    * rewrite-fired AND rewrite-exact under q54's recompute oracle.
    */
  private def joinViewRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = jvLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_jv")
    try {
      // avg + count(c) pin the nn_-backed derived path over a JOIN view
      // (round 13's crash shape: AVG decomposed to a nn_ leaf join
      // views didn't carry — this row keeps it oracle-gated)
      val q = s.sql(
        "SELECT tier, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, count(n_chars) AS nn_n_chars, " +
          "avg(n_chars) AS avg_n_chars, min(n_chars) AS min_n_chars, " +
          "max(n_chars) AS max_n_chars " +
          "FROM azof.docs_jv f JOIN azof.sources_jv d " +
          "ON f.src = d.key GROUP BY tier")
      val residual = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "join-view rewrite did not fire — refusing to pass the row " +
          "off the scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q57 STAR [[graft.sources.JoinViewDef]]: per-(tier, bucket
    * label) counts, char sums, extrema, and exact author distinct
    * counts over `docs ⋈ sources ⋈ buckets` — two dims, each with its
    * own fk; `author` is a NULLABLE fact column backed by the
    * refcounted distinct support table (q61).
    */
  private val starDef = graft.sources.JoinViewDef(Seq("tier", "label"),
    sumCols = Seq("n_chars"), minMaxCols = Seq("n_chars"),
    dims = Seq(graft.sources.DimJoin("src", Seq("tier")),
      graft.sources.DimJoin("bk", Seq("label"))),
    distinctCols = Seq("author"),
    distinctTuples = Seq(Seq("author", "n_chars"),
      Seq("bk", "n_chars")))

  /** The q64 day-bucketed STAR [[graft.sources.JoinViewDef]] over the
    * SAME tables: per-(tier, day) counts and char sums, `day` a DERIVED
    * fact-side `date_trunc` bucket — the time-series star rollup.
    */
  private val starDayDef = graft.sources.JoinViewDef(Seq("tier", "day"),
    sumCols = Seq("n_chars"),
    dims = Seq(graft.sources.DimJoin("src", Seq("tier"))),
    derivedGroups = Seq(graft.sources.DerivedGroup("day",
      "date_trunc('day', ts)", ColumnType.AzDateTime)))

  /** Seven-commit, per-commit-refreshed STAR lake: dim1 `src_star`
    * (key = source name, `tier` = number parity), dim2 `bkt_star`
    * (key = `b<doc_id % 4>`, `label` = bucket parity), fact
    * `facts_star` (fk1 = source, fk2 = bucket, `n_chars`). Churn on
    * ALL THREE tables: fact base (⅔, Jan) + delta (rest, Feb); a DIM1
    * re-tier of every fifth source to `vip` (Apr); a DIM2 re-label of
    * `b1` to `xl` (Apr); a FACT revision pointing `doc_id % 7 = 0` docs
    * at `src1` with `n_chars + 3` and author `a9` (May); a DIM2 delete
    * of `b3` (May — its facts leave the star); a fact delete of docs
    * 6/7 (Jun). The fact's nullable `author` (`a<doc_id % 10>`, NULL
    * for `doc_id % 6 = 0`) feeds the distinct support table: the dim
    * re-tiers move its pairs across groups, the revision collapses
    * distinct mass onto `a9`, the deletes decrement refcounts.
    */
  private[queries] def starLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "star-v7", "doc_star") { l =>
      import graft.sources.{AzofWriter, JoinView}
      val docs = Tables(s, dir, "documents")
      val srcs = docs.select("source").distinct()
      val num = expr("CAST(substring(source, 4, 10) AS INT)")
      AzofWriter.createTable(s, l, "src_star",
        TableSchema(Seq(
          ColumnDef("tier", ColumnType.AzString, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(s, l, "bkt_star",
        TableSchema(Seq(
          ColumnDef("label", ColumnType.AzString, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(s, l, "facts_star",
        TableSchema(Seq(
          ColumnDef("src", ColumnType.AzString, nullable = false),
          ColumnDef("bk", ColumnType.AzString, nullable = false),
          ColumnDef("n_chars", ColumnType.AzInt, nullable = false),
          ColumnDef("author", ColumnType.AzString, nullable = true),
          ColumnDef("ts", ColumnType.AzDateTime, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      def refresh(): Unit = {
        JoinView.refresh(s, l, "facts_star",
          Seq((l, "src_star"), (l, "bkt_star")), l, "doc_star", starDef)
        ()
      }
      def refreshDay(): Unit = {
        JoinView.refresh(s, l, "facts_star",
          Seq((l, "src_star")), l, "doc_star_day", starDayDef)
        ()
      }
      def factRows(filter: org.apache.spark.sql.Column, at: String,
          src: org.apache.spark.sql.Column = col("source"),
          nc: org.apache.spark.sql.Column = col("n_chars"),
          au: org.apache.spark.sql.Column =
            when(col("doc_id") % 6 === 0, lit(null))
              .otherwise(concat(lit("a"),
                (col("doc_id") % 10).cast("string"))),
          tsc: org.apache.spark.sql.Column =
            expr("timestamp'2024-03-01 00:00:00' + " +
              "make_interval(0, 0, 0, 0, CAST(doc_id % 40 AS INT), 0, 0)")) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          src.as("src"),
          concat(lit("b"), (col("doc_id") % 4).cast("string")).as("bk"),
          nc.as("n_chars"),
          au.cast("string").as("author"),
          tsc.as("ts"))
      AzofWriter.commitBase(s, l, "src_star",
        srcs.select(col("source").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-01-02T00:00:00Z"))).as("event_time"),
          when(num % 2 === 0, "even").otherwise("odd").as("tier")))
      AzofWriter.commitBase(s, l, "bkt_star",
        s.range(4).select(
          concat(lit("b"), col("id").cast("string")).as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-01-02T00:00:00Z"))).as("event_time"),
          when(col("id") % 2 === 0, "low").otherwise("high").as("label")))
      AzofWriter.commitBase(s, l, "facts_star",
        factRows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "facts_star",
        factRows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "src_star",
        srcs.where(num % 5 === 0).select(col("source").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-04-05T00:00:00Z"))).as("event_time"),
          lit("vip").as("tier")),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "bkt_star",
        s.range(1).select(lit("b1").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-04-05T00:00:00Z"))).as("event_time"),
          lit("xl").as("label")),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelete(s, l, "bkt_star", Seq("b3"),
        Instant.parse("2024-05-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "facts_star",
        factRows(col("doc_id") % 7 === 0, "2024-05-05T00:00:00Z",
          src = lit("src1"), nc = col("n_chars") + 3, au = lit("a9"),
          tsc = expr("timestamp'2024-03-01 00:00:00' + " +
            "make_interval(0, 0, 0, 0, CAST(doc_id % 40 AS INT) + 36, " +
            "0, 0)")),
        Instant.parse("2024-05-01T00:00:00Z"),
        Instant.parse("2024-06-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelete(s, l, "facts_star", Seq("6", "7"),
        Instant.parse("2024-06-05T00:00:00Z"))
      refresh()
      // the DAY view catches up the WHOLE seven-commit history in one
      // mixed leg (fact churn + the dim re-tier together) — the other
      // maintenance cadence, deliberately different from doc_star's
      // per-commit refreshes
      refreshDay()
      ()
    }

  /** The STAR-shape rewrite under the oracle gate (q55's two-dim
    * sibling, round-12 directive #2): a plain SQL
    * `fact JOIN dim1 JOIN dim2 GROUP BY` — no view mentioned — is
    * answered FROM the fresh two-dim [[graft.sources.JoinView]] by the
    * optimizer rule. Refuses to return a plan that still joins or
    * aggregates, so the row certifies rewrite-fired AND rewrite-exact
    * under the one-shot three-table recompute oracle.
    */
  private def starViewRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = starLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_star")
    try {
      val q = s.sql(
        "SELECT tier, label, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, count(n_chars) AS nn_n_chars, " +
          "avg(n_chars) AS avg_n_chars, min(n_chars) AS min_n_chars, " +
          "max(n_chars) AS max_n_chars " +
          "FROM azof.facts_star f " +
          "JOIN azof.src_star d1 ON f.src = d1.key " +
          "JOIN azof.bkt_star d2 ON f.bk = d2.key " +
          "GROUP BY tier, label")
      val residual = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "star-view rewrite did not fire — refusing to pass the row " +
          "off the scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** q57's oracle: the one-shot THREE-table star aggregate over all
    * reconstructed final states (see [[starLake]]'s churn script).
    */
  private val starViewOracle: String =
    """WITH fact AS (
         SELECT CASE WHEN doc_id % 7 = 0 THEN 'src1' ELSE source END
                  AS src,
                'b' || CAST(doc_id % 4 AS VARCHAR) AS bk,
                CASE WHEN doc_id % 7 = 0 THEN n_chars + 3 ELSE n_chars
                  END AS n_chars
         FROM documents WHERE doc_id NOT IN (6, 7)),
       dim1 AS (
         SELECT source AS k,
                CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                       THEN 'vip'
                     WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                       THEN 'even'
                     ELSE 'odd' END AS tier
         FROM (SELECT DISTINCT source FROM documents)),
       dim2 AS (
         SELECT 'b' || CAST(b AS VARCHAR) AS k,
                CASE WHEN b = 1 THEN 'xl'
                     WHEN b % 2 = 0 THEN 'low' ELSE 'high' END AS label
         FROM (VALUES (0),(1),(2),(3)) AS t(b) WHERE b <> 3)
       SELECT tier, label, COUNT(*) AS n_rows,
              CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
              COUNT(n_chars) AS nn_n_chars,
              CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars)
                AS avg_n_chars,
              MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
       FROM fact JOIN dim1 ON fact.src = dim1.k
                 JOIN dim2 ON fact.bk = dim2.k
       GROUP BY tier, label"""

  /** The STAR `COUNT(DISTINCT)` rewrite under the oracle gate (q60's
    * join twin, at a ROLLUP grain): plain SQL over
    * `fact ⋈ dim1 ⋈ dim2` grouping by `tier` — a proper SUBSET of the
    * view's `(tier, label)` grain — with `count(distinct author)` over
    * a NULLABLE fact column. The optimizer re-sums the additive totals
    * from the star view and re-counts the refcounted support pairs at
    * the query grain; exactness rides the support table's maintenance
    * through fact churn, BOTH dims' re-tiers (pairs move groups), the
    * dim delete, and the fact revision/delete. The plan gate refuses
    * any surviving azof relation or Join between azof tables
    * (Aggregates remain by design — they aggregate the index-sized
    * view/support reads, never the corpus).
    */
  private def starDistinctRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = starLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_star")
    try {
      val q = s.sql(
        "SELECT tier, count(*) AS n_rows, sum(n_chars) AS sum_n_chars, " +
          "count(DISTINCT author) AS dv_author " +
          "FROM azof.facts_star f " +
          "JOIN azof.src_star d1 ON f.src = d1.key " +
          "JOIN azof.bkt_star d2 ON f.bk = d2.key " +
          "GROUP BY tier")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "star distinct rewrite did not fire — refusing to pass the " +
          "row off the corpus scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** q61's oracle: the one-shot three-table star distinct/rollup over
    * the reconstructed final states ([[starLake]]'s churn script, incl.
    * the author column's null/revision history).
    */
  private val starDistinctOracle: String =
    """WITH fact AS (
         SELECT CASE WHEN doc_id % 7 = 0 THEN 'src1' ELSE source END
                  AS src,
                'b' || CAST(doc_id % 4 AS VARCHAR) AS bk,
                CASE WHEN doc_id % 7 = 0 THEN n_chars + 3 ELSE n_chars
                  END AS n_chars,
                CASE WHEN doc_id % 7 = 0 THEN 'a9'
                     WHEN doc_id % 6 = 0 THEN NULL
                     ELSE 'a' || CAST(doc_id % 10 AS VARCHAR)
                  END AS author
         FROM documents WHERE doc_id NOT IN (6, 7)),
       dim1 AS (
         SELECT source AS k,
                CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                       THEN 'vip'
                     WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                       THEN 'even'
                     ELSE 'odd' END AS tier
         FROM (SELECT DISTINCT source FROM documents)),
       dim2 AS (
         SELECT 'b' || CAST(b AS VARCHAR) AS k,
                CASE WHEN b = 1 THEN 'xl'
                     WHEN b % 2 = 0 THEN 'low' ELSE 'high' END AS label
         FROM (VALUES (0),(1),(2),(3)) AS t(b) WHERE b <> 3)
       SELECT tier, COUNT(*) AS n_rows,
              CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
              COUNT(DISTINCT author) AS dv_author
       FROM fact JOIN dim1 ON fact.src = dim1.k
                 JOIN dim2 ON fact.bk = dim2.k
       GROUP BY tier"""

  /** The VERSION-PINNED STAR rewrite under the oracle gate (q59's join
    * twin, the reproducible three-table dashboard): every table read
    * `VERSION AS OF` its current version — pins provably
    * view-identical under
    * [[graft.sources.JoinView.freshViewVersionAt]]'s per-table walks —
    * is answered FROM the star view; the plan gate refuses a plan that
    * still joins or aggregates, so the row certifies
    * pinned-star-rewrite-fired AND exact under the one-shot
    * reconstruction oracle. (Pins below a state-changing commit refuse
    * and time-travel — MvRewriteSpec's pinned star cases.)
    */
  private def starPinnedRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = starLake(s, dir)
    val vf = graft.format.AzofTable(s, lake, "facts_star").currentVersion
    val v1 = graft.format.AzofTable(s, lake, "src_star").currentVersion
    val v2 = graft.format.AzofTable(s, lake, "bkt_star").currentVersion
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_star")
    try {
      val q = s.sql(
        "SELECT tier, label, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, count(n_chars) AS nn_n_chars, " +
          "avg(n_chars) AS avg_n_chars, min(n_chars) AS min_n_chars, " +
          "max(n_chars) AS max_n_chars " +
          s"FROM azof.facts_star VERSION AS OF $vf AS f " +
          s"JOIN azof.src_star VERSION AS OF $v1 AS d1 " +
          "ON f.src = d1.key " +
          s"JOIN azof.bkt_star VERSION AS OF $v2 AS d2 " +
          "ON f.bk = d2.key " +
          "GROUP BY tier, label")
      val residual = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "pinned star rewrite did not fire — refusing to pass the row " +
          "off the scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The MIXED per-table EVENT-TIME pin (q62's matrix cell for event
    * time): every table read `TIMESTAMP AS OF` its OWN coordinate —
    * the fact at one instant, each dim at a different one, each
    * at-or-above that table's whole consumed corpus — serves from the
    * star view exactly when EVERY per-table
    * [[graft.sources.MatView.unchangedSinceAsOf]] walk passes inside
    * [[graft.sources.JoinView.freshViewVersions]] (the refusal cells —
    * one coordinate below a consumed commit — are spec-side,
    * JoinViewSpec's mixed event-time matrix). Refuses a plan that
    * still joins or aggregates.
    */
  private def starMixedAsOfRewrite(
      s: SparkSession, dir: String): DataFrame = {
    val lake = starLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_star")
    try {
      val q = s.sql(
        "SELECT tier, label, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, min(n_chars) AS min_n_chars, " +
          "max(n_chars) AS max_n_chars " +
          "FROM azof.facts_star TIMESTAMP AS OF " +
          "'2024-06-20T00:00:00Z' AS f " +
          "JOIN azof.src_star TIMESTAMP AS OF " +
          "'2024-05-15T00:00:00Z' AS d1 ON f.src = d1.key " +
          "JOIN azof.bkt_star TIMESTAMP AS OF " +
          "'2024-05-10T00:00:00Z' AS d2 ON f.bk = d2.key " +
          "GROUP BY tier, label")
      val residual = q.queryExecution.optimizedPlan.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "mixed event-time star rewrite did not fire — refusing to " +
          "pass the row off the scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** Four-commit lake whose VIEW LIFECYCLE is driven entirely through
    * the SQL DDL face ([[graft.plans.ViewDdl]]): `CREATE MATERIALIZED
    * VIEW … AS SELECT` infers the definition (sums, extrema, a
    * distinct column) from the defining query and populates; every
    * churn commit is followed by SQL `REFRESH MATERIALIZED VIEW`.
    * Same churn script as [[mvLake]] plus a nullable author column.
    */
  private[queries] def ddlLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "ddl-v1", "docs_ddl") { l =>
      val docs = Tables(s, dir, "documents")
      AzofWriter.createTable(s, l, "docs_ddl",
        TableSchema(Seq(
          ColumnDef("source", ColumnType.AzString, nullable = false),
          ColumnDef("n_chars", ColumnType.AzInt, nullable = false),
          ColumnDef("author", ColumnType.AzString, nullable = true))),
        Instant.parse("2024-01-01T00:00:00Z"))
      def rows(filter: org.apache.spark.sql.Column, at: String,
          src: org.apache.spark.sql.Column = col("source"),
          nc: org.apache.spark.sql.Column = col("n_chars"),
          au: org.apache.spark.sql.Column =
            when(col("doc_id") % 6 === 0, lit(null))
              .otherwise(concat(lit("a"),
                (col("doc_id") % 10).cast("string")))) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          src.as("source"), nc.cast("long").as("n_chars"),
          au.cast("string").as("author"))
      s.conf.set("spark.azof.path", l)
      try {
        AzofWriter.commitBase(s, l, "docs_ddl",
          rows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))     // v2
        s.sql(
          "CREATE MATERIALIZED VIEW doc_ddl AS " +
            "SELECT source, count(*) AS n_rows, " +
            "sum(n_chars) AS sum_n_chars, min(n_chars) AS min_n_chars, " +
            "max(n_chars) AS max_n_chars, " +
            "count(DISTINCT author) AS dv_author " +
            "FROM azof.docs_ddl GROUP BY source").collect()
        def refresh(): Unit = {
          s.sql("REFRESH MATERIALIZED VIEW doc_ddl").collect(); ()
        }
        AzofWriter.commitDelta(s, l, "docs_ddl",
          rows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
          Instant.parse("2024-02-01T00:00:00Z"),
          Instant.parse("2024-03-01T00:00:00Z"))                     // v3
        refresh()
        AzofWriter.commitDelta(s, l, "docs_ddl",
          rows(col("doc_id") % 5 === 0, "2024-04-05T00:00:00Z",
            src = lit("rev12"), nc = col("n_chars") + 4,
            au = lit("a9")),
          Instant.parse("2024-04-01T00:00:00Z"),
          Instant.parse("2024-05-01T00:00:00Z"))                     // v4
        refresh()
        AzofWriter.commitDelete(s, l, "docs_ddl", Seq("6", "7"),
          Instant.parse("2024-05-05T00:00:00Z"))                     // v5
        refresh()
      } finally s.conf.unset("spark.azof.path")
      ()
    }

  /** The SQL-DDL-created view under the oracle gate: the defining
    * query's own shape — counts, sums, extrema, and the exact
    * `COUNT(DISTINCT author)` off the DDL-inferred support table — is
    * answered FROM the view the DDL minted, hash-checked against the
    * one-shot recompute over the final live corpus. Refuses any
    * surviving azof relation.
    */
  private def matViewDdlRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = ddlLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_ddl")
    try {
      val q = s.sql(
        "SELECT source, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars, min(n_chars) AS min_n_chars, " +
          "max(n_chars) AS max_n_chars, " +
          "count(DISTINCT author) AS dv_author " +
          "FROM azof.docs_ddl GROUP BY source")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "DDL-created view rewrite did not fire — refusing to pass the " +
          "row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** [[ddlLake]]'s STAR twin (single + star in one round): the
    * `fact ⋈ dim GROUP BY tier` join view created and maintained via
    * SQL DDL alone — fact churn, a dim RE-TIER (facts move groups
    * without changing), and fact deletes, each refreshed with SQL.
    */
  private[queries] def ddlStarLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "ddlstar-v1", "facts_ddl") { l =>
      val docs = Tables(s, dir, "documents")
      val srcs = docs.select("source").distinct()
      val num = expr("CAST(substring(source, 4, 10) AS INT)")
      AzofWriter.createTable(s, l, "src_ddl",
        TableSchema(Seq(
          ColumnDef("tier", ColumnType.AzString, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(s, l, "facts_ddl",
        TableSchema(Seq(
          ColumnDef("src", ColumnType.AzString, nullable = false),
          ColumnDef("n_chars", ColumnType.AzInt, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      def factRows(filter: org.apache.spark.sql.Column, at: String) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          col("source").as("src"),
          col("n_chars").cast("long").as("n_chars"))
      AzofWriter.commitBase(s, l, "src_ddl",
        srcs.select(col("source").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-01-02T00:00:00Z"))).as("event_time"),
          when(num % 5 === 0, "vip").when(num % 2 === 0, "even")
            .otherwise("odd").as("tier")))
      AzofWriter.commitBase(s, l, "facts_ddl",
        factRows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))
      s.conf.set("spark.azof.path", l)
      try {
        s.sql(
          "CREATE MATERIALIZED VIEW star_ddl AS " +
            "SELECT tier, count(*) AS n_rows, " +
            "sum(n_chars) AS sum_n_chars " +
            "FROM azof.facts_ddl f JOIN azof.src_ddl d " +
            "ON f.src = d.key GROUP BY tier").collect()
        def refresh(): Unit = {
          s.sql("REFRESH MATERIALIZED VIEW star_ddl").collect(); ()
        }
        AzofWriter.commitDelta(s, l, "facts_ddl",
          factRows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
          Instant.parse("2024-02-01T00:00:00Z"),
          Instant.parse("2024-03-01T00:00:00Z"))
        refresh()
        AzofWriter.commitDelta(s, l, "src_ddl",
          s.range(1).select(lit("src3").as("key"),
            lit(java.sql.Timestamp.from(
              Instant.parse("2024-04-05T00:00:00Z"))).as("event_time"),
            lit("gold").as("tier")),
          Instant.parse("2024-04-01T00:00:00Z"),
          Instant.parse("2024-05-01T00:00:00Z"))
        refresh()
        AzofWriter.commitDelete(s, l, "facts_ddl", Seq("6", "7"),
          Instant.parse("2024-05-05T00:00:00Z"))
        refresh()
      } finally s.conf.unset("spark.azof.path")
      ()
    }

  /** The SQL-DDL-created STAR view under the oracle gate: the defining
    * join query is answered FROM the DDL-minted join view (exactness
    * rides the dim re-tier + deletes), hash-checked against the
    * one-shot two-table recompute. Refuses a plan that still joins or
    * carries any azof relation.
    */
  private def starDdlRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = ddlStarLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "star_ddl")
    try {
      val q = s.sql(
        "SELECT tier, count(*) AS n_rows, sum(n_chars) AS sum_n_chars " +
          "FROM azof.facts_ddl f JOIN azof.src_ddl d ON f.src = d.key " +
          "GROUP BY tier")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "DDL-created star rewrite did not fire — refusing to pass the " +
          "row off the corpus scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q84 FILTERED-view lakehouse: a single-table materialized view
    * whose defining query carries a WHERE — the view's MEMBERSHIP
    * predicate (`cat IN ('c0','c1','c2')` over c0..c4). The Feb
    * revision moves every seventh doc's category ACROSS the predicate
    * boundary in both directions (even doc_ids → 'c9', out; odd →
    * 'c1', in) and bumps its weight, so the incremental
    * `old − pre + new` subtraction is exercised exactly where a
    * filtered view can go wrong; deletes follow.
    */
  private[queries] def fltLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "flt-v1", "docs_flt") { l =>
      val docs = Tables(s, dir, "documents")
      AzofWriter.createTable(s, l, "docs_flt",
        TableSchema(Seq(
          ColumnDef("cat", ColumnType.AzString, nullable = false),
          ColumnDef("n_chars", ColumnType.AzInt, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      def rows(filter: org.apache.spark.sql.Column, at: String,
          cat: org.apache.spark.sql.Column =
            concat(lit("c"), (col("doc_id") % 5).cast("string")),
          nc: org.apache.spark.sql.Column = col("n_chars")) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          cat.as("cat"), nc.cast("long").as("n_chars"))
      s.conf.set("spark.azof.path", l)
      try {
        AzofWriter.commitBase(s, l, "docs_flt",
          rows(lit(true), "2024-01-02T00:00:00Z"))                   // v2
        s.sql(
          "CREATE MATERIALIZED VIEW doc_flt AS " +
            "SELECT cat, count(*) AS n_rows, " +
            "sum(n_chars) AS sum_n_chars, min(n_chars) AS min_n_chars, " +
            "max(n_chars) AS max_n_chars FROM azof.docs_flt " +
            "WHERE cat IN ('c0', 'c1', 'c2') GROUP BY cat").collect()
        def refresh(): Unit = {
          s.sql("REFRESH MATERIALIZED VIEW doc_flt").collect(); ()
        }
        AzofWriter.commitDelta(s, l, "docs_flt",
          rows(col("doc_id") % 7 === 0, "2024-02-05T00:00:00Z",
            cat = when(col("doc_id") % 2 === 0, "c9").otherwise("c1"),
            nc = col("n_chars") + 5),
          Instant.parse("2024-02-01T00:00:00Z"),
          Instant.parse("2024-03-01T00:00:00Z"))                     // v3
        refresh()
        AzofWriter.commitDelete(s, l, "docs_flt", Seq("6", "7"),
          Instant.parse("2024-03-05T00:00:00Z"))                     // v4
        refresh()
      } finally s.conf.unset("spark.azof.path")
      ()
    }

  /** The FILTERED view under the oracle gate: the defining query — WHERE
    * and all — answers FROM the view across boundary-crossing churn,
    * hash-checked against the one-shot filtered recompute over the
    * final live corpus. Refuses any surviving azof relation.
    */
  private def matViewFilteredRewrite(
      s: SparkSession, dir: String): DataFrame = {
    val lake = fltLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_flt")
    try {
      val q = s.sql(
        "SELECT cat, count(*) AS n_rows, sum(n_chars) AS sum_n_chars, " +
          "min(n_chars) AS min_n_chars, max(n_chars) AS max_n_chars " +
          "FROM azof.docs_flt WHERE cat IN ('c0', 'c1', 'c2') " +
          "GROUP BY cat")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "filtered-view rewrite did not fire — refusing to pass the " +
          "row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** [[fltLake]]'s STAR twin: the membership predicate reads the
    * GROUPED dim attribute (`tier IN ('vip','gold')`), and the Feb dim
    * RE-TIER moves whole sources across the boundary in both
    * directions without any fact churn — `num%3 = 0` sources go 'out'
    * (vip leaves membership) or 'gold' (even/odd enters) — the exact
    * case where per-(fact,dim-state) membership must be re-decided
    * from the affected-fact walk. Fact deletes follow.
    */
  private[queries] def fltStarLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "fltstar-v1", "facts_flt") { l =>
      val docs = Tables(s, dir, "documents")
      val srcs = docs.select("source").distinct()
      val num = expr("CAST(substring(source, 4, 10) AS INT)")
      AzofWriter.createTable(s, l, "src_flt",
        TableSchema(Seq(
          ColumnDef("tier", ColumnType.AzString, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(s, l, "facts_flt",
        TableSchema(Seq(
          ColumnDef("src", ColumnType.AzString, nullable = false),
          ColumnDef("n_chars", ColumnType.AzInt, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.commitBase(s, l, "src_flt",
        srcs.select(col("source").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-01-02T00:00:00Z"))).as("event_time"),
          when(num % 5 === 0, "vip").when(num % 2 === 0, "even")
            .otherwise("odd").as("tier")))
      AzofWriter.commitBase(s, l, "facts_flt",
        docs.select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-01-02T00:00:00Z"))).as("event_time"),
          col("source").as("src"),
          col("n_chars").cast("long").as("n_chars")))
      s.conf.set("spark.azof.path", l)
      try {
        s.sql(
          "CREATE MATERIALIZED VIEW star_flt AS " +
            "SELECT tier, count(*) AS n_rows, " +
            "sum(n_chars) AS sum_n_chars " +
            "FROM azof.facts_flt f JOIN azof.src_flt d " +
            "ON f.src = d.key WHERE tier IN ('vip', 'gold') " +
            "GROUP BY tier").collect()
        def refresh(): Unit = {
          s.sql("REFRESH MATERIALIZED VIEW star_flt").collect(); ()
        }
        AzofWriter.commitDelta(s, l, "src_flt",
          srcs.where(num % 3 === 0).select(col("source").as("key"),
            lit(java.sql.Timestamp.from(
              Instant.parse("2024-02-05T00:00:00Z"))).as("event_time"),
            when(num % 5 === 0, "out").otherwise("gold").as("tier")),
          Instant.parse("2024-02-01T00:00:00Z"),
          Instant.parse("2024-03-01T00:00:00Z"))                     // re-tier
        refresh()
        AzofWriter.commitDelete(s, l, "facts_flt", Seq("6", "7"),
          Instant.parse("2024-03-05T00:00:00Z"))
        refresh()
      } finally s.conf.unset("spark.azof.path")
      ()
    }

  /** The FILTERED star view under the oracle gate: the defining join
    * query with its dim-attribute WHERE answers FROM the join view
    * across the boundary-crossing re-tier, hash-checked against the
    * one-shot two-table filtered recompute. Refuses a plan that still
    * joins or carries any azof relation.
    */
  private def starFilteredRewrite(
      s: SparkSession, dir: String): DataFrame = {
    val lake = fltStarLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "star_flt")
    try {
      val q = s.sql(
        "SELECT tier, count(*) AS n_rows, sum(n_chars) AS sum_n_chars " +
          "FROM azof.facts_flt f JOIN azof.src_flt d ON f.src = d.key " +
          "WHERE tier IN ('vip', 'gold') GROUP BY tier")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "filtered-star rewrite did not fire — refusing to pass the " +
          "row off the corpus scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q86 SNOWFLAKE lakehouse: `fact ⋈ dim ⋈ sub` one-hop chain
    * (`facts_sn.src = src_sn.key`, `src_sn.rfk = reg_sn.key`) created
    * via SQL DDL and churned at EVERY level — a sub re-region moves
    * facts TWO hops away with no dim/fact churn, a dim re-points its
    * sub fk, facts delete — each absorbed by a SQL REFRESH.
    */
  private[queries] def snowLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "snow-v1", "facts_sn") { l =>
      val docs = Tables(s, dir, "documents")
      val srcs = docs.select("source").distinct()
      val num = expr("CAST(substring(source, 4, 10) AS INT)")
      AzofWriter.createTable(s, l, "reg_sn",
        TableSchema(Seq(
          ColumnDef("region", ColumnType.AzString, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(s, l, "src_sn",
        TableSchema(Seq(
          ColumnDef("rfk", ColumnType.AzString, nullable = false),
          ColumnDef("tier", ColumnType.AzString, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(s, l, "facts_sn",
        TableSchema(Seq(
          ColumnDef("src", ColumnType.AzString, nullable = false),
          ColumnDef("n_chars", ColumnType.AzInt, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      val at0 = java.sql.Timestamp.from(
        Instant.parse("2024-01-02T00:00:00Z"))
      AzofWriter.commitBase(s, l, "reg_sn",
        s.createDataFrame(s.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row("R0", at0, "east"),
          org.apache.spark.sql.Row("R1", at0, "west"),
          org.apache.spark.sql.Row("R2", at0, "west"),
          org.apache.spark.sql.Row("R3", at0, "south"))),
          graft.format.TableSchema(Seq(
            ColumnDef("region", ColumnType.AzString,
              nullable = false))).toStruct))
      AzofWriter.commitBase(s, l, "src_sn",
        srcs.select(col("source").as("key"), lit(at0).as("event_time"),
          concat(lit("R"), (num % 4).cast("string")).as("rfk"),
          when(num % 2 === 0, "even").otherwise("odd").as("tier")))
      AzofWriter.commitBase(s, l, "facts_sn",
        docs.select(col("doc_id").cast("string").as("key"),
          lit(at0).as("event_time"), col("source").as("src"),
          col("n_chars").cast("long").as("n_chars")))
      s.conf.set("spark.azof.path", l)
      try {
        s.sql(
          "CREATE MATERIALIZED VIEW snow_sn AS " +
            "SELECT tier, region, count(*) AS n_rows, " +
            "sum(n_chars) AS sum_n_chars " +
            "FROM azof.facts_sn f JOIN azof.src_sn d ON f.src = d.key " +
            "JOIN azof.reg_sn r ON d.rfk = r.key " +
            "GROUP BY tier, region").collect()
        def refresh(): Unit = {
          s.sql("REFRESH MATERIALIZED VIEW snow_sn").collect(); ()
        }
        // SUB-only churn: R1 re-regions west → apac (facts move TWO
        // hops away, no dim/fact churn at all)
        AzofWriter.commitDelta(s, l, "reg_sn",
          s.createDataFrame(s.sparkContext.parallelize(Seq(
            org.apache.spark.sql.Row("R1", java.sql.Timestamp.from(
              Instant.parse("2024-02-05T00:00:00Z")), "apac"))),
            graft.format.TableSchema(Seq(
              ColumnDef("region", ColumnType.AzString,
                nullable = false))).toStruct),
          Instant.parse("2024-02-01T00:00:00Z"),
          Instant.parse("2024-03-01T00:00:00Z"))
        refresh()
        // DIM churn: num%5 = 0 sources re-point their sub fk to R0
        AzofWriter.commitDelta(s, l, "src_sn",
          srcs.where(num % 5 === 0).select(col("source").as("key"),
            lit(java.sql.Timestamp.from(
              Instant.parse("2024-03-05T00:00:00Z"))).as("event_time"),
            lit("R0").as("rfk"),
            when(num % 2 === 0, "even").otherwise("odd").as("tier")),
          Instant.parse("2024-03-01T00:00:00Z"),
          Instant.parse("2024-04-01T00:00:00Z"))
        refresh()
        AzofWriter.commitDelete(s, l, "facts_sn", Seq("6", "7"),
          Instant.parse("2024-04-05T00:00:00Z"))
        refresh()
      } finally s.conf.unset("spark.azof.path")
      ()
    }

  /** The SNOWFLAKE chain under the oracle gate: the defining
    * three-table query answers FROM the chain view across churn at
    * every level, hash-checked against the one-shot three-table
    * recompute. Refuses a plan that still joins or carries any azof
    * relation.
    */
  private def snowflakeRewrite(s: SparkSession, dir: String): DataFrame = {
    val lake = snowLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "snow_sn")
    try {
      val q = s.sql(
        "SELECT tier, region, count(*) AS n_rows, " +
          "sum(n_chars) AS sum_n_chars " +
          "FROM azof.facts_sn f JOIN azof.src_sn d ON f.src = d.key " +
          "JOIN azof.reg_sn r ON d.rfk = r.key GROUP BY tier, region")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "snowflake chain rewrite did not fire — refusing to pass the " +
          "row off the corpus scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q87 VARIANCE lakehouse: a DDL-created view declaring
    * `var_samp`/`stddev_samp`/`var_pop` over a NULLABLE measure — the
    * `ss_<c>` sum-of-squares column rides the same `old − pre + new`
    * arithmetic as the sums through value churn, null flips, and
    * deletes.
    */
  private[queries] def varLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "var-v1", "docs_var") { l =>
      val docs = Tables(s, dir, "documents")
      AzofWriter.createTable(s, l, "docs_var",
        TableSchema(Seq(
          ColumnDef("cat", ColumnType.AzString, nullable = false),
          ColumnDef("n_chars", ColumnType.AzInt, nullable = true))),
        Instant.parse("2024-01-01T00:00:00Z"))
      def rows(filter: org.apache.spark.sql.Column, at: String,
          nc: org.apache.spark.sql.Column) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          concat(lit("c"), (col("doc_id") % 4).cast("string")).as("cat"),
          nc.cast("long").as("n_chars"))
      s.conf.set("spark.azof.path", l)
      try {
        AzofWriter.commitBase(s, l, "docs_var",
          rows(lit(true), "2024-01-02T00:00:00Z",
            when(col("doc_id") % 6 === 0, lit(null))
              .otherwise(col("n_chars"))))                           // v2
        s.sql(
          "CREATE MATERIALIZED VIEW doc_var AS " +
            "SELECT cat, count(*) AS n_rows, sum(n_chars) AS sum_nc, " +
            "var_samp(n_chars) AS var_nc, stddev_samp(n_chars) AS sd_nc, " +
            "var_pop(n_chars) AS vp_nc " +
            "FROM azof.docs_var GROUP BY cat").collect()
        def refresh(): Unit = {
          s.sql("REFRESH MATERIALIZED VIEW doc_var").collect(); ()
        }
        // every seventh doc revises (+5, overriding the null rule —
        // null→value flips ride along; ss subtracts the old square)
        AzofWriter.commitDelta(s, l, "docs_var",
          rows(col("doc_id") % 7 === 0, "2024-02-05T00:00:00Z",
            col("n_chars") + 5),
          Instant.parse("2024-02-01T00:00:00Z"),
          Instant.parse("2024-03-01T00:00:00Z"))                     // v3
        refresh()
        AzofWriter.commitDelete(s, l, "docs_var", Seq("6", "7"),
          Instant.parse("2024-03-05T00:00:00Z"))                     // v4
        refresh()
      } finally s.conf.unset("spark.azof.path")
      ()
    }

  /** The VARIANCE view under the oracle gate: var/stddev answer FROM
    * the (nn, sum, ss) totals in the FIXED operand order the DuckDB
    * twin mirrors (the t27 move — correctly-rounded IEEE ops on
    * exact-integer inputs are bit-identical cross-engine). Refuses any
    * surviving azof relation.
    */
  private def matViewVariance(s: SparkSession, dir: String): DataFrame = {
    val lake = varLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_var")
    try {
      val q = s.sql(
        "SELECT cat, count(*) AS n_rows, sum(n_chars) AS sum_nc, " +
          "var_samp(n_chars) AS var_nc, stddev_samp(n_chars) AS sd_nc, " +
          "var_pop(n_chars) AS vp_nc " +
          "FROM azof.docs_var GROUP BY cat")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "variance rewrite did not fire — refusing to pass the row " +
          "off the corpus-scan plan")
      pinned(s, q) // the gated plan's own rows (rounding-order pin)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** [[varLake]]'s STAR twin: variance over the join, where the dim
    * RE-TIER moves whole sources' squares across groups through the
    * affected-fact walk (single + star in one round).
    */
  private[queries] def varStarLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "varstar-v1", "facts_var") { l =>
      val docs = Tables(s, dir, "documents")
      val srcs = docs.select("source").distinct()
      val num = expr("CAST(substring(source, 4, 10) AS INT)")
      AzofWriter.createTable(s, l, "src_var",
        TableSchema(Seq(
          ColumnDef("tier", ColumnType.AzString, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(s, l, "facts_var",
        TableSchema(Seq(
          ColumnDef("src", ColumnType.AzString, nullable = false),
          ColumnDef("n_chars", ColumnType.AzInt, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      val at0 = java.sql.Timestamp.from(
        Instant.parse("2024-01-02T00:00:00Z"))
      AzofWriter.commitBase(s, l, "src_var",
        srcs.select(col("source").as("key"), lit(at0).as("event_time"),
          when(num % 3 === 0, "t0").when(num % 3 === 1, "t1")
            .otherwise("t2").as("tier")))
      AzofWriter.commitBase(s, l, "facts_var",
        docs.select(col("doc_id").cast("string").as("key"),
          lit(at0).as("event_time"), col("source").as("src"),
          col("n_chars").cast("long").as("n_chars")))
      s.conf.set("spark.azof.path", l)
      try {
        s.sql(
          "CREATE MATERIALIZED VIEW star_var AS " +
            "SELECT tier, count(*) AS n_rows, " +
            "sum(n_chars) AS sum_n_chars, var_samp(n_chars) AS var_nc " +
            "FROM azof.facts_var f JOIN azof.src_var d " +
            "ON f.src = d.key GROUP BY tier").collect()
        def refresh(): Unit = {
          s.sql("REFRESH MATERIALIZED VIEW star_var").collect(); ()
        }
        // dim re-tier: num%5 = 0 sources move to tier t9 — their
        // facts' squares subtract from the old tier and add to t9
        AzofWriter.commitDelta(s, l, "src_var",
          srcs.where(num % 5 === 0).select(col("source").as("key"),
            lit(java.sql.Timestamp.from(
              Instant.parse("2024-02-05T00:00:00Z"))).as("event_time"),
            lit("t9").as("tier")),
          Instant.parse("2024-02-01T00:00:00Z"),
          Instant.parse("2024-03-01T00:00:00Z"))
        refresh()
        AzofWriter.commitDelete(s, l, "facts_var", Seq("6", "7"),
          Instant.parse("2024-03-05T00:00:00Z"))
        refresh()
      } finally s.conf.unset("spark.azof.path")
      ()
    }

  /** The star VARIANCE view under the oracle gate ([[matViewVariance]]'s
    * join twin). Refuses a plan that still joins or carries any azof
    * relation.
    */
  private def starVariance(s: SparkSession, dir: String): DataFrame = {
    val lake = varStarLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "star_var")
    try {
      val q = s.sql(
        "SELECT tier, count(*) AS n_rows, sum(n_chars) AS sum_n_chars, " +
          "var_samp(n_chars) AS var_nc " +
          "FROM azof.facts_var f JOIN azof.src_var d ON f.src = d.key " +
          "GROUP BY tier")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "star variance rewrite did not fire — refusing to pass the " +
          "row off the corpus scan+join plan")
      pinned(s, q) // the gated plan's own rows (rounding-order pin)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q82 [[graft.sources.ViewDef]]: per-source sums over `w` plus
    * a declared tuple `(cat, sub)` whose components are NULLABLE —
    * the partial-null two-dimension histogram's support.
    */
  private val ntupDef = graft.sources.ViewDef(Seq("source"),
    sumCols = Seq("w"), distinctTuples = Seq(Seq("cat", "sub")))

  /** Four-commit NULLABLE-tuple lake: `cat` NULL for every 4th doc,
    * `sub` NULL for every 9th; the revision NULL-FLIPS both ways
    * (every 5th doc: even ids lose their cat, odd ids gain 'c9'; sub
    * becomes non-null) and bumps `w`; docs 6/7 deleted.
    */
  private[queries] def ntupLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "ntup-v1", "docs_ntup") { l =>
      import graft.sources.MatView
      val docs = Tables(s, dir, "documents")
      AzofWriter.createTable(s, l, "docs_ntup",
        TableSchema(Seq(
          ColumnDef("source", ColumnType.AzString, nullable = false),
          ColumnDef("cat", ColumnType.AzString, nullable = true),
          ColumnDef("sub", ColumnType.AzInt, nullable = true),
          ColumnDef("w", ColumnType.AzInt, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      val ck = new java.io.File(l, "_ntup_ck").toString
      def refresh(): Unit = {
        val q = MatView.refresh(s, l, "docs_ntup", l, "doc_ntup",
          ntupDef, ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "nullable-tuple-view refresh did not terminate within 300s")
      }
      val baseCat = when(col("doc_id") % 4 === 0, lit(null))
        .otherwise(concat(lit("c"), (col("doc_id") % 3).cast("string")))
      val baseSub = when(col("doc_id") % 9 === 0, lit(null))
        .otherwise((col("doc_id") % 2).cast("long"))
      def rows(filter: org.apache.spark.sql.Column, at: String,
          cat: org.apache.spark.sql.Column = baseCat,
          sub: org.apache.spark.sql.Column = baseSub,
          w: org.apache.spark.sql.Column = col("n_chars")) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          col("source"), cat.cast("string").as("cat"),
          sub.cast("long").as("sub"), w.cast("long").as("w"))
      AzofWriter.commitBase(s, l, "docs_ntup",
        rows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "docs_ntup",
        rows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "docs_ntup",
        rows(col("doc_id") % 5 === 0, "2024-04-05T00:00:00Z",
          cat = when(col("doc_id") % 2 === 0, lit(null))
            .otherwise(lit("c9")),
          sub = (col("doc_id") % 2).cast("long"),
          w = col("n_chars") + 1),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelete(s, l, "docs_ntup", Seq("6", "7"),
        Instant.parse("2024-05-05T00:00:00Z"))
      refresh()
      ()
    }

  /** The NULLABLE-component multi-column histogram rewrite under the
    * oracle gate (q77's round-16 lift): `GROUP BY cat, sub` where BOTH
    * tuple components are nullable — SQL keeps the partial-null
    * groups, which the format-3 pairs carry NULL-token-marked and the
    * split-back decodes to typed NULLs. Exactness rides null-flipping
    * revisions and deletes. Refuses any surviving azof relation.
    */
  private def matViewNullableTupleHistogram(
      s: SparkSession, dir: String): DataFrame = {
    val lake = ntupLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_ntup")
    try {
      val q = s.sql(
        "SELECT cat, sub, count(*) AS n_rows, sum(w) AS sum_w " +
          "FROM azof.docs_ntup GROUP BY cat, sub")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "nullable-tuple histogram rewrite did not fire — refusing to " +
          "pass the row off the corpus-scan plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The q83 star twin's definition: tier rollup with a NULLABLE fact
    * tuple `(cat, sub)`.
    */
  private val ntupStarDef = graft.sources.JoinViewDef(Seq("tier"),
    sumCols = Seq("n_chars"),
    dims = Seq(graft.sources.DimJoin("src", Seq("tier"))),
    distinctTuples = Seq(Seq("cat", "sub")))

  /** [[ntupLake]]'s STAR twin: nullable fact tuple components under a
    * dim RE-TIER (pairs move across groups without the facts
    * changing) plus fact deletes.
    */
  private[queries] def ntupStarLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "ntupstar-v1", "facts_ntup") { l =>
      import graft.sources.JoinView
      val docs = Tables(s, dir, "documents")
      val srcs = docs.select("source").distinct()
      val num = expr("CAST(substring(source, 4, 10) AS INT)")
      AzofWriter.createTable(s, l, "src_nt",
        TableSchema(Seq(
          ColumnDef("tier", ColumnType.AzString, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(s, l, "facts_ntup",
        TableSchema(Seq(
          ColumnDef("src", ColumnType.AzString, nullable = false),
          ColumnDef("cat", ColumnType.AzString, nullable = true),
          ColumnDef("sub", ColumnType.AzInt, nullable = true),
          ColumnDef("n_chars", ColumnType.AzInt, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      def refresh(): Unit = {
        JoinView.refresh(s, l, "facts_ntup", Seq((l, "src_nt")), l,
          "doc_ntup_star", ntupStarDef)
        ()
      }
      def factRows(filter: org.apache.spark.sql.Column, at: String) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          col("source").as("src"),
          when(col("doc_id") % 4 === 0, lit(null))
            .otherwise(concat(lit("c"), (col("doc_id") % 3)
              .cast("string"))).cast("string").as("cat"),
          when(col("doc_id") % 9 === 0, lit(null))
            .otherwise((col("doc_id") % 2)).cast("long").as("sub"),
          col("n_chars").cast("long").as("n_chars"))
      AzofWriter.commitBase(s, l, "src_nt",
        srcs.select(col("source").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-01-02T00:00:00Z"))).as("event_time"),
          when(num % 5 === 0, "vip").when(num % 2 === 0, "even")
            .otherwise("odd").as("tier")))
      AzofWriter.commitBase(s, l, "facts_ntup",
        factRows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "facts_ntup",
        factRows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "src_nt",
        s.range(1).select(lit("src3").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-04-05T00:00:00Z"))).as("event_time"),
          lit("gold").as("tier")),
        Instant.parse("2024-04-01T00:00:00Z"),
        Instant.parse("2024-05-01T00:00:00Z"))
      refresh()
      AzofWriter.commitDelete(s, l, "facts_ntup", Seq("6", "7"),
        Instant.parse("2024-05-05T00:00:00Z"))
      refresh()
      ()
    }

  /** [[matViewNullableTupleHistogram]]'s STAR twin: `GROUP BY tier,
    * cat, sub` over `fact ⋈ dim` with BOTH tuple components nullable,
    * served from the star view's NULL-token-marked pairs — exact
    * across the dim re-tier that moves partial-null pairs between
    * tiers. Refuses any surviving azof relation.
    */
  private def starNullableTupleHistogram(
      s: SparkSession, dir: String): DataFrame = {
    val lake = ntupStarLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite", "doc_ntup_star")
    try {
      val q = s.sql(
        "SELECT tier, cat, sub, count(*) AS n_rows " +
          "FROM azof.facts_ntup f JOIN azof.src_nt d ON f.src = d.key " +
          "GROUP BY tier, cat, sub")
      // azof relations only: the served plan legitimately joins the
      // two INDEX frames (value buckets + the derived NULL bucket) —
      // what must be gone is every corpus relation
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "star nullable-tuple histogram rewrite did not fire — " +
          "refusing to pass the row off the corpus scan+join plan")
      servedFrame(q) // re-root on the rewritten plan (see the helper doc)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite")
    }
  }

  /** The x03 [[graft.sources.ViewDef]]: `author` declared BOTH exact
    * (refcounted support) and approx (HLL sketch) — the sketch's
    * in-engine accuracy contract is checked against the exact twin.
    */
  private val hllDef = graft.sources.ViewDef(Seq("source"),
    distinctCols = Seq("author"), approxCols = Seq("author"))

  /** APPEND-ONLY lake for the sketch rows (HLL merges have no inverse
    * — the refusal/rebuild cells are spec-side, HllSpec): base + one
    * insert delta, refreshed per commit.
    */
  private[queries] def hllLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "hll-v1", "docs_hll") { l =>
      import graft.sources.MatView
      val docs = Tables(s, dir, "documents")
      AzofWriter.createTable(s, l, "docs_hll",
        TableSchema(Seq(
          ColumnDef("source", ColumnType.AzString, nullable = false),
          ColumnDef("author", ColumnType.AzString, nullable = true))),
        Instant.parse("2024-01-01T00:00:00Z"))
      val ck = new java.io.File(l, "_hll_ck").toString
      def refresh(): Unit = {
        val q = MatView.refresh(s, l, "docs_hll", l, "doc_hll", hllDef, ck)
        if (!q.awaitTermination(300000))
          throw new IllegalStateException(
            "hll-view refresh did not terminate within 300s")
      }
      def rows(filter: org.apache.spark.sql.Column, at: String) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          col("source"),
          when(col("doc_id") % 6 === 0, lit(null))
            .otherwise(concat(lit("a"),
              (col("doc_id") % 50).cast("string")))
            .cast("string").as("author"))
      AzofWriter.commitBase(s, l, "docs_hll",
        rows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "docs_hll",
        rows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      refresh()
      ()
    }

  /** APPROX_COUNT_DISTINCT from the view's HLL sketch, against its own
    * exact twin: per-source sketch estimates joined with the
    * refcounted support table's exact counts; `hll_ok` asserts the
    * estimate lands within 5% of truth (exactness is out of scope by
    * design — the sketch is O(groups) storage at ANY cardinality; the
    * oracle gates the exact counts AND the bound verdicts).
    */
  private def matViewHllApprox(s: SparkSession, dir: String): DataFrame = {
    val lake = hllLake(s, dir)
    val exact = graft.sources.MatView.countDistinct(s, lake, "doc_hll",
      hllDef, "author", Seq("source"))
    val est = graft.sources.MatView.approxDistinct(s, lake, "doc_hll",
      hllDef, "author", Seq("source"))
    exact.join(est, Seq("source"))
      .select(col("source"), col("dv_author"),
        (abs(col("adv_author").cast("double") /
          col("dv_author").cast("double") - 1.0) <= 0.05).as("hll_ok"))
  }

  /** The x04 star twin's definition. */
  private val hllStarDef = graft.sources.JoinViewDef(Seq("tier"),
    dims = Seq(graft.sources.DimJoin("src", Seq("tier"))),
    distinctCols = Seq("author"), approxCols = Seq("author"))

  /** [[hllLake]]'s STAR twin: append-only facts under a static dim. */
  private[queries] def hllStarLake(s: SparkSession, dir: String): String =
    cachedLake(dir, "hllstar-v1", "facts_hll") { l =>
      import graft.sources.JoinView
      val docs = Tables(s, dir, "documents")
      val srcs = docs.select("source").distinct()
      val num = expr("CAST(substring(source, 4, 10) AS INT)")
      AzofWriter.createTable(s, l, "src_hll",
        TableSchema(Seq(
          ColumnDef("tier", ColumnType.AzString, nullable = false))),
        Instant.parse("2024-01-01T00:00:00Z"))
      AzofWriter.createTable(s, l, "facts_hll",
        TableSchema(Seq(
          ColumnDef("src", ColumnType.AzString, nullable = false),
          ColumnDef("author", ColumnType.AzString, nullable = true))),
        Instant.parse("2024-01-01T00:00:00Z"))
      def refresh(): Unit = {
        JoinView.refresh(s, l, "facts_hll", Seq((l, "src_hll")), l,
          "doc_hll_star", hllStarDef)
        ()
      }
      def factRows(filter: org.apache.spark.sql.Column, at: String) =
        docs.where(filter).select(
          col("doc_id").cast("string").as("key"),
          lit(java.sql.Timestamp.from(Instant.parse(at))).as("event_time"),
          col("source").as("src"),
          when(col("doc_id") % 6 === 0, lit(null))
            .otherwise(concat(lit("a"),
              (col("doc_id") % 50).cast("string")))
            .cast("string").as("author"))
      AzofWriter.commitBase(s, l, "src_hll",
        srcs.select(col("source").as("key"),
          lit(java.sql.Timestamp.from(
            Instant.parse("2024-01-02T00:00:00Z"))).as("event_time"),
          when(num % 2 === 0, "even").otherwise("odd").as("tier")))
      AzofWriter.commitBase(s, l, "facts_hll",
        factRows(col("doc_id") % 3 =!= 0, "2024-01-02T00:00:00Z"))
      refresh()
      AzofWriter.commitDelta(s, l, "facts_hll",
        factRows(col("doc_id") % 3 === 0, "2024-02-05T00:00:00Z"),
        Instant.parse("2024-02-01T00:00:00Z"),
        Instant.parse("2024-03-01T00:00:00Z"))
      refresh()
      ()
    }

  /** [[matViewHllApprox]]'s STAR twin: per-tier sketch estimates off
    * the join view vs the star support table's exact counts.
    */
  private def starHllApprox(s: SparkSession, dir: String): DataFrame = {
    val lake = hllStarLake(s, dir)
    val exact = graft.sources.JoinView.countDistinct(s, lake,
      "doc_hll_star", hllStarDef, "author", Seq("tier"))
    val est = graft.sources.JoinView.approxDistinct(s, lake,
      "doc_hll_star", hllStarDef, "author", Seq("tier"))
    exact.join(est, Seq("tier"))
      .select(col("tier"), col("dv_author"),
        (abs(col("adv_author").cast("double") /
          col("dv_author").cast("double") - 1.0) <= 0.05).as("hll_ok"))
  }

  /** The OPT-IN approx rewrite (`spark.azof.mv.rewrite.approx`): plain
    * SQL `approx_count_distinct(author)` over the corpus table is
    * served from the view's `hll_author` register sketch — here at the
    * GLOBAL grain, so the per-source sketches MERGE per position
    * ([[graft.sources.Hll.mergeAllCol]]'s max monoid) before ONE
    * estimate, never summed estimates. The conf is separate from the
    * exact `spark.azof.mv.rewrite` by design (the served value is the
    * azof HLL estimate, not Spark's own HLL++ sketch) and default OFF;
    * the conf-off / exact-conf-never-serves-approx cells are spec-side
    * (MvRewriteSpec). The exact `COUNT(DISTINCT author)` twin in the
    * same query hash-gates (served from the refcounted support pairs),
    * and the estimate is asserted within 5% of it — x03's bound
    * contract, now through the zero-query-change SQL face. Refuses a
    * plan that still carries any azof SOURCE relation.
    */
  private def matViewApproxRewrite(
      s: SparkSession, dir: String): DataFrame = {
    val lake = hllLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite.approx", "doc_hll")
    try {
      val q = s.sql(
        "SELECT dv_author, " +
          "(abs(CAST(adv AS DOUBLE) / CAST(dv_author AS DOUBLE) - 1.0)" +
          " <= 0.05) AS hll_ok FROM (" +
          "SELECT count(DISTINCT author) AS dv_author, " +
          "approx_count_distinct(author) AS adv FROM azof.docs_hll)")
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "opt-in approx rewrite did not fire — refusing to pass the " +
          "row off the corpus-scan plan")
      pinned(s, q) // the gated plan's own rows (sketch-estimator pin)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite.approx")
    }
  }

  /** [[matViewApproxRewrite]]'s STAR twin at the view's own grain:
    * `approx_count_distinct` over the plain `fact ⋈ dim GROUP BY tier`
    * join serves per-row from the join view's sketches (exact-grain
    * path — one stored sketch per group, estimated directly), with the
    * exact distinct twin hash-gating from the star support pairs.
    * Refuses a plan that still joins or carries any azof relation.
    */
  private def starApproxRewrite(
      s: SparkSession, dir: String): DataFrame = {
    val lake = hllStarLake(s, dir)
    s.conf.set("spark.azof.path", lake)
    s.conf.set("spark.azof.mv.rewrite.approx", "doc_hll_star")
    try {
      val q = s.sql(
        "SELECT tier, dv_author, " +
          "(abs(CAST(adv AS DOUBLE) / CAST(dv_author AS DOUBLE) - 1.0)" +
          " <= 0.05) AS hll_ok FROM (" +
          "SELECT tier, count(DISTINCT author) AS dv_author, " +
          "approx_count_distinct(author) AS adv " +
          "FROM azof.facts_hll f JOIN azof.src_hll d ON f.src = d.key " +
          "GROUP BY tier)")
      // the exact-distinct twin serves from index-grain support scans
      // (their own re-count Aggregate/Join survive by design — q61's
      // precedent); the gate is on CORPUS relations
      val residual = q.queryExecution.optimizedPlan.collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if l.relation.isInstanceOf[graft.sources.AzofRelation] => l
        case r: org.apache.spark.sql.execution.datasources.v2
            .DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.AzofV2Table] => r
      }
      if (residual.nonEmpty) throw new IllegalStateException(
        "star opt-in approx rewrite did not fire — refusing to pass " +
          "the row off the corpus scan+join plan")
      pinned(s, q) // the gated plan's own rows (sketch-estimator pin)
    } finally {
      s.conf.unset("spark.azof.path")
      s.conf.unset("spark.azof.mv.rewrite.approx")
    }
  }

  /** q54/q55's shared CTE prelude: both tables' reconstructed final
    * states (see [[jvLake]]'s churn script).
    */
  private val joinViewWith: String =
    """WITH fact AS (
         SELECT CASE WHEN doc_id % 7 = 0 THEN 'src1' ELSE source END
                  AS src,
                CASE WHEN doc_id % 7 = 0 THEN n_chars + 3 ELSE n_chars
                  END AS n_chars
         FROM documents WHERE doc_id NOT IN (6, 7)),
       dim AS (
         SELECT source AS src,
                CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                       THEN 'vip'
                     WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                       THEN 'even'
                     ELSE 'odd' END AS tier
         FROM (SELECT DISTINCT source FROM documents)
         WHERE source <> 'src7')"""

  /** q54's oracle: the one-shot fact⋈dim aggregate over the
    * reconstructed final states — exactly [[JoinView.serve]]'s layout
    * (incl. the `nn_<c>` non-null count).
    */
  private val joinViewOracle: String = joinViewWith +
    """
       SELECT tier, COUNT(*) AS n_rows,
              CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
              COUNT(n_chars) AS nn_n_chars,
              MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
       FROM fact JOIN dim USING (src) GROUP BY tier"""

  /** q55's oracle: the same truth through the plan-pinned optimizer
    * REWRITE of the plain SQL join — plus `AVG` (the nn_-backed
    * derived-aggregate path over a JOIN view).
    */
  private val joinViewAvgOracle: String = joinViewWith +
    """
       SELECT tier, COUNT(*) AS n_rows,
              CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
              COUNT(n_chars) AS nn_n_chars,
              CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars)
                AS avg_n_chars,
              MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
       FROM fact JOIN dim USING (src) GROUP BY tier"""

  /** q51/q52's shared oracle: the one-shot GROUP BY over the mv lake's
    * final LIVE corpus, reconstructed relationally from the raw
    * documents (docs 6/7 deleted; every `doc_id % 5 = 0` doc moved to
    * source `rev12` with `n_chars + 4` by the Apr revision batch).
    */
  private val matViewOracle: String =
    """WITH live AS (
         SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                  AS source,
                CASE WHEN doc_id % 5 = 0 THEN n_chars + 4 ELSE n_chars END
                  AS n_chars
         FROM documents WHERE doc_id NOT IN (6, 7))
       SELECT source, COUNT(*) AS n_rows,
              CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
              COUNT(n_chars) AS nn_n_chars,
              MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars,
              CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
       FROM live GROUP BY source"""

  /** q56's oracle: the derived aggregates over the same reconstructed
    * live state — AVG and the arithmetic combo re-derived from totals.
    */
  private val matViewAvgOracle: String =
    """WITH live AS (
         SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                  AS source,
                CASE WHEN doc_id % 5 = 0 THEN n_chars + 4 ELSE n_chars END
                  AS n_chars
         FROM documents WHERE doc_id NOT IN (6, 7))
       SELECT source,
              CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
              COUNT(*) AS n_rows,
              CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
              100 * CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS pct_chars
       FROM live GROUP BY source"""

  /** q58's oracle: null-skipping SUM/COUNT/AVG over the reconstructed
    * nullable-measure state (see [[mvnLake]]'s churn script — the Apr
    * batch flips nullness both ways for every fifth doc).
    */
  private val matViewNullableOracle: String =
    """WITH live AS (
         SELECT source,
                CASE WHEN doc_id % 5 = 0 THEN
                       CASE WHEN doc_id % 4 = 0 THEN n_chars + 7
                            ELSE NULL END
                     ELSE
                       CASE WHEN doc_id % 4 = 0 THEN NULL
                            ELSE n_chars END
                END AS score
         FROM documents WHERE doc_id NOT IN (6, 7))
       SELECT source, COUNT(*) AS n_rows,
              CAST(SUM(score) AS BIGINT) AS sum_score,
              COUNT(score) AS nn_score,
              CAST(SUM(score) AS DOUBLE) / COUNT(score) AS avg_score
       FROM live GROUP BY source"""

  def oracleSql: Map[String, String] = Map(
    "q51_matview" -> matViewOracle,
    "q52_matview_rebuild" -> matViewOracle,
    "q56_mv_avg_rewrite" -> matViewAvgOracle,
    "q58_mv_nullable" -> matViewNullableOracle,
    // the one-shot fact⋈dim aggregate over both reconstructed final
    // states (see jvLake's churn script); q55 re-proves it through the
    // optimizer REWRITE of the plain SQL join (same truth, plan-pinned)
    "q54_join_view" -> joinViewOracle,
    "q55_join_rewrite" -> joinViewAvgOracle,
    // the one-shot THREE-table star aggregate (fact ⋈ 2 dims, churn on
    // all three) re-proved through the plan-pinned optimizer rewrite
    "q57_star_view" -> starViewOracle,
    // exact star COUNT(DISTINCT) at a rollup grain: the refcounted
    // support pairs re-counted at the query grain, under dim re-tiers
    // that move pairs across groups
    "q61_star_distinct" -> starDistinctOracle,
    // per-table VERSION pins provably view-identical serve the same
    // star truth (pins ARE the current versions; refusals are
    // spec-side)
    "q62_star_pinned_rewrite" -> starViewOracle,
    // the HLL sketch's in-engine accuracy contract: exact counts from
    // the support table hash-gate normally; the sketch estimate is
    // asserted within 5% of truth (TRUE verdicts hash-gate — the
    // estimate itself is engine-specific by design, O(groups) storage)
    "x03_hll_mv" ->
      """WITH live AS (
           SELECT source,
                  CASE WHEN doc_id % 6 = 0 THEN NULL
                       ELSE 'a' || CAST(doc_id % 50 AS VARCHAR)
                    END AS author
           FROM documents)
         SELECT source, COUNT(DISTINCT author) AS dv_author,
                TRUE AS hll_ok
         FROM live GROUP BY source""",
    // the star twin at the tier grain
    "x04_hll_star" ->
      """WITH fact AS (
           SELECT source AS src,
                  CASE WHEN doc_id % 6 = 0 THEN NULL
                       ELSE 'a' || CAST(doc_id % 50 AS VARCHAR)
                    END AS author
           FROM documents),
         dim AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even' ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents))
         SELECT tier, COUNT(DISTINCT author) AS dv_author,
                TRUE AS hll_ok
         FROM fact JOIN dim ON fact.src = dim.k GROUP BY tier""",
    // the OPT-IN approx rewrite at the GLOBAL grain: the exact
    // COUNT(DISTINCT) twin hash-gates (served from the support pairs
    // through the same rewritten plan), and the TRUE verdict pins the
    // sketch estimate within 5% of it — the estimate itself is
    // engine-specific by design (azof HLL, not Spark's HLL++)
    "x05_approx_rewrite" ->
      """WITH live AS (
           SELECT source,
                  CASE WHEN doc_id % 6 = 0 THEN NULL
                       ELSE 'a' || CAST(doc_id % 50 AS VARCHAR)
                    END AS author
           FROM documents)
         SELECT COUNT(DISTINCT author) AS dv_author, TRUE AS hll_ok
         FROM live""",
    // the star twin at the view's own grain (per tier)
    "x06_star_approx_rewrite" ->
      """WITH fact AS (
           SELECT source AS src,
                  CASE WHEN doc_id % 6 = 0 THEN NULL
                       ELSE 'a' || CAST(doc_id % 50 AS VARCHAR)
                    END AS author
           FROM documents),
         dim AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even' ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents))
         SELECT tier, COUNT(DISTINCT author) AS dv_author,
                TRUE AS hll_ok
         FROM fact JOIN dim ON fact.src = dim.k GROUP BY tier""",
    // the NULLABLE-component multi-column histogram: SQL's GROUP BY
    // keeps partial-null rows, reconstructed one-shot — the rewrite
    // serves them from NULL-token-marked tuple pairs
    "q82_mv_nullable_tuple" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN
                         CASE WHEN doc_id % 2 = 0 THEN NULL
                              ELSE 'c9' END
                       WHEN doc_id % 4 = 0 THEN NULL
                       ELSE 'c' || CAST(doc_id % 3 AS VARCHAR)
                    END AS cat,
                  CASE WHEN doc_id % 5 = 0 THEN doc_id % 2
                       WHEN doc_id % 9 = 0 THEN NULL
                       ELSE doc_id % 2 END AS sub,
                  CASE WHEN doc_id % 5 = 0 THEN n_chars + 1
                       ELSE n_chars END AS w
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT cat, sub, COUNT(*) AS n_rows,
                CAST(SUM(w) AS BIGINT) AS sum_w
         FROM live GROUP BY 1, 2""",
    // the star twin: partial-null tuple pairs move across tiers with
    // the dim re-tier (src3 -> gold) and stay exact
    "q83_star_nullable_tuple" ->
      """WITH fact AS (
           SELECT source AS src,
                  CASE WHEN doc_id % 4 = 0 THEN NULL
                       ELSE 'c' || CAST(doc_id % 3 AS VARCHAR)
                    END AS cat,
                  CASE WHEN doc_id % 9 = 0 THEN NULL
                       ELSE doc_id % 2 END AS sub
           FROM documents WHERE doc_id NOT IN (6, 7)),
         dim AS (
           SELECT source AS k,
                  CASE WHEN source = 'src3' THEN 'gold'
                       WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 'vip'
                       WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even'
                       ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents))
         SELECT tier, cat, sub, COUNT(*) AS n_rows
         FROM fact JOIN dim ON fact.src = dim.k
         GROUP BY 1, 2, 3""",
    // the SQL-DDL-created view serves its own defining query: counts,
    // sums, extrema, and the exact distinct off the inferred support
    // table, reconstructed one-shot over the final live corpus
    "q79_mv_ddl_rewrite" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 5 = 0 THEN n_chars + 4 ELSE n_chars
                    END AS n_chars,
                  CASE WHEN doc_id % 5 = 0 THEN 'a9'
                       WHEN doc_id % 6 = 0 THEN NULL
                       ELSE 'a' || CAST(doc_id % 10 AS VARCHAR)
                    END AS author
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars,
                COUNT(DISTINCT author) AS dv_author
         FROM live GROUP BY source""",
    // the SQL-DDL-created STAR view serves its defining join query,
    // exact across the dim re-tier (src3 → gold) and fact deletes
    "q80_star_ddl_rewrite" ->
      """WITH fact AS (
           SELECT source AS src, n_chars FROM documents
           WHERE doc_id NOT IN (6, 7)),
         dim AS (
           SELECT source AS k,
                  CASE WHEN source = 'src3' THEN 'gold'
                       WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 'vip'
                       WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even'
                       ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents))
         SELECT tier, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
         FROM fact JOIN dim ON fact.src = dim.k GROUP BY tier""",
    // the FILTERED view's defining query reconstructed one-shot: the
    // Feb revision moved every seventh doc across the membership
    // boundary in both directions (even → 'c9' out, odd → 'c1' in)
    "q84_mv_filtered_rewrite" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 7 = 0 THEN
                         CASE WHEN doc_id % 2 = 0 THEN 'c9'
                              ELSE 'c1' END
                       ELSE 'c' || CAST(doc_id % 5 AS VARCHAR)
                    END AS cat,
                  CASE WHEN doc_id % 7 = 0 THEN n_chars + 5
                       ELSE n_chars END AS n_chars
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT cat, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
         FROM live WHERE cat IN ('c0', 'c1', 'c2') GROUP BY cat""",
    // the FILTERED star: the dim re-tier moved num%3=0 sources across
    // the membership boundary (vip → 'out', even/odd → 'gold') with
    // no fact churn at all
    "q85_star_filtered_rewrite" ->
      """WITH fact AS (
           SELECT source AS src, n_chars FROM documents
           WHERE doc_id NOT IN (6, 7)),
         dim AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 3 = 0 THEN
                         CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                              THEN 'out' ELSE 'gold' END
                       WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 'vip'
                       WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even'
                       ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents))
         SELECT tier, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
         FROM fact JOIN dim ON fact.src = dim.k
         WHERE tier IN ('vip', 'gold') GROUP BY tier""",
    // the SNOWFLAKE chain reconstructed one-shot: R1 re-regioned
    // west → apac (two-hop move), num%5=0 sources re-pointed to R0,
    // facts 6/7 deleted
    "q86_snowflake_rewrite" ->
      """WITH fact AS (
           SELECT source AS src, n_chars FROM documents
           WHERE doc_id NOT IN (6, 7)),
         dim AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                       THEN 'R0'
                       ELSE 'R' || CAST(
                         CAST(substr(source, 4) AS INT) % 4 AS VARCHAR)
                    END AS rfk,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                       THEN 'even' ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents)),
         sub AS (
           SELECT 'R' || CAST(r AS VARCHAR) AS k,
                  CASE WHEN r = 0 THEN 'east'
                       WHEN r = 1 THEN 'apac'
                       WHEN r = 2 THEN 'west'
                       ELSE 'south' END AS region
           FROM (VALUES (0),(1),(2),(3)) AS t(r))
         SELECT tier, region, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
         FROM fact JOIN dim ON fact.src = dim.k
                   JOIN sub ON dim.rfk = sub.k
         GROUP BY tier, region""",
    // VARIANCE reconstructed one-shot, the rational MIRRORING the
    // rewrite's fixed operand order over exact-integer (nn, s, ss) —
    // correctly-rounded IEEE ops on identical operands are
    // bit-identical cross-engine (the t27 move)
    "q87_mv_variance" ->
      """WITH live AS (
           SELECT 'c' || CAST(doc_id % 4 AS VARCHAR) AS cat,
                  CASE WHEN doc_id % 7 = 0 THEN n_chars + 5
                       WHEN doc_id % 6 = 0 THEN NULL
                       ELSE n_chars END AS nc
           FROM documents WHERE doc_id NOT IN (6, 7)),
         agg AS (
           SELECT cat, COUNT(*) AS n_rows, COUNT(nc) AS nn,
                  CAST(SUM(nc) AS BIGINT) AS s,
                  CAST(SUM(nc * nc) AS BIGINT) AS ss
           FROM live GROUP BY cat)
         SELECT cat, n_rows, s AS sum_nc,
                CASE WHEN nn > 1 THEN
                  (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) *
                    CAST(s AS DOUBLE) / CAST(nn AS DOUBLE))
                    / CAST(nn - 1 AS DOUBLE) END AS var_nc,
                CASE WHEN nn > 1 THEN SQRT(
                  (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) *
                    CAST(s AS DOUBLE) / CAST(nn AS DOUBLE))
                    / CAST(nn - 1 AS DOUBLE)) END AS sd_nc,
                CASE WHEN nn > 0 THEN
                  (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) *
                    CAST(s AS DOUBLE) / CAST(nn AS DOUBLE))
                    / CAST(nn AS DOUBLE) END AS vp_nc
         FROM agg""",
    // the star twin: the dim re-tier moved num%5=0 sources' squares
    // to t9 through the affected-fact walk
    "q88_star_variance" ->
      """WITH fact AS (
           SELECT source AS src, n_chars FROM documents
           WHERE doc_id NOT IN (6, 7)),
         dim AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 't9'
                       WHEN CAST(substr(source, 4) AS INT) % 3 = 0
                         THEN 't0'
                       WHEN CAST(substr(source, 4) AS INT) % 3 = 1
                         THEN 't1'
                       ELSE 't2' END AS tier
           FROM (SELECT DISTINCT source FROM documents)),
         agg AS (
           SELECT tier, COUNT(*) AS n_rows,
                  COUNT(n_chars) AS nn,
                  CAST(SUM(n_chars) AS BIGINT) AS s,
                  CAST(SUM(n_chars * n_chars) AS BIGINT) AS ss
           FROM fact JOIN dim ON fact.src = dim.k GROUP BY tier)
         SELECT tier, n_rows, s AS sum_n_chars,
                CASE WHEN nn > 1 THEN
                  (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) *
                    CAST(s AS DOUBLE) / CAST(nn AS DOUBLE))
                    / CAST(nn - 1 AS DOUBLE) END AS var_nc
         FROM agg""",
    // an event-time coordinate at-or-above every table's consumed
    // corpus serves the same star truth through the per-table as-of
    // walks (q74's join twin; refusals are spec-side)
    "q76_star_asof_rewrite" ->
      """WITH fact AS (
           SELECT CASE WHEN doc_id % 7 = 0 THEN 'src1' ELSE source END
                    AS src,
                  'b' || CAST(doc_id % 4 AS VARCHAR) AS bk,
                  CASE WHEN doc_id % 7 = 0 THEN n_chars + 3 ELSE n_chars
                    END AS n_chars
           FROM documents WHERE doc_id NOT IN (6, 7)),
         dim1 AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 'vip'
                       WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even'
                       ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents)),
         dim2 AS (
           SELECT 'b' || CAST(b AS VARCHAR) AS k,
                  CASE WHEN b = 1 THEN 'xl'
                       WHEN b % 2 = 0 THEN 'low' ELSE 'high' END AS label
           FROM (VALUES (0),(1),(2),(3)) AS t(b) WHERE b <> 3)
         SELECT tier, label, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
         FROM fact JOIN dim1 ON fact.src = dim1.k
                   JOIN dim2 ON fact.bk = dim2.k
         GROUP BY tier, label""",
    // MIXED per-table event-time coordinates — fact @06-20, src @05-15,
    // bkt @05-10, each above its own consumed corpus — serve the same
    // final-state truth as q76's shared coordinate (the q62 matrix
    // cell for event time; refusal cells are spec-side)
    "q81_star_mixed_asof" ->
      """WITH fact AS (
           SELECT CASE WHEN doc_id % 7 = 0 THEN 'src1' ELSE source END
                    AS src,
                  'b' || CAST(doc_id % 4 AS VARCHAR) AS bk,
                  CASE WHEN doc_id % 7 = 0 THEN n_chars + 3 ELSE n_chars
                    END AS n_chars
           FROM documents WHERE doc_id NOT IN (6, 7)),
         dim1 AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 'vip'
                       WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even'
                       ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents)),
         dim2 AS (
           SELECT 'b' || CAST(b AS VARCHAR) AS k,
                  CASE WHEN b = 1 THEN 'xl'
                       WHEN b % 2 = 0 THEN 'low' ELSE 'high' END AS label
           FROM (VALUES (0),(1),(2),(3)) AS t(b) WHERE b <> 3)
         SELECT tier, label, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
         FROM fact JOIN dim1 ON fact.src = dim1.k
                   JOIN dim2 ON fact.bk = dim2.k
         GROUP BY tier, label""",
    // the day-bucketed rollup reconstructed one-shot: the Apr revision
    // moved every fifth doc +36h across buckets and bumped v
    "q63_mv_timebucket" ->
      """WITH live AS (
           SELECT source,
                  TIMESTAMP '2024-03-01 00:00:00'
                    + to_hours(CAST(doc_id % 40 AS BIGINT))
                    + CASE WHEN doc_id % 5 = 0 THEN to_hours(36)
                           ELSE to_hours(0) END AS t,
                  CASE WHEN doc_id % 5 = 0 THEN n_chars + 7
                       ELSE n_chars END AS v
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT date_trunc('day', t) AS day, source,
                COUNT(*) AS n_rows, CAST(SUM(v) AS BIGINT) AS sum_v,
                MIN(v) AS min_v, MAX(v) AS max_v
         FROM live GROUP BY 1, 2""",
    // the day-bucketed STAR rollup reconstructed one-shot: the May
    // revision re-pointed %7 docs at src1, bumped n_chars, AND shifted
    // ts +36h across buckets; the dim re-tier moved sources to vip
    "q64_star_timebucket" ->
      """WITH fact AS (
           SELECT CASE WHEN doc_id % 7 = 0 THEN 'src1' ELSE source END
                    AS src,
                  CASE WHEN doc_id % 7 = 0 THEN n_chars + 3 ELSE n_chars
                    END AS n_chars,
                  TIMESTAMP '2024-03-01 00:00:00'
                    + to_hours(CAST(doc_id % 40 AS BIGINT))
                    + CASE WHEN doc_id % 7 = 0 THEN to_hours(36)
                           ELSE to_hours(0) END AS ts
           FROM documents WHERE doc_id NOT IN (6, 7)),
         dim1 AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 'vip'
                       WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even'
                       ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents))
         SELECT tier, date_trunc('day', ts) AS day,
                COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
         FROM fact JOIN dim1 ON fact.src = dim1.k
         GROUP BY tier, date_trunc('day', ts)""",
    // exact COUNT(DISTINCT) from the refcounted support table, under
    // value-moving revisions, nulls, and zero-crossing deletes
    "q60_mv_distinct" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 4 = 0 THEN NULL
                       WHEN doc_id % 5 = 0 THEN (doc_id % 7) + 1
                       ELSE doc_id % 7 END AS b
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, COUNT(*) AS n_rows,
                COUNT(DISTINCT b) AS dv_b
         FROM live GROUP BY source""",
    // exact per-source value histogram incl. the NULL bucket, served
    // from refcounts + view totals — values under their canonical
    // string encoding
    "q65_mv_histogram" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 4 = 0 THEN NULL
                       WHEN doc_id % 5 = 0 THEN (doc_id % 7) + 1
                       ELSE doc_id % 7 END AS b
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, CAST(b AS VARCHAR) AS value,
                COUNT(*) AS n_rows
         FROM live GROUP BY 1, 2""",
    // the same histogram truth through PLAIN SQL and the optimizer
    // rule: b comes back under its own BIGINT type, NULL bucket incl.
    "q66_mv_histogram_rewrite" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 4 = 0 THEN NULL
                       WHEN doc_id % 5 = 0 THEN (doc_id % 7) + 1
                       ELSE doc_id % 7 END AS b
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, b, COUNT(*) AS n_rows
         FROM live GROUP BY 1, 2""",
    // the pin IS the current version — same histogram truth through
    // the pinned walk (refusals are spec-side)
    "q67_mv_pinned_histogram" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 4 = 0 THEN NULL
                       WHEN doc_id % 5 = 0 THEN (doc_id % 7) + 1
                       ELSE doc_id % 7 END AS b
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, b, COUNT(*) AS n_rows
         FROM live GROUP BY 1, 2""",
    // SUM-WEIGHTED histogram: count + sum(v) + avg(v) per (source, b)
    // incl. the NULL b bucket's sums, under value-moving revisions
    // (v + 2 on every fifth doc), measure nulls (every ninth doc), and
    // deletes — avg is ONE division of exact integer totals (bit-exact
    // cross-engine, the family float rule)
    "q70_mv_sum_histogram" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 4 = 0 THEN NULL
                       WHEN doc_id % 5 = 0 THEN (doc_id % 7) + 1
                       ELSE doc_id % 7 END AS b,
                  CASE WHEN doc_id % 9 = 0 THEN NULL
                       WHEN doc_id % 5 = 0 THEN n_chars + 2
                       ELSE n_chars END AS v
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, b, COUNT(*) AS n_rows,
                CAST(SUM(v) AS BIGINT) AS sum_v,
                CAST(SUM(v) AS DOUBLE) / COUNT(v) AS avg_v
         FROM live GROUP BY 1, 2""",
    // the STAR twin: per-(tier, author) counts + char sums + mean over
    // the three reconstructed final states, NULL author bucket incl.
    "q71_star_sum_histogram" ->
      """WITH fact AS (
           SELECT CASE WHEN doc_id % 7 = 0 THEN 'src1' ELSE source END
                    AS src,
                  'b' || CAST(doc_id % 4 AS VARCHAR) AS bk,
                  CASE WHEN doc_id % 7 = 0 THEN n_chars + 3 ELSE n_chars
                    END AS n_chars,
                  CASE WHEN doc_id % 7 = 0 THEN 'a9'
                       WHEN doc_id % 6 = 0 THEN NULL
                       ELSE 'a' || CAST(doc_id % 10 AS VARCHAR)
                    END AS author
           FROM documents WHERE doc_id NOT IN (6, 7)),
         dim1 AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 'vip'
                       WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even'
                       ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents)),
         dim2 AS (
           SELECT 'b' || CAST(b AS VARCHAR) AS k
           FROM (VALUES (0),(1),(2),(3)) AS t(b) WHERE b <> 3)
         SELECT tier, author, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                CAST(SUM(n_chars) AS DOUBLE) / COUNT(n_chars)
                  AS avg_n_chars
         FROM fact JOIN dim1 ON fact.src = dim1.k
                   JOIN dim2 ON fact.bk = dim2.k
         GROUP BY 1, 2""",
    // multi-column distinct: COUNT(DISTINCT b, v) — any-null rows
    // skipped (Spark's multi-arg COUNT) — from the tuple support pairs;
    // the oracle mirrors the injective separator encoding
    "q72_mv_tuple_distinct" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 4 = 0 THEN NULL
                       WHEN doc_id % 5 = 0 THEN (doc_id % 7) + 1
                       ELSE doc_id % 7 END AS b,
                  CASE WHEN doc_id % 9 = 0 THEN NULL
                       WHEN doc_id % 5 = 0 THEN n_chars + 2
                       ELSE n_chars END AS v
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, COUNT(*) AS n_rows,
                COUNT(DISTINCT CASE
                  WHEN b IS NOT NULL AND v IS NOT NULL
                  THEN CAST(b AS VARCHAR) || chr(1) || CAST(v AS VARCHAR)
                END) AS dv_b_v
         FROM live GROUP BY source""",
    // the STAR twin at the tier rollup grain — tuples moved across
    // groups by both dim re-tiers, collapsed by the fact revision
    "q73_star_tuple_distinct" ->
      """WITH fact AS (
           SELECT CASE WHEN doc_id % 7 = 0 THEN 'src1' ELSE source END
                    AS src,
                  'b' || CAST(doc_id % 4 AS VARCHAR) AS bk,
                  CASE WHEN doc_id % 7 = 0 THEN n_chars + 3 ELSE n_chars
                    END AS n_chars,
                  CASE WHEN doc_id % 7 = 0 THEN 'a9'
                       WHEN doc_id % 6 = 0 THEN NULL
                       ELSE 'a' || CAST(doc_id % 10 AS VARCHAR)
                    END AS author
           FROM documents WHERE doc_id NOT IN (6, 7)),
         dim1 AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 'vip'
                       WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even'
                       ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents)),
         dim2 AS (
           SELECT 'b' || CAST(b AS VARCHAR) AS k
           FROM (VALUES (0),(1),(2),(3)) AS t(b) WHERE b <> 3)
         SELECT tier, COUNT(*) AS n_rows,
                COUNT(DISTINCT CASE WHEN author IS NOT NULL
                  THEN author || chr(1) || CAST(n_chars AS VARCHAR)
                END) AS dv_an
         FROM fact JOIN dim1 ON fact.src = dim1.k
                   JOIN dim2 ON fact.bk = dim2.k
         GROUP BY tier""",
    // the two-dimension histogram from the tuple pairs: counts, sums,
    // and the mean per (cat, sub), split back into typed components
    "q77_mv_tuple_histogram" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'c9'
                       ELSE 'c' || CAST(doc_id % 3 AS VARCHAR) END AS cat,
                  doc_id % 2 AS sub,
                  CASE WHEN doc_id % 5 = 0 THEN n_chars + 1
                       ELSE n_chars END AS w
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT cat, sub, COUNT(*) AS n_rows,
                CAST(SUM(w) AS BIGINT) AS sum_w,
                CAST(SUM(w) AS DOUBLE) / COUNT(w) AS avg_w
         FROM live GROUP BY 1, 2""",
    // the STAR twin: (dim attr, fact tuple) histogram over the three
    // reconstructed final states
    "q78_star_tuple_histogram" ->
      """WITH fact AS (
           SELECT CASE WHEN doc_id % 7 = 0 THEN 'src1' ELSE source END
                    AS src,
                  'b' || CAST(doc_id % 4 AS VARCHAR) AS bk,
                  CASE WHEN doc_id % 7 = 0 THEN n_chars + 3 ELSE n_chars
                    END AS n_chars
           FROM documents WHERE doc_id NOT IN (6, 7)),
         dim1 AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 'vip'
                       WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even'
                       ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents)),
         dim2 AS (
           SELECT 'b' || CAST(b AS VARCHAR) AS k
           FROM (VALUES (0),(1),(2),(3)) AS t(b) WHERE b <> 3)
         SELECT tier, bk, n_chars, COUNT(*) AS n_rows
         FROM fact JOIN dim1 ON fact.src = dim1.k
                   JOIN dim2 ON fact.bk = dim2.k
         GROUP BY 1, 2, 3""",
    // the Mar-1 day slice of the bucketed rollup: rows whose (possibly
    // +36h-shifted) timestamp truncates to Mar 1
    "q68_mv_bucket_slice" ->
      """WITH live AS (
           SELECT source,
                  TIMESTAMP '2024-03-01 00:00:00'
                    + to_hours(CAST(doc_id % 40 AS BIGINT))
                    + CASE WHEN doc_id % 5 = 0 THEN to_hours(36)
                           ELSE to_hours(0) END AS t,
                  CASE WHEN doc_id % 5 = 0 THEN n_chars + 7
                       ELSE n_chars END AS v
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, COUNT(*) AS n_rows,
                CAST(SUM(v) AS BIGINT) AS sum_v
         FROM live
         WHERE date_trunc('day', t) = TIMESTAMP '2024-03-01 00:00:00'
         GROUP BY source""",
    // histogram × star × per-table pins: per-(tier, author) counts
    // incl. the NULL author bucket, reconstructed one-shot
    "q69_star_pinned_histogram" ->
      """WITH fact AS (
           SELECT CASE WHEN doc_id % 7 = 0 THEN 'src1' ELSE source END
                    AS src,
                  'b' || CAST(doc_id % 4 AS VARCHAR) AS bk,
                  CASE WHEN doc_id % 7 = 0 THEN 'a9'
                       WHEN doc_id % 6 = 0 THEN NULL
                       ELSE 'a' || CAST(doc_id % 10 AS VARCHAR)
                    END AS author
           FROM documents WHERE doc_id NOT IN (6, 7)),
         dim1 AS (
           SELECT source AS k,
                  CASE WHEN CAST(substr(source, 4) AS INT) % 5 = 0
                         THEN 'vip'
                       WHEN CAST(substr(source, 4) AS INT) % 2 = 0
                         THEN 'even'
                       ELSE 'odd' END AS tier
           FROM (SELECT DISTINCT source FROM documents)),
         dim2 AS (
           SELECT 'b' || CAST(b AS VARCHAR) AS k
           FROM (VALUES (0),(1),(2),(3)) AS t(b) WHERE b <> 3)
         SELECT tier, author, COUNT(*) AS n_rows
         FROM fact JOIN dim1 ON fact.src = dim1.k
                   JOIN dim2 ON fact.bk = dim2.k
         GROUP BY 1, 2""",
    // an event-time coordinate at-or-above the whole consumed corpus
    // serves the same truth as q59 through the as-of walk (refusals —
    // backdated deletes, consumed above-t data — are spec-side)
    "q74_mv_asof_rewrite" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 5 = 0 THEN n_chars + 4 ELSE n_chars
                    END AS n_chars
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
         FROM live GROUP BY source""",
    // auto-discovery serves q53's truth with NO view named in the
    // session conf (the sidecar listing is the candidate source)
    "q75_mv_auto_rewrite" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 5 = 0 THEN n_chars + 4 ELSE n_chars
                    END AS n_chars
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
         FROM live GROUP BY source""",
    // a provably view-identical VERSION pin serves the same truth as
    // q53 (the pin IS the current version; refusal cases are spec-side)
    "q59_mv_pinned_rewrite" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 5 = 0 THEN n_chars + 4 ELSE n_chars
                    END AS n_chars
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
         FROM live GROUP BY source""",
    // the rewritten aggregate serves the SAME truth as q51 minus the
    // derived mean (the rewrite covers count/sum/min/max)
    "q53_mv_rewrite" ->
      """WITH live AS (
           SELECT CASE WHEN doc_id % 5 = 0 THEN 'rev12' ELSE source END
                    AS source,
                  CASE WHEN doc_id % 5 = 0 THEN n_chars + 4 ELSE n_chars
                    END AS n_chars
           FROM documents WHERE doc_id NOT IN (6, 7))
         SELECT source, COUNT(*) AS n_rows,
                CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars,
                MIN(n_chars) AS min_n_chars, MAX(n_chars) AS max_n_chars
         FROM live GROUP BY source""",
    // s08: candidates from the persisted signatures ≡ d02's own oracle
    // over the raw documents (final source state = the full table)
    "s08_minhash_sig_index" ->
      graft.queries.Pipeline.oracleSql("d02_minhash_lsh"),
    // index-served ≡ one-shot retrain on an append-only corpus: the
    // oracle IS t19's from-scratch bigram LM over the same documents
    "t20_lm_index" ->
      graft.queries.Pipeline.oracleSql("t19_lm_score"),
    "q18_azof_roundtrip" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE date_trunc('milliseconds', ts) <= TIMESTAMP '2024-01-25 00:00:00')
         WHERE rn = 1""",
    // version 3 of the vt lake = everything before Jan 20; the tag
    // resolves to it, so the oracle is q18's latest-row-per-key shape
    // with the Jan-20 cut (same tie-break: the two layouts are
    // identical over this subset)
    "q42_version_tag" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE date_trunc('milliseconds', ts) < TIMESTAMP '2024-01-20 00:00:00')
         WHERE rn = 1""",
    // the rolled-back CURRENT view ≡ version 3's view — deliberately
    // the same oracle as q42 through a different engine mechanism
    "q43_rollback" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE date_trunc('milliseconds', ts) < TIMESTAMP '2024-01-20 00:00:00')
         WHERE rn = 1""",
    // key predicates commute with the per-key dedup, so the oracle is
    // q18's latest-row-per-key query restricted to the looked-up keys
    "q32_key_lookup" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE date_trunc('milliseconds', ts) <= TIMESTAMP '2024-01-25 00:00:00'
                 AND CAST(user_id AS VARCHAR) IN ('7', '23', '41'))
         WHERE rn = 1""",
    // the SQL-inserted table holds ms-truncated events before Jan 10;
    // its Current scan is latest-row-per-key over exactly that set
    "q33_sql_insert" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE date_trunc('milliseconds', ts) < TIMESTAMP '2024-01-10 00:00:00')
         WHERE rn = 1""",
    // the atomically-CTAS'd table holds the whole ms-truncated corpus;
    // its Current scan is latest-row-per-key over all of it
    "q46_sql_ctas" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events)
         WHERE rn = 1""",
    // winners over ALL events whose newest row is a purchase — the
    // predicate applies to the WINNER, never to older rows
    // the z-order-compacted lake's Current view = every event merged;
    // winner-is-purchase, exactly q41's rule over the full corpus
    "q44_zorder_skip" ->
      """SELECT key, event_time, event_type FROM (
           SELECT CAST(user_id AS VARCHAR) AS key,
                  date_trunc('milliseconds', ts) AS event_time, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY date_trunc('milliseconds', ts) DESC,
                             event_id DESC) AS rn
           FROM events)
         WHERE rn = 1 AND event_type = 'purchase'""",
    "q41_value_skip" ->
      """SELECT key, event_time, event_type FROM (
           SELECT CAST(user_id AS VARCHAR) AS key,
                  date_trunc('milliseconds', ts) AS event_time, event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY date_trunc('milliseconds', ts) DESC,
                             event_id DESC) AS rn
           FROM events)
         WHERE rn = 1 AND event_type = 'purchase'""",
    // final post-MERGE state, recomputed relationally: pre-Jan-10
    // winners minus merged-away keys, plus tagged updates and inserts
    "q40_sql_merge" ->
      """WITH pre AS (
           SELECT CAST(user_id AS VARCHAR) AS key,
                  date_trunc('milliseconds', ts) AS event_time, event_type
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY date_trunc('milliseconds', ts) DESC,
                            event_id DESC) AS rn
                 FROM events
                 WHERE date_trunc('milliseconds', ts) <
                         TIMESTAMP '2024-01-10 00:00:00')
           WHERE rn = 1),
         src AS (
           SELECT CAST(user_id AS VARCHAR) AS key,
                  date_trunc('milliseconds', ts) AS event_time, event_type
           FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY date_trunc('milliseconds', ts) DESC,
                            event_id DESC) AS rn
                 FROM events
                 WHERE date_trunc('milliseconds', ts) >=
                         TIMESTAMP '2024-01-10 00:00:00'
                   AND date_trunc('milliseconds', ts) <
                         TIMESTAMP '2024-01-20 00:00:00')
           WHERE rn = 1)
         SELECT p.key, p.event_time, p.event_type FROM pre p
           WHERE NOT EXISTS (SELECT 1 FROM src s WHERE s.key = p.key)
         UNION ALL
         SELECT s.key, s.event_time, s.event_type || '_m' AS event_type
           FROM src s JOIN pre p ON p.key = s.key
           WHERE s.event_type <> 'view'
         UNION ALL
         SELECT s.key, s.event_time, s.event_type || '_i' AS event_type
           FROM src s
           WHERE NOT EXISTS (SELECT 1 FROM pre p WHERE p.key = s.key)""",
    // post-merge Current, recomputed relationally: per-key newest row
    // across the pre-Jan-10 base, the branch MERGE's tagged rows
    // (matched against the FORK state = pre rows only — main's later
    // delta must not influence tags), and main's [Jan 20, ∞) delta
    "q47_branch_merge" ->
      """WITH kv AS (SELECT CAST(user_id AS VARCHAR) AS key,
                date_trunc('milliseconds', ts) AS event_time,
                event_type, event_id
              FROM events),
         pre AS (SELECT * FROM kv
                 WHERE event_time < TIMESTAMP '2024-01-10 00:00:00'),
         src AS (SELECT key, event_time, event_type, event_id FROM (
                   SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                     ORDER BY event_time DESC, event_id DESC) AS rn
                   FROM kv
                   WHERE event_time >= TIMESTAMP '2024-01-10 00:00:00'
                     AND event_time <  TIMESTAMP '2024-01-20 00:00:00')
                 WHERE rn = 1),
         dml AS (SELECT s.key, s.event_time,
                   CASE WHEN EXISTS (SELECT 1 FROM pre p WHERE p.key = s.key)
                        THEN s.event_type || '_m'
                        ELSE s.event_type || '_i' END AS event_type,
                   s.event_id
                 FROM src s),
         late AS (SELECT * FROM kv
                  WHERE event_time >= TIMESTAMP '2024-01-20 00:00:00'),
         allr AS (SELECT * FROM pre UNION ALL SELECT * FROM dml
                  UNION ALL SELECT * FROM late)
         SELECT key, event_time, event_type FROM (
           SELECT *, ROW_NUMBER() OVER (PARTITION BY key
             ORDER BY event_time DESC, event_id DESC) AS rn FROM allr)
         WHERE rn = 1""",
    // the feed is the raw rows of the two delta commits (no dedup);
    // delta windows partition time, so the committing version is a
    // function of event_time alone
    "q35_change_feed" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type,
         CASE WHEN date_trunc('milliseconds', ts) < TIMESTAMP '2024-01-20 00:00:00'
              THEN CAST(3 AS BIGINT) ELSE CAST(4 AS BIGINT) END AS _commit_version
         FROM events
         WHERE date_trunc('milliseconds', ts) >= TIMESTAMP '2024-01-10 00:00:00'""",
    // the publish preview is exactly the staged rows: the [Jan 10,
    // Jan 20) upserts (branch commit 3) plus the two Mar-1 tombstones
    // (branch commit 4, NULL values, _deleted = true)
    "q49_publish_preview" ->
      """SELECT key, event_time, event_type, _deleted, _commit_version FROM (
           SELECT CAST(user_id AS VARCHAR) AS key,
                  date_trunc('milliseconds', ts) AS event_time, event_type,
                  false AS _deleted, CAST(3 AS BIGINT) AS _commit_version
           FROM events
           WHERE date_trunc('milliseconds', ts) >= TIMESTAMP '2024-01-10 00:00:00'
             AND date_trunc('milliseconds', ts) < TIMESTAMP '2024-01-20 00:00:00'
           UNION ALL
           SELECT d.key, TIMESTAMP '2024-03-01 00:00:00',
                  CAST(NULL AS VARCHAR), true, CAST(4 AS BIGINT)
           FROM (VALUES ('7'), ('23')) AS d(key))""",
    // strict mode ranks by (file precedence, event_time DESC): the
    // tagged inner-window delta (later start) outranks the full delta,
    // so any key with an inner-window event surfaces its newest TAGGED
    // row even when an untagged later row exists — first-seen-wins
    "q36_strict_precedence" ->
      """WITH kv AS (SELECT CAST(user_id AS VARCHAR) AS key,
                date_trunc('milliseconds', ts) AS event_time, event_type
              FROM events),
         u AS (SELECT key, event_time, event_type || '_d2' AS event_type,
                      0 AS prec
               FROM kv
               WHERE event_time >= TIMESTAMP '2024-01-05 00:00:00'
                 AND event_time <  TIMESTAMP '2024-01-15 00:00:00'
               UNION ALL
               SELECT key, event_time, event_type, 1 AS prec FROM kv)
         SELECT key, event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY key
                 ORDER BY prec, event_time DESC) AS rn FROM u)
         WHERE rn = 1""",
    // the per-key winner is dropped iff its key is deleted AND its
    // event_time is at-or-before that key's tombstone (the tombstone
    // outranks an exact event-time tie by file precedence; newer rows
    // beat it)
    "q37_tombstone_delete" ->
      """SELECT key, event_time, event_type FROM
           (SELECT CAST(user_id AS VARCHAR) AS key,
              date_trunc('milliseconds', ts) AS event_time, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
            FROM events)
         WHERE rn = 1
           AND NOT (key IN ('7', '23')
                    AND event_time <= TIMESTAMP '2024-01-25 00:00:00')
           AND NOT (key IN ('41', '103')
                    AND event_time <= TIMESTAMP '2024-02-01 00:00:00')""",
    // the mirror must surface exactly the source's Current state: same
    // winners, same tombstone suppression — q37's oracle verbatim
    "q38_mirror_delete" ->
      """SELECT key, event_time, event_type FROM
           (SELECT CAST(user_id AS VARCHAR) AS key,
              date_trunc('milliseconds', ts) AS event_time, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
            FROM events)
         WHERE rn = 1
           AND NOT (key IN ('7', '23')
                    AND event_time <= TIMESTAMP '2024-01-25 00:00:00')
           AND NOT (key IN ('41', '103')
                    AND event_time <= TIMESTAMP '2024-02-01 00:00:00')""",
    // the native-sink mirror states the same contract as q38: the
    // target's Current state IS the source's — winners, tombstones,
    // event-time delete semantics all preserved through the DSv2 sink
    "q45_native_mirror" ->
      """SELECT key, event_time, event_type FROM
           (SELECT CAST(user_id AS VARCHAR) AS key,
              date_trunc('milliseconds', ts) AS event_time, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
            FROM events)
         WHERE rn = 1
           AND NOT (key IN ('7', '23')
                    AND event_time <= TIMESTAMP '2024-01-25 00:00:00')
           AND NOT (key IN ('41', '103')
                    AND event_time <= TIMESTAMP '2024-02-01 00:00:00')""",
    // the staged-on-a-branch mirror PUBLISHES the identical contract:
    // after fast-forward, the target's main Current is the source's
    // state — the oracle is blind to the staging detour by design
    "q48_wap_mirror" ->
      """SELECT key, event_time, event_type FROM
           (SELECT CAST(user_id AS VARCHAR) AS key,
              date_trunc('milliseconds', ts) AS event_time, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
            FROM events)
         WHERE rn = 1
           AND NOT (key IN ('7', '23')
                    AND event_time <= TIMESTAMP '2024-01-25 00:00:00')
           AND NOT (key IN ('41', '103')
                    AND event_time <= TIMESTAMP '2024-02-01 00:00:00')""",
    // the FOLDED staged publish keeps the identical contract: branch
    // compaction before fast-forward must not change the published
    // Current — same oracle as q48/q45, blind to the fold by design
    "q50_wap_fold_publish" ->
      """SELECT key, event_time, event_type FROM
           (SELECT CAST(user_id AS VARCHAR) AS key,
              date_trunc('milliseconds', ts) AS event_time, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
            FROM events)
         WHERE rn = 1
           AND NOT (key IN ('7', '23')
                    AND event_time <= TIMESTAMP '2024-01-25 00:00:00')
           AND NOT (key IN ('41', '103')
                    AND event_time <= TIMESTAMP '2024-02-01 00:00:00')""",
    // a key is deleted iff its per-key winner matched the predicate,
    // and the tombstone (at `now`, after every event) suppresses it
    // unconditionally — survivors are the winners that did NOT match
    "q39_predicate_delete" ->
      """SELECT key, event_time, event_type FROM
           (SELECT CAST(user_id AS VARCHAR) AS key,
              date_trunc('milliseconds', ts) AS event_time, event_type,
              ROW_NUMBER() OVER (PARTITION BY user_id
                ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
            FROM events)
         WHERE rn = 1 AND event_type <> 'error'""",
    // s07: the persisted index's final Current == direct PQ encode of
    // the FULL embeddings table under the seed codebooks frozen on the
    // initial slice (vec_id % 5 <> 0) — same replay CTEs as s06, codes
    // joined to a string (the index's portable storage format)
    "s07_pq_codes_index" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                    FROM embeddings),
          seed AS (SELECT c, v FROM (
              SELECT v, ROW_NUMBER() OVER (
                  ORDER BY md5('pq#' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS c
              FROM e WHERE vec_id % 5 <> 0) WHERE c < 16),
          books AS (SELECT s.s, seed.c, seed.v[s.s*8+1 : s.s*8+8] AS cv
                    FROM seed, (SELECT unnest(range(0, 8)) AS s) s),
          encd AS (SELECT e.vec_id, b.s, b.c,
                     list_sum(list_transform(
                       list_zip(e.v[b.s*8+1 : b.s*8+8], b.cv),
                       x -> (x[1]-x[2])*(x[1]-x[2]))) AS d
                   FROM e CROSS JOIN books b),
          enc AS (SELECT vec_id, s, c FROM (
              SELECT vec_id, s, c, ROW_NUMBER() OVER (
                  PARTITION BY vec_id, s ORDER BY d ASC, c) AS rn
              FROM encd) WHERE rn = 1)
          SELECT vec_id, string_agg(CAST(c AS VARCHAR), ',' ORDER BY s) AS codes
          FROM enc GROUP BY vec_id""",
    // one by-key commit holds ALL events, so Current is plain
    // latest-row-per-key restricted to the looked-up keys
    "q34_bykey_lookup" ->
      """SELECT CAST(user_id AS VARCHAR) AS key,
         date_trunc('milliseconds', ts) AS event_time, event_type
         FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY date_trunc('milliseconds', ts) DESC, event_id DESC) AS rn
               FROM events
               WHERE CAST(user_id AS VARCHAR) IN ('7', '23', '41', '103'))
         WHERE rn = 1""")
}
