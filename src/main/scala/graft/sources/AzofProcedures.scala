package graft.sources

import graft.format.AzofTable
import java.time.Instant
import java.util.{Collections, Iterator => JIterator}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL maintenance procedures — Spark 4's native `ProcedureCatalog`
  * surface over the table-maintenance library calls, so operations a
  * lakehouse operator runs on a schedule are one `CALL` away from any
  * SQL client (the Iceberg `CALL cat.system.x(...)` convention):
  *
  * {{{
  * CALL lake.system.compact(`table` => 't', at => '2024-06-01T00:00:00Z',
  *                          files => 4, by_key => true)        -- or zorder => 'c1,c2'
  * CALL lake.system.vacuum(`table` => 't', keep => 10, dry_run => true)
  * CALL lake.system.purge(`table` => 't', before => '2024-06-01T00:00:00Z')
  * CALL lake.system.dedup_apply(`table` => 't', index_path => '/idx')
  * CALL lake.system.tag(`table` => 't', name => 'release-1')
  * CALL lake.system.rollback(`table` => 't', tag => 'release-1')
  * }}}
  *
  * Each procedure delegates to the SAME implementation the CLI and
  * library callers use ([[AzofWriter.compact]], [[AzofVacuum.vacuum]],
  * [[AzofWriter.purgeDeleted]], [[DedupFlow.applyVerdict]]) and
  * returns a one-row summary via `LocalScan` — results are
  * driver-sized by construction (counts and version stamps, never row
  * data). `table` needs backquotes in the named-argument form: it is a
  * SQL keyword.
  */
object AzofProcedures {

  val Names: Seq[String] =
    Seq("compact", "vacuum", "purge", "dedup_apply", "dedup_ingest",
      "sem_refresh", "dedup_rebuild", "sem_rebuild", "analyze",
      "contain_refresh", "shard_refresh", "seq_refresh", "lm_refresh",
      "mv_refresh", "term_refresh", "jv_refresh",
      "create_view", "create_join_view",
      "tag", "untag", "rollback",
      "create_branch", "drop_branch", "fast_forward", "merge_branch",
      "publish_preview")

  def load(path: String, ident: Identifier): UnboundProcedure = {
    val name = ident.name.toLowerCase
    require(ident.namespace.sameElements(Array("system")) &&
      Names.contains(name),
      s"unknown azof procedure ${ident.namespace.mkString(".")}.${ident.name}" +
        s" (expected system.{${Names.mkString(", ")}})")
    new Unbound(path, name)
  }

  private final class Unbound(path: String, name: String)
    extends UnboundProcedure {
    override def name(): String = name
    override def description(): String = s"azof system.$name"
    override def bind(inputType: StructType): BoundProcedure =
      new Bound(path, name)
  }

  private def p(n: String, t: DataType) = ProcedureParameter.in(n, t).build()
  private def pd(n: String, t: DataType, dflt: String) =
    ProcedureParameter.in(n, t).defaultValue(dflt).build()

  private final class Bound(path: String, name: String)
    extends BoundProcedure {
    override def name(): String = name
    override def description(): String = s"azof system.$name"
    override def isDeterministic: Boolean = false

    override def parameters(): Array[ProcedureParameter] = name match {
      case "compact" => Array(
        p("table", StringType), p("at", StringType),
        pd("files", IntegerType, "1"), pd("by_key", BooleanType, "false"),
        pd("zorder", StringType, "CAST(NULL AS STRING)"),
        pd("branch", StringType, "CAST(NULL AS STRING)"))
      case "vacuum" => Array(
        p("table", StringType), p("keep", IntegerType),
        pd("min_age_hours", IntegerType, "1"),
        pd("dry_run", BooleanType, "false"))
      case "purge" => Array(
        p("table", StringType), p("before", StringType))
      case "dedup_apply" => Array(
        p("table", StringType), p("index_path", StringType),
        pd("cc_table", StringType, "'components'"),
        pd("key_map", StringType, "CAST(NULL AS STRING)"),
        pd("sem_path", StringType, "CAST(NULL AS STRING)"),
        pd("sem_table", StringType, "'sem'"),
        pd("contain_path", StringType, "CAST(NULL AS STRING)"),
        pd("contain_table", StringType, "'contain_pairs'"),
        pd("contain_threshold", DoubleType, "0.9"),
        pd("branch", StringType, "CAST(NULL AS STRING)"))
      case "dedup_ingest" => Array(
        p("table", StringType), p("index_path", StringType),
        pd("text_col", StringType, "'text'"),
        pd("min_jaccard", DoubleType, "0.5"),
        pd("key_map", StringType, "CAST(NULL AS STRING)"))
      case "sem_refresh" => Array(
        p("table", StringType), p("index_path", StringType),
        pd("index_table", StringType, "'sem'"),
        pd("vec_col", StringType, "'vec'"))
      case "dedup_rebuild" => Array(
        p("table", StringType), p("index_path", StringType),
        pd("new_cc_table", StringType, "'components_next'"),
        pd("text_col", StringType, "'text'"),
        pd("min_jaccard", DoubleType, "0.5"),
        pd("key_map", StringType, "CAST(NULL AS STRING)"))
      case "sem_rebuild" => Array(
        p("table", StringType), p("index_path", StringType),
        p("new_index_table", StringType),
        pd("k", IntegerType, "16"),
        pd("threshold", DoubleType, "0.4"),
        pd("vec_col", StringType, "'vec'"),
        pd("keyed", BooleanType, "false"))
      case "analyze" => Array(p("table", StringType))
      case "contain_refresh" => Array(
        p("table", StringType), p("index_path", StringType),
        pd("index_table", StringType, "'contain_pairs'"),
        pd("text_col", StringType, "'text'"),
        pd("min_shared", IntegerType, "3"),
        pd("max_df", IntegerType, "20"),
        pd("min_containment", DoubleType, "0.9"),
        pd("keyed", BooleanType, "false"))
      case "shard_refresh" => Array(
        p("table", StringType), p("index_path", StringType),
        pd("index_table", StringType, "'shard_map'"))
      case "lm_refresh" => Array(
        p("table", StringType), p("index_path", StringType),
        pd("index_table", StringType, "'lm_stats'"),
        pd("text_col", StringType, "'text'"))
      // create_view IS mv_refresh (create-if-absent + initial refresh)
      // under the name the DDL's refusal messages point at — the
      // explicit-definition face for shapes CREATE MATERIALIZED VIEW
      // cannot infer from a query
      case "mv_refresh" | "create_view" => Array(
        p("table", StringType), p("index_path", StringType),
        p("group_cols", StringType),
        pd("index_table", StringType, "'mv'"),
        pd("sum_cols", StringType, "''"),
        pd("minmax_cols", StringType, "''"),
        pd("distinct_cols", StringType, "''"),
        // derived group entries "name:Type=sql[;name2:Type2=sql2]"
        pd("derived", StringType, "''"),
        // multi-column distinct tuples "a+b;c+d"
        pd("distinct_tuples", StringType, "''"),
        // APPROX_COUNT_DISTINCT sketch columns
        pd("approx_cols", StringType, "''"),
        // membership predicate (filtered/partial view), SQL text
        pd("filter", StringType, "''"),
        // VAR/STDDEV sum-of-squares columns (must also be sum_cols)
        pd("var_cols", StringType, "''"))
      case "term_refresh" => Array(
        p("table", StringType), p("index_path", StringType),
        pd("index_table", StringType, "'term_postings'"),
        pd("text_col", StringType, "'text'"))
      case "jv_refresh" | "create_join_view" => Array(
        // dim_table/fk_col take comma lists for STAR views; dim_cols
        // takes ';'-separated per-dim groups ("tier;region,country")
        p("table", StringType), p("dim_table", StringType),
        p("index_path", StringType), p("group_cols", StringType),
        p("fk_col", StringType),
        pd("dim_cols", StringType, "''"),
        pd("sum_cols", StringType, "''"),
        pd("minmax_cols", StringType, "''"),
        pd("index_table", StringType, "'jv'"),
        pd("dim_path", StringType, "CAST(NULL AS STRING)"),
        pd("distinct_cols", StringType, "''"),
        // derived FACT-side group entries "name:Type=sql[;...]"
        pd("derived", StringType, "''"),
        // multi-column distinct tuples "a+b;c+d"
        pd("distinct_tuples", StringType, "''"),
        // APPROX_COUNT_DISTINCT sketch columns
        pd("approx_cols", StringType, "''"),
        // membership predicate (filtered/partial view), SQL text
        pd("filter", StringType, "''"),
        // VAR/STDDEV sum-of-squares columns (must also be sum_cols)
        pd("var_cols", StringType, "''"))
      case "seq_refresh" => Array(
        p("table", StringType), p("index_path", StringType),
        pd("index_table", StringType, "'seq_map'"),
        pd("text_col", StringType, "'text'"))
      case "tag" => Array(
        p("table", StringType), p("name", StringType),
        pd("version", LongType, "CAST(NULL AS BIGINT)"),
        pd("replace", BooleanType, "false"))
      case "untag" => Array(
        p("table", StringType), p("name", StringType))
      case "rollback" => Array(
        p("table", StringType),
        pd("to_version", LongType, "CAST(NULL AS BIGINT)"),
        pd("tag", StringType, "CAST(NULL AS STRING)"))
      case "create_branch" => Array(
        p("table", StringType), p("name", StringType),
        pd("version", LongType, "CAST(NULL AS BIGINT)"))
      case "drop_branch" => Array(
        p("table", StringType), p("name", StringType))
      case "fast_forward" => Array(
        p("table", StringType), p("branch", StringType))
      case "merge_branch" => Array(
        p("table", StringType), p("branch", StringType))
      case "publish_preview" => Array(
        p("table", StringType), p("branch", StringType))
    }

    override def call(input: InternalRow): JIterator[Scan] = {
      val spark = SparkSession.active
      def str(i: Int): String =
        if (input.isNullAt(i)) null else input.getUTF8String(i).toString
      // "name:Type=sql[;name2:Type2=sql2]" → derived group defs (the
      // CLI --derived contract, one shared parser)
      def parseDerived(v: String): Seq[DerivedGroup] =
        DerivedGroup.parseList(v)
      // "a+b;c+d" -> multi-column distinct tuple declarations
      def parseTuples(v: String): Seq[Seq[String]] =
        Option(v).toSeq
          .flatMap(_.split(";").map(_.trim).filter(_.nonEmpty))
          .map(_.split("\\+").map(_.trim).filter(_.nonEmpty).toSeq)
      val out: (StructType, Seq[Any]) = name match {
        case "compact" =>
          val br = Option(str(5))
          AzofWriter.compact(spark, path, str(0), Instant.parse(str(1)),
            input.getInt(2), byKey = input.getBoolean(3),
            zorder = Option(str(4)).toSeq
              .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty)),
            branch = br)
          // branch folds report the BRANCH head (main's pointer is
          // untouched by design)
          val t = AzofTable(spark, path, str(0))
          (StructType(Seq(StructField("version", LongType))),
            Seq(br.flatMap(t.branchHead).getOrElse(
              t.currentVersion.toLong)))
        case "vacuum" =>
          val r = AzofVacuum.vacuum(spark, path, str(0), input.getInt(1),
            dryRun = input.getBoolean(3),
            minAgeMs = input.getInt(2) * 3600L * 1000L)
          // counts go out as Long uniformly: Seq(Long, Int, …) would
          // silently WIDEN every element to Long while the schema said
          // IntegerType — a ClassCastException at row projection
          (StructType(Seq(
            StructField("deleted_data_files", LongType),
            StructField("deleted_snapshots", LongType),
            StructField("retained_snapshots", LongType))),
            Seq(r.deletedDataFiles.size.toLong, r.deletedSnapshots.size.toLong,
              r.retainedSnapshots.size.toLong))
        case "purge" =>
          val r = AzofWriter.purgeDeleted(spark, path, str(0),
            Instant.parse(str(1)))
          (StructType(Seq(
            StructField("purged_keys", LongType),
            StructField("rewritten_files", LongType),
            StructField("dropped_files", LongType))),
            Seq(r.purgedKeys, r.rewrittenFiles.size.toLong,
              r.droppedFiles.size.toLong))
        case "dedup_apply" =>
          val n = DedupFlow.applyVerdict(spark, path, str(0), str(1),
            str(2), Option(str(3)),
            Option(str(4)).map(p => (p, str(5))),
            containIndex = Option(str(6)).map(p => (p, str(7))),
            containThreshold = input.getDouble(8),
            branch = Option(str(9)))
          (StructType(Seq(StructField("deleted_docs", LongType))), Seq(n))
        case "dedup_ingest" =>
          // stable checkpoint derived from the signature table — the
          // same rule as the CLI: a fresh dir per call would be a new
          // streaming appId replaying the whole commit feed every time
          val ckpt = new org.apache.hadoop.fs.Path(str(1),
            "minhash_sig/_refresh_checkpoint").toString
          val r = DedupFlow.ingest(spark, path, str(0), str(2), str(1),
            ckpt, Instant.ofEpochMilli(System.currentTimeMillis()),
            minJaccard = input.getDouble(3),
            keyMap = Option(str(4)))
          (StructType(Seq(
            StructField("from_version", LongType),
            StructField("to_version", LongType),
            StructField("churned", LongType),
            StructField("candidates", LongType),
            StructField("verified", LongType),
            StructField("relabeled", LongType))),
            Seq(r.fromVersion, r.toVersion, r.churned, r.candidates,
              r.verified, r.relabeled))
        case "sem_refresh" =>
          val ckpt = new org.apache.hadoop.fs.Path(str(1),
            str(2) + "/_refresh_checkpoint").toString
          var docs = 0L; var cmp = 0L; var batches = 0L
          SemDedupIndex.refresh(spark, path, str(0), str(3), str(1),
            str(2), ckpt, onStats = s => {
              batches += 1; docs += s.batchDocs; cmp += s.pairComparisons
            }).awaitTermination()
          (StructType(Seq(
            StructField("batches", LongType),
            StructField("docs", LongType),
            StructField("comparisons", LongType))),
            Seq(batches, docs, cmp))
        case "dedup_rebuild" =>
          // the epoch reconciliation escape hatch from SQL: re-cluster
          // the pinned corpus from the persisted signatures into a
          // FRESH components table (same stable checkpoint rule as
          // dedup_ingest — the signature catch-up stays exactly-once
          // across ingest and rebuild runs)
          val ckpt = new org.apache.hadoop.fs.Path(str(1),
            "minhash_sig/_refresh_checkpoint").toString
          val n = DedupFlow.rebuildEpoch(spark, path, str(0), str(3),
            str(1), ckpt,
            Instant.ofEpochMilli(System.currentTimeMillis()),
            newCcTable = str(2),
            minJaccard = input.getDouble(4),
            keyMap = Option(str(5)))
          (StructType(Seq(
            StructField("epoch_table", StringType),
            StructField("labeled_docs", LongType))),
            Seq(str(2), n))
        case "sem_rebuild" =>
          var docs = 0L; var cmp = 0L
          val m = SemDedupIndex.rebuildEpoch(spark, path, str(0), str(5),
            str(1), str(2),
            k = input.getInt(3), threshold = input.getDouble(4),
            onStats = s => { docs += s.batchDocs; cmp += s.pairComparisons },
            keyed = input.getBoolean(6))
          (StructType(Seq(
            StructField("epoch_table", StringType),
            StructField("k", LongType),
            StructField("threshold", DoubleType),
            StructField("docs", LongType))),
            Seq(str(2), m.k.toLong, m.threshold, docs))
        case "analyze" =>
          val r = AzofWriter.analyzeTable(spark, path, str(0))
          (StructType(Seq(
            StructField("analyzed_files", LongType),
            StructField("skipped_files", LongType),
            StructField("version", LongType, nullable = true))),
            Seq(r.analyzed.size.toLong, r.skipped.size.toLong,
              r.version.map(java.lang.Long.valueOf).orNull))
        case "contain_refresh" =>
          val r = ContainIndex.refresh(spark, path, str(0), str(3),
            str(1), str(2),
            Instant.ofEpochMilli(System.currentTimeMillis()),
            minShared = input.getInt(4), maxDf = input.getInt(5),
            minContainment = input.getDouble(6),
            keyed = input.getBoolean(7))
          (StructType(Seq(
            StructField("from_version", LongType),
            StructField("to_version", LongType),
            StructField("churned", LongType),
            StructField("candidates", LongType),
            StructField("verified", LongType),
            StructField("upserted", LongType),
            StructField("retired", LongType))),
            Seq(r.fromVersion, r.toVersion, r.churned, r.candidates,
              r.verified, r.upserted, r.retired))
        case "lm_refresh" =>
          // the stable-checkpoint rule from dedup_ingest: a fresh dir
          // per call would be a new streaming appId replaying the whole
          // commit feed every time
          val lmCk = new org.apache.hadoop.fs.Path(str(1),
            str(2) + "/_refresh_checkpoint").toString
          val q = LmIndex.refresh(spark, path, str(0), str(3),
            str(1), str(2), lmCk)
          q.awaitTermination()
          (StructType(Seq(StructField("stats_version", LongType))),
            Seq(AzofTable(spark, str(1), str(2)).currentVersion.toLong))
        case "mv_refresh" | "create_view" =>
          // same stable-checkpoint rule as lm_refresh
          def csv(v: String): Seq[String] =
            Option(v).toSeq.flatMap(
              _.split(',').map(_.trim).filter(_.nonEmpty))
          val vd = ViewDef(csv(str(2)), csv(str(4)), csv(str(5)),
            csv(str(6)), parseDerived(str(7)), parseTuples(str(8)),
            csv(str(9)),
            Option(str(10)).map(_.trim).filter(_.nonEmpty),
            csv(str(11)))
          val mvCk = new org.apache.hadoop.fs.Path(str(1),
            str(3) + "/_refresh_checkpoint").toString
          val q = MatView.refresh(spark, path, str(0), str(1), str(3),
            vd, mvCk)
          q.awaitTermination()
          (StructType(Seq(StructField("view_version", LongType))),
            Seq(AzofTable(spark, str(1), str(3)).currentVersion.toLong))
        case "jv_refresh" | "create_join_view" =>
          def jcsv(v: String): Seq[String] =
            Option(v).toSeq.flatMap(
              _.split(',').map(_.trim).filter(_.nonEmpty))
          val fks = jcsv(str(4))
          val dimTables = jcsv(str(1))
          require(fks.size == dimTables.size,
            s"${dimTables.size} dim table(s), ${fks.size} fk column(s)")
          val dimColGroups = Option(str(5)).filter(_.nonEmpty)
            .map(_.split(";", -1).toSeq.map(
              _.split(",").map(_.trim).filter(_.nonEmpty).toSeq))
            .getOrElse(Nil)
          val padded = dimColGroups.padTo(fks.size, Seq.empty[String])
          val jd = JoinViewDef(jcsv(str(3)), jcsv(str(6)), jcsv(str(7)),
            fks.zip(padded).map { case (fk, dc) => DimJoin(fk, dc) },
            jcsv(str(10)), parseDerived(str(11)), parseTuples(str(12)),
            jcsv(str(13)),
            Option(str(14)).map(_.trim).filter(_.nonEmpty),
            jcsv(str(15)))
          // split with -1 keeps EMPTY slots (",lake2" = default lake
          // for dim1, lake2 for dim2) — a nonEmpty filter here would
          // silently shift later lakes onto earlier dims (cliJvDims'
          // contract, mirrored)
          val dimPaths = Option(str(9))
            .map(_.split(",", -1).map(_.trim).toSeq)
            .getOrElse(Nil).padTo(dimTables.size, "")
            .map(pth => if (pth.isEmpty) path else pth)
          val jr = JoinView.refresh(spark, path, str(0),
            dimTables.zipWithIndex.map { case (dt, i) =>
              (dimPaths(i), dt) },
            str(2), str(8), jd)
          (StructType(Seq(
            StructField("fact_version", LongType),
            StructField("dim_version", LongType),
            StructField("touched", LongType))),
            Seq(jr.toFact, jr.toDim, jr.touched))
        case "term_refresh" =>
          // same stable-checkpoint rule as lm_refresh
          val tCk = new org.apache.hadoop.fs.Path(str(1),
            str(2) + "/_refresh_checkpoint").toString
          val tq = TermIndex.refresh(spark, path, str(0), str(3),
            str(1), str(2), tCk)
          tq.awaitTermination()
          (StructType(Seq(StructField("postings_version", LongType))),
            Seq(AzofTable(spark, str(1), str(2)).currentVersion.toLong))
        case "shard_refresh" =>
          val r = ShardMap.refresh(spark, path, str(0), str(1), str(2),
            Instant.ofEpochMilli(System.currentTimeMillis()))
          (StructType(Seq(
            StructField("from_version", LongType),
            StructField("to_version", LongType),
            StructField("churned", LongType),
            StructField("assigned", LongType),
            StructField("next_rank", LongType))),
            Seq(r.fromVersion, r.toVersion, r.churned, r.assigned,
              r.nextRank))
        case "seq_refresh" =>
          val r = SeqMap.refresh(spark, path, str(0), str(3), str(1),
            str(2), Instant.ofEpochMilli(System.currentTimeMillis()))
          (StructType(Seq(
            StructField("from_version", LongType),
            StructField("to_version", LongType),
            StructField("churned", LongType),
            StructField("assigned", LongType),
            StructField("next_token", LongType))),
            Seq(r.fromVersion, r.toVersion, r.churned, r.assigned,
              r.nextToken))
        case "tag" =>
          // resolve "current" HERE so the reported tagged_version is
          // exactly what was tagged even if another commit races the
          // tag commit itself
          val resolved = if (input.isNullAt(2))
            AzofTable(spark, path, str(0)).currentVersion.toLong
          else input.getLong(2)
          val v = AzofWriter.tagVersion(spark, path, str(0), str(1),
            Some(resolved), replace = input.getBoolean(3))
          (StructType(Seq(
            StructField("tag", StringType),
            StructField("tagged_version", LongType),
            StructField("committed_at", LongType))),
            Seq(str(1), resolved, v))
        case "untag" =>
          val v = AzofWriter.untagVersion(spark, path, str(0), str(1))
          (StructType(Seq(
            StructField("tag", StringType),
            StructField("committed_at", LongType))),
            Seq(str(1), v))
        case "rollback" =>
          // exactly one of to_version / tag names the target; a tag
          // resolves through the current snapshot's ref index
          val target = (input.isNullAt(1), Option(str(2))) match {
            case (false, None) => input.getLong(1)
            case (true, Some(t)) =>
              AzofTable(spark, path, str(0)).resolveVersion(t).toLong
            case _ => throw new IllegalArgumentException(
              "rollback takes exactly one of to_version => N or " +
                "tag => 'name'")
          }
          val v = AzofWriter.rollback(spark, path, str(0), target)
          (StructType(Seq(
            StructField("rolled_back_to", LongType),
            StructField("committed_at", LongType))),
            Seq(target, v))
        case "create_branch" =>
          val at = AzofWriter.createBranch(spark, path, str(0), str(1),
            if (input.isNullAt(2)) None else Some(input.getLong(2)))
          (StructType(Seq(
            StructField("branch", StringType),
            StructField("forked_at", LongType))),
            Seq(str(1), at))
        case "drop_branch" =>
          AzofWriter.dropBranch(spark, path, str(0), str(1))
          (StructType(Seq(StructField("dropped", StringType))),
            Seq(str(1)))
        case "fast_forward" =>
          val v = AzofWriter.fastForward(spark, path, str(0), str(1))
          (StructType(Seq(
            StructField("branch", StringType),
            StructField("published_at", LongType))),
            Seq(str(1), v))
        case "publish_preview" =>
          // the WAP audit gate from pure SQL: size the staged change
          // set before deciding to fast_forward/merge_branch (row-level
          // inspection is the reader/CLI face — `changes --branch B` /
          // .option("publishDiff", b); this summary is driver-sized)
          val prev = AzofChangeFeed.branchDiff(spark, path, str(0), str(1))
          val agg = prev.groupBy().agg(
            org.apache.spark.sql.functions.count(
              org.apache.spark.sql.functions.lit(1)),
            org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.when(
                org.apache.spark.sql.functions.col("_deleted"), 1L)
                .otherwise(0L)),
            org.apache.spark.sql.functions.countDistinct(
              org.apache.spark.sql.functions.col("_commit_version")))
            .collect()(0)
          val total = agg.getLong(0)
          val dels = if (agg.isNullAt(1)) 0L else agg.getLong(1)
          (StructType(Seq(
            StructField("branch", StringType),
            StructField("upserts", LongType),
            StructField("deletes", LongType),
            StructField("staged_commits", LongType))),
            Seq(str(1), total - dels, dels, agg.getLong(2)))
        case "merge_branch" =>
          val v = AzofWriter.mergeBranch(spark, path, str(0), str(1))
          (StructType(Seq(
            StructField("branch", StringType),
            StructField("merged_at", LongType))),
            Seq(str(1), v))
      }
      val row = new GenericInternalRow(out._2.map {
        case s: String => UTF8String.fromString(s)
        case v => v.asInstanceOf[AnyRef]
      }.toArray[Any])
      Collections.singletonList[Scan](new LocalScan {
        override def rows(): Array[InternalRow] = Array(row)
        override def readSchema(): StructType = out._1
      }).iterator()
    }
  }
}
