package graft.sources

import graft.format._
import graft.operators.AzofScan
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext}
import org.apache.spark.sql.functions.{col, lit, not}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** `spark.read.format("azof")` — the programmatic time-travel surface,
  * matching the reference's per-(table, asOf) provider registration
  * (reference: crates/azof-datafusion/src/lib.rs:60-82, context.rs:30-43)
  * without requiring the `AzofExtensions` session rule or any session
  * config: it works in a vanilla SparkSession and composes with every
  * DataFrame operation.
  *
  * {{{
  * spark.read.format("azof").load("/lake/events_kv")                  // current
  * spark.read.format("azof").option("table", "t").load("/lake")       // explicit table
  * spark.read.format("azof").option("asOf", "2024-01-25T00:00:00Z")   // event-time travel
  * spark.read.format("azof").option("versionAsOf", "3")               // snapshot travel
  * }}}
  *
  * Design note: this is the V1 `RelationProvider` connector API on
  * purpose, NOT a DSv2 `PartitionReaderFactory` — the merge-dedup scan
  * already exists as a single declarative Catalyst plan
  * ([[graft.operators.AzofScan]]); a DSv2 reader would need that
  * semantics re-implemented row-at-a-time per partition (a second,
  * slower copy of the engine's core). The relation delegates to the
  * plan: column pruning flows through `buildScan`'s requiredColumns into
  * the scan's parquet ReadSchema, and translatable filters are applied
  * inside the inner plan (where Catalyst pushes key predicates below
  * the dedup window and everything pushable into the parquet scan)
  * while Spark re-applies them above (all filters stay "unhandled") so
  * correctness never depends on the translation.
  */
final class AzofDataSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "azof"

  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path", throw new IllegalArgumentException(
      "azof reader needs a path: spark.read.format(\"azof\").load(<tableDir>) " +
        "or .option(\"table\", <name>).load(<lakehouseDir>)"))
    val (lake, table) = parameters.get("table") match {
      case Some(t) => (path, t)
      case None =>
        val p = new Path(path)
        val parent = Option(p.getParent).getOrElse(
          throw new IllegalArgumentException(
            s"cannot split '$path' into lakehouse dir + table name; " +
              "pass .option(\"table\", <name>) explicitly"))
        (parent.toString, p.getName)
    }
    // CDC read: .option("changesFrom", v)[.option("changesTo", w)] —
    // rows added by commits in (v, w] tagged _commit_version, the
    // DataFrameReader face of AzofChangeFeed. Non-numeric values
    // resolve as named version refs (tags) like versionAsOf does.
    def version(opt: String, v: String): Long =
      v.trim.toLongOption.getOrElse {
        try graft.format.AzofTable(sqlContext.sparkSession, lake, table)
          .resolveVersion(v).toLong
        catch { case e: IllegalArgumentException =>
          throw new IllegalArgumentException(
            s"azof reader option '$opt' must be a snapshot version " +
              s"number or a known tag, got '$v': ${e.getMessage}")
        }
      }
    // metadata views through the reader, for non-catalog users:
    //   .option("meta", "history"|"files"|"refs")[.option("versionAsOf", v)]
    parameters.get("meta").foreach { kind =>
      return new AzofMetaRelation(sqlContext, lake, table,
        kind.trim.toLowerCase(java.util.Locale.ROOT),
        parameters.get("versionAsOf"))
    }
    // publish preview: .option("publishDiff", <branch>) — the rows
    // publishing that branch would make live on main (AzofChangeFeed
    // .branchDiff), the audit face of write-audit-publish
    parameters.get("publishDiff").foreach { b =>
      return new AzofBranchDiffRelation(sqlContext, lake, table, b.trim)
    }
    parameters.get("changesFrom") match {
      case Some(fromV) =>
        new AzofChangesRelation(sqlContext, lake, table,
          version("changesFrom", fromV),
          parameters.get("changesTo").map(version("changesTo", _)))
      case None =>
        val asOf = parameters.get("asOf").orElse(parameters.get("timestampAsOf"))
          .map(s => AsOf.EventTime(AzofDataSource.parseInstant(s)): AsOf)
          .getOrElse(AsOf.Current)
        new AzofRelation(sqlContext, lake, table, asOf,
          parameters.get("versionAsOf"))
    }
  }
}

/** Metadata-view relation ([[AzofMetadataTables]] through the
  * DataFrameReader): driver-sized rows materialized into a local
  * DataFrame — bounded by commit count / the driver-held snapshot
  * tree, never row data.
  */
final class AzofMetaRelation(
    override val sqlContext: SQLContext,
    lakehousePath: String, tableName: String,
    kind: String, version: Option[String])
  extends BaseRelation with TableScan {

  private val spark = sqlContext.sparkSession
  override val schema: StructType = AzofMetadataTables.schemaFor(kind)
  override def buildScan(): RDD[Row] = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      AzofMetadataTables.rowsFor(
        spark, lakehousePath, tableName, kind, version).asJava,
      schema).rdd
  }
}

/** Change-feed relation: the batch CDC surface as a plain table scan
  * (Spark applies filters/projection above; the feed itself is a union
  * of the new files of each data-adding commit — metadata-pruned, never
  * a full-table diff).
  */
final class AzofChangesRelation(
    override val sqlContext: SQLContext,
    lakehousePath: String, tableName: String,
    fromVersion: Long, toVersion: Option[Long])
  extends BaseRelation with TableScan {

  private val spark = sqlContext.sparkSession
  private val df = toVersion match {
    case Some(v) =>
      AzofChangeFeed.between(spark, lakehousePath, tableName, fromVersion, v)
    case None =>
      AzofChangeFeed.since(spark, lakehousePath, tableName, fromVersion)
  }
  override val schema: StructType = df.schema
  override def buildScan(): RDD[Row] = df.rdd
}

/** Publish-preview relation: [[AzofChangeFeed.branchDiff]] as a plain
  * table scan — what publishing the branch would change on main.
  */
final class AzofBranchDiffRelation(
    override val sqlContext: SQLContext,
    lakehousePath: String, tableName: String, branch: String)
  extends BaseRelation with TableScan {

  private val df = AzofChangeFeed.branchDiff(
    sqlContext.sparkSession, lakehousePath, tableName, branch)
  override val schema: StructType = df.schema
  override def buildScan(): RDD[Row] = df.rdd
}

object AzofDataSource {
  /** Accepts ISO instants (`2024-01-25T00:00:00Z`), local date-times with
    * `T` or space (interpreted as UTC — azof timestamps are UTC by
    * format contract), and bare dates (midnight UTC).
    */
  def parseInstant(s: String): Instant = {
    val t = s.trim
    try Instant.parse(t)
    catch { case _: java.time.format.DateTimeParseException =>
      try LocalDateTime.parse(t.replace(' ', 'T')).toInstant(ZoneOffset.UTC)
      catch { case _: java.time.format.DateTimeParseException =>
        LocalDate.parse(t).atStartOfDay.toInstant(ZoneOffset.UTC)
      }
    }
  }
}

/** One (table, asOf, version) relation: schema from the resolved
  * snapshot, scan delegated to [[AzofScan.scanSnapshot]].
  */
final class AzofRelation(
    override val sqlContext: SQLContext,
    lakehousePath: String,
    tableName: String,
    asOf: AsOf,
    versionAsOf: Option[String]) extends BaseRelation with PrunedFilteredScan {

  private val spark = sqlContext.sparkSession
  private val table = AzofTable(spark, lakehousePath, tableName)

  /** `(lakehousePath, tableName)` iff this relation is the CURRENT live
    * view (no as-of, no version pin) — the only view an incrementally
    * maintained aggregate can stand in for. Consumed by
    * [[graft.plans.MvRewriteRule]].
    */
  private[graft] def mvMatchKey: Option[(String, String)] =
    if (asOf == AsOf.Current && versionAsOf.isEmpty)
      Some((lakehousePath, tableName))
    else None

  /** `(lakehousePath, tableName, resolvedVersion)` iff this relation is
    * a VERSION-pinned main-lineage view (`VERSION AS OF <n|tag>`, no
    * event-time as-of): the rewrite rule may serve it from a view whose
    * state provably equals the live view AT that version
    * ([[MatView.freshViewVersionAt]] — the reproducible-report shape).
    */
  private[graft] def mvMatchKeyPinned: Option[(String, String, Long)] =
    if (asOf == AsOf.Current && versionAsOf.nonEmpty)
      scala.util.Try(
        table.resolveVersion(versionAsOf.get).toLong).toOption
        .map(v => (lakehousePath, tableName, v))
    else None

  /** `(lakehousePath, tableName, t)` iff this relation is an
    * EVENT-TIME as-of view (`TIMESTAMP AS OF t`, no version pin): the
    * rewrite rule may serve it from a view whose consumed state
    * provably equals the as-of view at `t`
    * ([[MatView.unchangedSinceAsOf]] — the frozen-dashboard shape).
    */
  private[graft] def mvMatchKeyAsOf
      : Option[(String, String, java.time.Instant)] =
    asOf match {
      case AsOf.EventTime(t) if versionAsOf.isEmpty =>
        Some((lakehousePath, tableName, t))
      case _ => None
    }
  // non-numeric versionAsOf specs resolve as named refs (tags) through
  // the current snapshot's ref index (AzofTable.resolveVersion)
  private val snap: Snapshot =
    versionAsOf.map(v => table.snapshot(table.resolveVersion(v)))
      .getOrElse(table.currentSnapshot)

  override val schema: StructType = snap.schema.toStruct

  /** Size estimate from the snapshot's own file list: ONE directory
    * listing, summed over the files THIS view's time pruning keeps.
    * Raw delta/base bytes upper-bound the merge-dedup output (dedup
    * only drops rows), so the estimate is conservative for Spark's
    * auto-broadcast decision — without it `BaseRelation` defaults to
    * "effectively infinite" and an azof dim table never broadcasts,
    * forcing a shuffle join however small the table is. Listing failure
    * falls back to that safe default.
    */
  private[sources] lazy val estimatedSizeBytes: Long =
    try {
      val dir = table.tableDir
      val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
      val lens = fs.listStatus(dir)
        .map(st => st.getPath.getName -> st.getLen).toMap
      val files = AzofScan.prunedFiles(snap, asOf)
      val sum = files.map(f => lens.getOrElse(f, 0L)).sum
      // empty view (or nothing listed) -> 1 byte, not 0: zero reads as
      // "stats absent" to some consumers and under-bounds are harmless
      math.max(sum, 1L)
    } catch { case _: java.io.IOException => super.sizeInBytes }

  override def sizeInBytes: Long = estimatedSizeBytes

  /** Row estimate from the snapshot's per-file `rows` stats, summed
    * over THIS view's time-pruned files: an upper bound of the
    * merge-dedup output (dedup only drops rows) — a conservative
    * planner input, metadata-only. None when any pruned file predates
    * the row-count stats generation (a partial sum would UNDER-bound,
    * which for a planner is the dangerous direction; `analyze`
    * backfills old tables).
    */
  private[sources] lazy val estimatedRows: Option[Long] = {
    val entries = snap.dataFilesWithStats(asOf)
    val counts = entries.flatMap(_.stats.flatMap(_.rows))
    if (counts.size == entries.size) Some(counts.sum) else None
  }

  /** The scan RDD is handed over in Spark's INTERNAL row format: the
    * inner as-of plan already produces UnsafeRows, and the default
    * `needConversion = true` contract would deserialize every row to an
    * external [[Row]] in [[buildScan]] only for `DataSourceStrategy` to
    * re-encode it above the relation boundary — two full per-row
    * conversions the real query never needs (optimization guide §1.4's
    * `df.rdd` warning, measured on the SQL-surface scans this relation
    * serves).
    */
  private[sources] val internalHandoff: Boolean =
    spark.conf.get("spark.azof.scan.internalRows", "true").toBoolean

  /** Inner-plan AQE is disabled by default (see [[buildScan]]'s planning
    * note) behind its OWN kill switch so the A/B probe can attribute a
    * regression to the handoff and the AQE change independently.
    */
  private[sources] val innerAqe: Boolean =
    spark.conf.get("spark.azof.scan.innerAqe", "false").toBoolean

  // Both flags are snapshotted ONCE at relation construction: a def
  // re-reading the session conf could disagree between the planner's
  // needConversion check and buildScan (conf flipped mid-query) and
  // crash with a row-format ClassCastException.
  override def needConversion: Boolean = !internalHandoff

  override def buildScan(
      requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val projection =
      if (requiredColumns.isEmpty) None else Some(requiredColumns.toSet)
    val base = AzofScan.scanSnapshot(spark, table, snap, asOf, projection,
      AzofRelation.extractKeyFilter(filters), filters.toSeq)
    val filtered = filters.flatMap(translate)
      .foldLeft(base)((df, c) => df.where(c))
    val ordered: DataFrame =
      if (requiredColumns.isEmpty) filtered.select()
      else filtered.select(requiredColumns.map(col).toSeq: _*)
    // Plan the INNER query with AQE off: under AQE, forcing the RDD
    // eagerly materializes every inner exchange — the driver BLOCKS in
    // AdaptiveSparkPlanExec.withFinalPlanUpdate once per azof relation,
    // serially, before the outer query runs a single task (measured via
    // thread-dump sampling: the dominant driver frame on the MV-family
    // fallback plans). Without AQE the dedup shuffle joins the outer
    // job lazily and pipelines with everything else. AQE loses only
    // partition coalescing here — its skew handling never applied to
    // the window dedup anyway — and the OUTER query keeps full AQE.
    // The thread-local conf override scopes the change to this
    // planning, never the session.
    def handoff(): RDD[Row] =
      if (internalHandoff) ordered.queryExecution.toRdd.asInstanceOf[RDD[Row]]
      else ordered.rdd // kill switch / A-B probe arm (external Rows)
    if (innerAqe) handoff()
    else {
      val innerConf = spark.sessionState.conf.clone()
      innerConf.setConfString("spark.sql.adaptive.enabled", "false")
      org.apache.spark.sql.internal.SQLConf.withExistingConf(innerConf) {
        handoff()
      }
    }
  }

  /** Best-effort Filter → Column translation for pushdown INTO the inner
    * plan; untranslatable filters just skip the pushdown (Spark applies
    * every filter above this relation regardless — `unhandledFilters`
    * stays the conservative default).
    */
  private def translate(f: Filter): Option[Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case And(l, r) =>
      for { lc <- translate(l); rc <- translate(r) } yield lc && rc
    case Or(l, r) =>
      for { lc <- translate(l); rc <- translate(r) } yield lc || rc
    case Not(c) => translate(c).map(not)
    case _ => None
  }
}

object AzofRelation {
  import graft.format.{KeyFilter, TableSchema}

  /** Extract a [[KeyFilter]] for stats-based file skipping from pushed
    * filters (implicitly a conjunction). Only shapes that are PROVABLY
    * key-restricting prune: equality/IN/range on the `key` column, and
    * conjunctions thereof. Anything else — Or, Not, other columns,
    * non-string values — contributes nothing (conservative: the scan
    * reads more, never less, and its residual predicate keeps results
    * exact regardless).
    */
  def extractKeyFilter(filters: Array[Filter]): Option[KeyFilter] = {
    val parts = filters.toSeq.flatMap(extractOne)
    parts match {
      case Seq()  => None
      case Seq(f) => Some(f)
      case many   => Some(KeyFilter.AllOf(many))
    }
  }

  private def extractOne(f: Filter): Option[KeyFilter] = f match {
    case EqualTo(TableSchema.KeyName, v: String) =>
      Some(KeyFilter.Keys(Set(v)))
    case EqualNullSafe(TableSchema.KeyName, v: String) =>
      Some(KeyFilter.Keys(Set(v)))
    case In(TableSchema.KeyName, vs)
        if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
      Some(KeyFilter.Keys(vs.map(_.asInstanceOf[String]).toSet))
    // strict bounds widen to inclusive — pruning may only over-keep
    case GreaterThan(TableSchema.KeyName, v: String) =>
      Some(KeyFilter.Range(Some(v), None))
    case GreaterThanOrEqual(TableSchema.KeyName, v: String) =>
      Some(KeyFilter.Range(Some(v), None))
    case LessThan(TableSchema.KeyName, v: String) =>
      Some(KeyFilter.Range(None, Some(v)))
    case LessThanOrEqual(TableSchema.KeyName, v: String) =>
      Some(KeyFilter.Range(None, Some(v)))
    case StringStartsWith(TableSchema.KeyName, p) if p.nonEmpty =>
      // every key with prefix p is >= p; the upper side stays open (a
      // tight bound needs prefix-increment logic, not worth the edge
      // cases) — half-range pruning still skips everything below p
      Some(KeyFilter.Range(Some(p), None))
    case And(l, r) =>
      (extractOne(l), extractOne(r)) match {
        case (Some(a), Some(b)) => Some(KeyFilter.AllOf(Seq(a, b)))
        case (a, b)             => a.orElse(b) // AND: either side alone is a valid widening
      }
    case _ => None
  }
}
