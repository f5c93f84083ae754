package graft.sources

import graft.format.{AsOf, ColumnDef, ColumnType, TableSchema}
import java.time.Instant
import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, V1Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, count, lit}
import org.apache.spark.sql.sources.{AlwaysFalse, And, BaseRelation, EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, InsertableRelation, IsNotNull, IsNull, LessThan, LessThanOrEqual, Not, Or, StringContains, StringEndsWith, StringStartsWith, TableScan}
import org.apache.spark.sql.types.{StructType, StringType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 `TableCatalog` over an azof lakehouse — the catalog-native
  * time-travel surface (the reference's per-(table, asOf) provider
  * registration, `crates/azof-datafusion/src/context.rs:30-43`, subsumed
  * by Spark's own analyzer):
  *
  * {{{
  * spark.sql.catalog.lake       = graft.sources.AzofCatalog
  * spark.sql.catalog.lake.path  = /path/to/lakehouse
  *
  * SELECT * FROM lake.financials TIMESTAMP AS OF '2019-01-17T00:00:00Z'
  * SELECT * FROM lake.t VERSION AS OF 3
  * spark.table("lake.t")
  * }}}
  *
  * `TIMESTAMP AS OF` / `VERSION AS OF` on catalog tables route through
  * Spark's native resolution into `loadTable(ident, timestampMicros)` /
  * `loadTable(ident, version)` — no parser extension, no session rule.
  * Reads delegate through the `V1Scan` bridge to [[AzofRelation]], i.e.
  * the SAME single-scan Catalyst merge-dedup plan as every other
  * surface; column pruning and filter pushdown flow through the
  * `ScanBuilder` into that plan. Read-only by design: writes go through
  * [[AzofWriter]]'s commit protocol, which a `createTable(ident, ...)`
  * DDL path would bypass.
  */
class AzofCatalog extends TableCatalog
  with StagingTableCatalog
  with org.apache.spark.sql.connector.catalog.ProcedureCatalog {
  private var catalogName: String = _
  private var lakehousePath: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    lakehousePath = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.path must point at the lakehouse root"))
  }

  override def name(): String = catalogName

  /** `CALL <cat>.system.<proc>(...)` — SQL maintenance procedures
    * ([[AzofProcedures]]: compact, vacuum, purge, dedup_apply).
    */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    AzofProcedures.load(lakehousePath, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      AzofProcedures.Names.map(n => Identifier.of(namespace, n)).toArray
    else Array.empty

  private def spark: SparkSession = SparkSession.active

  private def subPath(namespace: Array[String]): Path =
    namespace.foldLeft(new Path(lakehousePath))((p, n) => new Path(p, n))

  private def tableDir(ident: Identifier) =
    new Path(subPath(ident.namespace), ident.name)

  /** A REAL azof table lives at the ident's directory. The public
    * [[tableExists]] adds live BRANCH views on top, so `writeStream
    * .toTable(cat.t.branch_b)` resolves the branch instead of having
    * Spark CREATE a fresh table named `branch_b` inside `t`'s
    * directory; the fallback chains below stay keyed on the real test.
    */
  private def realTableExists(ident: Identifier): Boolean = {
    val marker = new Path(tableDir(ident), "version.txt")
    marker.getFileSystem(spark.sessionState.newHadoopConf()).exists(marker)
  }

  override def tableExists(ident: Identifier): Boolean =
    realTableExists(ident) || branchTable(ident).isDefined

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = subPath(namespace)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root)
      .filter(s => s.isDirectory &&
        !s.getPath.getName.startsWith(".") && // in-flight CTAS staging dirs
        fs.exists(new Path(s.getPath, "version.txt")))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  private def load(ident: Identifier, asOf: AsOf, version: Option[String]): Table = {
    if (!realTableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new AzofV2Table(tableDir(ident).getParent.toString, ident.name, asOf, version)
  }

  /** `cat.t.history` / `cat.t.files` / `cat.t.refs` — metadata views
    * (AzofMetadataTables). A REAL table always wins the name: the
    * fallback fires only when the ident resolves to no table and its
    * namespace tail does. `version` pins files/refs (`VERSION AS OF`
    * on a metadata table); history refuses it.
    */
  private def metadataTable(
      ident: Identifier, version: Option[String]): Option[Table] =
    if (!realTableExists(ident) && ident.namespace.nonEmpty) {
      val kind = ident.name.toLowerCase(java.util.Locale.ROOT)
      val parent = Identifier.of(
        ident.namespace.dropRight(1), ident.namespace.last)
      if (AzofMetadataTables.Names.contains(kind) && realTableExists(parent))
        Some(AzofMetadataTables.table(spark,
          tableDir(parent).getParent.toString, parent.name, kind, version))
      else None
    } else None

  /** `cat.t.branch_<name>` — a BRANCH view: reads pin the branch's head
    * snapshot (resolved at load), `INSERT INTO` appends to the branch
    * lineage. A REAL table always wins the name, same contract as the
    * metadata views. Row-level DML and streaming sinks on branch views
    * land on the branch lineage; publish via fast_forward/merge_branch.
    */
  private def branchTable(ident: Identifier): Option[Table] =
    if (!realTableExists(ident) && ident.namespace.nonEmpty &&
      ident.name.startsWith("branch_")) {
      val bname = ident.name.stripPrefix("branch_")
      val parent = Identifier.of(
        ident.namespace.dropRight(1), ident.namespace.last)
      if (bname.nonEmpty && realTableExists(parent)) {
        val parentLake = tableDir(parent).getParent.toString
        val t = graft.format.AzofTable(spark, parentLake, parent.name)
        t.branchHead(bname).map(head =>
          new AzofV2Table(parentLake, parent.name, AsOf.Current,
            Some(head.toString), branchLineage = Some(bname)))
      } else None
    } else None

  /** Write-audit-publish SESSION ROUTING (Iceberg's `spark.wap.branch`
    * analog): with `spark.azof.wap.branch = <b>` set, every UNPINNED
    * load of a real table serves the branch view instead — the whole
    * ETL job reads and appends through `<b>` with its SQL unchanged,
    * and main readers see nothing until `CALL system.fast_forward` /
    * `merge_branch`. Explicit pins (`VERSION AS OF`, `TIMESTAMP AS
    * OF`) and the metadata/branch views stay un-routed — an explicit
    * spelling always wins a session default. An unknown branch refuses
    * loudly: silently writing main would defeat the audit gate.
    * Row-level DML (UPDATE / MERGE / DELETE) on a branch view lands on
    * the branch lineage, so the whole ETL — appends and DML alike —
    * stages invisibly.
    */
  override def loadTable(ident: Identifier): Table =
    spark.conf.getOption(AzofCatalog.WapBranchConf).filter(_.nonEmpty) match {
      case Some(b) if realTableExists(ident) =>
        val lake = tableDir(ident).getParent.toString
        val t = graft.format.AzofTable(spark, lake, ident.name)
        val head = t.branchHead(b).getOrElse(
          throw new IllegalArgumentException(
            s"${AzofCatalog.WapBranchConf}='$b' names no branch of " +
              s"${ident.name} — create it first (CALL " +
              "system.create_branch) or unset the conf; refusing to " +
              "route the write to main"))
        new AzofV2Table(lake, ident.name, AsOf.Current,
          Some(head.toString), branchLineage = Some(b))
      case _ =>
        metadataTable(ident, None)
          .orElse(branchTable(ident))
          .getOrElse(load(ident, AsOf.Current, None))
    }

  /** Spark's native `VERSION AS OF n` (or a named tag / branch). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (branchTable(ident).isDefined)
      throw new UnsupportedOperationException(
        s"branch view ${ident.name} is already a pinned lineage head — " +
          "pin versions on the table itself (VERSION AS OF resolves " +
          "branch names too)")
    metadataTable(ident, Some(version)).getOrElse(
      load(ident, AsOf.Current, Some(version)))
  }

  /** Spark's native `TIMESTAMP AS OF ts` — micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    // metadata views pin by snapshot VERSION; event-time travel does
    // not select a snapshot, so refuse with the remedy instead of the
    // generic missing-table error
    if (metadataTable(ident, None).isDefined)
      throw new UnsupportedOperationException(
        s"metadata view ${ident.name} pins by VERSION AS OF <n|'tag'>, " +
          "not TIMESTAMP AS OF (event time does not select a snapshot)")
    if (branchTable(ident).isDefined)
      throw new UnsupportedOperationException(
        s"branch view ${ident.name} reads its lineage head — event-time " +
          "travel runs on the table itself")
    load(ident, AsOf.EventTime(Instant.ofEpochSecond(
      Math.floorDiv(timestamp, 1000000L),
      Math.floorMod(timestamp, 1000000L) * 1000L)), None)
  }

  override def invalidateTable(ident: Identifier): Unit = ()

  /** `CREATE TABLE lake.t (key STRING, event_time TIMESTAMP, ...) USING
    * azof [TBLPROPERTIES ('start'='<instant>')]` — routed through the
    * SAME commit protocol as the library path
    * ([[AzofWriter.createTable]]): snapshot 1 with one open segment. The
    * declared schema must lead with the two system columns; value
    * columns must use the format's four types.
    */
  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      "azof tables have no partition transforms: files partition by " +
        "event-time segments/deltas (and carry key stats for skipping)")
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (ident.namespace() :+ ident.name()).toSeq)
    val start = Option(properties.get("start"))
      .map(AzofDataSource.parseInstant).getOrElse(Instant.EPOCH)
    AzofWriter.createTable(spark, tableDir(ident).getParent.toString,
      ident.name, AzofCatalog.toAzofSchema(schema), start)
    loadTable(ident)
  }

  /** ATOMIC `CREATE TABLE ... USING azof AS SELECT ...`: the table is
    * created under a dot-prefixed staging directory (invisible to
    * `listTables`/`tableExists`, so no reader observes a half-written
    * CTAS), the SELECT lands through the ordinary partitioned insert
    * path, and publish is ONE directory rename — snapshot documents
    * reference data files by name relative to the table directory, so
    * the rename moves the whole consistent table or nothing. A failed
    * query aborts by deleting the staging directory; the final name is
    * never created, instead of the non-atomic empty-table-then-
    * undroppable residue (azof's `dropTable` refuses by design).
    *
    * REPLACE TABLE (and CREATE OR REPLACE) stay refused: replace
    * semantically erases a table's version history, which an
    * append-only format must not do — the supported spellings are
    * rollback (append-only restore) or a new CTAS name.
    */
  override def stageCreate(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : StagedTable = {
    require(partitions.isEmpty,
      "azof tables have no partition transforms: files partition by " +
        "event-time segments/deltas (and carry key stats for skipping)")
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(
        (ident.namespace() :+ ident.name()).toSeq)
    val start = Option(properties.get("start"))
      .map(AzofDataSource.parseInstant).getOrElse(Instant.EPOCH)
    val stageName =
      s".stage-${java.util.UUID.randomUUID().toString.take(8)}-${ident.name}"
    val parent = tableDir(ident).getParent.toString
    AzofWriter.createTable(spark, parent, stageName,
      AzofCatalog.toAzofSchema(schema), start)
    new AzofStagedCreateTable(parent, stageName, ident)
  }

  override def stageReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : StagedTable =
    throw new UnsupportedOperationException(
      "azof tables are append-only with full version history: REPLACE " +
        "TABLE would erase it — roll back to a version, or CTAS a new name")

  override def stageCreateOrReplace(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String])
      : StagedTable =
    if (tableExists(ident))
      stageReplace(ident, schema, partitions, properties)
    else stageCreate(ident, schema, partitions, properties)

  /** `ALTER TABLE lake.t ADD COLUMN c <type>` / `DROP COLUMN c` —
    * schema evolution through the commit protocol
    * ([[AzofWriter.addColumn]]/[[AzofWriter.dropColumn]]): metadata-only
    * snapshots; added columns must be nullable (old files lack them and
    * scan as NULL); dropped names are retired and cannot be re-added
    * (resurrection guard — see [[graft.format.Snapshot]]).
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    // `ALTER TABLE cat.t.branch_<b> ADD COLUMN` stages the evolution on
    // the branch lineage (the WAP migration shape); drop/rename stay
    // main-only — a staged narrow would need publish-time column
    // un-retirement, a resurrection hazard by construction
    val (tgt, branch): (Identifier, Option[String]) =
      if (!realTableExists(ident) && ident.namespace.nonEmpty &&
        ident.name.startsWith("branch_") &&
        ident.name.stripPrefix("branch_").nonEmpty)
        (Identifier.of(ident.namespace.dropRight(1), ident.namespace.last),
          Some(ident.name.stripPrefix("branch_")))
      else (ident, None)
    changes.foreach {
      case add: TableChange.AddColumn =>
        require(add.fieldNames.length == 1,
          s"azof columns are flat: cannot add nested ${add.fieldNames.mkString(".")}")
        require(add.isNullable,
          s"added column '${add.fieldNames.head}' must be nullable: " +
            "existing data files do not contain it")
        AzofWriter.addColumn(spark, tableDir(tgt).getParent.toString,
          tgt.name,
          ColumnDef(add.fieldNames.head,
            AzofCatalog.toColumnType(add.fieldNames.head, add.dataType()),
            nullable = true),
          branch = branch)
      case drop: TableChange.DeleteColumn =>
        require(branch.isEmpty,
          "branch schema evolution is ADD-only: DROP COLUMN runs on main")
        require(drop.fieldNames.length == 1,
          s"azof columns are flat: cannot drop nested ${drop.fieldNames.mkString(".")}")
        AzofWriter.dropColumn(spark, tableDir(tgt).getParent.toString,
          tgt.name, drop.fieldNames.head)
      case ren: TableChange.RenameColumn =>
        require(branch.isEmpty,
          "branch schema evolution is ADD-only: RENAME COLUMN runs on main")
        require(ren.fieldNames.length == 1,
          s"azof columns are flat: cannot rename nested ${ren.fieldNames.mkString(".")}")
        AzofWriter.renameColumn(spark, tableDir(tgt).getParent.toString,
          tgt.name, ren.fieldNames.head, ren.newName)
      case other => throw new UnsupportedOperationException(
        "azof supports only ADD COLUMN, DROP COLUMN, and RENAME COLUMN; " +
          s"got ${other.getClass.getSimpleName}")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean =
    if (!realTableExists(ident) && branchTable(ident).isDefined)
      throw new UnsupportedOperationException(
        s"${ident.name} is a branch view — drop the branch via CALL " +
          "system.drop_branch (expired by the next vacuum)")
    else throw new UnsupportedOperationException(
      "azof tables are append-only with full version history: " +
        "expire data via AzofVacuum")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "azof tables are addressed by directory: rename is not supported")
}

object AzofCatalog {
  /** Session conf routing unpinned table loads through a branch (WAP). */
  val WapBranchConf = "spark.azof.wap.branch"

  private[sources] def toColumnType(
      name: String, dt: org.apache.spark.sql.types.DataType): ColumnType =
    ColumnType.all.find(_.sparkType == dt).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name': unsupported type ${dt.sql}; azof value columns " +
          "are STRING, BIGINT, BOOLEAN, or TIMESTAMP"))

  /** Declared SQL schema → azof table schema: `key STRING, event_time
    * TIMESTAMP` system columns first (declared nullability is ignored —
    * the format makes them non-null), then value columns in the format's
    * four types.
    */
  private[sources] def toAzofSchema(schema: StructType): TableSchema = {
    val fs = schema.fields
    require(fs.length >= 2 &&
      fs(0).name == TableSchema.KeyName && fs(0).dataType == StringType &&
      fs(1).name == TableSchema.EventTimeName && fs(1).dataType == TimestampType,
      "azof tables lead with system columns `key STRING, event_time " +
        s"TIMESTAMP`; got ${schema.simpleString}")
    TableSchema(fs.drop(2).toSeq.map(f =>
      ColumnDef(f.name, toColumnType(f.name, f.dataType), f.nullable)))
  }

  /** Append `data` as one partitioned delta commit — the `INSERT INTO`
    * path. One validation pass (row count + system-column null check),
    * then [[AzofWriter.commitPartitioned]]: rows land range-partitioned
    * across `spark.azof.insert.files` files (default min(32,
    * parallelism)) in one distributed write — by event_time, or by KEY
    * when `spark.azof.insert.byKey = true` (the point-lookup-friendly
    * layout) — and ONE snapshot commit with conflict retry registers
    * them, so SQL inserts inherit the library path's first-writer-wins
    * semantics.
    */
  private[sources] def append(
      lakehousePath: String, tableName: String, data: DataFrame,
      branch: Option[String] = None): Unit = {
    val spark = data.sparkSession
    val rows = data.persist()
    try {
      val c = rows.agg(count(lit(1)), count(col(TableSchema.KeyName)),
        count(col(TableSchema.EventTimeName))).collect()(0)
      val n = c.getLong(0)
      if (n == 0) return // empty INSERT is a legal no-op, not a failed commit
      require(c.getLong(1) == n && c.getLong(2) == n,
        "azof system columns key/event_time must be non-null")
      val numFiles = spark.conf.getOption("spark.azof.insert.files")
        .map(s => scala.util.Try(s.trim.toInt).toOption
          .filter(_ >= 1)
          .getOrElse(throw new IllegalArgumentException(
            s"spark.azof.insert.files must be a positive integer, got '$s'")))
        .getOrElse(math.min(32, math.max(1,
          spark.sparkContext.defaultParallelism)))
      AzofWriter.commitPartitioned(spark, lakehousePath, tableName, rows,
        numFiles,
        byKey = spark.conf.getOption("spark.azof.insert.byKey")
          .exists(_.toBoolean),
        branch = branch)
    } finally { rows.unpersist(); () }
  }
}

/** One (table, asOf, version) view as a DSv2 Table; reads bridge to the
  * V1 [[AzofRelation]] so the merge-dedup plan exists exactly once, and
  * writes (`INSERT INTO` / `df.writeTo(...).append()`) bridge through
  * `V1Write` into the partitioned commit protocol.
  */
class AzofV2Table(
    lakehousePath: String, tableName: String,
    asOf: AsOf, version: Option[String],
    branchLineage: Option[String] = None)
  extends Table with SupportsRead with SupportsWrite
  with org.apache.spark.sql.connector.catalog.SupportsDelete
  with org.apache.spark.sql.connector.catalog.SupportsRowLevelOperations {

  // lazy val: a loaded Table represents ONE resolved version — planning
  // may ask for the schema repeatedly and must not re-read (or observe a
  // concurrently bumped) snapshot mid-query
  private lazy val relation: AzofRelation =
    new AzofRelation(SparkSession.active.sqlContext, lakehousePath,
      tableName, asOf, version)

  override def name(): String = tableName
  override def schema(): StructType = relation.schema

  /** See [[AzofRelation.mvMatchKey]] — Current main-lineage view only. */
  private[graft] def mvMatchKey: Option[(String, String)] =
    if (asOf == AsOf.Current && version.isEmpty && branchLineage.isEmpty)
      Some((lakehousePath, tableName))
    else None

  /** See [[AzofRelation.mvMatchKeyPinned]] — a `VERSION AS OF` pin on
    * the main lineage (tags resolve; branch heads never rewrite).
    */
  private[graft] def mvMatchKeyPinned: Option[(String, String, Long)] =
    if (asOf == AsOf.Current && version.nonEmpty && branchLineage.isEmpty)
      scala.util.Try(graft.format.AzofTable(SparkSession.active,
        lakehousePath, tableName).resolveVersion(version.get).toLong)
        .toOption
        .map(v => (lakehousePath, tableName, v))
    else None

  /** See [[AzofRelation.mvMatchKeyAsOf]] — an event-time as-of view on
    * the main lineage (WAP/branch routing never rewrites).
    */
  private[graft] def mvMatchKeyAsOf
      : Option[(String, String, java.time.Instant)] =
    asOf match {
      case graft.format.AsOf.EventTime(t)
        if version.isEmpty && branchLineage.isEmpty =>
        Some((lakehousePath, tableName, t))
      case _ => None
    }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.STREAMING_WRITE)

  /** `DESCRIBE TABLE EXTENDED` observability: the loaded view's pinned
    * version, its op, registered-file count, and tag count — all from
    * the snapshot the relation already holds (no extra I/O beyond one
    * version read on the Current path).
    */
  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    try {
      val t = graft.format.AzofTable(
        SparkSession.active, lakehousePath, tableName)
      val v = version.map(t.resolveVersion).getOrElse(t.currentVersion)
      val snap = t.snapshot(v)
      m.put("format", "azof")
      m.put("version", v)
      snap.op.foreach(m.put("op", _))
      m.put("data_files", snap.allFiles.size.toString)
      m.put("tags", snap.refs.size.toString)
      branchLineage.foreach(m.put("branch", _))
      asOf match {
        case AsOf.EventTime(ts) => m.put("as_of", ts.toString); ()
        case _ => ()
      }
    } catch { case scala.util.control.NonFatal(_) => () } // best-effort
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AzofScanBuilder(relation)

  /** `DELETE FROM cat.t WHERE <predicate>` — SQL face of the tombstone
    * delete ([[AzofWriter.commitDelete]]). Two shapes:
    *
    *   - '''key-set predicates''' (`key = 'k'`, `key IN (...)`, OR/AND
    *     combinations thereof) resolve to an explicit key set with NO
    *     table scan — metadata-only cost, the fast path.
    *   - '''value predicates''' (`event_type = 'spam'`, ranges, string
    *     matches, conjunctions with key predicates — the takedown shape
    *     a training-data lake actually runs) resolve keys through the
    *     Current merge-dedup scan: a key is deleted iff its CURRENT
    *     winner row matches the predicate. One scan + one distinct on
    *     `key`, then the same [[AzofWriter.commitDelete]] DataFrame
    *     path — never a rewrite.
    *
    * Either way the delete is a new EVENT at `now`: history before it
    * still time-travels (append-only contract). `DELETE` without a
    * WHERE (truncate) and predicates outside the translatable filter
    * algebra report non-deletable and Spark raises its standard
    * cannot-delete error.
    *
    * Deliberate asymmetry on 0-row deletes: a key-set delete is
    * metadata-only — it does NOT scan to verify existence, so deleting
    * an absent key still commits its (harmless) tombstone, exactly the
    * Kafka-tombstone publish semantics; the shapes the engine can
    * prove empty without any work (a contradictory key conjunction, a
    * value predicate matching no current winner) commit NO version.
    * Verifying key existence cheaply would need the scan the fast path
    * exists to avoid.
    */
  override def canDeleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Boolean =
    asOf == AsOf.Current && version.isEmpty && branchLineage.isEmpty &&
      filters.nonEmpty &&
      (AzofV2Table.deletableKeys(filters).isDefined ||
        filters.forall(f => AzofV2Table.filterToColumn(f).isDefined))

  override def deleteWhere(
      filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    if (branchLineage.nonEmpty)
      throw new UnsupportedOperationException(
        s"DELETE on branch view $tableName.branch_${branchLineage.get} " +
          "is not supported — branch writes are appends; publish via " +
          "CALL system.fast_forward, then delete on the table")
    if (asOf != AsOf.Current || version.nonEmpty)
      throw new UnsupportedOperationException(
        s"cannot DELETE from a time-travel view of azof table $tableName")
    if (filters.isEmpty)
      throw new UnsupportedOperationException(
        s"azof DELETE without WHERE (truncate) is not supported on " +
          s"$tableName: the engine is append-only")
    val spark = SparkSession.active
    AzofV2Table.deletableKeys(filters) match {
      // empty resolved set (contradictory conjunction): a 0-row no-op
      // delete per SQL semantics — no tombstone commit, no new version
      case Some(keys) =>
        if (keys.nonEmpty)
          AzofWriter.commitDelete(spark, lakehousePath, tableName,
            keys.toSeq, java.time.Instant.now())
      case None =>
        val pred = filters.map(f => AzofV2Table.filterToColumn(f).getOrElse(
            throw new UnsupportedOperationException(
              s"azof DELETE cannot translate predicate $f on $tableName")))
          .reduce(_ && _)
        val keysDf = graft.operators.AzofScan
          .scan(spark, lakehousePath, tableName, AsOf.Current)
          .where(pred)
          .select(org.apache.spark.sql.functions
            .col(TableSchema.KeyName))
          .distinct()
          .persist()
        try {
          // commitDelete refuses an empty key set; a predicate matching
          // no current winner is a legal 0-row no-op
          if (keysDf.take(1).nonEmpty)
            AzofWriter.commitDelete(spark, lakehousePath, tableName,
              keysDf, java.time.Instant.now(), branch = None)
        } finally { keysDf.unpersist(); () }
    }
  }

  /** `UPDATE` / `MERGE INTO` / non-translatable `DELETE` — Spark's
    * row-level rewrite rules fire on this and plan a delta-based
    * (merge-on-read) write: see [[AzofRowLevelOperation]]. Key-set and
    * translatable-predicate DELETEs still take the metadata-only
    * [[deleteWhere]] fast path (Spark's optimizer converts the
    * row-level plan back when [[canDeleteWhere]] accepts).
    *
    * A BRANCH view is a writable lineage, so row-level DML works on it
    * too: the statement reads the branch head, its delta files (updates
    * as new key rows, MERGE deletes as tombstones) commit onto the
    * branch, and main is untouched until publish — which makes a full
    * audit ETL with UPDATE/MERGE statements runnable under WAP routing
    * (`spark.azof.wap.branch`) with its SQL unchanged. Conflict
    * validation is scoped to the branch's own lineage.
    */
  override def newRowLevelOperationBuilder(
      info: org.apache.spark.sql.connector.write.RowLevelOperationInfo)
      : org.apache.spark.sql.connector.write.RowLevelOperationBuilder = {
    if (asOf != AsOf.Current || (version.nonEmpty && branchLineage.isEmpty))
      throw new UnsupportedOperationException(
        s"cannot run row-level DML on a time-travel view of azof table " +
          tableName)
    () => new AzofRowLevelOperation(lakehousePath, tableName, info.command,
      branchLineage)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // a loaded time-travel view is a historical read surface, never a
    // write target — appends go to the table's current head. A BRANCH
    // view carries a version pin for its reads but IS writable: appends
    // land on the branch lineage.
    if (asOf != AsOf.Current || (version.nonEmpty && branchLineage.isEmpty))
      throw new UnsupportedOperationException(
        s"cannot write to a time-travel view of azof table $tableName")
    // a `_azof_deleted`-carrying STREAM works on any lineage (the CDC
    // replication shape — deltas flag per-row tombstones, branch or
    // main); a marker-carrying BATCH insert is refused downstream by
    // commitPartitioned with the commitDelta/commitDelete remedy
    // SupportsStreamingUpdateAsAppend: exact for a merge-on-read format
    // (an updated row is the key's new version, the per-key merge serves
    // it) — streaming aggregations sink in outputMode("update"); see
    // [[AzofStreamingWrite]]
    new WriteBuilder
      with org.apache.spark.sql.internal.connector
        .SupportsStreamingUpdateAsAppend {
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit = {
              if (overwrite) throw new UnsupportedOperationException(
                "azof is append-only: INSERT OVERWRITE is not supported " +
                  "(rewrite via compaction, expire via vacuum)")
              AzofCatalog.append(lakehousePath, tableName, data, branchLineage)
            }
          }
        override def toStreaming
            : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
          // a branch lineage is a first-class streaming target: the
          // stream's delta commits stage on the branch (replay guard
          // per-lineage), invisible to main until publish — streaming
          // write-audit-publish, incl. under WAP session routing
          new AzofStreamingWrite(
            lakehousePath, tableName, info.queryId(), info.schema(),
            branchLineage)
      }
    }
  }
}

/** The in-flight table of an atomic CTAS ([[AzofCatalog.stageCreate]]):
  * a full azof table under the dot-prefixed staging directory — the
  * SELECT's rows land through the ordinary partitioned insert path —
  * published by ONE directory rename (data files are snapshot-relative,
  * so the table moves consistent-or-not-at-all) and aborted by deleting
  * the staging directory. A concurrent CREATE that wins the name makes
  * publish clean up and fail with the standard already-exists error.
  */
private final class AzofStagedCreateTable(
    parentLake: String, stageName: String, finalIdent: Identifier)
  extends AzofV2Table(parentLake, stageName, AsOf.Current, None)
  with StagedTable {

  override def name(): String = finalIdent.name

  // CREATE OR REPLACE on a missing name plans as truncate-then-append on
  // the staged table; truncating a brand-new EMPTY staging table is the
  // identity, so the staged view (and only it) accepts truncate
  override def capabilities(): util.Set[TableCapability] = {
    val caps = util.EnumSet.copyOf(super.capabilities())
    caps.add(TableCapability.TRUNCATE)
    caps
  }

  override def newWriteBuilder(
      info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder
      with org.apache.spark.sql.connector.write.SupportsTruncate {
      override def truncate(): WriteBuilder = this // staging dir is empty
      override def build(): V1Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              AzofCatalog.append(parentLake, stageName, data)
          }
      }
    }

  private def fsAndPaths = {
    val stage = new Path(parentLake, stageName)
    val dest = new Path(parentLake, finalIdent.name)
    (stage.getFileSystem(
      SparkSession.active.sessionState.newHadoopConf()), stage, dest)
  }

  override def commitStagedChanges(): Unit = {
    val (fs, stage, dest) = fsAndPaths
    // exists-check first: Hadoop rename onto an existing directory is
    // move-INTO on some filesystems — never silently nest the table
    if (fs.exists(dest) || !fs.rename(stage, dest)) {
      fs.delete(stage, true)
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(
          (finalIdent.namespace() :+ finalIdent.name()).toSeq)
    }
  }

  override def abortStagedChanges(): Unit = {
    val (fs, stage, _) = fsAndPaths
    fs.delete(stage, true)
    ()
  }
}

private final class AzofScanBuilder(relation: AzofRelation)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns with SupportsPushDownFilters {

  private var required: StructType = relation.schema
  private var filters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  // every filter is pushed INTO the inner plan best-effort and ALSO kept
  // by Spark (returned as residual), so correctness never depends on the
  // translation
  override def pushFilters(fs: Array[Filter]): Array[Filter] = {
    filters = fs; fs
  }
  override def pushedFilters(): Array[Filter] = filters

  override def build(): Scan = new AzofV1ScanBridge(relation, required, filters)
}

private final class AzofV1ScanBridge(
    relation: AzofRelation, required: StructType, filters: Array[Filter])
  extends V1Scan
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {

  override def readSchema(): StructType = required

  /** Snapshot-derived size estimate (see
    * [[AzofRelation.estimatedSizeBytes]]), scaled by the pruned-column
    * fraction — feeds Spark's auto-broadcast decision for catalog-SQL
    * joins over azof tables.
    */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = {
        val total = relation.estimatedSizeBytes
        val all = relation.schema.length.max(1)
        val frac = required.length.min(all).max(1).toDouble / all
        java.util.OptionalLong.of(math.max((total * frac).toLong, 1L))
      }
      override def numRows(): java.util.OptionalLong =
        // per-file `rows` stats summed over the view's pruned files —
        // an upper bound of the deduped output (see
        // AzofRelation.estimatedRows); absent on pre-stats tables
        relation.estimatedRows
          .map(java.util.OptionalLong.of)
          .getOrElse(java.util.OptionalLong.empty())
    }

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      // the delegate hands rows over in whatever format ITS
      // needConversion declares (internal UnsafeRows by default) — the
      // bridge must forward that declaration or Spark wraps the scan in
      // a Row→InternalRow encoder that ClassCastExceptions on UnsafeRow
      override def needConversion: Boolean = relation.needConversion
      override def buildScan(): RDD[Row] =
        relation.buildScan(required.fieldNames, filters)
    }.asInstanceOf[T]
}

object AzofV2Table {

  /** The exact key set a conjunction of pushed DELETE filters denotes:
    * each conjunct must be `key = v` / `key <=> v` / `key IN (...)` or
    * an OR of those; conjuncts intersect. None when any conjunct is
    * not a pure key-set predicate (value predicates, ranges, NOT, a
    * bare DELETE-without-WHERE truncate) — the caller then refuses.
    */
  private[sources] def deletableKeys(
      filters: Array[Filter]): Option[Set[String]] = {
    def keysOf(f: Filter): Option[Set[String]] = f match {
      case EqualTo(TableSchema.KeyName, v: String)       => Some(Set(v))
      case EqualNullSafe(TableSchema.KeyName, v: String) => Some(Set(v))
      case In(TableSchema.KeyName, vs)
          if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
        Some(vs.map(_.asInstanceOf[String]).toSet)
      case Or(l, r) => for { a <- keysOf(l); b <- keysOf(r) } yield a ++ b
      case _ => None
    }
    if (filters.isEmpty) None
    else {
      val sets = filters.toSeq.map(keysOf)
      if (sets.exists(_.isEmpty)) None
      // a contradictory-but-valid conjunction (key='a' AND key='b')
      // intersects to the EMPTY set — that is a legal 0-row delete
      // (SQL no-op), not a non-deletable predicate, so keep Some(∅)
      // and let deleteWhere skip the commit
      else Some(sets.flatten.reduce(_ intersect _))
    }
  }

  /** Translate one pushed DELETE filter to a Column over the Current
    * scan — the value-predicate delete path. None for filters outside
    * the algebra (the caller then refuses). `AlwaysTrue` is
    * deliberately untranslatable: it is Spark's truncate shape, and a
    * predicate delete must never silently become a full-table delete.
    */
  private[sources] def filterToColumn(
      f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v)            => Some(col(a) === lit(v))
    case EqualNullSafe(a, v)      => Some(col(a) <=> lit(v))
    case GreaterThan(a, v)        => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v)           => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v)    => Some(col(a) <= lit(v))
    case In(a, vs)                => Some(col(a).isin(vs.toIndexedSeq: _*))
    case IsNull(a)                => Some(col(a).isNull)
    case IsNotNull(a)             => Some(col(a).isNotNull)
    case StringStartsWith(a, v)   => Some(col(a).startsWith(v))
    case StringEndsWith(a, v)     => Some(col(a).endsWith(v))
    case StringContains(a, v)     => Some(col(a).contains(v))
    case AlwaysFalse()            => Some(lit(false))
    case And(l, r) =>
      for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a && b
    case Or(l, r) =>
      for { a <- filterToColumn(l); b <- filterToColumn(r) } yield a || b
    case Not(c) => filterToColumn(c).map(!_)
    case _      => None
  }
}
