package graft.sources

import graft.format.AsOf
import java.time.Instant
import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.sources.{BaseRelation, Filter, TableScan}
import org.apache.spark.sql.types.StructType
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
class AzofCatalog extends TableCatalog {
  private var catalogName: String = _
  private var lakehousePath: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    lakehousePath = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.path must point at the lakehouse root"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def subPath(namespace: Array[String]): Path =
    namespace.foldLeft(new Path(lakehousePath))((p, n) => new Path(p, n))

  private def tableDir(ident: Identifier) =
    new Path(subPath(ident.namespace), ident.name)

  override def tableExists(ident: Identifier): Boolean = {
    val marker = new Path(tableDir(ident), "version.txt")
    marker.getFileSystem(spark.sessionState.newHadoopConf()).exists(marker)
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val root = subPath(namespace)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Array.empty
    else fs.listStatus(root)
      .filter(s => s.isDirectory &&
        fs.exists(new Path(s.getPath, "version.txt")))
      .map(s => Identifier.of(namespace, s.getPath.getName))
  }

  private def load(ident: Identifier, asOf: AsOf, version: Option[String]): Table = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new AzofV2Table(tableDir(ident).getParent.toString, ident.name, asOf, version)
  }

  override def loadTable(ident: Identifier): Table =
    load(ident, AsOf.Current, None)

  /** Spark's native `VERSION AS OF n`. */
  override def loadTable(ident: Identifier, version: String): Table =
    load(ident, AsOf.Current, Some(version))

  /** Spark's native `TIMESTAMP AS OF ts` — micros since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    load(ident, AsOf.EventTime(Instant.ofEpochSecond(
      Math.floorDiv(timestamp, 1000000L),
      Math.floorMod(timestamp, 1000000L) * 1000L)), None)

  override def invalidateTable(ident: Identifier): Unit = ()

  override def createTable(
      ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "azof catalog is read-only: create tables via AzofWriter.createTable")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "azof catalog is read-only: evolve schemas via AzofWriter.addColumn")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      "azof catalog is read-only: expire data via AzofVacuum")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("azof catalog is read-only")
}

/** One (table, asOf, version) view as a DSv2 Table; reads bridge to the
  * V1 [[AzofRelation]] so the merge-dedup plan exists exactly once.
  */
final class AzofV2Table(
    lakehousePath: String, tableName: String,
    asOf: AsOf, version: Option[String]) extends Table with SupportsRead {

  // lazy val: a loaded Table represents ONE resolved version — planning
  // may ask for the schema repeatedly and must not re-read (or observe a
  // concurrently bumped) snapshot mid-query
  private lazy val relation: AzofRelation =
    new AzofRelation(SparkSession.active.sqlContext, lakehousePath,
      tableName, asOf, version)

  override def name(): String = tableName
  override def schema(): StructType = relation.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AzofScanBuilder(relation)
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
  extends V1Scan {

  override def readSchema(): StructType = required

  override def toV1TableScan[T <: BaseRelation with TableScan](
      context: SQLContext): T =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = context
      override def schema: StructType = required
      override def buildScan(): RDD[Row] =
        relation.buildScan(required.fieldNames, filters)
    }.asInstanceOf[T]
}
