package graft.format

import org.apache.spark.sql.types._

/** azof value-column type system — exactly four types (reference:
  * crates/azof/src/schema.rs:15-21), mapped to Spark SQL types the way the
  * reference maps them to Arrow (crates/azof/src/schema.rs:190-197):
  * String→Utf8→StringType, Int→Int64→LongType, Boolean→BooleanType,
  * DateTime→Timestamp(ms, UTC)→TimestampType (session TZ pinned UTC;
  * millisecond values fit Spark's microsecond timestamps losslessly).
  */
sealed abstract class ColumnType(val jsonName: String, val sparkType: DataType)
object ColumnType {
  case object AzString extends ColumnType("String", StringType)
  case object AzInt extends ColumnType("Int", LongType)
  case object AzBoolean extends ColumnType("Boolean", BooleanType)
  case object AzDateTime extends ColumnType("DateTime", TimestampType)

  val all: Seq[ColumnType] = Seq(AzString, AzInt, AzBoolean, AzDateTime)

  def fromJsonName(s: String): ColumnType =
    all.find(_.jsonName == s).getOrElse(
      throw new IllegalArgumentException(s"unknown azof column type: $s"))
}

/** One declared value column (reference: crates/azof/src/schema.rs:24-28).
  *
  * `physical` is the RENAME extension: the immutable name the column's
  * bytes live under in every data file, fixed at creation and unchanged
  * by renames — `name` is the logical name queries see. None = never
  * renamed (physical == name). Writers always write the physical name
  * and scans read physical then project to logical, so files from
  * before and after a rename stay byte-compatible and per-file value
  * stats (keyed by physical name) survive renames. Serialized as an
  * extra `physical_name` JSON field the reference's serde parser
  * ignores — but note a reference reader of a RENAMED table would look
  * for the logical name in files and surface NULLs; renames are for
  * tables owned by this engine (same caveat class as tombstones).
  */
final case class ColumnDef(
    name: String, dataType: ColumnType, nullable: Boolean,
    physical: Option[String] = None) {
  /** The name in data files: the original creation name, forever. */
  def physicalName: String = physical.getOrElse(name)
}

/** Declared schema of the value columns of a table. Two system columns —
  * `key: String` (record identity / dedup key) and `event_time:
  * Timestamp` (version timestamp) — are always present, always first, and
  * non-nullable (reference: crates/azof/src/schema.rs:12-13,173-203).
  */
final case class TableSchema(columns: Seq[ColumnDef]) {

  /** Full physical Spark schema: `key, event_time, values...` in declared
    * order — the column order of every azof parquet file.
    */
  def toStruct: StructType = StructType(
    TableSchema.systemFields ++ columns.map(c =>
      StructField(c.name, c.dataType.sparkType, c.nullable)))

  /** Names in physical order, system columns first. */
  def allColumnNames: Seq[String] =
    Seq(TableSchema.KeyName, TableSchema.EventTimeName) ++ columns.map(_.name)

  /** [[toStruct]] with each value column under its PHYSICAL name — the
    * schema of the bytes in data files ([[ColumnDef.physical]]). Equal
    * to [[toStruct]] unless a column was renamed. System columns never
    * rename.
    */
  def physicalStruct: StructType = StructType(
    TableSchema.systemFields ++ columns.map(c =>
      StructField(c.physicalName, c.dataType.sparkType, c.nullable)))

  /** True iff any column's logical name differs from its physical. */
  def hasRenames: Boolean = columns.exists(c => c.physicalName != c.name)

  /** The physical (file) name for a logical column name; identity for
    * unknown/system names.
    */
  def physicalOf(logical: String): String =
    columns.find(_.name == logical).map(_.physicalName).getOrElse(logical)

  /** Rename a file-schema frame's physical column names to their
    * logical ones — the ONE place the physical→logical projection
    * lives (scan, change feed, and streaming source all read raw
    * bytes under physical names). Sequential renames are
    * collision-free because a retired logical name can never return
    * as another column's current name.
    */
  def toLogicalNames(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    if (!hasRenames) df
    else columns.filter(c => c.physicalName != c.name)
      .foldLeft(df)((d, c) => d.withColumnRenamed(c.physicalName, c.name))

  /** Output schema under a projection: only the requested columns survive,
    * in physical order — system columns included only when requested
    * (reference: crates/azof/src/schema.rs:148-203).
    */
  def projectedStruct(projection: Option[Set[String]]): StructType =
    projection match {
      case None => toStruct
      case Some(cols) =>
        StructType(toStruct.fields.filter(f => cols.contains(f.name)))
    }
}

object TableSchema {
  val KeyName = "key"
  val EventTimeName = "event_time"

  /** Row-level tombstone marker column (this engine's delete extension):
    * present only in files whose snapshot delta entry carries
    * `tombstone: true`; absent reads as null → not deleted.
    */
  val DeletedName = "_azof_deleted"

  /** Reserved [[FileStats]] `cols` key holding a file's EVENT-TIME
    * range (epoch-millis decimals, [[ValueStats.encode]]'s timestamp
    * scheme). Deltas already carry a window; BASE files don't, and the
    * event-time `AS OF` rewrite gate needs a provable upper bound on a
    * base file's rows ([[graft.sources.MatView.unchangedSinceAsOf]]).
    * The `_azof` prefix keeps it out of every value-column lookup (no
    * user column can be named this).
    */
  val EventTimeStatName = "_azof_et"

  val systemFields: Seq[StructField] = Seq(
    StructField(KeyName, StringType, nullable = false),
    StructField(EventTimeName, TimestampType, nullable = false))
}
