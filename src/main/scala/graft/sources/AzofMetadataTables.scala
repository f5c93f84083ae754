package graft.sources

import graft.format.{AzofTable, SnapshotCodec}
import java.util
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL-queryable table introspection — the Iceberg metadata-table
  * convention, served through the same catalog that serves the data,
  * and through the DataFrameReader for non-catalog users:
  *
  * {{{
  * SELECT * FROM cat.t.history   -- one row per snapshot on disk
  * SELECT * FROM cat.t.files     -- a snapshot's registered files
  * SELECT * FROM cat.t.refs      -- named refs: tags + branch heads
  * SELECT * FROM cat.t.files VERSION AS OF 'release-1'
  * spark.read.format("azof").option("table", "t")
  *   .option("meta", "files").load(lake)
  * }}}
  *
  * A REAL table always wins the name on the catalog path: the fallback
  * fires only when `cat.<ns...>.<name>` resolves to no table and
  * `<ns...>` does. `files`/`refs` accept a version pin (`VERSION AS
  * OF`, or the reader's `versionAsOf` option) to inspect an old
  * version's file set or tag map; `history` refuses the pin — it
  * already IS the cross-version view. All three are driver-sized BY
  * CONSTRUCTION — history is one row per snapshot document (bounded by
  * commit count, which vacuum bounds), `files` walks ONE snapshot's
  * driver-held segment tree plus one directory listing for byte sizes,
  * `refs` is a snapshot's ref map plus one head lookup per live branch
  * pointer — so a driver-local batch
  * (`LocalScan` / local DataFrame) is the honest physical shape, not a
  * compromise: there is nothing to distribute.
  */
object AzofMetadataTables {

  val Names: Set[String] = Set("history", "files", "refs")

  /** `version` pins `files`/`refs` to that snapshot; `history` refuses
    * a version pin, because it already IS the cross-version view.
    */
  def table(spark: SparkSession, lakehousePath: String,
      tableName: String, kind: String,
      version: Option[String] = None): Table = {
    validate(tableName, kind, version)
    new MetaTable(spark, lakehousePath, tableName, kind, version)
  }

  private def validate(
      tableName: String, kind: String, version: Option[String]): Unit = {
    require(Names.contains(kind),
      s"unknown metadata view '$kind' (expected ${Names.toSeq.sorted.mkString(", ")})")
    if (version.nonEmpty && kind == "history")
      throw new UnsupportedOperationException(
        s"$tableName.history already spans all versions; query it " +
          "unpinned (VERSION AS OF applies to .files and .refs)")
  }

  def schemaFor(kind: String): StructType = kind match {
    case "history" => StructType(Seq(
      StructField("version", LongType, nullable = false),
      StructField("committed_at", TimestampType, nullable = true),
      StructField("op", StringType, nullable = true),
      StructField("data_files", LongType, nullable = false),
      StructField("tagged_as", StringType, nullable = true),
      StructField("is_current", BooleanType, nullable = false),
      StructField("branch", StringType, nullable = true),
      StructField("parent", LongType, nullable = true)))
    case "files" => StructType(Seq(
      StructField("file", StringType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("start", TimestampType, nullable = false),
      StructField("end", TimestampType, nullable = true),
      StructField("tombstone", BooleanType, nullable = false),
      StructField("seq", LongType, nullable = true),
      StructField("key_min", StringType, nullable = true),
      StructField("key_max", StringType, nullable = true),
      StructField("rows", LongType, nullable = true),
      StructField("size_bytes", LongType, nullable = true)))
    case "refs" => StructType(Seq(
      StructField("name", StringType, nullable = false),
      StructField("type", StringType, nullable = false),
      StructField("version", LongType, nullable = false)))
  }

  private def tsOf(i: java.time.Instant): java.sql.Timestamp =
    java.sql.Timestamp.from(i)

  /** The view's rows, as external-typed [[Row]]s — shared by the DSv2
    * `LocalScan` (converted to InternalRow) and the V1 reader relation.
    */
  def rowsFor(spark: SparkSession, lakehousePath: String,
      tableName: String, kind: String,
      version: Option[String]): Seq[Row] = {
    validate(tableName, kind, version)
    val t = AzofTable(spark, lakehousePath, tableName)
    val conf = spark.sessionState.newHadoopConf()
    val fs = t.tableDir.getFileSystem(conf)
    // the pinned snapshot for files/refs (tags resolve through the
    // CURRENT ref index, like every other versionAsOf surface)
    def pinned = version match {
      case Some(v) => t.snapshot(t.resolveVersion(v))
      case None => t.currentSnapshot
    }
    kind match {
      case "history" =>
        val current = t.currentVersion.toLong
        val refs = t.currentSnapshot.refs
        val statuses = fs.listStatus(t.tableDir)
          .map(st => st.getPath.getName -> st.getModificationTime).toMap
        AzofTable.snapshotIdsOnDisk(fs, t.tableDir).flatMap { id =>
          t.classifySnapshot(id.toString) match {
            case SnapshotCodec.DocClass.Valid(snap) =>
              val tags = refs.collect {
                case (n, v) if v == id => n
              }.toSeq.sorted
              Some(Row(
                id,
                statuses.get(s"s$id.json")
                  .map(m => tsOf(java.time.Instant.ofEpochMilli(m)))
                  .orNull,
                snap.op.orNull,
                snap.allFiles.size.toLong,
                if (tags.isEmpty) null else tags.mkString(","),
                id == current,
                snap.branch.orNull,
                snap.parent.map(java.lang.Long.valueOf).orNull))
            case _ => None // crash debris / foreign docs: not history
          }
        }
      case "files" =>
        val snap = pinned
        val sizes = fs.listStatus(t.tableDir)
          .map(st => st.getPath.getName -> st.getLen).toMap
        def walk(seg: graft.format.Segment): Seq[Row] = {
          val base = seg.file.map { f =>
            Row(f, "base", tsOf(seg.start),
              seg.end.map(tsOf).orNull,
              false, null,
              seg.fileStats.map(_.keyMin).orNull,
              seg.fileStats.map(_.keyMax).orNull,
              seg.fileStats.flatMap(_.rows)
                .map(java.lang.Long.valueOf).orNull,
              sizes.get(f).map(java.lang.Long.valueOf).orNull)
          }.toSeq
          val deltas = seg.delta.map { d =>
            Row(d.file, "delta", tsOf(d.start), tsOf(d.end),
              d.tombstone,
              d.seq.map(java.lang.Long.valueOf).orNull,
              d.stats.map(_.keyMin).orNull,
              d.stats.map(_.keyMax).orNull,
              d.stats.flatMap(_.rows).map(java.lang.Long.valueOf).orNull,
              sizes.get(d.file).map(java.lang.Long.valueOf).orNull)
          }
          base ++ deltas ++ seg.segments.flatMap(walk)
        }
        snap.segments.flatMap(walk)
      case "refs" =>
        // tags are snapshot state (the pinned snapshot's ref map);
        // branch pointers are table-level files OUTSIDE any snapshot, so
        // they appear only on the UNPINNED view — a pinned refs view is
        // a historical inspection, and branches have no history to pin
        val tags = pinned.refs.toSeq.map { case (n, v) => Row(n, "tag", v) }
        val branches =
          if (version.nonEmpty) Seq.empty
          else t.listBranches.flatMap(b =>
            t.branchHead(b).map(h => Row(b, "branch", h)))
        (tags ++ branches).sortBy(_.getString(0))
    }
  }

  private final class MetaTable(spark: SparkSession,
      lakehousePath: String, tableName: String, kind: String,
      version: Option[String])
    extends Table with SupportsRead {

    override def name(): String = s"$tableName.$kind"
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)
    override def schema(): StructType = schemaFor(kind)

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new LocalScan {
        override def readSchema(): StructType = schema()
        override def rows(): Array[InternalRow] = {
          val conv = CatalystTypeConverters.createToCatalystConverter(schema())
          rowsFor(spark, lakehousePath, tableName, kind, version)
            .map(r => conv(r).asInstanceOf[InternalRow]).toArray
        }
      }
  }
}
