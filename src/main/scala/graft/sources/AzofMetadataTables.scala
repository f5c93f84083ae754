package graft.sources

import graft.format.{AzofTable, SnapshotCodec}
import java.util
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** SQL-queryable table introspection — the Iceberg metadata-table
  * convention, served through the same catalog that serves the data:
  *
  * {{{
  * SELECT * FROM cat.t.history   -- one row per snapshot on disk
  * SELECT * FROM cat.t.files     -- current snapshot's registered files
  * SELECT * FROM cat.t.refs      -- named version tags
  * }}}
  *
  * A REAL table always wins the name: the catalog only falls back to a
  * metadata view when `cat.<ns...>.<name>` resolves to no table and
  * `<ns...>` does. All three are driver-sized BY CONSTRUCTION — history
  * is one row per snapshot document (bounded by commit count, which
  * vacuum bounds), `files` walks ONE snapshot's driver-held segment
  * tree plus one directory listing for byte sizes, `refs` is the
  * current snapshot's ref map — so `LocalScan` (a driver-local batch)
  * is the honest physical shape, not a compromise: there is nothing to
  * distribute. Metadata views read the CURRENT state only; history IS
  * the time-travel surface here.
  */
object AzofMetadataTables {

  val Names: Set[String] = Set("history", "files", "refs")

  /** `version` pins `files`/`refs` to that snapshot (`VERSION AS OF`
    * on a metadata table — inspect an old version's file set or tag
    * map); `history` refuses a version pin, because it already IS the
    * cross-version view.
    */
  def table(spark: SparkSession, lakehousePath: String,
      tableName: String, kind: String,
      version: Option[String] = None): Table = {
    if (version.nonEmpty && kind == "history")
      throw new UnsupportedOperationException(
        s"$tableName.history already spans all versions; query it " +
          "unpinned (VERSION AS OF applies to .files and .refs)")
    new MetaTable(spark, lakehousePath, tableName, kind, version)
  }

  private def s(v: String): AnyRef = UTF8String.fromString(v)
  private def tsMicros(i: java.time.Instant): AnyRef =
    java.lang.Long.valueOf(Math.addExact(
      Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L))

  private final class MetaTable(spark: SparkSession,
      lakehousePath: String, tableName: String, kind: String,
      version: Option[String] = None)
    extends Table with SupportsRead {

    override def name(): String = s"$tableName.$kind"
    override def capabilities(): util.Set[TableCapability] =
      util.EnumSet.of(TableCapability.BATCH_READ)

    override def schema(): StructType = kind match {
      case "history" => StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("committed_at", TimestampType, nullable = true),
        StructField("op", StringType, nullable = true),
        StructField("data_files", LongType, nullable = false),
        StructField("tagged_as", StringType, nullable = true),
        StructField("is_current", BooleanType, nullable = false)))
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
        StructField("tag", StringType, nullable = false),
        StructField("version", LongType, nullable = false)))
    }

    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new LocalScan {
        override def readSchema(): StructType = schema()
        override def rows(): Array[InternalRow] = buildRows()
      }

    private def buildRows(): Array[InternalRow] = {
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
                Some(new GenericInternalRow(Array[Any](
                  id,
                  statuses.get(s"s$id.json")
                    .map(m => tsMicros(java.time.Instant.ofEpochMilli(m)))
                    .orNull,
                  snap.op.map(s).orNull,
                  snap.allFiles.size.toLong,
                  if (tags.isEmpty) null else s(tags.mkString(",")),
                  id == current)): InternalRow)
              case _ => None // crash debris / foreign docs: not history
            }
          }.toArray
        case "files" =>
          val snap = pinned
          val sizes = fs.listStatus(t.tableDir)
            .map(st => st.getPath.getName -> st.getLen).toMap
          def walk(seg: graft.format.Segment): Seq[InternalRow] = {
            val base = seg.file.map { f =>
              new GenericInternalRow(Array[Any](
                s(f), s("base"), tsMicros(seg.start),
                seg.end.map(tsMicros).orNull,
                false, null,
                seg.fileStats.map(x => s(x.keyMin)).orNull,
                seg.fileStats.map(x => s(x.keyMax)).orNull,
                seg.fileStats.flatMap(_.rows)
                  .map(java.lang.Long.valueOf).orNull,
                sizes.get(f).map(java.lang.Long.valueOf).orNull)): InternalRow
            }.toSeq
            val deltas = seg.delta.map { d =>
              new GenericInternalRow(Array[Any](
                s(d.file), s("delta"), tsMicros(d.start),
                tsMicros(d.end),
                d.tombstone,
                d.seq.map(java.lang.Long.valueOf).orNull,
                d.stats.map(x => s(x.keyMin)).orNull,
                d.stats.map(x => s(x.keyMax)).orNull,
                d.stats.flatMap(_.rows).map(java.lang.Long.valueOf).orNull,
                sizes.get(d.file).map(java.lang.Long.valueOf).orNull)): InternalRow
            }
            base ++ deltas ++ seg.segments.flatMap(walk)
          }
          snap.segments.flatMap(walk).toArray
        case "refs" =>
          pinned.refs.toSeq.sortBy(_._1).map { case (n, v) =>
            new GenericInternalRow(Array[Any](s(n), v)): InternalRow
          }.toArray
      }
    }
  }
}
