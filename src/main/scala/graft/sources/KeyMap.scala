package graft.sources

import graft.format.{AzofTable, ColumnDef, ColumnType, TableSchema}
import graft.operators.AzofScan
import java.time.Instant
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED surrogate key↔id mapping — the bridge that lets STRING-
  * keyed corpora (URLs, UUIDs, content hashes — what real document
  * keys look like) run the numeric half of the dedup index family.
  * The LSH blocking and Jaccard verify are key-type-agnostic and run
  * on the source keys directly; only connected components needs
  * numerics (min-label propagation converges on a label SUM), so ids
  * are minted exactly at the pair → clustering boundary, for PAIR-
  * INVOLVED keys only — the mapping grows with the near-duplicate
  * neighborhood, not the corpus.
  *
  * The map is itself an azof table keyed by the source key with the
  * surrogate id as its one value column: versioned, vacuumable,
  * mirrorable like every other index table. Mappings are permanent —
  * a deleted doc keeps its id (its component history references it;
  * the monotone contract needs stable ids), and a re-inserted key
  * reuses its old id, which is exactly what keeps the CC merge
  * consistent across delete/re-add cycles.
  *
  * '''Minting.''' New ids are `high-water + dense rank` over the batch
  * keys in `(order-hash, key)` order, computed by the SAME two-phase
  * distributed prefix sum the export stage uses
  * ([[graft.operators.Packing.prefixSum]]) — never a partition-less
  * `row_number` window, whose plan funnels the whole batch through ONE
  * sort task. Steady-state batches are small either way, but a
  * BOOTSTRAP ingest over an existing duplicate-heavy corpus mints the
  * entire pair-involved neighborhood in one batch (at web scale:
  * 10⁸–10⁹ keys), and that is exactly the shape a single-task sort
  * stalls. Hash order (not lexicographic) is fine: ids only need to be
  * DENSE and DETERMINISTIC — survivor election is MIN KEY on the raw
  * string keys, and components converge identically under any id
  * assignment. The high-water mark rides a sidecar
  * (`_keymap_hwm.json`) and is advanced BEFORE the rows commit: a
  * crash between the two leaves an id-range gap — harmless — where
  * the reverse order could double-assign an id.
  */
object KeyMap {

  val HwmFileName = "_keymap_hwm.json"

  val MapSchema: TableSchema = TableSchema(Seq(
    ColumnDef("sid", ColumnType.AzString, nullable = false)))

  def create(
      spark: SparkSession,
      idxLake: String, idxTable: String = "key_map",
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    AzofWriter.createTableIfAbsent(spark, idxLake, idxTable, MapSchema,
      segmentStart)
    ()
  }

  /** The current mapping as `(<key>, doc_id)` — join-ready for both
    * directions.
    */
  def ids(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame =
    AzofScan.scan(spark, idxLake, idxTable)
      .select(col(TableSchema.KeyName),
        col("sid").cast("long").as("doc_id"))

  /** Mint surrogate ids for every key in `keys` (first column) that has
    * none yet; known keys are untouched. Returns how many were minted
    * (0 = no commit).
    */
  def mint(
      spark: SparkSession, idxLake: String, idxTable: String,
      keys: DataFrame, at: Instant): Long = {
    val fresh = keys.select(col(keys.columns.head).as(TableSchema.KeyName))
      .distinct()
      .join(AzofScan.scan(spark, idxLake, idxTable)
          .select(col(TableSchema.KeyName)),
        Seq(TableSchema.KeyName), "left_anti")
      .persist()
    val n = fresh.count()
    if (n > 0) {
      val base = readHwm(spark, idxLake, idxTable).getOrElse(
        // sidecar lost/predates the table: recover from the map itself
        AzofScan.scan(spark, idxLake, idxTable)
          .agg(coalesce(max(col("sid").cast("long")), lit(0L)))
          .collect()(0).getLong(0) + 1L)
      // reserve the range FIRST (see the minting note above)
      writeHwm(spark, idxLake, idxTable, base + n)
      val rows = rankedSids(fresh, base)
        .select(col(TableSchema.KeyName),
          lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName),
          col("sid"))
      AzofWriter.commitDelta(spark, idxLake, idxTable, rows, at, at,
        op = Some("keymap-mint"))
    }
    fresh.unpersist()
    n
  }

  /** `(key, sid)` with sid = `base + dense rank` of the key under the
    * `(orderHash, key)` global order — the two-phase distributed rank
    * (see the minting note; [[graft.operators.Packing.prefixSum]] with
    * unit weights makes the exclusive prefix sum exactly the 0-based
    * dense rank). Deterministic across runs and partitionings: the hash
    * is content-derived and the raw key breaks hash ties totally.
    */
  private[sources] def rankedSids(fresh: DataFrame, base: Long): DataFrame =
    graft.operators.Packing.prefixSum(
      fresh.select(col(TableSchema.KeyName))
        .withColumn("_h",
          graft.operators.Packing.orderHash("km1", col(TableSchema.KeyName)))
        .withColumn("_tid", col(TableSchema.KeyName))
        .withColumn("_w", lit(1L)))
      .withColumn("sid", (lit(base) + col("_prefix")).cast("string"))
      .drop("_h", "_tid", "_w", "_prefix")

  // ---------------------------------------------------- high-water mark

  private def hwmPath(
      spark: SparkSession, idxLake: String, idxTable: String): Path =
    new Path(AzofTable(spark, idxLake, idxTable).tableDir, HwmFileName)

  private def readHwm(
      spark: SparkSession, idxLake: String, idxTable: String): Option[Long] = {
    val p = hwmPath(spark, idxLake, idxTable)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val root =
        try new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
        finally in.close()
      Some(root.get("nextId").asLong)
    }
  }

  private def writeHwm(
      spark: SparkSession, idxLake: String, idxTable: String,
      nextId: Long): Unit = {
    val p = hwmPath(spark, idxLake, idxTable)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true) // forward-only
    try out.write(s"""{"nextId":$nextId}"""
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
