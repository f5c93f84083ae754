package graft.sources

import graft.format.{ColumnDef, ColumnType, TableSchema}
import graft.operators.{AzofScan, Dedup}
import java.time.Instant
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PERSISTED connected-component assignment index over a near-duplicate
  * pair graph — the clustering companion of [[MinHashIndex]] (which
  * amortizes signatures/candidates) and [[PqIndex]] (codes): a 100-TB
  * dedup pipeline does not re-cluster the whole corpus every time a
  * crawl batch lands. The `(doc_id → component_id)` labeling lives as
  * an azof table keyed by doc id and refreshes INCREMENTALLY from each
  * batch's new pairs.
  *
  * '''The merge trick.''' A min-label assignment is itself a star
  * graph: every labeled doc points at its component's root (the
  * minimum id). So an incremental refresh is just connected components
  * over `star-edges(current assignment) ∪ new-pairs` — the union graph
  * has exactly the connectivity of `all-pairs-so-far`, and
  * [[Dedup.connectedComponents]] (propagation with large-star/
  * small-star fallback) resolves it in O(log n) rounds. Only the
  * components actually TOUCHED by the batch participate: the batch's
  * endpoints name their current roots (one broadcast join), the
  * touched roots name their members (one broadcast semi-join), and
  * everything else never enters the merge — so the refresh costs one
  * narrow scan of the assignment plus CC over the batch's
  * neighborhood, not over the corpus's history.
  *
  * '''Bounded writes.''' Labels only ever decrease (a merge relabels
  * to the smaller root), so the refresh commits ONLY rows whose label
  * is new or changed — a batch touching k documents across c
  * components writes O(k + |merged components|) rows, never the full
  * assignment. A no-op refresh (all pairs already known) commits
  * nothing at all.
  *
  * Everything the writer stack provides composes for free: VERSION AS
  * OF over clustering generations (what did the dedup verdict look
  * like before this crawl landed?), the change feed (downstream
  * keep-one serving can follow relabels commit-exactly), vacuum,
  * mirroring. The serve step ([[Dedup.keepCanonical]] over
  * [[assignment]]) is then one broadcast-sized join — see d13.
  */
object CcIndex {

  /** Index-table value schema: the component root id as a decimal
    * string (engine-portable and oracle-checkable).
    */
  val AssignSchema: TableSchema = TableSchema(Seq(
    ColumnDef("component_id", ColumnType.AzString, nullable = false)))

  def create(
      spark: SparkSession,
      idxLake: String, idxTable: String,
      segmentStart: Instant = Instant.parse("2024-01-01T00:00:00Z")): Unit = {
    AzofWriter.createTableIfAbsent(spark, idxLake, idxTable, AssignSchema,
      segmentStart)
    ()
  }

  /** The index's current labeling as the `(doc_id, component_id)` frame
    * [[Dedup.keepCanonical]] consumes. Only ever CLUSTERED docs are
    * present (singletons never enter a pair, so they never enter the
    * index) — exactly the contract of [[Dedup.connectedComponents]].
    */
  def assignment(
      spark: SparkSession, idxLake: String, idxTable: String): DataFrame =
    AzofScan.scan(spark, idxLake, idxTable)
      .select(
        coalesce(col(TableSchema.KeyName).try_cast("long"),
          raise_error(concat(
            lit("CcIndex.assignment needs long-castable keys; got '"),
            col(TableSchema.KeyName), lit("'"))).cast("long")).as("doc_id"),
        col("component_id").cast("long").as("component_id"))

  /** Merge one batch of new near-dup pairs `(a, b)` into the persisted
    * assignment and commit the changed labels at event time `at`.
    * Returns the number of rows committed (0 = the batch taught the
    * index nothing; no version is written then).
    *
    * `hintBroadcast` forces the batch-derived join sides (endpoints,
    * touched roots) to broadcast — right for a crawl-sized pair batch,
    * wrong for a bootstrap merge whose batch IS the corpus; callers
    * that measured the batch (e.g. [[DedupFlow.ingest]]'s `nVerified`)
    * pass `false` past their threshold and the semi-joins shuffle
    * instead (AQE still broadcasts what it measures to be small).
    */
  def refreshWithPairs(
      spark: SparkSession,
      idxLake: String, idxTable: String,
      pairs: DataFrame, a: String, b: String,
      at: Instant,
      hintBroadcast: Boolean = true): Long = {
    def hinted(df: DataFrame) = if (hintBroadcast) broadcast(df) else df
    val current = assignment(spark, idxLake, idxTable)
      .persist()
    val newEdges = pairs
      .select(col(a).cast("long").as("_ia"), col(b).cast("long").as("_ib"))
      .persist()
    // components touched by the batch: endpoints → their current roots
    // (an endpoint can also BE a root), then roots → their members
    val batchVerts = newEdges.select(col("_ia").as("doc_id"))
      .unionAll(newEdges.select(col("_ib").as("doc_id"))).distinct()
    val touchedRoots = current
      .join(hinted(batchVerts), Seq("doc_id"), "left_semi")
      .select(col("component_id")).distinct()
    val affected = current
      .join(hinted(touchedRoots), Seq("component_id"), "left_semi")
    // affected components re-expressed as their star edges: root
    // members carry label == id and contribute no edge; they re-enter
    // the union as the dst of their leaves (a root with no leaves has
    // no cluster and cannot exist in a pair-built index)
    val starEdges = affected
      .where(col("doc_id") =!= col("component_id"))
      .select(col("doc_id").as("_ia"), col("component_id").as("_ib"))
    val merged = Dedup.connectedComponents(
      newEdges.unionAll(starEdges), "_ia", "_ib")
    val changed = merged
      .join(current.withColumnRenamed("component_id", "_old"),
        Seq("doc_id"), "left")
      .where(col("_old").isNull || col("_old") =!= col("component_id"))
      .select(
        col("doc_id").cast("string").as(TableSchema.KeyName),
        lit(java.sql.Timestamp.from(at)).as(TableSchema.EventTimeName),
        col("component_id").cast("string").as("component_id"))
      .persist()
    val n = changed.count()
    if (n > 0)
      AzofWriter.commitDelta(spark, idxLake, idxTable, changed, at, at,
        op = Some("cc-refresh"))
    changed.unpersist()
    newEdges.unpersist()
    current.unpersist()
    // the CC result is checkpoint-backed (invisible to unpersist) —
    // release it now that `changed` has been computed and committed
    graft.operators.Blocks.free(merged)
    n
  }
}
