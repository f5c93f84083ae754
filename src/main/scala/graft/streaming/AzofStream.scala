package graft.streaming

import graft.format.AzofTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Streaming scan of an azof table — the reference's unchecked
  * "Streaming in scan" roadmap item (reference: README.md:158-159),
  * realized with Spark's file stream source rather than a bespoke
  * connector: every commit lands exactly one immutable data file named
  * `base_s<N>.parquet` / `delta_s<N>.parquet` in the table directory, so
  * tailing those names IS the table's append feed. Compaction and other
  * rewrites use different prefixes (`compact_…`) and are invisible to the
  * stream — the same rewrite-skipping rule the batch change feed applies
  * via the snapshot `op` field.
  *
  * Semantics: replay-then-follow. The first micro-batch emits all commit
  * files present at start; subsequent batches emit newly committed files.
  * Exactly-once per file comes from the file source's checkpointed log.
  * The feed is APPEND-level (rows as committed, before per-key dedup) —
  * downstream consumers needing upsert semantics apply their own merge,
  * e.g. `Sessionize`-style state or `dropDuplicates` on key+event_time.
  *
  * The schema is pinned at stream start from the current snapshot; files
  * written before a column was added surface NULL for it (same rule as
  * the batch scan after schema evolution).
  *
  * Caveat — at-least-once w.r.t. table commits: the writer lands the
  * data file BEFORE s{N}.json and the version bump, so a micro-batch can
  * emit a file whose commit is still in flight; if that writer crashes
  * before the version bump, the stream has emitted rows the table never
  * committed (and vacuum may later delete the orphan). Consumers that
  * must align exactly with committed versions should poll the batch
  * change feed ([[graft.sources.AzofChangeFeed]]) instead.
  */
object AzofStream {

  def appends(
      spark: SparkSession, lakehousePath: String, table: String): DataFrame = {
    val t = AzofTable(spark, lakehousePath, table)
    val schema = t.currentSnapshot.schema
    // files store PHYSICAL names; surface the logical ones
    val raw = spark.readStream
      .schema(schema.physicalStruct)
      .option("pathGlobFilter", "{base,delta}_*.parquet")
      .parquet(t.tableDir.toString)
    schema.toLogicalNames(raw)
  }
}
