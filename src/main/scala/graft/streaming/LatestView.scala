package graft.streaming

import graft.format.{AzofTable, TableSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Continuously-maintained latest-per-key view — the STREAMING mirror of
  * the batch Current scan: tail the table's append feed
  * ([[AzofStream.appends]]) and keep one state record per key (its
  * current winner), emitting an update row whenever a commit changes a
  * key's winner. The serving-layer shape for a KV table: downstream
  * sinks receive an upsert stream instead of re-scanning.
  *
  * State is bounded by key cardinality (one `(event_time, hash, payload)`
  * triple per key — the same bound as the table itself) with no
  * watermard/timeout: a KV table's keys never expire.
  *
  * Winner rule: a row replaces the state iff its event_time is strictly
  * newer, or equal with a smaller `xxhash64` of the full row — a TOTAL
  * order, so the view converges to the same answer under any arrival
  * order, micro-batch slicing, or replay (CRDT-style max). This matches
  * the batch scan exactly whenever `(key, event_time)` pairs are unique
  * across files (every layout this engine's writers produce for
  * distinct data); for cross-file exact ties the batch scan prefers
  * file precedence first and hash second, while the stream — which has
  * no file-precedence notion — uses the hash rule alone.
  *
  * Inherited caveat (see [[AzofStream]]): the append feed is
  * at-least-once w.r.t. table COMMITS — a data file landed by a writer
  * that crashes before its snapshot commit can be ingested into state
  * and is never retracted, so the view can briefly (or, for such
  * orphans, permanently) hold a row the committed table never had.
  * Views that must align exactly with committed versions — or must
  * observe tombstone DELETES, which the append feed's name filter
  * never surfaces — use [[latestCommitted]], the same state machine
  * over the commit-exact `azof-commits` source.
  *
  * Value columns ride through state as JSON (schema-dynamic payloads
  * can't be a Scala case class); the output re-expands them to typed
  * columns via the table schema.
  */
object LatestView {

  /** Streaming DataFrame of winner updates: full table schema
    * (`key, event_time, values...`), one row per winner CHANGE. Run with
    * `outputMode("update")`.
    */
  def latest(
      spark: SparkSession, lakehousePath: String, table: String): DataFrame = {
    import spark.implicits._
    val t = AzofTable(spark, lakehousePath, table)
    val schema = t.currentSnapshot.schema
    val allCols = schema.allColumnNames.map(col)
    val valueStruct = org.apache.spark.sql.types.StructType(
      schema.toStruct.fields.drop(2))
    val valueCols = schema.columns.map(c => col(c.name))

    val keyed = AzofStream.appends(spark, lakehousePath, table)
      .select(
        col(TableSchema.KeyName).as("_k"),
        unix_micros(col(TableSchema.EventTimeName)).as("_et"),
        xxhash64(allCols: _*).as("_h"),
        to_json(struct(valueCols: _*)).as("_js"))
      .as[(String, Long, Long, String)]
      .groupByKey(_._1)

    val updates = keyed.flatMapGroupsWithState(
      OutputMode.Update, GroupStateTimeout.NoTimeout)(
      (key: String, rows: Iterator[(String, Long, Long, String)],
       state: GroupState[(Long, Long, String)]) => {
        var cur = state.getOption
        var changed = false
        rows.foreach { case (_, et, h, js) =>
          val better = cur.forall { case (cet, ch, _) =>
            et > cet || (et == cet && h < ch)
          }
          if (better) { cur = Some((et, h, js)); changed = true }
        }
        if (changed) {
          state.update(cur.get)
          Iterator.single((key, cur.get._1, cur.get._3))
        } else Iterator.empty
      })

    updates.toDF("_k", "_et", "_js")
      .select(
        col("_k").as(TableSchema.KeyName),
        timestamp_micros(col("_et")).as(TableSchema.EventTimeName),
        from_json(col("_js"), valueStruct).as("_v"))
      .select(col(TableSchema.KeyName) +:
        col(TableSchema.EventTimeName) +:
        schema.columns.map(c => col(s"_v.${c.name}").as(c.name)): _*)
  }

  /** The COMMIT-EXACT, DELETE-AWARE variant of [[latest]]: same
    * one-winner-per-key state machine, fed by the `azof-commits`
    * streaming source instead of the file-level append feed — so it
    * inherits none of the append feed's caveats (orphan files never
    * enter state; compaction rewrites never re-emit) and it SEES
    * tombstones: a delete whose event wins a key emits one update row
    * with `_deleted = true` and NULL values (the Delta-CDF shape), and
    * a later re-insert emits the resurrected winner. Output schema:
    * `key, event_time, values..., _deleted`. The winner rule is the
    * same total order as [[latest]] (event_time, then hash), so the
    * view converges to the batch Current scan's row set with deleted
    * keys flagged — the serving-layer view a replicated KV table with
    * takedowns actually needs. Run with `outputMode("update")`.
    */
  def latestCommitted(
      spark: SparkSession, lakehousePath: String, table: String): DataFrame = {
    import spark.implicits._
    val t = AzofTable(spark, lakehousePath, table)
    val schema = t.currentSnapshot.schema
    val allCols = schema.allColumnNames.map(col)
    val valueStruct = org.apache.spark.sql.types.StructType(
      schema.toStruct.fields.drop(2))
    val valueCols = schema.columns.map(c => col(c.name))

    val keyed = spark.readStream.format("azof-commits")
      .option("table", table).load(lakehousePath)
      .select(
        col(TableSchema.KeyName).as("_k"),
        unix_micros(col(TableSchema.EventTimeName)).as("_et"),
        xxhash64(allCols: _*).as("_h"),
        to_json(struct(valueCols: _*)).as("_js"),
        coalesce(col("_deleted"), lit(false)).as("_d"))
      .as[(String, Long, Long, String, Boolean)]
      .groupByKey(_._1)

    val updates = keyed.flatMapGroupsWithState(
      OutputMode.Update, GroupStateTimeout.NoTimeout)(
      (key: String, rows: Iterator[(String, Long, Long, String, Boolean)],
       state: GroupState[(Long, Long, String, Boolean)]) => {
        var cur = state.getOption
        var changed = false
        rows.foreach { case (_, et, h, js, d) =>
          val better = cur.forall { case (cet, ch, _, _) =>
            et > cet || (et == cet && h < ch)
          }
          if (better) { cur = Some((et, h, js, d)); changed = true }
        }
        if (changed) {
          state.update(cur.get)
          Iterator.single((key, cur.get._1, cur.get._3, cur.get._4))
        } else Iterator.empty
      })

    updates.toDF("_k", "_et", "_js", "_d")
      .select(
        col("_k").as(TableSchema.KeyName),
        timestamp_micros(col("_et")).as(TableSchema.EventTimeName),
        from_json(col("_js"), valueStruct).as("_v"),
        col("_d"))
      .select(col(TableSchema.KeyName) +:
        col(TableSchema.EventTimeName) +:
        schema.columns.map(c => col(s"_v.${c.name}").as(c.name)) :+
        col("_d").as("_deleted"): _*)
  }
}
