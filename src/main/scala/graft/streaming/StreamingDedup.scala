package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact dedup against ALL history — the incremental arm of
  * [[graft.operators.Dedup.exact]]: a corpus that grows by commits
  * (a crawler feed, an azof table's change stream) gets each new doc
  * judged against every fingerprint ever seen, without re-scanning the
  * accumulated corpus per batch. Batch dedup re-shuffles N docs every
  * run; this holds ONE state record per distinct fingerprint (the
  * canonical doc id — a long) in the state store and touches only the
  * new batch's rows, which is the 100-TB design: state size equals the
  * deduped corpus's key cardinality, the same bound the batch
  * shuffle's reduce side carries, but paid once and kept instead of
  * rebuilt per run (RocksDB-backed on a real cluster).
  *
  * Verdict rule: FIRST-ARRIVAL-WINS, the only causally-consistent rule
  * a stream can implement (the batch min-id canon would retract
  * already-shipped docs when a smaller id arrives late). Within one
  * micro-batch the tie breaks to the MIN id, so id-ordered replay of a
  * static corpus reproduces the batch [[graft.operators.Dedup.exact]]
  * verdicts exactly — spec-pinned, and the reason the two operators
  * share one fingerprint ([[TextAnalysis.fingerprint]]).
  *
  * Verdicts are FINAL (a kept doc is never demoted), so the output is
  * Append-mode: safe to feed a downstream sink exactly-once. Compose
  * upstream with any streaming source — `readStream` over files, rate,
  * or the commit-exact `azof-commits` source for lakehouse-backed
  * corpora.
  *
  * Output: (doc_id, fp, canonical_id, is_dup).
  */
object StreamingDedup {

  def verdicts(docs: DataFrame, text: Column, id: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val keyed = docs
      .select(id.cast("long").as("_id"),
        TextAnalysis.fingerprint(text).as("_fp"))
      .as[(Long, String)]
      .groupByKey(_._2)
    keyed.flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(
      (fp: String, rows: Iterator[(Long, String)],
       state: GroupState[Long]) => {
        // sort the batch's ids so the within-batch canonical is the min
        // id deterministically (micro-batch slicing must not change
        // verdicts for a given arrival order)
        val ids = rows.map(_._1).toArray
        java.util.Arrays.sort(ids)
        val canonical = state.getOption.getOrElse {
          val c = ids(0)
          state.update(c)
          c
        }
        ids.iterator.map(i => (i, fp, canonical, i != canonical))
      })
      .toDF("doc_id", "fp", "canonical_id", "is_dup")
  }
}
