package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic cleanup for intermediate frames.
  *
  * `Dataset.unpersist()` only consults the CacheManager, which tracks
  * `persist()` registrations — for a `localCheckpoint` frame (whose
  * plan is a [[LogicalRDD]] over an RDD persisted at the RDD level) it
  * is a silent NO-OP, and the checkpoint blocks live until the
  * ContextCleaner notices the RDD object is garbage. That's
  * GC-timing-dependent: fine for a one-shot query, unbounded block
  * accumulation for a long-running ingest driver that checkpoints
  * per batch ([[graft.sources.DedupFlow]], [[graft.sources.CcIndex]],
  * [[graft.sources.SemDedupIndex]]) or an iterative loop that
  * checkpoints per round ([[Dedup.connectedComponents]]).
  */
object Blocks {

  /** Release the storage behind `df` NOW, whichever way it was pinned:
    * CacheManager entries via the normal unpersist, checkpoint blocks
    * via the underlying RDD. Blocking=false — the frame must simply
    * not be read again, the executors reclaim asynchronously.
    */
  def free(df: DataFrame): Unit = {
    df.unpersist()
    df.queryExecution.analyzed match {
      case l: LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
  }

  /** Release every checkpoint block a fully-consumed plan references:
    * each [[LogicalRDD]] in `df`'s analyzed plan is a lineage cut made
    * somewhere upstream (a `localCheckpoint` inside a helper whose
    * frame the caller never sees). For a per-batch pipeline (streaming
    * `foreachBatch` bodies) this is the difference between bounded
    * storage and one orphaned checkpoint per micro-batch. Call ONLY
    * after the last action on `df` — the plan is unreadable after.
    */
  def freeReferenced(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
}
