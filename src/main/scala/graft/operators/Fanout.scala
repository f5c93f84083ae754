package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive read fan-out for expensive per-row kernels
  * (optimization guide §2.5: "Input skew: one huge unsplittable file …
  * repartition immediately after the read").
  *
  * Parquet is splittable only at row-group granularity, so a corpus
  * that arrives as one file with one row group scans as ONE task no
  * matter how many cores the session has — and every narrow per-row
  * kernel above that scan (shingling, signature hashing, vector math)
  * runs serially while the other cores idle. [[spread]] redistributes
  * such a frame across `defaultParallelism` partitions, hashed on a
  * caller-chosen DETERMINISTIC key — never round-robin
  * `repartition(n)`, which pays a local sort per task
  * (`spark.sql.execution.sortBeforeRepartition`) and exists precisely
  * because retried tasks must reproduce row placement (guide §2.5,
  * SPARK-38388); a hash of a stable key needs neither.
  *
  * The guard is SCALE-ADAPTIVE, not a local-mode constant: it sums the
  * optimized plan's LEAF relation size estimates (raw input bytes —
  * robust against join-inflated intermediate estimates) and fires only
  * when the whole input would occupy fewer than a quarter of the
  * session's cores at the configured split size
  * (`spark.sql.files.maxPartitionBytes`). A production table of many
  * files / row groups ≥ cores exceeds the threshold and passes through
  * untouched — no shuffle is ever ADDED at scale, where the scan's own
  * parallelism already feeds every core.
  */
object Fanout {

  /** Redistribute `df` across the session's cores when its raw input
    * is too small to have split — see the object doc. `key` must be a
    * deterministic expression over `df`'s columns (doc id, vector id).
    */
  def spread(df: DataFrame, key: Column, moreKeys: Column*): DataFrame = {
    val spark = df.sparkSession
    // kill switch (and the A/B-probe toggle): spark.azof.fanout=false
    // restores the pass-through shape
    if (!spark.conf.get("spark.azof.fanout", "true").toBoolean) return df
    val target = spark.sparkContext.defaultParallelism
    if (target <= 1) return df
    val splitBytes =
      BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    // Leaf stats come from the ANALYZED plan: leaves are identical to
    // the optimized plan's for this guard's purpose (raw input
    // relations), and reading them here avoids running the whole
    // optimizer once per spread() call at composition time — the real
    // action re-optimizes the composed plan anyway, so optimizing here
    // was pure duplicated driver work (ADVICE r17).
    val leafBytes = df.queryExecution.analyzed.collectLeaves()
      .map(_.stats.sizeInBytes).sum
    // Known limitation (documented, deliberate): the guard reasons in
    // BYTES at the configured split size. An oversized single
    // ROW-GROUP file (e.g. 2 GB, one row group) still scans as one
    // task yet passes the byte test; counting actual row groups would
    // need a footer read per file at composition time. Azof's own
    // writer sizes row groups well below that, so the case cannot
    // arise on engine-written tables.
    if (leafBytes * 4 < splitBytes * target)
      df.repartition(target, (key +: moreKeys): _*)
    else df
  }
}
