package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting. A hot grouping key funnels its entire
  * group through one reducer; salting splits each group into `nSalts`
  * sub-groups for the wide phase and merges the partials in a second,
  * tiny aggregation keyed by the true key. Both phases are ordinary
  * hash aggregations, so map-side partial aggregation still applies —
  * the cost is one extra (narrow) shuffle of `keys × nSalts` partial
  * rows, bought against the hot key's reducer no longer being the
  * straggler. AQE's skew handling covers *joins*; aggregation skew is
  * handled here, at plan level.
  *
  * The salt must be deterministic w.r.t. the ROW (not the task) so a
  * retried partition re-salts identically: `saltFrom` hashes caller-
  * chosen columns (e.g. a unique id) rather than using rand() or
  * spark_partition_id().
  */
object Skew {

  /** Deterministic salt in [0, nSalts) from the given columns. */
  def saltFrom(nSalts: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(nSalts.toLong))

  /** Two-phase salted sum+count over a possibly-skewed key.
    * Output: key, `sum_<valueAlias>`, `n`.
    */
  def saltedSumCount(
      df: DataFrame, key: String, value: Column, valueAlias: String,
      salt: Column): DataFrame = {
    val partial = df
      .groupBy(col(key), salt.as("_salt"))
      .agg(sum(value).as("_psum"), count(lit(1)).as("_pn"))
    partial
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$valueAlias"), sum(col("_pn")).as("n"))
  }
}
