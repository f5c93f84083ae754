package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time as-of join: attach to each left row the most recent right
  * row with the same key and `ts <= left.ts` (at-or-before semantics, like
  * the reference's as-of scan predicate — crates/azof/src/lakehouse.rs:64-68
  * — but as a two-stream JOIN, which the reference lacks).
  *
  * Implementation is the union+window pattern, NOT a range join: both
  * sides are tagged, unioned, and a single `last(_, ignoreNulls)` running
  * window per key carries the right payload forward. Cost is ONE shuffle
  * on the key plus a per-partition sort — no range-condition row
  * explosion, no broadcast of either side — so it scales linearly with
  * |left|+|right| at any data size. A key whose history is pathologically
  * hot (celebrity user) skews its window partition; pre-splitting such
  * keys by coarse time bucket is the standard mitigation and composes
  * with this operator.
  *
  * Tie semantics: a right row at exactly left.ts IS visible (right sorts
  * before left at equal ts); among equal-ts right rows the largest
  * `tieBreak` wins. Both rules are deterministic and engine-portable.
  */
object AsOfJoin {

  /** @param payload right columns carried onto each left row, surfaced as
    *                `asof_<name>` (null when no right row is at-or-before)
    */
  def leftAsOf(
      left: DataFrame, right: DataFrame,
      key: String, ts: String, tieBreak: String,
      payload: Seq[String]): DataFrame = {
    val leftOther = left.columns.filterNot(Set(key, ts)).toSeq
    // The payload travels as ONE struct so the window's last() picks a
    // whole right ROW atomically. Per-column last(ignoreNulls) would
    // stitch values from different rows whenever the most recent right
    // row carries a NULL in one payload column.
    val payloadType =
      right.select(struct(payload.map(col): _*)).schema.head.dataType
    val l = left.select(
      Seq(col(key), col(ts), col(tieBreak).as("_tie"), lit(1).as("_side")) ++
        leftOther.map(col) :+
        lit(null).cast(payloadType).as("_payload"): _*)
    val r = right.select(
      Seq(col(key), col(ts), col(tieBreak).as("_tie"), lit(0).as("_side")) ++
        leftOther.map(c => lit(null).as(c)) :+
        struct(payload.map(col): _*).as("_payload"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = false)
      .withColumn("_payload", last(col("_payload"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
    payload.foldLeft(carried) { (df, p) =>
      df.withColumn(s"asof_$p", col("_payload").getField(p))
    }
      .drop("_side", "_tie", "_payload")
  }
}
