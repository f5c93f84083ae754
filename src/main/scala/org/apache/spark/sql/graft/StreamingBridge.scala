package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame

/** The one `private[sql]` doorway a V1 streaming Source implementation
  * needs: MicroBatchExecution asserts that `getBatch`'s DataFrame is
  * streaming-tagged ("did not have isStreaming=true"), and the only
  * constructor for such a frame over computed data is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming =
  * true)` — package-private to `org.apache.spark.sql`, which is why
  * out-of-tree V1 sources (Delta Lake's DeltaSource is the canonical
  * example) host a shim inside an `org.apache.spark.sql` subpackage.
  * This object is that shim, and deliberately nothing else: all engine
  * logic stays in `graft.*`.
  */
object StreamingBridge {

  /** Re-tag a fully-planned batch DataFrame as a streaming micro-batch
    * frame: same rows, same schema, `isStreaming = true`.
    */
  def asStreaming(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession
    spark.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = true)
  }

  /** Wrap a logical plan back into a DataFrame — `Dataset.ofRows` is
    * `private[sql]`. Used by the MV rewrite rule to apply a remapped
    * group-column filter onto the served view's analyzed plan.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Wrap a Catalyst expression as a Column — `ExpressionUtils.column`
    * is `private[sql]`. Used by the MV rewrite rule to carry literal
    * operands of a rewritten aggregate expression onto the served view
    * byte-exactly (no external/internal value conversion round-trip).
    */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
}
