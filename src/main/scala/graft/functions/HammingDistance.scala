package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hamming distance between two equal-length strings as a native
  * Catalyst expression with whole-stage codegen — Spark ships
  * `levenshtein` but no `hamming`, and a Scala UDF would box both
  * strings per row. Null on length mismatch (mirrors SQL null-on-bad-
  * input convention; DuckDB's `hamming` errors instead, so oracles only
  * compare equal-length inputs).
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hamming requires (string, string), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].getBytes
    val b = r.asInstanceOf[UTF8String].getBytes
    if (a.length != b.length) null
    else {
      var d = 0L
      var i = 0
      while (i < a.length) {
        if (a(i) != b(i)) d += 1L
        i += 1
      }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      val a = ctx.freshName("a")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      s"""
         |byte[] $a = $l.getBytes();
         |byte[] $b = $r.getBytes();
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long d = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    if ($a[$i] != $b[$i]) d++;
         |  }
         |  ${ev.value} = d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  /** Register `hamming(a, b)` as a SQL function on the session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hamming", exprs => HammingDistance(exprs(0), exprs(1)), "scala_udf")
}
