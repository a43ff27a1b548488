package graft.plans

import graft.functions.TextFns
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `ik_analyze` UDTF (app/func/KeywordUDTF.java:16-28) as a
  * proper Catalyst Generator: one output row per token, usable in
  * `LATERAL VIEW tokenize_gen(col)` exactly like the Flink
  * `LATERAL TABLE(ik_analyze(...))` call sites (KeywordStatsApp.java:52-54).
  *
  * Compared to the `udf + explode` composition this avoids materializing the
  * intermediate token array per row — the generator streams tokens straight
  * into the child consumption loop of GenerateExec. (Generators are evaluated
  * interpreted — CodegenFallback — as are Spark's own collection generators.)
  */
case class TokenizeGenerator(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("token", StringType) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tokenize_gen expects string, got ${child.dataType.simpleString}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else TextFns.tokenize(v.toString).map(t => InternalRow(UTF8String.fromString(t)))
  }

  override protected def withNewChildInternal(newChild: Expression): TokenizeGenerator =
    copy(newChild)

  override def prettyName: String = "tokenize_gen"
}

object TokenizeGenerator {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tokenize_gen", exprs => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"tokenize_gen expects exactly 1 argument, got ${exprs.length}")
        TokenizeGenerator(exprs.head)
      }, "built-in")
}
