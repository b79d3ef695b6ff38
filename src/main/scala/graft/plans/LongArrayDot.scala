package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen'd dot product over two int64 arrays — the hot inner
  * loop of the quantized-cosine similarity path (SURVEY §2.9 T3 /
  * the ANN suite). The composable form
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0, +)` materializes the
  * zipped array per row and evaluates two lambda closures; this
  * expression is one fused loop with no allocation, inside
  * whole-stage codegen.
  *
  * Null handling: null array → null result (BinaryExpression default);
  * elements are assumed non-null (they come from `transform` over
  * non-null embeddings — quantization never emits null).
  */
case class LongArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  // AbstractDataType (and with it ExpectsInputTypes' signature) is
  // private[sql] in Spark 4 — check input types by hand
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"long_array_dot expects two array<bigint> inputs, got ${l.sql} and ${r.sql}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "long_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  import org.apache.spark.sql.GraftColumnBridge

  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(LongArrayDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
