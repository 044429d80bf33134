package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the embedding hot path (SURVEY.md §7.3's
  * "custom `Expression` … if it shows up in profiles" — it does: the
  * `aggregate`/`zip_with` higher-order-function fold is interpreted
  * per-element, dominating similarity/dedup pair scoring).
  *
  * `VectorDot(a, b)` computes the in-order double-accumulated dot product of
  * two float vectors with full whole-stage codegen (`doGenCode` emits a
  * tight primitive loop — no per-element virtual calls, no boxing). The
  * accumulation order matches the HOF fold exactly, so results are
  * bit-identical to the previous implementation and to the DuckDB oracle.
  *
  * Scale note: this is the per-pair kernel inside O(candidates) similarity
  * joins — at 100 TB the constant factor here is the job's bottleneck;
  * codegen makes it a fused multiply-add loop on primitive arrays.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column-API entry point: dot product of two `array<float>` columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(
      VectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
