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

  // element accessor per side: float or double arrays both accepted
  private def isDouble(e: Expression): Boolean = e.dataType match {
    case org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (xd, yd) = (isDouble(left), isDouble(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val ax = if (isDouble(left)) s"$a.getDouble($i)"
               else s"(double) $a.getFloat($i)"
      val bx = if (isDouble(right)) s"$b.getDouble($i)"
               else s"(double) $b.getFloat($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value}_acc += $ax * $bx;
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
