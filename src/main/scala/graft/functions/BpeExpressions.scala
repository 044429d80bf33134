package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.Bpe

/** Codegen'd kernels for real merge-table BPE over a token array (see
  * [[graft.ops.Bpe]] for the algorithm and the oracle-parity story).
  * Both expressions stay inside whole-stage codegen: the generated code
  * is a single call into the shared [[Bpe.Coder]] reference object,
  * whose per-executor memo makes the merge loop run ~once per distinct
  * word, not once per token occurrence. */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    Bpe.coder.countAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coder = ctx.addReferenceObj("bpeCoder", Bpe.coder,
      classOf[Bpe.Coder].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $coder.countAll($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** The full BPE tokenization as one space-joined string — the form a
  * digest can pin symbol-for-symbol against the oracle's recursive
  * replay. */
case class BpeEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    UTF8String.fromString(Bpe.coder.encodeAll(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coder = ctx.addReferenceObj("bpeCoder", Bpe.coder,
      classOf[Bpe.Coder].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String" +
        s".fromString($coder.encodeAll($a));")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeExpressions {
  /** Total real-BPE token count of a token array. */
  def bpeTokenCount(tokens: Column): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(tokens)))

  /** Space-joined real-BPE tokenization of a token array. */
  def bpeEncode(tokens: Column): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(tokens)))
}
