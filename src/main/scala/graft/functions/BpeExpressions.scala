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
case class BpeTokenCount(child: Expression,
                         coder: Bpe.Coder = Bpe.coder)
    extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    coder.countAll(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("bpeCoder", coder, classOf[Bpe.Coder].getName)
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $c.countAll($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** The full BPE tokenization as one space-joined string — the form a
  * digest can pin symbol-for-symbol against the oracle's recursive
  * replay. */
case class BpeEncode(child: Expression,
                     coder: Bpe.Coder = Bpe.coder)
    extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode needs array<string>, got ${other.sql}")
  }

  override def nullSafeEval(a: Any): Any =
    UTF8String.fromString(coder.encodeAll(a.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = ctx.addReferenceObj("bpeCoder", coder, classOf[Bpe.Coder].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String" +
        s".fromString($c.encodeAll($a));")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeExpressions {
  /** Total real-BPE token count of a token array (the committed
    * [[Bpe.Merges]] fixture coder). */
  def bpeTokenCount(tokens: Column): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(tokens)))

  /** As above over an arbitrary coder — the consumer of a
    * [[Bpe.train]]-ed merge table. */
  def bpeTokenCount(tokens: Column, coder: Bpe.Coder): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(tokens), coder))

  /** Space-joined real-BPE tokenization of a token array. */
  def bpeEncode(tokens: Column): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(tokens)))

  /** As above over an arbitrary coder. */
  def bpeEncode(tokens: Column, coder: Bpe.Coder): Column =
    GraftBridge.column(BpeEncode(GraftBridge.expression(tokens), coder))
}
