package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

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

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireFloatVectors("vector_dot", left, right)

  // element accessor per side: float or double arrays both accepted
  private def isDouble(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
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

/** Batched hyperplane-LSH kernel: all `planes.length` (≤ 64) sign bits of
  * one vector in a single expression evaluation — bit p of the result is 1
  * iff `dot(vec, planes(p)) >= 0`.
  *
  * Replaces 32 separate [[VectorDot]]-against-plane-literal evaluations per
  * row. The win is not the loop fusion itself but the plane storage: a
  * plane shipped as a `typedLit` array is a `GenericArrayData` of BOXED
  * doubles (one unbox per element per row — 16k unboxings/row at 32×512);
  * here the planes ride along as a primitive `double[][]` reference object,
  * so the generated code is a pure primitive multiply-add nest.
  *
  * Each per-plane accumulation is the same in-order double fold over
  * `min(vec.length, plane.length)` as [[VectorDot]] — results are
  * bit-identical to the per-plane path and to the DuckDB oracle's
  * `list_dot_product` mirror. */
case class HyperplaneSignBits(child: Expression,
                              planes: Array[Array[Double]])
    extends UnaryExpression {

  require(planes.length <= 64, "sign bits must fit a long")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireFloatVectors("hyperplane_sign_bits", child)

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val xd = isDouble
    val vn = x.numElements()
    var mask = 0L
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      val n = math.min(vn, w.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (xd) x.getDouble(i) else x.getFloat(i).toDouble) * w(i)
        i += 1
      }
      if (acc >= 0) mask |= 1L << p
      p += 1
    }
    mask
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", planes, "double[][]")
      val mask = ctx.freshName("mask")
      val p = ctx.freshName("p")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val vn = ctx.freshName("vn")
      val ax = if (isDouble) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      s"""
         |int $vn = $a.numElements();
         |long $mask = 0L;
         |for (int $p = 0; $p < $pl.length; $p++) {
         |  double[] $w = $pl[$p];
         |  int $n = java.lang.Math.min($vn, $w.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $ax * $w[$i];
         |  }
         |  if ($acc >= 0) $mask |= 1L << $p;
         |}
         |${ev.value} = $mask;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignBits =
    copy(child = newChild)
}

/** IVF nearest-centroid assignment kernel: the argmax-cosine cell of one
  * vector against the full centroid set in a single expression evaluation.
  * `cells`/`cents`/`cnorms` ride along as primitive reference objects
  * (one `long[]` + `float[][]` + `double[]` — centroids are ≤ √n rows,
  * i.e. ~100k × 64 floats ≈ 25 MB even at 10^10 vectors), so assignment
  * is a map-only pass inside whole-stage codegen: no ×nLists row
  * expansion, no aggregation, no join.
  *
  * This exists because every declarative argmax formulation measured
  * pathological at the 100×-probe point (n=200k, nLists=448):
  * `groupBy(max_by(cell, struct(_sim, -cell)))` puts a struct in the
  * aggregation buffer, which HashAggregate cannot hold — the plan
  * degrades to a SortAggregate over the n×nLists expansion (64 s); the
  * two-pass primitive-buffer rewrite (max then filter+min) re-executes
  * the broadcast centroid subplan per consumer, multiplying the Lloyd
  * chain (97 s). The kernel runs the same math in 2.4 s.
  *
  * Parity contract (bit-identical to the declarative path and the DuckDB
  * IvfChain oracle): per centroid, the dot is the [[VectorDot]] in-order
  * double fold over min(len) elements; sim = dot / (n·cn) only when
  * n·cn > 0 (the `cosFromDot` zero-norm NULL guard); centroids are
  * iterated in ascending cell order with a strict `>` so the LOWEST cell
  * wins exact float ties — `max_by(cell, struct(_sim, -cell))` semantics.
  * A vector with no valid sim (zero norm) falls to the lowest cell, which
  * is where the oracle's `ORDER BY sim DESC, cell` ranking (NULLS LAST)
  * places it. */
case class NearestCentroid(vec: Expression, norm: Expression,
                           cells: Array[Long], cents: Array[Array[Float]],
                           cnorms: Array[Double])
    extends BinaryExpression {

  require(cells.nonEmpty && cells.length == cents.length &&
    cells.length == cnorms.length, "centroid arrays must align and be non-empty")
  require(cells.sameElements(cells.sorted),
    "cells must be ascending so the strict > keeps the lowest cell on ties")

  override def left: Expression = vec
  override def right: Expression = norm

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireFloatVectors("nearest_centroid", vec) match {
      case TypeCheckResult.TypeCheckSuccess if norm.dataType != DoubleType =>
        TypeCheckResult.TypeCheckFailure(
          s"nearest_centroid requires a double norm, got ${norm.dataType.sql}")
      case r => r
    }

  private def isDouble: Boolean = vec.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, nn: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = nn.asInstanceOf[Double]
    val xd = isDouble
    val vn = x.numElements()
    // copy the vector out of ArrayData once — the nLists × dim inner nest
    // then runs on primitive arrays (no per-element accessor calls, JIT
    // auto-vectorizable); the copy amortizes over nLists passes
    val xs = new Array[Double](vn)
    var j = 0
    while (j < vn) {
      xs(j) = if (xd) x.getDouble(j) else x.getFloat(j).toDouble
      j += 1
    }
    var bestCell = cells(0)
    var best = Double.NegativeInfinity
    var k = 0
    while (k < cents.length) {
      val w = cents(k)
      val m = math.min(vn, w.length)
      var acc = 0.0
      var i = 0
      while (i < m) {
        acc += xs(i) * w(i).toDouble
        i += 1
      }
      val den = n * cnorms(k)
      if (den > 0) {
        val sim = acc / den
        if (sim > best) { best = sim; bestCell = cells(k) }
      }
      k += 1
    }
    bestCell
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cl = ctx.addReferenceObj("cells", cells, "long[]")
      val cv = ctx.addReferenceObj("cents", cents, "float[][]")
      val cn = ctx.addReferenceObj("cnorms", cnorms, "double[]")
      val vn = ctx.freshName("vn")
      val bestCell = ctx.freshName("bestCell")
      val best = ctx.freshName("best")
      val k = ctx.freshName("k")
      val w = ctx.freshName("w")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val den = ctx.freshName("den")
      val sim = ctx.freshName("sim")
      val xs = ctx.freshName("xs")
      val j = ctx.freshName("j")
      val ax = if (isDouble) s"$a.getDouble($j)" else s"(double) $a.getFloat($j)"
      // vector copied to a primitive scratch once per row: the nLists × dim
      // nest then has no ArrayData accessor calls in it (JIT-vectorizable);
      // same multiply/accumulate order, bit-identical result
      s"""
         |int $vn = $a.numElements();
         |double[] $xs = new double[$vn];
         |for (int $j = 0; $j < $vn; $j++) { $xs[$j] = $ax; }
         |long $bestCell = $cl[0];
         |double $best = Double.NEGATIVE_INFINITY;
         |for (int $k = 0; $k < $cv.length; $k++) {
         |  float[] $w = $cv[$k];
         |  int $m = java.lang.Math.min($vn, $w.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $m; $i++) {
         |    $acc += $xs[$i] * (double) $w[$i];
         |  }
         |  double $den = $b * $cn[$k];
         |  if ($den > 0) {
         |    double $sim = $acc / $den;
         |    if ($sim > $best) { $best = $sim; $bestCell = $cl[$k]; }
         |  }
         |}
         |${ev.value} = $bestCell;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(vec = newLeft, norm = newRight)
}

/** Primitive-buffer mutable state for [[VectorMean]]: per-dimension running
  * double sums and long counts, grown lazily to the widest vector seen. */
private[functions] final class VecMeanBuffer(
    var sums: Array[Double], var counts: Array[Long]) {
  def add(x: ArrayData, isDouble: Boolean): Unit = {
    val n = x.numElements()
    if (n > sums.length) {
      sums = java.util.Arrays.copyOf(sums, n)
      counts = java.util.Arrays.copyOf(counts, n)
    }
    var i = 0
    while (i < n) {
      sums(i) += (if (isDouble) x.getDouble(i) else x.getFloat(i).toDouble)
      counts(i) += 1L
      i += 1
    }
  }
  def mergeIn(o: VecMeanBuffer): Unit = {
    val n = o.sums.length
    if (n > sums.length) {
      sums = java.util.Arrays.copyOf(sums, n)
      counts = java.util.Arrays.copyOf(counts, n)
    }
    var i = 0
    while (i < n) { sums(i) += o.sums(i); counts(i) += o.counts(i); i += 1 }
  }
}

/** Element-wise mean of a group's float vectors as one aggregate with a
  * primitive `(double[] sums, long[] counts)` buffer — the Lloyd-refinement
  * kernel (the [[NearestCentroid]] precedent applied to the reduce side).
  *
  * Replaces the `posexplode → groupBy(cell, i).avg → collect_list →
  * array_sort → transform` chain, which pushes n×dim ROWS through a hash
  * aggregate per Lloyd iteration (the named residual in SCALING.md's 100×
  * gap). Here each input row is one `while` loop over its vector into a
  * primitive buffer: no row expansion, no struct shuffle — partials are one
  * compact binary blob per (cell, partition).
  *
  * The struct/array aggregation-buffer trap does not apply: a
  * TypedImperativeAggregate's buffer is an opaque JVM object in a
  * BinaryType slot, which plans as ObjectHashAggregate (this is how
  * Spark's own percentile/count_min_sketch work;
  * `spark.sql.execution.useObjectHashAggregateExec`, falling back to
  * SortAggregate only past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * in-memory groups) — it is DECLARATIVE array-typed buffers that force
  * the SortAggregate fallback outright. The ObjectHashAggregate shape is
  * pinned in PlanInvariantSpec.
  *
  * Parity with the replaced chain: per dimension the accumulation is the
  * same add-per-row in partition encounter order, merged per-partition
  * partial — and the mean divides by that DIMENSION's count (a ragged
  * corpus averages exactly like posexplode+avg, which only sees rows that
  * have the dimension). Output is `array<double>` of per-dim means;
  * returns NULL for a group that contributed no dimensions — no non-null
  * vectors, or only zero-length ones (posexplode of such a group emitted
  * no rows at all, so the replaced chain produced no entry either). */
case class VectorMean(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[VecMeanBuffer] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireFloatVectors("vector_mean", child)

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): VecMeanBuffer =
    new VecMeanBuffer(Array.emptyDoubleArray, Array.emptyLongArray)

  override def update(buf: VecMeanBuffer, input: InternalRow): VecMeanBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData], isDouble)
    buf
  }

  override def merge(buf: VecMeanBuffer, other: VecMeanBuffer): VecMeanBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: VecMeanBuffer): Any =
    if (buf.sums.length == 0) null
    else {
      val out = new Array[Double](buf.sums.length)
      var i = 0
      while (i < out.length) { out(i) = buf.sums(i) / buf.counts(i); i += 1 }
      new GenericArrayData(out)
    }

  override def serialize(buf: VecMeanBuffer): Array[Byte] = {
    val n = buf.sums.length
    val bb = java.nio.ByteBuffer.allocate(4 + n * 16)
    bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.sums(i)); i += 1 }
    i = 0
    while (i < n) { bb.putLong(buf.counts(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): VecMeanBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val sums = new Array[Double](n)
    val counts = new Array[Long](n)
    var i = 0
    while (i < n) { sums(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < n) { counts(i) = bb.getLong; i += 1 }
    new VecMeanBuffer(sums, counts)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMean =
    copy(child = newChild)
}

object VectorExpressions {
  /** Analysis-time gate shared by the vector kernels: every input must be
    * `array<float>` or `array<double>`. The element accessors hard-branch
    * on double-vs-float (`getDouble`/`getFloat`), so any other type —
    * including `array<int>` — would otherwise surface as an obscure
    * ClassCastException at eval time or a codegen compile error. */
  private[functions] def requireFloatVectors(
      fn: String, inputs: Expression*): TypeCheckResult = {
    val bad = inputs.map(_.dataType).find {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => false
      case _ => true
    }
    bad match {
      case Some(t) => TypeCheckResult.TypeCheckFailure(
        s"$fn requires array<float> or array<double> inputs, got ${t.sql}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }

  /** Column-API entry point: dot product of two `array<float>` columns. */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(
      VectorDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-API entry point: long bitmask of hyperplane sign bits. */
  def hyperplaneSignBits(vec: Column, planes: Array[Array[Double]]): Column =
    GraftBridge.column(
      HyperplaneSignBits(GraftBridge.expression(vec), planes))

  /** Column-API entry point: per-dimension mean of a group's vectors
    * (aggregate — use inside `.agg(...)`). */
  def vecMean(vec: Column): Column =
    GraftBridge.column(
      VectorMean(GraftBridge.expression(vec)).toAggregateExpression())

  /** Column-API entry point: argmax-cosine centroid cell of a vector. */
  def nearestCentroid(vec: Column, norm: Column, cells: Array[Long],
                      cents: Array[Array[Float]],
                      cnorms: Array[Double]): Column =
    GraftBridge.column(
      NearestCentroid(GraftBridge.expression(vec), GraftBridge.expression(norm),
        cells, cents, cnorms))
}
