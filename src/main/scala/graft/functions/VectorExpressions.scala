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

/** Per-query ADC lookup-table kernel: ONE expression producing the flat
  * m·k `array<double>` LUT — slot s·k + c = dot(query_slice_s, cb_{s,c})
  * — from the query embedding. Replaces an `array(...)` of m·k separate
  * slice+dot literal expressions whose sheer node count dominated DRIVER
  * planning time (each analyzer/optimizer batch walks every node; the
  * round-16 bisection measured ~5 s of flat per-plan cost at m·k = 512).
  * The codebooks ride along as primitive `float[][][]` references
  * (`cents(s)(c)` = the subspace-s centroid for code c, or null for a
  * refinement-dropped cell → slot 0.0, never referenced by any code);
  * each slot is the same in-order double fold as [[VectorDot]] over the
  * query slice, so every value is bit-identical to the expression-built
  * LUT and to the DuckDB oracle chain. */
case class AdcLut(child: Expression, cents: Array[Array[Array[Float]]],
                  subDim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireFloatVectors("adc_lut", child)

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val qe = input.asInstanceOf[ArrayData]
    val m = cents.length
    val k = if (m == 0) 0 else cents(0).length
    val out = new Array[Double](m * k)
    val qn = qe.numElements()
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val v = cents(s)(c)
        if (v != null) {
          var acc = 0.0
          var i = 0
          val base = s * subDim
          val n = math.min(math.max(qn - base, 0), math.min(subDim, v.length))
          while (i < n) {
            val x = if (isDouble) qe.getDouble(base + i)
                    else qe.getFloat(base + i).toDouble
            acc += x * v(i).toDouble
            i += 1
          }
          out(s * k + c) = acc
        }
        c += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("adcLutCents", cents, "float[][][]")
    val qx = if (isDouble) "getDouble" else "getFloat"
    nullSafeCodeGen(ctx, ev, qe => {
      val s = ctx.freshName("s"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val out = ctx.freshName("out")
      val v = ctx.freshName("v"); val acc = ctx.freshName("acc")
      val base = ctx.freshName("base"); val n = ctx.freshName("n")
      val m = cents.length
      val k = if (m == 0) 0 else cents(0).length
      s"""
         |double[] $out = new double[${m * k}];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $subDim;
         |  for (int $c = 0; $c < $k; $c++) {
         |    float[] $v = $centsRef[$s][$c];
         |    if ($v != null) {
         |      double $acc = 0.0;
         |      int $n = java.lang.Math.min(
         |        java.lang.Math.max($qe.numElements() - $base, 0),
         |        java.lang.Math.min($subDim, $v.length));
         |      for (int $i = 0; $i < $n; $i++) {
         |        $acc += ((double) $qe.$qx($base + $i)) * ((double) $v[$i]);
         |      }
         |      $out[$s * $k + $c] = $acc;
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): AdcLut =
    copy(child = newChild)
}

/** Whole-vector PQ encode kernel: all m subspace codes of one vector in a
  * SINGLE expression evaluation — `array<int>` of length m, code s =
  * the argmax-cosine codebook cell of slice s. Replaces the former
  * `array(16 × NearestCentroid(slice, sqrt(dot(slice, slice))))`
  * construction, whose inline generated code bloated every downstream
  * stage past the whole-stage-codegen method limit: the round-16
  * bisection measured the resulting interpreted fallback re-projecting
  * the 16-kernel array PER JOIN PAIR (~140 µs/pair — 56 s at the 10×
  * probe for what this kernel does once per corpus row).
  *
  * Parity contract, per subspace s (bit-identical to the slice +
  * [[NearestCentroid]] chain and the DuckDB oracle): the slice is
  * vec[s·subDim ..] (shorter at a ragged tail, `slice` semantics); its
  * norm is sqrt of the in-order x² double fold; per centroid the dot is
  * the in-order double fold over min(len); sim compares only when
  * norm·cnorm > 0; ascending cells with strict `>` keep the LOWEST cell
  * on ties and for zero-norm slices. */
case class PqEncode(child: Expression, cells: Array[Array[Long]],
                    cents: Array[Array[Array[Float]]],
                    cnorms: Array[Array[Double]], subDim: Int)
    extends UnaryExpression {

  require(cells.length == cents.length && cells.length == cnorms.length,
    "per-subspace codebook arrays must align")
  // Mirror NearestCentroid's contract: the documented lowest-cell-on-ties /
  // zero-norm rule reads cells(s)(0), so every subspace needs a non-empty,
  // ascending cell list — an unsorted book would silently break tie order,
  // an empty one would throw inside generated code.
  require(cells.forall(cl => cl.nonEmpty && cl.sameElements(cl.sorted)),
    "pq_encode: each subspace's cells must be non-empty and ascending")

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.requireFloatVectors("pq_encode", child)

  private def isDouble: Boolean = child.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val xd = isDouble
    val vn = x.numElements()
    val m = cells.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val base = s * subDim
      val len = math.max(0, math.min(subDim, vn - base))
      // slice copied to a primitive scratch once; norm = in-order x² fold
      val xs = new Array[Double](len)
      var nacc = 0.0
      var j = 0
      while (j < len) {
        val xv = if (xd) x.getDouble(base + j) else x.getFloat(base + j).toDouble
        xs(j) = xv
        nacc += xv * xv
        j += 1
      }
      val norm = math.sqrt(nacc)
      val cl = cells(s); val cv = cents(s); val cn = cnorms(s)
      var bestCell = cl(0)
      var best = Double.NegativeInfinity
      var c = 0
      while (c < cv.length) {
        val w = cv(c)
        val n2 = math.min(len, w.length)
        var acc = 0.0
        var i = 0
        while (i < n2) { acc += xs(i) * w(i).toDouble; i += 1 }
        val den = norm * cn(c)
        if (den > 0) {
          val sim = acc / den
          if (sim > best) { best = sim; bestCell = cl(c) }
        }
        c += 1
      }
      out(s) = bestCell.toInt
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cl = ctx.addReferenceObj("pqCells", cells, "long[][]")
    val cv = ctx.addReferenceObj("pqCents", cents, "float[][][]")
    val cn = ctx.addReferenceObj("pqNorms", cnorms, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val vn = ctx.freshName("vn"); val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val base = ctx.freshName("base")
      val len = ctx.freshName("len"); val xs = ctx.freshName("xs")
      val nacc = ctx.freshName("nacc"); val j = ctx.freshName("j")
      val norm = ctx.freshName("norm"); val bestCell = ctx.freshName("bestCell")
      val best = ctx.freshName("best"); val c = ctx.freshName("c")
      val w = ctx.freshName("w"); val n2 = ctx.freshName("n2")
      val acc = ctx.freshName("acc"); val i = ctx.freshName("i")
      val den = ctx.freshName("den"); val sim = ctx.freshName("sim")
      val xv = ctx.freshName("xv")
      val ax = if (isDouble) s"$a.getDouble($base + $j)"
               else s"(double) $a.getFloat($base + $j)"
      val m = cells.length
      s"""
         |int $vn = $a.numElements();
         |int[] $out = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $base = $s * $subDim;
         |  int $len = java.lang.Math.max(0,
         |    java.lang.Math.min($subDim, $vn - $base));
         |  double[] $xs = new double[$len];
         |  double $nacc = 0.0;
         |  for (int $j = 0; $j < $len; $j++) {
         |    double $xv = $ax;
         |    $xs[$j] = $xv;
         |    $nacc += $xv * $xv;
         |  }
         |  double $norm = java.lang.Math.sqrt($nacc);
         |  long $bestCell = $cl[$s][0];
         |  double $best = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $cv[$s].length; $c++) {
         |    float[] $w = $cv[$s][$c];
         |    int $n2 = java.lang.Math.min($len, $w.length);
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n2; $i++) {
         |      $acc += $xs[$i] * (double) $w[$i];
         |    }
         |    double $den = $norm * $cn[$s][$c];
         |    if ($den > 0) {
         |      double $sim = $acc / $den;
         |      if ($sim > $best) { $best = $sim; $bestCell = $cl[$s][$c]; }
         |    }
         |  }
         |  $out[$s] = (int) $bestCell;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** ADC table-lookup kernel: Σ_s `left[s·k + right_s]` for a flat
  * `array<double>` lookup table (`left`, laid out subspace-major: slot
  * s·k + c) and an `array<int>` PQ code (`right`, one code per
  * subspace). One expression evaluation replaces the m-term
  * `element_at` chain, whose size pushed the whole scoring stage out of
  * whole-stage codegen into interpreted row-at-a-time evaluation — the
  * round-16 phase bisection measured that fallback at >100 µs/pair. The
  * generated code is a tight primitive loop; accumulation is in
  * ascending-subspace order, matching both the former unrolled chain and
  * the order-insensitive (round-6-before-rank) oracle contract. */
case class LookupSum(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = left.dataType match {
    case ArrayType(DoubleType, _) => right.dataType match {
      case ArrayType(it, _) if it == org.apache.spark.sql.types.IntegerType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"lookup_sum code must be array<int>, got ${t.sql}")
    }
    case t => TypeCheckResult.TypeCheckFailure(
      s"lookup_sum table must be array<double>, got ${t.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val code = b.asInstanceOf[ArrayData]
    val m = code.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += arr.getDouble(s * k + code.getInt(s))
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      s"""
         |int $m = $b.numElements();
         |double ${ev.value}_acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  ${ev.value}_acc += $a.getDouble($s * $k + $b.getInt($s));
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LookupSum =
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

  /** Column-API entry point: Σ_s arr[s·k + code_s] — the ADC table
    * lookup (see [[LookupSum]]). */
  def lookupSum(arr: Column, code: Column, k: Int): Column =
    GraftBridge.column(
      LookupSum(GraftBridge.expression(arr), GraftBridge.expression(code), k))

  /** Column-API entry point: the flat per-query ADC LUT array (see
    * [[AdcLut]]); `cents(s)(c)` = subspace-s centroid for code c (null =
    * dropped cell). */
  def adcLut(qe: Column, cents: Array[Array[Array[Float]]],
             subDim: Int): Column =
    GraftBridge.column(AdcLut(GraftBridge.expression(qe), cents, subDim))

  /** Column-API entry point: all m PQ subspace codes of a vector (see
    * [[PqEncode]]). */
  def pqEncode(vec: Column, cells: Array[Array[Long]],
               cents: Array[Array[Array[Float]]],
               cnorms: Array[Array[Double]], subDim: Int): Column =
    GraftBridge.column(
      PqEncode(GraftBridge.expression(vec), cells, cents, cnorms, subDim))

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
