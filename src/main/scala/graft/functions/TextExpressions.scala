package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native text-feature kernels (the VectorDot precedent, one column type
  * over): hashed-bucket histograms for the trained classifiers' scoring
  * paths. */
object TextExpressions {

  /** Per-document hashed-unigram histogram: counts of
    * `hash16(token) % numBuckets` over a token array, one `long[]` per
    * row. Exactly [[HashBucketCounts]]'s contract — see there. */
  def hashBucketCounts(tokens: Column, numBuckets: Int): Column =
    GraftBridge.column(
      HashBucketCounts(GraftBridge.expression(tokens), numBuckets))

  /** Count of code points outside `[a-zA-Z0-9\s]` —
    * `regexp_count(text, '[^a-zA-Z0-9\\s]')` byte-for-byte (see
    * [[AsciiPunctCount]]). */
  def punctCount(text: Column): Column =
    GraftBridge.column(AsciiPunctCount(GraftBridge.expression(text)))
}

/** Single-pass hashed-bucket histogram over a token array: bucket of a
  * token is `conv(substring(md5(t), 1, 4), 16, 10) % numBuckets` — the
  * [[graft.ops.TextAnalysis.hash16]] contract, byte-for-byte (first two
  * md5 bytes as an unsigned 16-bit int), so the DuckDB oracle's replay
  * is untouched.
  *
  * This exists because the declarative formulation — project a per-token
  * bucket array, then `transform(sequence(0, B−1), f -> size(filter(bks,
  * b -> b = f)))` — rescans the token array once PER BUCKET through
  * interpreted higher-order lambdas: O(B·n_tokens) with lambda overhead,
  * measured as the dominant cost of the four trained-classifier scoring
  * rows (the 1st/3rd/7th/10th most expensive bench queries). The kernel
  * is one O(n_tokens) pass inside whole-stage codegen; only the
  * 64-element count array leaves the expression, and the downstream
  * margin/x arithmetic becomes cheap 64-element `zip_with` folds. */
case class HashBucketCounts(child: Expression, numBuckets: Int)
    extends UnaryExpression {

  require(numBuckets > 0 && numBuckets <= 65536,
    s"hash_bucket_counts: numBuckets must be in [1, 65536], got $numBuckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_bucket_counts needs array<string> tokens, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    HashBucketCounts.compute(v.asInstanceOf[ArrayData], numBuckets)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.HashBucketCounts.compute(" +
        s"$a, $numBuckets);")

  override protected def withNewChildInternal(
      newChild: Expression): HashBucketCounts = copy(child = newChild)
}

/** Single-pass count of code points OUTSIDE `[a-zA-Z0-9\s]` — the
  * punctuation-density signal of the quality formula, exactly
  * `regexp_count(text, '[^a-zA-Z0-9\\s]')`: same per-code-point match
  * semantics (Java's `\s` = space/tab/LF/VT/FF/CR; every non-ASCII code
  * point is one match in both formulations — a UTF-8 lead byte counts
  * once, continuation bytes never).
  *
  * This exists because the regex formulation iterates `Matcher.find()`
  * once per punctuation character through the full regex machinery —
  * measured at 25 s of the quality-scoring row's 76 s at the 100×
  * probe, per-row cost proportional to text bytes. The kernel is one
  * branchy byte loop over the raw UTF-8, no allocation, inside
  * whole-stage codegen.
  *
  * PRECONDITION: the input is VALID UTF-8 (what UTF8String carries for
  * any string that entered the engine through a source/literal — Spark
  * normalizes on ingest). On malformed bytes the two formulations
  * diverge by construction: a stray continuation byte (0x80-0xBF with
  * no lead) counts 0 here, while the regex path decodes it to U+FFFD
  * and counts 1; a truncated multi-byte sequence counts its lead byte
  * once here but may surface as several replacement chars there. The
  * kernel's behavior on malformed input (count lead bytes, ignore
  * orphan continuations) is pinned by TextExpressionsSpec's planted
  * invalid-bytes case and is the intended semantics. */
case class AsciiPunctCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ascii_punct_count needs a string, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    AsciiPunctCount.compute(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.AsciiPunctCount.compute($a);")

  override protected def withNewChildInternal(
      newChild: Expression): AsciiPunctCount = copy(child = newChild)
}

object AsciiPunctCount {
  def compute(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val n = s.numBytes
    var cnt = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b < 0x80) {
        val ok = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
          (b >= '0' && b <= '9') || b == ' ' || b == '\t' || b == '\n' ||
          b == 0x0b || b == '\f' || b == '\r'
        if (!ok) cnt += 1
      } else if ((b & 0xc0) == 0xc0) {
        cnt += 1 // lead byte: one non-ASCII code point, always a match
      }
      i += 1
    }
    cnt
  }
}

object HashBucketCounts {
  // MessageDigest is stateful; one per thread, reset by digest()
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** The kernel body — static so generated code calls it directly.
    * NULL array elements count into bucket of the empty string's hash?
    * No: a null token (impossible from `split`, possible from a raw
    * array literal) is SKIPPED, mirroring what the declarative
    * formulation does (md5(NULL) is NULL, the bucket comparison never
    * matches). */
  def compute(arr: ArrayData, numBuckets: Int): ArrayData = {
    val out = new Array[Long](numBuckets)
    val md = md5.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        out(h % numBuckets) += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
