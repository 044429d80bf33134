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

  /** Tokenize + hash + bucket + marker-count RAW TEXT in one fused pass —
    * see [[TokenHashFeatures]]. Returns `array<long>` of
    * `numBuckets + 1 + markerGroups.size` cells:
    * `[0, numBuckets)` the hashed-unigram histogram, `[numBuckets]` the
    * total token count, then one token count per marker group. */
  def tokenHashFeatures(text: Column, numBuckets: Int,
                        markerGroups: Seq[Seq[String]]): Column =
    GraftBridge.column(TokenHashFeatures(
      GraftBridge.expression(text), numBuckets, markerGroups))
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

/** The fused scoring front-end of the trained classifiers: whitespace
  * tokenization, per-token md5-prefix hashing, bucket counting, total
  * token count, and marker-set counting in ONE pass over the raw UTF-8
  * bytes — semantically exactly
  * `_t = split(lower(trim(text)), "\\s+")` followed by
  * `hash_bucket_counts(_t, B)` + `size(_t)` +
  * `size(filter(_t, t -> t IN group_g))` per group, byte-for-byte (the
  * equivalence is pinned in TextExpressionsSpec), so every DuckDB oracle
  * replay is untouched.
  *
  * Output layout (`array<long>`, length `numBuckets + 1 + nGroups`):
  * cells `[0, B)` = histogram of `hash16(token) % B`; cell `[B]` = total
  * token count; cell `[B + 1 + g]` = tokens equal to any marker of group
  * g (multiplicity preserved). `numBuckets = 0` is the marker-only mode:
  * the layout collapses to `[total, group counts...]` and the md5 per
  * token is SKIPPED entirely (the label-rule consumers need counts, not
  * buckets).
  *
  * This exists because the two-step formulation — materialize the token
  * array with the `split` regex, then run [[HashBucketCounts]] over it —
  * pays regex machinery plus a Catalyst array allocation per row before
  * the histogram pass ever starts; SCALING.md's 100× probes put that
  * front-end (tokenizer + md5-per-token) at the dominant remaining cost
  * of the trained-classifier scoring rows. Tokenization here is a branchy
  * byte scan (Java `\s+` split semantics exactly: separators are the six
  * ASCII whitespace bytes, `Pattern.split(-1)` keeps leading/trailing
  * empty tokens, `""` yields one empty token); the token bytes are hashed
  * in place — no token array, no per-token UTF8String, nothing but the
  * fixed-size count array leaves the expression. */
case class TokenHashFeatures(child: Expression, numBuckets: Int,
    markerGroups: Seq[Seq[String]]) extends UnaryExpression {

  require(numBuckets >= 0 && numBuckets <= 65536,
    s"token_hash_features: numBuckets must be in [0, 65536], got $numBuckets")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_hash_features needs a string, got ${t.sql}")
  }

  @transient private lazy val groupBytes: Array[Array[Array[Byte]]] =
    markerGroups.map(_.map(
      _.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray).toArray

  override def nullSafeEval(v: Any): Any =
    TokenHashFeatures.compute(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      numBuckets, groupBytes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("markerGroups", groupBytes, "byte[][][]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TokenHashFeatures.compute(" +
        s"$a, $numBuckets, $ref);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): TokenHashFeatures = copy(child = newChild)
}

object TokenHashFeatures {
  // shared with HashBucketCounts: one per-thread MessageDigest serves
  // both kernels (identical hash-prefix contract)
  private def md5 = HashBucketCounts.md5

  /** Java-regex `\s`: the six ASCII whitespace bytes. Multi-byte code
    * points can never alias them (UTF-8 continuation/lead bytes are all
    * >= 0x80), so byte comparison IS code-point comparison here. */
  private def isSep(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(s0: org.apache.spark.unsafe.types.UTF8String, numBuckets: Int,
              groups: Array[Array[Array[Byte]]]): ArrayData = {
    // same trim-then-lower order as split(lower(trim(text)), ...): trim
    // strips 0x20 only; UTF8String.toLowerCase is the Lower expression's
    // own code path, so case mapping can never drift from the oracle
    val bytes = s0.trim().toLowerCase().getBytes
    val n = bytes.length
    val out = new Array[Long](numBuckets + 1 + groups.length)
    val md = if (numBuckets > 0) md5.get() else null

    def emit(start: Int, end: Int): Unit = {
      if (numBuckets > 0) {
        md.update(bytes, start, end - start)
        val d = md.digest() // digest() resets the instance
        val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        out(h % numBuckets) += 1
      }
      out(numBuckets) += 1
      var g = 0
      while (g < groups.length) {
        val ms = groups(g)
        var k = 0
        var found = false
        while (!found && k < ms.length) {
          val m = ms(k)
          if (m.length == end - start) {
            var j = 0
            while (j < m.length && m(j) == bytes(start + j)) j += 1
            found = j == m.length
          }
          k += 1
        }
        if (found) out(numBuckets + 1 + g) += 1
        g += 1
      }
    }

    // Pattern.split(regex, -1) semantics: "" -> one empty token; a
    // leading separator run -> empty first token; a trailing run ->
    // empty last token; interior runs are single boundaries
    if (n == 0) emit(0, 0)
    else {
      if (isSep(bytes(0))) emit(0, 0)
      var i = 0
      while (i < n) {
        while (i < n && isSep(bytes(i))) i += 1
        if (i < n) {
          val st = i
          while (i < n && !isSep(bytes(i))) i += 1
          emit(st, i)
        } else emit(0, 0) // the string ended inside a separator run
      }
    }
    new GenericArrayData(out)
  }
}

object HashBucketCounts {
  // MessageDigest is stateful; one per thread, reset by digest().
  // Shared by TokenHashFeatures (same hash-prefix contract).
  private[functions] val md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](
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
