package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The native text kernels against their declarative references: the
  * hashed histogram vs the per-bucket filter scan, and the punct counter
  * vs regexp_count — byte-for-byte on planted and generated strings. */
class TextExpressionsSpec extends SparkSuite {

  import spark.implicits._

  test("hashBucketCounts equals the declarative per-bucket filter scan " +
    "on generated token arrays") {
    val docs = (0L until 50L).map { i =>
      (i, (0 to (i % 7).toInt).map(j => s"tok${(i * 31 + j * 7) % 23}")
        .mkString(" "))
    }.toDF("doc_id", "text")
    val h16 = "cast(conv(substring(md5(t), 1, 4), 16, 10) as bigint)"
    val rows = docs
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("_t"))
      .select(col("doc_id"),
        TextExpressions.hashBucketCounts(col("_t"), 64).as("fast"),
        expr(s"transform(_t, t -> cast($h16 % 64 as int))").as("_bks"))
      .select(col("doc_id"), col("fast"),
        expr("transform(sequence(0, 63), f -> " +
          "cast(size(filter(_bks, b -> b = f)) as bigint))").as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"histogram mismatch for doc ${r.getLong(0)}")
    }
  }

  test("hashBucketCounts skips null tokens (the md5(NULL) semantics) " +
    "and counts empty strings") {
    val df = Seq(Tuple1(Seq[String](null, "", "a", "", null)))
      .toDF("toks")
    val fast = df.select(
      TextExpressions.hashBucketCounts(col("toks"), 8)).collect()
      .head.getSeq[Long](0)
    assert(fast.sum == 3L, "two nulls skipped, three tokens counted")
  }

  test("punctCount equals regexp_count on planted strings including " +
    "unicode, control whitespace, and empty text") {
    val samples = Seq(
      "", "abc XYZ 019", "a,b.c!d?e", ",,,", "tab\tnl\nvtff\fcr\r",
      "mixed: 42% of $10, плюс юникод é ü 漢字!", "  spaces  ",
      "newline\n\n\npile", "control", "emoji 😀 end")
    val df = samples.zipWithIndex.map(_.swap).toDF("id", "text")
    val rows = df.select(col("id"),
      TextExpressions.punctCount(col("text")).as("fast"),
      regexp_count(col("text"), lit("[^a-zA-Z0-9\\s]")).cast("long")
        .as("slow")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"punct mismatch on ${samples(r.getInt(0))}: " +
          s"fast=${r.getLong(1)} regex=${r.getLong(2)}")
    }
  }

  test("punctCount on INVALID UTF-8 pins the documented malformed-bytes " +
    "semantics: orphan continuation bytes count 0, a truncated lead " +
    "counts once (the regex path would see U+FFFD replacements instead)") {
    import org.apache.spark.unsafe.types.UTF8String
    // orphan continuation byte: not a lead, not ASCII -> ignored
    assert(AsciiPunctCount.compute(
      UTF8String.fromBytes(Array[Byte]('a', 0x80.toByte, 'b'))) == 0L)
    // truncated 2-byte sequence: the lead byte counts one code point
    assert(AsciiPunctCount.compute(
      UTF8String.fromBytes(Array[Byte]('a', 0xC3.toByte))) == 1L)
    // valid 2-byte char for contrast: still exactly one
    assert(AsciiPunctCount.compute(
      UTF8String.fromBytes("é".getBytes("UTF-8"))) == 1L)
  }
}
