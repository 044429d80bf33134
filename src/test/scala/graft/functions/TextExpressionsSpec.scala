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

  test("tokenHashFeatures equals the declarative split+hash+filter " +
    "formulation cell-for-cell on planted strings (whitespace edges, " +
    "unicode case, empty text)") {
    val markers = Seq(Seq("the", "a", "of"), Seq("und", "der"))
    val samples = Seq(
      "", "the quick brown fox", "  leading and trailing  ",
      "tabs\tand\nnewlines\f\rmixed", "\t", "a", "the the THE tHe",
      "Der UND der Straße", "İstanbul I İ ß MASSE", "punct, only! here?",
      "multi   space   runs", "trailing tab\t", "\nleading newline",
      "ünïcödé wörds ÜNÏCÖDÉ WÖRDS", "a b c d e f g h i j the of")
    val df = samples.zipWithIndex.map(_.swap).toDF("id", "text")
    val B = 16
    val h16 = "cast(conv(substring(md5(t), 1, 4), 16, 10) as bigint)"
    val rows = df
      .select(col("id"), col("text"),
        TextExpressions.tokenHashFeatures(col("text"), B, markers)
          .as("fast"),
        split(lower(trim(col("text"))), "\\s+").as("_t"))
      .select(col("id"), col("fast"),
        expr(s"transform(_t, t -> cast($h16 % $B as int))").as("_bks"),
        size(col("_t")).cast("long").as("n"),
        expr("cast(size(filter(_t, t -> t in ('the', 'a', 'of'))) as long)")
          .as("g0"),
        expr("cast(size(filter(_t, t -> t in ('und', 'der'))) as long)")
          .as("g1"))
      .select(col("id"), col("fast"),
        expr(s"concat(transform(sequence(0, ${B - 1}), f -> " +
          "cast(size(filter(_bks, b -> b = f)) as bigint)), " +
          "array(n, g0, g1))").as("slow"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"feature mismatch on ${samples(r.getInt(0))}: " +
          s"fast=${r.getSeq[Long](1)} slow=${r.getSeq[Long](2)}")
    }
  }

  test("tokenHashFeatures marker-only mode (numBuckets = 0) returns " +
    "[total, group counts...] and matches size/markerCount semantics") {
    val df = Seq((0, "The Cat and the Hat"), (1, ""), (2, " \t "))
      .toDF("id", "text")
    val rows = df.select(col("id"),
      TextExpressions.tokenHashFeatures(col("text"), 0,
        Seq(Seq("the", "and"))).as("f"),
      size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"),
      expr("cast(size(filter(split(lower(trim(text)), '\\\\s+'), " +
        "t -> t in ('the', 'and'))) as long)").as("g"))
      .collect()
    rows.foreach { r =>
      val f = r.getSeq[Long](1)
      assert(f.length == 2, s"marker-only layout must be 2 cells: $f")
      assert(f(0) == r.getLong(2) && f(1) == r.getLong(3),
        s"row ${r.getInt(0)}: fast=$f n=${r.getLong(2)} g=${r.getLong(3)}")
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
