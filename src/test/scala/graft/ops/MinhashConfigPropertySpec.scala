package graft.ops

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Properties of the parameterized MinHash banding (the production
  * bands/hashes dial): exact duplicates are candidates at EVERY
  * configuration (identical shingle sets ⇒ identical signatures ⇒ every
  * band collides — a theorem, not a tuning outcome), and the folded-key
  * encoding at the default configuration reproduces the legacy (h1, h2)
  * candidate set. */
class MinhashConfigPropertySpec extends SparkSuite {

  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs " +
    "far away while the cat sleeps near the warm fire in the old house"
  private val nearDup = base.replace("cat", "kitten")
  private val unrelated = "completely different content about spark query " +
    "engines processing massive distributed datasets with columnar storage"

  private def docsDf = Seq(
    (0L, base), (1L, base), (2L, nearDup), (3L, unrelated))
    .map { case (i, t) => (i, t, "en", "s", t.length.toLong) }
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact duplicates are candidates at every (hashes, bands) config") {
    for ((h, b) <- Seq((8, 4), (16, 8), (16, 4), (32, 8), (8, 1))) {
      val cand = pairs(Dedup.minhashCandidates(docsDf, h, b))
      assert(cand.contains((0L, 1L)), s"exact dup lost at ($h hashes, $b bands)")
    }
  }

  test("folded-key banding at the default (8, 4) config reproduces the " +
    "legacy (h1, h2) candidate set on real data (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val legacy = pairs(Dedup.minhashCandidates(docs))
    val folded = pairs(Dedup.minhashCandidates(docs, 8, 4))
    assert(folded == legacy && legacy.nonEmpty)
  }

  test("wide config (16, 8) still surfaces the near dup, never the " +
    "unrelated doc, and verified jaccard matches the default path's") {
    val wide = Dedup.minhashLshPairs(docsDf, 16, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(wide.get((0L, 1L)).contains(1.0))
    assert(wide.contains((0L, 2L))) // near dup caught at 16/8 too
    assert(!wide.keys.exists { case (_, d2) => d2 == 3L })
    val default = Dedup.minhashLshPairs(docsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard"))
      .toMap
    // jaccard is a property of the pair, not of the banding config
    for ((k, j) <- wide if default.contains(k)) assert(default(k) == j)
  }

  test("4-hash bands (higher precision per collision) keep the exact dup " +
    "and exclude the unrelated doc on the fixture") {
    val precise = pairs(Dedup.minhashCandidates(docsDf, 16, 4)) // 4 per band
    assert(precise.contains((0L, 1L))) // theorem: identical docs collide
    assert(!precise.exists { case (_, d2) => d2 == 3L })
  }

  test("invalid banding configs are rejected loudly") {
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashCandidates(docsDf, 8, 3) // 3 does not divide 8
    }
    assert(e.getMessage.contains("bands"))
  }
}
