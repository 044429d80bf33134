package graft.ops

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[Dedup.blockedContainment]] with the `maxShingleDf`
  * stop-shingle cut against a naive in-memory model — the
  * [[NgramDfCutPropertySpec]] harness with the min-size denominator.
  * Corpora plant a BOILERPLATE 3-shingle shared by most docs of a block
  * (the hot-key pathology the cut exists for) plus organic near-dup
  * pairs; the model restates the semantics directly — distinct
  * 3-shingles per doc, block document frequency, drop shingles over the
  * cutoff, containment |A∩B| / min(|A|,|B|) over the survivors — and
  * the Spark plan must agree on every generated corpus and cutoff,
  * including cutoffs that drop nothing and cutoffs that empty whole
  * documents. A planted all-hot fixture additionally shows the cut
  * BOUNDING the candidate pair count: n docs sharing only one viral
  * shingle pair quadratically uncut and not at all once it is cut. */
class ContainmentDfCutPropertySpec extends SparkSuite {

  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  private def corpusGen(n: Int): Gen[Seq[(Long, String)]] =
    Gen.listOfN(n, for {
      boiler <- Gen.frequency(2 -> true, 1 -> false)
      len <- Gen.choose(3, 9)
      body <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield (if (boiler) Seq("copy", "right", "notice") else Nil) ++ body)
      .map(_.zipWithIndex.map { case (toks, i) =>
        (i.toLong, toks.mkString(" "))
      })

  private def naive(docs: Seq[(Long, String)], minC: Double,
                    cut: Option[Long]): Set[(Long, Long, Double)] = {
    def shingles(t: String): Set[String] = {
      val toks = t.trim.toLowerCase.split("\\s+").toVector
      (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
    }
    val all = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val df = all.values.toSeq.flatten.groupBy(identity).map {
      case (sh, occ) => sh -> occ.size.toLong
    }
    val kept = cut match {
      case Some(k) => all.view.mapValues(_.filter(df(_) <= k)).toMap
      case None => all
    }
    (for {
      (d1, s1) <- kept.toSeq; (d2, s2) <- kept.toSeq if d1 < d2
      inter = (s1 & s2).size
      if inter > 0 // inter-driven path: zero-overlap pairs never enumerated
      c = math.floor(inter.toDouble / math.min(s1.size, s2.size)
        * 1e6 + 0.5) / 1e6
      if c >= minC
    } yield (d1, d2, c)).toSet
  }

  private def toDf(docs: Seq[(Long, String)]) =
    docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("df-cut containment matches the naive model across cutoffs, " +
    "including no-op and doc-emptying cuts") {
    for (rep <- 0 until 2; cut <- Seq(1L, 3L, 100L)) {
      val docs = corpusGen(24)
        .pureApply(Gen.Parameters.default, Seed(7200L + rep))
      val got = Dedup.blockedContainment(toDf(docs), 0.05, Some(cut))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = naive(docs, 0.05, Some(cut))
      assert(got == want, s"rep=$rep cut=$cut: " +
        s"spark-only=${got -- want} naive-only=${want -- got}")
    }
    // cutoff high enough to drop nothing == the uncut operator
    val docs = corpusGen(24).pureApply(Gen.Parameters.default, Seed(77L))
    val uncut = Dedup.blockedContainment(toDf(docs), 0.05).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bigCut = Dedup.blockedContainment(toDf(docs), 0.05, Some(1000L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bigCut == uncut && uncut.nonEmpty)
  }

  test("planted hot shingle: the cut bounds the candidate pair count " +
    "(quadratic uncut, zero once the viral shingle is dropped)") {
    val n = 20
    // every doc: the same viral shingle + 3 doc-unique tokens (unique
    // shingles overlap nowhere), so EVERY pair shares exactly the hot
    // shingle and nothing else.
    val docs = (0L until n.toLong).map { i =>
      (i, s"hot viral shingle u${i}a u${i}b u${i}c")
    }
    val uncut = Dedup.blockedContainment(toDf(docs), 0.001).collect()
    assert(uncut.length == n * (n - 1) / 2,
      s"expected quadratic pairs uncut, got ${uncut.length}")
    val cut = Dedup.blockedContainment(toDf(docs), 0.001, Some(2L)).collect()
    assert(cut.isEmpty,
      s"hot shingle (df=$n > 2) should be stop-cut; got ${cut.length} pairs")
  }
}
