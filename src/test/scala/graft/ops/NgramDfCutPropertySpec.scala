package graft.ops

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[Dedup.blockedNgramJaccard]] with the `maxShingleDf`
  * stop-shingle cut against a naive in-memory model. Corpora plant a
  * BOILERPLATE 3-shingle shared by most docs of a block (the exact
  * pathology the cut exists for) plus organic near-dup pairs; the model
  * restates the semantics directly — distinct 3-shingles per doc, block
  * document frequency, drop shingles over the cutoff, Jaccard over the
  * survivors — and the Spark plan must agree on every generated corpus
  * and cutoff, including cutoffs that drop nothing and cutoffs that
  * empty whole documents. */
class NgramDfCutPropertySpec extends SparkSuite {

  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta", "iota", "kappa")

  /** Docs: boilerplate prefix (3 fixed tokens = 1 hot shingle + bridge
    * shingles) on ~2/3 of docs, then a random body. Single block. */
  private def corpusGen(n: Int): Gen[Seq[(Long, String)]] =
    Gen.listOfN(n, for {
      boiler <- Gen.frequency(2 -> true, 1 -> false)
      len <- Gen.choose(3, 9)
      body <- Gen.listOfN(len, Gen.oneOf(vocab))
    } yield (if (boiler) Seq("copy", "right", "notice") else Nil) ++ body)
      .map(_.zipWithIndex.map { case (toks, i) =>
        (i.toLong, toks.mkString(" "))
      })

  private def naive(docs: Seq[(Long, String)], minJ: Double,
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
      j = math.floor(inter.toDouble / (s1.size + s2.size - inter)
        * 1e6 + 0.5) / 1e6
      if j >= minJ
    } yield (d1, d2, j)).toSet
  }

  test("df-cut Jaccard matches the naive model across cutoffs, including " +
    "no-op and doc-emptying cuts") {
    for (rep <- 0 until 2; cut <- Seq(1L, 3L, 100L)) {
      val docs = corpusGen(24)
        .pureApply(Gen.Parameters.default, Seed(4200L + rep))
      val df = docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = Dedup.blockedNgramJaccard(df, 0.05, Some(cut)).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val want = naive(docs, 0.05, Some(cut))
      assert(got == want, s"rep=$rep cut=$cut: " +
        s"spark-only=${got -- want} naive-only=${want -- got}")
    }
    // cutoff high enough to drop nothing == the uncut operator
    val docs = corpusGen(24).pureApply(Gen.Parameters.default, Seed(99L))
    val df = docs.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val uncut = Dedup.blockedNgramJaccard(df, 0.05).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val bigCut = Dedup.blockedNgramJaccard(df, 0.05, Some(1000L)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(bigCut == uncut && uncut.nonEmpty)
  }
}
