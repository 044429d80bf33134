package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the sampling family against naive in-memory models:
  * token-budget packing (prefix-sum bucketing semantics, including docs
  * larger than the whole budget), per-source quota capping (longest-first
  * keep with deterministic ties), and the refresh-stability contract of
  * salted-hash split assignment — growing the corpus must never move a
  * previously-assigned document to a different split. */
class SamplingPropertySpec extends SparkSuite {

  import spark.implicits._

  private val langGen = Gen.oneOf("en", "de", "es")
  private val srcGen = Gen.oneOf("s0", "s1", "s2")

  /** (doc_id, lang, source, nTokens) — text is nTokens dummy tokens. */
  private def corpusGen(n: Int): Gen[Seq[(Long, String, String, Int)]] =
    Gen.listOfN(n, for {
      lang <- langGen; src <- srcGen; ntok <- Gen.choose(1, 30)
    } yield (lang, src, ntok)).map(_.zipWithIndex.map {
      case ((l, s, t), i) => (i.toLong, l, s, t)
    })

  private def toDf(c: Seq[(Long, String, String, Int)]) =
    c.map { case (id, lang, src, ntok) =>
      val text = Seq.fill(ntok)("tok").mkString(" ")
      (id, text, lang, src, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("packByTokenBudget matches the naive prefix-sum model across " +
    "budgets, including single-doc overflow packs") {
    for {
      budget <- Seq(1L, 7L, 32L, 1000L)
      rep <- 0 until 2
    } {
      val corpus = corpusGen(40)
        .pureApply(Gen.Parameters.default, Seed(7000L * budget + rep))
      val naive: Map[(String, Long), (Long, Long)] = corpus
        .groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
          var pre = 0L
          ds.sortBy(_._1).map { case (_, _, _, ntok) =>
            val packId = pre / budget
            pre += ntok
            ((lang, packId), ntok.toLong)
          }
        }.groupBy(_._1)
        .map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_._2).sum)) }
      val got = Sampling.packByTokenBudget(toDf(corpus), budget).collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("pack_tokens")))).toMap
      assert(got == naive, s"budget=$budget rep=$rep")
      // prefix-sum contract: each lang's packs start at id 0 (pre starts
      // at 0). Ids may legitimately skip when one doc exceeds the budget.
      got.keys.groupBy(_._1).foreach { case (lang, ks) =>
        assert(ks.map(_._2).min == 0L, s"no pack 0 for $lang")
      }
    }
  }

  test("quotaCap matches the naive longest-first model with deterministic " +
    "ties") {
    for (perSource <- Seq(1, 3, 10); rep <- 0 until 2) {
      val corpus = corpusGen(35)
        .pureApply(Gen.Parameters.default, Seed(9000L * perSource + rep))
      val df = toDf(corpus)
      val naive = corpus
        .map { case (id, _, src, ntok) => (id, src, ("tok " * ntok).trim.length.toLong) }
        .groupBy(_._2).toSeq.flatMap { case (_, ds) =>
          ds.sortBy { case (id, _, len) => (-len, id) }
            .take(perSource).zipWithIndex
            .map { case ((id, src, len), i) => (id, src, len, i.toLong + 1) }
        }.map { case (id, src, len, rk) => id -> ((src, len, rk)) }.toMap
      val got = Sampling.quotaCap(df, perSource).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("source"), r.getAs[Long]("n_chars"),
            r.getAs[Long]("rk")))).toMap
      assert(got == naive, s"perSource=$perSource rep=$rep")
    }
  }

  test("assignSplit and stratifiedSample are refresh-stable: growing the " +
    "corpus never changes an existing document's assignment") {
    val small = corpusGen(30).pureApply(Gen.Parameters.default, Seed(1L))
    val extra = corpusGen(60).pureApply(Gen.Parameters.default, Seed(2L))
      .map { case (id, l, s, t) => (id + 1000L, l, s, t) } // disjoint ids
    val grown = small ++ extra
    def splits(c: Seq[(Long, String, String, Int)]) =
      Sampling.assignSplit(toDf(c)).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    def strat(c: Seq[(Long, String, String, Int)]) =
      Sampling.stratifiedSample(toDf(c), Map("en" -> 50, "de" -> 25), 10)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    val before = splits(small)
    val after = splits(grown)
    assert(before.forall { case (id, s) => after(id) == s })
    val keptBefore = strat(small)
    val keptAfter = strat(grown)
    val smallIds = small.map(_._1).toSet
    assert((keptAfter & smallIds) == keptBefore) // same survivors among old docs
  }
}
