package graft.ops

import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: the exact-substring family ([[Dedup.substringRuns]] /
  * [[Dedup.substringRemove]]) against a naive in-memory model. The model
  * restates the semantics directly — walk every (pair, diagonal), collect
  * MAXIMAL runs of consecutive token equality, keep those >= k; removal
  * marks each run's d2-side span, merges overlapping spans per doc, and
  * cuts them out — while the operator gets there through window-hash
  * anchors, a gaps-and-islands window, and span verification. A tiny
  * vocabulary makes coincidental >= k-token matches plentiful (stressing
  * the islands merge far beyond the planted phrase), and ~half the docs
  * additionally embed a fixed 6-token phrase at a random offset so dense
  * cross-partner overlaps exercise the removal's interval merge. */
class SubstringPropertySpec extends SparkSuite {

  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "d", "e")
  private val phrase = Vector("p0", "p1", "p2", "p3", "p4", "p5")

  private def corpusGen(n: Int): Gen[Seq[(Long, String)]] =
    Gen.listOfN(n, for {
      plant <- Gen.frequency(1 -> true, 1 -> false)
      len <- Gen.choose(4, 14)
      body <- Gen.listOfN(len, Gen.oneOf(vocab))
      at <- Gen.choose(0, len)
    } yield
      if (plant) body.take(at) ++ phrase ++ body.drop(at) else body)
      .map(_.zipWithIndex.map { case (toks, i) =>
        (i.toLong, toks.mkString(" "))
      })

  private def toks(t: String): Vector[String] =
    t.trim.toLowerCase.split("\\s+").toVector

  /** All maximal >= k-token shared runs per (pair, diagonal):
    * (d1, d2, d1_pos, d2_pos, run_tokens). */
  private def naiveRuns(docs: Seq[(Long, String)], k: Int)
      : Set[(Long, Long, Long, Long, Long)] = {
    val m = docs.map { case (id, t) => id -> toks(t) }.toMap
    (for {
      (d1, t1) <- m.toSeq; (d2, t2) <- m.toSeq if d1 < d2
      diag <- -(t2.length - 1) to (t1.length - 1) // p1 - p2
      run <- {
        val runs = collection.mutable.ArrayBuffer.empty[(Int, Int, Int)]
        var cur: Option[(Int, Int, Int)] = None
        for (p2 <- 0 until t2.length; p1 = p2 + diag
             if p1 >= 0 && p1 < t1.length) {
          if (t1(p1) == t2(p2)) cur = cur match {
            case Some((a, b, l)) => Some((a, b, l + 1))
            case None => Some((p1, p2, 1))
          }
          else { cur.foreach(runs += _); cur = None }
        }
        cur.foreach(runs += _)
        runs.filter(_._3 >= k)
      }
    } yield (d1, d2, run._1.toLong, run._2.toLong, run._3.toLong)).toSet
  }

  /** Removal model: merge each doc's d2-side spans, cut, rejoin. */
  private def naiveRemove(docs: Seq[(Long, String)], k: Int)
      : Map[Long, (Long, String)] = {
    val spans = naiveRuns(docs, k).toSeq
      .map { case (_, d2, _, p2, len) => d2 -> ((p2, p2 + len)) }
      .groupMap(_._1)(_._2)
    docs.map { case (id, t) =>
      val tk = toks(t)
      val cut = spans.getOrElse(id, Nil).toSet
      val kept = tk.zipWithIndex.collect {
        case (tok, i) if !cut.exists(s => i >= s._1 && i < s._2) => tok
      }
      id -> ((tk.length - kept.length).toLong, kept.mkString(" "))
    }.toMap
  }

  test("substringRuns matches the naive maximal-run model on dense " +
    "small-vocabulary corpora (coincidental runs + planted phrase)") {
    for (rep <- 0 until 3) {
      val docs = corpusGen(12)
        .pureApply(Gen.Parameters.default, Seed(1700L + rep))
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.substringRuns(df, kTokens = 4).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      val want = naiveRuns(docs, 4)
      assert(got == want, s"rep=$rep: spark-only=${got -- want} " +
        s"naive-only=${want -- got}")
    }
  }

  test("substringRemove matches the naive mark-merge-cut model: " +
    "per-doc removed counts and cleaned texts agree exactly") {
    for (rep <- 0 until 3) {
      val docs = corpusGen(12)
        .pureApply(Gen.Parameters.default, Seed(2900L + rep))
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.substringRemove(df, kTokens = 4).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      val want = naiveRemove(docs, 4).view.mapValues { case (n, txt) =>
        (n, org.apache.commons.codec.digest.DigestUtils.md5Hex(txt))
      }.toMap
      assert(got == want, s"rep=$rep: " +
        s"mismatches=${got.keySet.filter(k => got(k) != want(k))}")
    }
  }
}
