package graft.ops

import graft.SparkSuite
import org.apache.commons.codec.digest.DigestUtils
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test: [[Curation.chunkDedup]] against a naive in-memory model,
  * across chunk widths and the boundary shapes that matter — documents
  * shorter than one chunk, exact chunk multiples, ragged tails, exact
  * full-document duplicates, and within-document repeats. The model
  * re-states the semantics directly (first (doc_id, chunk_id) occurrence
  * owns a cross-document chunk; single-document chunks always survive);
  * the Spark plan must agree on every generated corpus. */
class ChunkDedupPropertySpec extends SparkSuite {

  import spark.implicits._

  /** The semantics, stated naively: tokenize like TextAnalysis.tokens
    * (lower, trim, split on whitespace), chunk into `w`-token groups,
    * keep a chunk occurrence iff its chunk lives in only one document OR
    * this occurrence is the (doc_id, chunk_id)-minimal one. */
  private def naiveModel(docs: Seq[(Long, String)],
                         w: Int): Map[Long, (Long, Long, String)] = {
    val chunks: Seq[(Long, Vector[String])] = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toVector
        .grouped(w).map(_.mkString(" ")).toVector
    }
    val byChunk = (for { (id, cs) <- chunks; (c, i) <- cs.zipWithIndex }
      yield (c, id, i)).groupBy(_._1)
    chunks.map { case (id, cs) =>
      val kept = cs.zipWithIndex.filter { case (c, i) =>
        val g = byChunk(c)
        g.map(_._2).distinct.size == 1 ||
          g.map(x => (x._2, x._3)).min == ((id, i))
      }
      id -> ((cs.size.toLong, kept.size.toLong,
        DigestUtils.md5Hex(kept.map(_._1).mkString(" "))))
    }.toMap
  }

  // Small token alphabet so cross-document chunk collisions are common.
  private val tokenGen = Gen.oneOf((0 until 6).map(i => s"t$i"))
  private def docGen(minLen: Int, maxLen: Int): Gen[String] = for {
    n <- Gen.choose(minLen, maxLen)
    ts <- Gen.listOfN(n, tokenGen)
  } yield ts.mkString(" ")

  /** 7 docs: four random (ragged lengths up to 3 chunks + tail), one
    * exact full copy of a random earlier doc, one exact-multiple doc
    * (length == 2w), one shorter-than-a-chunk doc. */
  private def corpusGen(w: Int): Gen[Seq[(Long, String)]] = for {
    base <- Gen.listOfN(4, docGen(1, 3 * w + 2))
    dupOf <- Gen.choose(0, 3)
    exactMult <- docGen(2 * w, 2 * w)
    short <- docGen(1, math.max(1, w - 1))
  } yield (base :+ base(dupOf) :+ exactMult :+ short)
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("chunkDedup matches the naive model across widths, boundary " +
    "lengths and full-document duplicates") {
    for {
      w <- Seq(1, 2, 3, 7, 10)
      rep <- 0 until 3
    } {
      val corpus = corpusGen(w)
        .pureApply(Gen.Parameters.default, Seed(1000L * w + rep))
      val df = corpus.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
      val got = Curation.chunkDedup(df, w).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"),
            r.getAs[String]("clean_md5")))).toMap
      val want = naiveModel(corpus, w)
      assert(got == want, s"mismatch at w=$w rep=$rep corpus=$corpus")
    }
  }
}
