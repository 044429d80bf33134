package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the [[graft.functions.VectorMean]] primitive-buffer
  * aggregate against an in-memory model: random ragged float-vector groups
  * (dims 0–8, values spanning sign/magnitude, null vectors mixed in) must
  * produce exactly the per-dimension mean over the rows that HAVE each
  * dimension — the posexplode+avg semantics the kernel replaced — and the
  * result must be invariant to the partition layout (1, 3, or 8 partitions:
  * different update/merge split points through the same buffer math). */
class VectorMeanPropertySpec extends SparkSuite {

  import spark.implicits._
  import graft.functions.VectorExpressions.vecMean

  private def rowsGen(n: Int): Gen[List[(Long, Option[List[Float]])]] =
    Gen.listOfN(n, for {
      cell <- Gen.choose(0L, 4L)
      dims <- Gen.choose(0, 8)
      vec <- Gen.option(Gen.listOfN(dims,
        Gen.oneOf(Gen.choose(-1000f, 1000f), Gen.oneOf(0f, -0f, 1e-30f, 3e7f))))
    } yield (cell, vec))

  /** The model: per cell, per dim, mean over rows long enough to have it.
    * A cell that contributed no dimensions at all (no vectors, or only
    * zero-length ones) is NULL — the buffer never grew. */
  private def model(rows: Seq[(Long, Option[List[Float]])])
      : Map[Long, Option[List[Double]]] =
    rows.groupBy(_._1).map { case (cell, rs) =>
      val vecs = rs.flatMap(_._2)
      val width = if (vecs.isEmpty) 0 else vecs.map(_.length).max
      cell -> (if (width == 0) None
      else Some((0 until width).map { i =>
        val xs = vecs.filter(_.length > i).map(_(i).toDouble)
        xs.sum / xs.length
      }.toList))
    }

  test("vecMean equals the per-dim ragged mean model at every partition " +
    "layout, within double-fold reorder tolerance") {
    for (rep <- 0 until 5) {
      val rows = rowsGen(60)
        .apply(Gen.Parameters.default, Seed(1234L + rep)).get
      val expected = model(rows)
      for (parts <- Seq(1, 3, 8)) {
        val df = rows.toDF("cell", "embedding").repartition(parts)
        val got = df.groupBy("cell").agg(vecMean($"embedding").as("m"))
          .collect()
          .map(r => r.getLong(0) -> Option(r.getSeq[Double](1)).map(_.toList))
          .toMap
        assert(got.keySet == expected.keySet, s"rep=$rep parts=$parts")
        for ((cell, exp) <- expected) {
          (got(cell), exp) match {
            case (None, None) =>
            case (Some(g), Some(e)) =>
              assert(g.length == e.length, s"rep=$rep parts=$parts cell=$cell")
              // partial-merge order differs across layouts; doubles summed
              // in a different order agree to relative 1e-12 here
              g.zip(e).zipWithIndex.foreach { case ((gv, ev), i) =>
                assert(math.abs(gv - ev) <= 1e-9 * math.max(1.0, math.abs(ev)),
                  s"rep=$rep parts=$parts cell=$cell dim=$i: $gv vs $ev")
              }
            case (g, e) =>
              fail(s"rep=$rep parts=$parts cell=$cell: $g vs $e")
          }
        }
      }
    }
  }

  test("groups that contribute no dimensions — all-null OR only empty " +
    "vectors — yield NULL (posexplode of nothing emitted no rows)") {
    val df = Seq(
      (0L, Some(List.empty[Float])), (0L, Some(List.empty[Float])),
      (1L, None), (1L, None),
      (2L, Some(List(2.0f)))
    ).toDF("cell", "embedding")
    val got = df.groupBy("cell").agg(vecMean($"embedding").as("m"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    assert(got(0L).isEmpty && got(1L).isEmpty)
    assert(got(2L).contains(Seq(2.0)))
  }
}
