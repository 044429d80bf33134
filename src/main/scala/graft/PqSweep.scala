package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dial sweep for the PQ family (the IvfSweep pattern): recall@5 of ADC
  * (raw and reranked) vs exact brute force across (m, k, rerank) on the
  * SPARK_GRAFT_SF_DIR embeddings — the measurement behind the committed
  * sim_pq_* gate dials. */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") < 20)
    val exact = graft.ops.Similarity.bruteForceTopK(emb, q, 5)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count()
    for {
      m <- Seq(8, 16)
      k <- Seq(16, 32)
      rerank <- Seq(0, 20, 50)
    } {
      val cb = graft.ops.ProductQuantization.train(emb, m, k, dimHint = Some(64))
      val approx = graft.ops.ProductQuantization
        .adcTopK(emb, q, 5, cb, rerank = rerank)
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(approx, Seq("query_id", "neighbor_id")).count()
      println(f"m=$m%-3d k=$k%-3d rerank=$rerank%-3d recall@5 = ${hit.toDouble / nExact}%.3f")
    }
    // the composed IVF-PQ path: coarse cells bound candidates, ADC ranks.
    // With args: `PqSweep <nLists> <nProbe> <rerank>` measures ONE
    // explicit dial point with median-of-3 wall time — the scale-probe
    // instrument (e.g. nLists=ceil(sqrt(n)) at the 100x corpus).
    val dials: Seq[(Int, Int, Int)] =
      if (args.length == 3) Seq((args(0).toInt, args(1).toInt, args(2).toInt))
      else Seq((16, 4, 0), (16, 4, 50), (16, 6, 0), (16, 6, 50))
    for ((nLists, nProbe, rerank) <- dials) {
      val cb = graft.ops.ProductQuantization.train(emb, 16, 32, dimHint = Some(64))
      def run() = graft.ops.ProductQuantization
        .ivfPqTopK(emb, q, 5, cb, nLists = nLists, nProbe = nProbe,
          rerank = rerank)
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(run(), Seq("query_id", "neighbor_id")).count()
      val times = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        run().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"ivfpq nLists=$nLists%-4d nProbe=$nProbe%-3d rerank=$rerank%-3d " +
        f"recall@5 = ${hit.toDouble / nExact}%.3f  median ${times.sorted.apply(1)}%.2f s")
    }
    spark.stop()
  }
}
