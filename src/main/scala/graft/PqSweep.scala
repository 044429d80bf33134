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
    // the composed IVF-PQ path: coarse cells bound candidates, ADC ranks
    for {
      nProbe <- Seq(4, 6)
      rerank <- Seq(0, 50)
    } {
      val cb = graft.ops.ProductQuantization.train(emb, 16, 32, dimHint = Some(64))
      val approx = graft.ops.ProductQuantization
        .ivfPqTopK(emb, q, 5, cb, nLists = 16, nProbe = nProbe, rerank = rerank)
        .select(col("query_id"), col("neighbor_id"))
      val hit = exact.join(approx, Seq("query_id", "neighbor_id")).count()
      println(f"ivfpq nProbe=$nProbe%-2d rerank=$rerank%-3d recall@5 = ${hit.toDouble / nExact}%.3f")
    }
    spark.stop()
  }
}
