package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind SCALING.md's "nLists ~ √n" IVF guidance:
  * sweeps (nLists, nProbe) over the sf embeddings table and prints, per
  * setting, recall@5 against the exact brute-force top-5 (the
  * sim_ann_ivf_recall protocol: vec_id < 20 query set, micro-averaged)
  * and a median-of-3 wall time of the full ivfTopK query — so the
  * partition-count guidance in the docs is a measured curve, not an
  * assertion. Run: `tools/spark-run.sh graft.IvfSweep [sfDir]`. */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val q = emb.where(col("vec_id") < 20)
    val exact = ops.Similarity.bruteForceTopK(emb, q, 5)
      .select(col("query_id"), col("neighbor_id")).cache()
    val nExact = exact.count() // materialize once; denominator for recall

    println(f"IVF sweep: $sfDir, n=$n vectors, sqrt(n)=${math.sqrt(n.toDouble)}%.0f")
    println(f"${"nLists"}%8s ${"nProbe"}%8s ${"recall@5"}%10s ${"median_s"}%10s  runs")
    for ((nLists, nProbe) <- Seq((16, 4), (32, 4), (64, 4), (64, 16),
      (128, 8), (256, 16), (256, 64))) {
      val approx = ops.Similarity.ivfTopK(emb, q, 5, nLists, nProbe)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("_hit"))
      val nHit = exact.join(approx, Seq("query_id", "neighbor_id"), "left")
        .agg(count(col("_hit"))).head().getLong(0)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        ops.Similarity.ivfTopK(emb, q, 5, nLists, nProbe).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$nLists%8d $nProbe%8d ${nHit.toDouble / nExact}%10.3f " +
        f"${times.sorted.apply(1)}%10.3f  ${times.map(t => f"$t%.2f").mkString(" ")}")
    }
    exact.unpersist()
    spark.stop()
  }
}
