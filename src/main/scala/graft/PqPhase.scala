package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase decomposition for the PQ search paths — the instrument behind
  * the round-16 ADC rewrite: times codebook training (driver collect),
  * code materialization, and each composed search separately, so a
  * wall-time gap can be attributed to a phase instead of guessed at.
  * (This is how the explode→LUT-join→partial-agg pipeline and the
  * m-kernel encode's codegen bloat were isolated; see SCALING.md round
  * 16.) Run: `SPARK_GRAFT_SF_DIR=... tools/spark-run.sh graft.PqPhase`. */
object PqPhase {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") < 20)
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache(); r
    }
    val cb = timed("train") {
      graft.ops.ProductQuantization.train(emb, 16, 32, dimHint = Some(64))
    }
    val codes = timed("encode.localCheckpoint") {
      graft.ops.ProductQuantization.encode(emb, cb)
        .select(col("vec_id"), col("pq_code")).localCheckpoint()
    }
    timed("adcSearch(stored codes)") {
      graft.ops.ProductQuantization.adcSearch(codes, cb, q, 5).count()
    }
    timed("adcTopK(in-plan encode)") {
      graft.ops.ProductQuantization.adcTopK(emb, q, 5, cb).count()
    }
    timed("ivfPqTopK(given cb)") {
      graft.ops.ProductQuantization.ivfPqTopK(emb, q, 5, cb).count()
    }
    timed("ivfPqResidualTopK(total)") {
      graft.ops.ProductQuantization
        .ivfPqResidualTopK(emb, q, 5, dimHint = Some(64)).count()
    }
  }
}
