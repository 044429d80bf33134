package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** A/B the native VectorDot kernel vs the HOF fold on the same pair join. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val pairs = e.as("a").join(e.as("b"),
      col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))

    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      for (round <- 1 to 3) {
        val t0 = System.nanoTime()
        val s = pairs.select(sum(c)).collect()(0).getDouble(0)
        println(f"$label round $round: ${(System.nanoTime() - t0) / 1e9}%.2f s (sum=$s%.3f)")
      }
    }
    time("native", graft.functions.VectorExpressions.vecDot(
      col("a.embedding"), col("b.embedding")))
    time("hof   ", Similarity.dotHof(col("a.embedding"), col("b.embedding")))
    spark.stop()
  }
}
