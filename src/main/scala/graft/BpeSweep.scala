package graft

import org.apache.spark.sql.SparkSession

/** Measurement harness behind SCALING.md's batched byte-level BPE cell:
  * runs [[graft.ops.Bpe.trainBytesBatched]] at a production-vocabulary
  * dial and prints per-round keep counts, the cumulative merge count,
  * and total wall time — so the "hundreds of rounds, not 32k jobs"
  * claim is a measured curve, not an assertion. The per-round keep
  * count is the interesting shape: the pairwise-disjointness rule
  * self-limits a round to ~|current alphabet|/2 merges, so early
  * rounds keep few and the rate grows with the vocabulary.
  * Run: `tools/spark-run.sh graft.BpeSweep [sfDir] [rounds] [batchM]`. */
object BpeSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val rounds = args.lift(1).map(_.toInt).getOrElse(12)
    val batchM = args.lift(2).map(_.toInt).getOrElse(128)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    var cum = 0
    val t0 = System.nanoTime()
    val merges = ops.Bpe.trainBytesBatched(docs, rounds, batchM,
      onRound = (r, kept) => {
        cum += kept
        println(f"round $r%3d: kept $kept%4d (cum $cum%5d, " +
          f"${(System.nanoTime() - t0) / 1e9}%6.1f s)")
      })
    val totalSec = (System.nanoTime() - t0) / 1e9
    println(f"TOTAL merges=${merges.length} rounds=$rounds " +
      f"batchM=$batchM wall=$totalSec%.1f s")
  }
}
