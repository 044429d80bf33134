package graft

import org.apache.spark.sql.SparkSession

/** A/B the SimHash widths on the same corpus: 16-bit (oracle hash) vs
  * 64-bit (production xxhash64) pair detection end-to-end — signature,
  * chunk-band join, hamming verify, pair expansion. Prints median-of-3
  * wall time and pair counts per width, backing SCALING.md's claim that
  * the 64-bit path carries the same topology at comparable cost.
  * Run: `tools/spark-run.sh graft.SimhashBench [sfDir]`. */
object SimhashBench {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(s"SimHash width A/B: $sfDir, ${docs.count()} docs")
    for (bits <- Seq(16, 64)) {
      val counts = collection.mutable.Buffer[Long]()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val (pairs, cleanup) = ops.Dedup.simhashPairsManaged(docs, 3, bits)
        counts += pairs.count()
        cleanup()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"bits=$bits%2d  pairs=${counts.head}%8d  " +
        f"median ${times.sorted.apply(1)}%.3f s  " +
        f"(runs: ${times.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
