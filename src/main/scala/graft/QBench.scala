package graft

import org.apache.spark.sql.SparkSession

/** Single-query micro-bench for iterating on one operator without paying
  * for the whole suite: `QBench q1 q2 ...` times just those
  * entries with the same warm-pass + median-of-3 + clearCache protocol
  * AND the same measured action ([[Bench]]'s `queryExecution.toRdd`
  * plan execution — never `df.count()`, whose count-time re-optimization
  * prunes map work and can eliminate row-preserving joins entirely), so
  * its numbers are comparable to BENCH_r{N}.json medians. */
object QBench {
  private def runPlan(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.toRdd.count()
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val warmDir = {
      val small = new java.io.File(
        new java.io.File(sfDir).getParentFile, "sf0.001")
      if (small.isDirectory) small.getPath else sfDir
    }
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      runPlan(fn(spark, warmDir))
      spark.catalog.clearCache()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        runPlan(fn(spark, sfDir))
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"$n%-28s median ${times.sorted.apply(1)}%.3f s  (runs: ${times.map(t => f"$t%.2f").mkString(" ")})")
    }
    spark.stop()
  }
}
