package graft

import org.apache.spark.sql.SparkSession

/** Run one SparkEntry query by name: time it, optionally dump the formatted
  * physical plan. Usage: RunQuery <name> [sfDir] [--explain] [--show]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.drop(1).filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toList.sorted}"))
    if (args.contains("--explain")) fn(spark, sfDir).explain("formatted")
    if (args.contains("--show")) fn(spark, sfDir).show(20, truncate = false)
    // time construction + count together: some operators (iterative CC)
    // run driver-looped actions during construction
    if (args.contains("--warm")) fn(spark, sfDir).count()
    val t0 = System.nanoTime()
    val n = fn(spark, sfDir).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"$name: $n rows in $dt%.2f s")
    spark.stop()
  }
}
