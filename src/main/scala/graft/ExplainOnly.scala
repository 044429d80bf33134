package graft
import org.apache.spark.sql.SparkSession

/** Print one registry query's formatted physical plan WITHOUT executing
  * it ([[RunQuery]] always counts afterwards — too expensive on probe
  * corpora when only the strategy choice is in question). */
object ExplainOnly {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
