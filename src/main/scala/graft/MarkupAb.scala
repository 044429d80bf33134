package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.MarkupExpressions

/** A/B the codegen'd markup-extraction kernel vs the declarative
  * regexp_replace + replace chain on the same markup-wrapped corpus —
  * the [[MicroBench]] protocol (plan-execute action, median-of-3 after
  * a warm pass). Optional arg 2 `repeat` tiles each document's wrapped
  * payload N× to probe longer-document behavior (the kernel/regex gap
  * grows with document length). */
object MarkupAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repeatN = args.drop(1).headOption.map(_.toInt).getOrElse(1)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        SparkEntry.markupWrapped(col("doc_id"), col("text")).as("raw"))
      .select(col("doc_id"),
        (if (repeatN <= 1) col("raw")
         else concat_ws(" ", Seq.fill(repeatN)(col("raw")): _*)).as("raw"))

    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      val q = d.select(col("doc_id"), c.as("main_text"))
      q.queryExecution.toRdd.count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        q.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"$label median ${ts(1)}%.3f s (reps ${ts.map(t => f"$t%.2f").mkString("/")})")
    }
    time("kernel     ", MarkupExpressions.extractMarkup(col("raw")))
    time("declarative", MarkupExpressions.extractMarkupDeclarative(col("raw")))
    spark.stop()
  }
}
