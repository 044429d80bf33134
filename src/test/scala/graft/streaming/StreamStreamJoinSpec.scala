package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Stream-stream interval join (the enrichment shape of a streaming
  * pipeline: impressions ⋈ clicks within an attribution window). Both
  * sides carry watermarks, and the join condition bounds event time on
  * both ends, so Spark can size the state store and evict expired rows —
  * the property that keeps state bounded on an unbounded 100 TB/day
  * stream. Without BOTH the watermarks and the two-sided time bound this
  * query would be rejected or grow state forever; this spec pins the
  * working shape.
  */
class StreamStreamJoinSpec extends SparkSuite {

  import spark.implicits._

  test("interval join matches clicks within the attribution window only") {
    implicit val e1 = org.apache.spark.sql.Encoders.product[(Long, Long)]
    val impStream = MemoryStream[(Long, Long)](spark)   // (ad_id, epoch_sec)
    val clickStream = MemoryStream[(Long, Long)](spark) // (ad_id, epoch_sec)

    val imps = impStream.toDF().toDF("ad_id", "sec")
      .select(col("ad_id"), timestamp_seconds(col("sec")).as("imp_ts"))
      .withWatermark("imp_ts", "20 seconds")
    val clicks = clickStream.toDF().toDF("ad_id", "sec")
      .select(col("ad_id"), timestamp_seconds(col("sec")).as("click_ts"))
      .withWatermark("click_ts", "20 seconds")

    val joined = imps.join(clicks,
      imps("ad_id") === clicks("ad_id") &&
        col("click_ts") >= col("imp_ts") &&
        col("click_ts") <= col("imp_ts") + expr("INTERVAL 10 SECONDS"))
      .select(imps("ad_id"), col("imp_ts"), col("click_ts"))

    val query = joined.writeStream.format("memory")
      .queryName("attributed").outputMode("append").start()
    try {
      impStream.addData((1L, 100L), (2L, 100L), (3L, 200L))
      clickStream.addData(
        (1L, 105L), // in window  -> attributed
        (2L, 150L), // 50 s later -> outside the 10 s window
        (3L, 199L)) // before the impression -> not attributed
      query.processAllAvailable()

      val rows = spark.table("attributed")
        .select(col("ad_id")).as[Long].collect().sorted
      assert(rows.toList == List(1L))
    } finally query.stop()
  }
}
