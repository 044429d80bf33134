package graft.connector

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.SparkSuite

/** Regression coverage for the `events.ts` type-normalization shims in
  * [[Records.readEvents]]. The driver's generator has emitted two distinct
  * parquet encodings across regenerations — TIMESTAMP(NANOS) (readable only
  * as long) and pandas `timestamp[us]` with no UTC flag (read as
  * TIMESTAMP_NTZ) — and every downstream `unix_millis`/watermark consumer
  * needs the session-zoned TimestampType either way.
  */
class RecordsSpec extends SparkSuite {

  test("readEvents normalizes an NTZ-written events.parquet to TimestampType") {
    import spark.implicits._
    val dir = tmpDir("records_ntz")
    val src = Seq(
      (1L, 10L, "click", "{}", "2024-03-01T00:00:00.123456"),
      (2L, 11L, "view",  "{}", "2024-03-01T06:30:15.000001")
    ).toDF("event_id", "user_id", "event_type", "props", "ts_str")
      .withColumn("ts", col("ts_str").cast(TimestampNTZType))
      .drop("ts_str")
    src.write.mode("overwrite").parquet(s"$dir/events.parquet")
    // precondition: the fixture really round-trips as NTZ
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType ==
      TimestampNTZType)

    val ev = Records.readEvents(spark, dir)
    assert(ev.schema("ts").dataType == TimestampType)
    // unix_millis must analyze (the exact failure mode of the regression)
    // and, under the pinned-UTC session, reproduce the wall-clock instants
    val millis = ev.orderBy("event_id")
      .select(unix_millis(col("ts"))).as[Long].collect()
    assert(millis.toSeq == Seq(1709251200123L, 1709274615000L))
  }

  test("readEvents yields TimestampType on the driver's current testdata") {
    val ev = Records.readEvents(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType == TimestampType)
    // the whole NTZ blast radius funnels through this one expression
    assert(ev.select(unix_millis(col("ts"))).limit(1).count() == 1L)
  }
}
