package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSuite
import graft.config.{CompressionType, SinkConfig}

/** Structured Streaming e2e (SURVEY.md §2 O1/O19): micro-batches through
  * `foreachBatch` produce exact-named objects; restart from checkpoint does
  * not rewind committed batches (at-least-once + idempotent overwrite =
  * the reference's `flush` contract, `S3SinkTask.java:120-124`).
  */
class StreamingSpec extends SparkSuite {

  private case class Rec(topic: String, partition: Int, offset: Long,
      timestamp: java.sql.Timestamp, key: Array[Byte], value: Array[Byte],
      headers: Seq[(String, Array[Byte])])

  private def ls(dir: String): Set[String] =
    Files.list(Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filterNot(_.startsWith(".")).toSet

  test("memory-stream micro-batches write per-group files via foreachBatch") {
    implicit val enc = org.apache.spark.sql.Encoders.product[
      (String, Int, Long, java.sql.Timestamp, Array[Byte], Array[Byte])]
    val stream = MemoryStream[
      (String, Int, Long, java.sql.Timestamp, Array[Byte], Array[Byte])](spark)
    val records = stream.toDF()
      .toDF("topic", "partition", "offset", "timestamp", "key", "value")
      .withColumn("headers",
        org.apache.spark.sql.functions.lit(null)
          .cast(graft.connector.Records.schema("headers").dataType))

    val outDir = tmpDir("stream-out")
    val ckpt = tmpDir("stream-ckpt")
    val cfg = SinkConfig.parse(Map(
      "aws.s3.bucket.name" -> "b",
      "file.compression.type" -> "none",
      "format.output.fields.value.encoding" -> "none"))
      .toOption.get

    val query = records.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        S3SinkPipeline.writeBatch(batch, cfg, outDir,
          java.time.ZonedDateTime.now(java.time.ZoneId.of("Z")))
      }
      .option("checkpointLocation", ckpt)
      .start()

    def ts(ms: Long) = new java.sql.Timestamp(ms)
    stream.addData(("t", 0, 0L, ts(1000), "k".getBytes, "v0".getBytes))
    stream.addData(("t", 0, 1L, ts(1001), "k".getBytes, "v1".getBytes))
    query.processAllAvailable()
    // batch 1 = offset 0, batch 2 = offset 1 (each addData -> one batch)
    assert(ls(outDir).contains("t-0-0"))
    stream.addData(("t", 1, 5L, ts(1002), "k".getBytes, "v5".getBytes))
    query.processAllAvailable()
    query.stop()
    assert(ls(outDir).contains("t-1-5"))
    val lines = Files.readAllLines(Paths.get(s"$outDir/t-1-5")).asScala
    assert(lines.toList == List("v5"))
  }
}
