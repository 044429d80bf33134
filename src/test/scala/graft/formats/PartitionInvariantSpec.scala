package graft.formats

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.time.{ZoneId, ZonedDateTime}

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.apache.spark.sql.Row

import graft.SparkSuite
import graft.config.SinkConfig
import graft.streaming.S3SinkPipeline

/** Property-style grouping invariants (SURVEY.md §5 test plan): for random
  * batches, the written files exactly PARTITION the batch — every record in
  * exactly one file, file membership consistent with the group key — and
  * key-mode emits exactly the latest record per key. */
class PartitionInvariantSpec extends SparkSuite {

  private val Now = ZonedDateTime.of(2020, 3, 1, 7, 0, 0, 0, ZoneId.of("Z"))

  private def randomBatch(seed: Int, n: Int) = {
    val rnd = new Random(seed)
    val rows = (0 until n).map { i =>
      Row(s"topic${rnd.nextInt(3)}", rnd.nextInt(4), i.toLong,
        new java.sql.Timestamp(1000L + rnd.nextInt(100000)),
        s"key${rnd.nextInt(7)}".getBytes(StandardCharsets.UTF_8),
        s"val-$seed-$i".getBytes(StandardCharsets.UTF_8), null)
    }
    (rows, spark.createDataFrame(rows.asJava, graft.connector.Records.schema))
  }

  private def allLines(dir: String): Map[String, List[String]] =
    Files.list(Paths.get(dir)).iterator().asScala
      .filterNot(_.getFileName.toString.startsWith("."))
      .map(p => p.getFileName.toString ->
        Files.readAllLines(p).asScala.toList)
      .toMap

  test("topic-partition files partition the batch exactly (3 random seeds)") {
    for (seed <- Seq(1, 42, 7)) {
      val (rows, df) = randomBatch(seed, 200)
      val dir = tmpDir(s"inv-$seed")
      val cfg = SinkConfig.parse(Map(
        "aws.s3.bucket.name" -> "b", "file.compression.type" -> "none",
        "format.output.fields.value.encoding" -> "none")).toOption.get
      S3SinkPipeline.writeBatch(df, cfg, dir, Now)
      val files = allLines(dir)
      // every record appears exactly once across all files
      val written = files.values.flatten.toList.sorted
      val expected = rows.map(r => new String(
        r.getAs[Array[Byte]](5), StandardCharsets.UTF_8)).toList.sorted
      assert(written == expected, s"seed $seed: files must partition the batch")
      // each file's name prefix matches its records' (topic, partition)
      val byGroup = rows.groupBy(r => (r.getString(0), r.getInt(1)))
      assert(files.size == byGroup.size)
      byGroup.foreach { case ((t, p), rs) =>
        val start = rs.map(_.getLong(2)).min
        assert(files.contains(s"$t-$p-$start"), s"seed $seed: missing $t-$p-$start")
        assert(files(s"$t-$p-$start").size == rs.size)
      }
    }
  }

  test("key mode emits exactly the latest record per key (3 random seeds)") {
    for (seed <- Seq(2, 13, 99)) {
      val (rows, df) = randomBatch(seed, 150)
      val dir = tmpDir(s"inv-key-$seed")
      val cfg = SinkConfig.parse(Map(
        "aws.s3.bucket.name" -> "b", "file.compression.type" -> "none",
        "file.name.template" -> "{{key}}",
        "format.output.fields.value.encoding" -> "none")).toOption.get
      S3SinkPipeline.writeBatch(df, cfg, dir, Now)
      val files = allLines(dir)
      val latestPerKey = rows
        .groupBy(r => new String(r.getAs[Array[Byte]](4), StandardCharsets.UTF_8))
        .map { case (k, rs) =>
          val latest = rs.maxBy(r => (r.getLong(2), r.getInt(1)))
          k -> new String(latest.getAs[Array[Byte]](5), StandardCharsets.UTF_8)
        }
      assert(files.view.mapValues(_.toList).toMap ==
        latestPerKey.view.mapValues(List(_)).toMap, s"seed $seed")
    }
  }
}
