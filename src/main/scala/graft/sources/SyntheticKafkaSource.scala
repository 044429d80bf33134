package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A graft-internal DataSourceV2 STREAMING source that emits the exact
  * Kafka source schema — (key, value, topic, partition, offset,
  * timestamp, timestampType, headers) — with fully deterministic
  * synthetic content. It exists for ONE reason: the container ships no
  * `spark-sql-kafka-0-10` jars (verified absent from every cache,
  * zero-egress image), so `format("kafka")` can never resolve here; this
  * source lets [[graft.streaming.S3SinkPipeline]] run its ENTIRE
  * subscribe → group → encode → exact-name-write path as one real
  * Structured Streaming query (micro-batch planning, offset tracking,
  * checkpoint commits — the O19 semantics) end-to-end in tests, with the
  * Kafka-specific piece reduced to the one `format(...)` string.
  *
  * Reference scenario mirrored: the reference proves its connector
  * against a real broker in
  * `/root/reference/src/integration-test/java/io/aiven/kafka/connect/IntegrationTest.java:134-183`
  * (produce N records across topics/partitions → await exact-named
  * compressed objects); StreamingSpec drives the same shape through this
  * source.
  *
  * Options (all optional):
  *   - `topics`: comma-separated topic names (default `t0`)
  *   - `partitions`: partitions per topic (default 2)
  *   - `rowsPerPartition`: total rows per (topic, partition) — the
  *     stream is FINITE so `processAllAvailable()` terminates (default 20)
  *   - `rowsPerBatch`: offsets admitted per partition per micro-batch
  *     (default 10) — >1 micro-batch per run exercises incremental
  *     planning
  *
  * Determinism contract: record content is a pure function of
  * (topic, partition, offset) — key cycles `key-0/1/2` with every 5th
  * record null-keyed (the tombstone-adjacent case O3/O9 care about),
  * value is `v-<topic>-<p>-<i>` bytes, two headers carry a constant and
  * the offset, timestamps step 1 s from 2026-01-01T00:00:00Z. Replayed
  * ranges (checkpoint restart) therefore rewrite byte-identical files —
  * the at-least-once idempotence the sink's deterministic names rely on. */
class SyntheticKafkaSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticKafkaSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new SyntheticKafkaTable(new CaseInsensitiveStringMap(properties))
}

object SyntheticKafkaSource {
  /** The Kafka source's exact schema with `includeHeaders=true`. */
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  /** 2026-01-01T00:00:00Z in epoch micros. */
  val BaseTimestampMicros: Long = 1767225600000000L

  /** The deterministic record at (topic, partition, offset) as an
    * InternalRow — shared by the partition reader and (re-derivable by)
    * test oracles. */
  def recordAt(topic: String, partition: Int, i: Long): InternalRow = {
    val key =
      if (i % 5 == 4) null
      else s"key-${i % 3}".getBytes("UTF-8")
    val value = s"v-$topic-$partition-$i".getBytes("UTF-8")
    val headers: ArrayData = new GenericArrayData(Array[Any](
      headerRow("h-src", "graft".getBytes("UTF-8")),
      headerRow("h-offset", i.toString.getBytes("UTF-8"))))
    new GenericInternalRow(Array[Any](
      key, value, UTF8String.fromString(topic), partition, i,
      BaseTimestampMicros + i * 1000000L, 0, headers))
  }

  private def headerRow(k: String, v: Array[Byte]): InternalRow =
    new GenericInternalRow(Array[Any](UTF8String.fromString(k), v))
}

private[sources] class SyntheticKafkaTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "synthetic-kafka"
  override def schema(): StructType = SyntheticKafkaSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SyntheticKafkaSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SyntheticKafkaStream(
            options.getOrDefault("topics", "t0").split(",").toSeq
              .map(_.trim).filter(_.nonEmpty),
            options.getInt("partitions", 2),
            options.getLong("rowsPerPartition", 20L),
            options.getLong("rowsPerBatch", 10L))
      }
    }
}

/** Watermark offset: rows emitted per (every) partition so far — the
  * source admits offsets uniformly across partitions. */
private[sources] case class SyntheticOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private[sources] class SyntheticKafkaStream(topics: Seq[String],
    partitions: Int, rowsPerPartition: Long, rowsPerBatch: Long)
    extends MicroBatchStream {
  require(topics.nonEmpty && partitions > 0 && rowsPerPartition >= 0 &&
    rowsPerBatch > 0, "synthetic kafka source: bad dials")

  // advances by rowsPerBatch per poll, capped at the finite end; content
  // is offset-deterministic, so replayed ranges (checkpoint restart)
  // rewrite identical bytes (at-least-once, like the real source)
  private var admitted = 0L

  override def initialOffset(): Offset = SyntheticOffset(0L)

  override def latestOffset(): Offset = {
    admitted = math.min(rowsPerPartition, admitted + rowsPerBatch)
    SyntheticOffset(admitted)
  }

  override def deserializeOffset(json: String): Offset = {
    val n = json.trim.toLong
    // A restarted query hands the checkpointed offsets back through
    // here BEFORE its first poll: resume the admission pacing from the
    // restored position (a broker-backed source's latest offset is
    // likewise independent of the consumer's restart) — otherwise the
    // first post-restart latestOffset() returns exactly the committed
    // offset and processAllAvailable() sees a caught-up stream.
    admitted = math.max(admitted, n)
    SyntheticOffset(n)
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[SyntheticOffset].n
    val hi = end.asInstanceOf[SyntheticOffset].n
    if (hi <= lo) Array.empty
    else (for {
      t <- topics
      p <- 0 until partitions
    } yield SyntheticKafkaPartition(t, p, lo, hi): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val sp = partition.asInstanceOf[SyntheticKafkaPartition]
        new PartitionReader[InternalRow] {
          private var i = sp.lo - 1
          override def next(): Boolean = { i += 1; i < sp.hi }
          override def get(): InternalRow =
            SyntheticKafkaSource.recordAt(sp.topic, sp.partition, i)
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] case class SyntheticKafkaPartition(topic: String,
    partition: Int, lo: Long, hi: Long) extends InputPartition
