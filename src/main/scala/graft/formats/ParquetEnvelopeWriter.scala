package graft.formats

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{MessageType, MessageTypeParser}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

import graft.config.CompressionType

/** Parquet format writer (SURVEY.md §2 O13): one exact-named parquet object
  * per group, rows in the reference's envelope shape
  * `{key, offset, timestamp, headers, value}` (`README.md:355-405`; nested
  * read-back asserted `ParquetIntegrationTest.java:153-214`).
  *
  * The reference compresses parquet *internally* via the parquet codec when
  * the outer compression is configured; we do the idiomatic equivalent —
  * parquet-internal gzip/snappy/zstd — and document the deviation from
  * whole-object wrapping (SURVEY.md §2 O15 note).
  *
  * Same streaming topology as [[GroupFileWriter]]: repartition by filename,
  * sort within partitions, one open writer per task at a time.
  */
object ParquetEnvelopeWriter {

  /** The reference's envelope is `{key, offset, timestamp, headers: map,
    * value}` (`README.md:357-405` — headers an Avro MAP with same-typed
    * values). Parquet MAP annotation reads back as Spark `MapType`. */
  val EnvelopeSchema: MessageType = MessageTypeParser.parseMessageType(
    """message envelope {
      |  optional binary key (STRING);
      |  required int64 offset;
      |  required int64 timestamp;
      |  optional group headers (MAP) {
      |    repeated group key_value {
      |      required binary key (STRING);
      |      optional binary value;
      |    }
      |  }
      |  optional binary value (STRING);
      |}""".stripMargin)

  private def codec(t: CompressionType): CompressionCodecName = t match {
    case CompressionType.None   => CompressionCodecName.UNCOMPRESSED
    case CompressionType.Gzip   => CompressionCodecName.GZIP
    case CompressionType.Snappy => CompressionCodecName.SNAPPY
    case CompressionType.Zstd   => CompressionCodecName.ZSTD
  }

  /** Write records (must have `_filename`, `key`, `offset`, `timestamp`,
    * `headers`, `value` columns in the canonical record schema) as one
    * parquet object per distinct `_filename` under `baseUri`. */
  def write(records: DataFrame, baseUri: String,
            compression: CompressionType,
            groupCols: Seq[String] = Seq("_filename")): Unit = {
    val serConf = new SerializableConfiguration(
      records.sparkSession.sparkContext.hadoopConfiguration)
    val codecName = codec(compression)
    records
      .select((Seq(col("_filename"), col("key").cast("string").as("key"),
        col("offset"), unix_millis(col("timestamp")).as("ts_ms"),
        col("headers"), col("value").cast("string").as("value")) ++
        groupCols.filterNot(_ == "_filename").map(col)): _*)
      .repartition(groupCols.map(col): _*)
      .sortWithinPartitions(col("_filename"), col("offset"))
      .foreachPartition { (it: Iterator[Row]) =>
        writePartition(it, baseUri, serConf.value, codecName)
      }
  }

  private def writePartition(it: Iterator[Row], baseUri: String,
                             conf: Configuration,
                             codecName: CompressionCodecName): Unit = {
    val factory = new SimpleGroupFactory(EnvelopeSchema)
    var current: String = null
    var writer: org.apache.parquet.hadoop.ParquetWriter[
      org.apache.parquet.example.data.Group] = null

    def close(): Unit = if (writer != null) { writer.close(); writer = null }

    def open(name: String): Unit = {
      val path = new Path(baseUri, name)
      writer = ExampleParquetWriter.builder(path)
        .withConf(conf)
        .withType(EnvelopeSchema)
        .withCompressionCodec(codecName)
        .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
        .build()
    }

    it.foreach { row =>
      val name = row.getString(0)
      if (name != current) { close(); open(name); current = name }
      val g = factory.newGroup()
      if (!row.isNullAt(1)) g.append("key", row.getString(1))
      g.append("offset", row.getLong(2))
      g.append("timestamp", if (row.isNullAt(3)) 0L else row.getLong(3))
      if (!row.isNullAt(4)) {
        val hs = row.getSeq[Row](4)
        if (hs.nonEmpty) {
          val mapGroup = g.addGroup("headers")
          hs.foreach { h =>
            val kv = mapGroup.addGroup("key_value")
            kv.append("key", h.getString(0))
            if (!h.isNullAt(1))
              kv.append("value", Binary.fromConstantByteArray(h.getAs[Array[Byte]](1)))
          }
        }
      }
      if (!row.isNullAt(5)) g.append("value", row.getString(5))
      writer.write(g)
    }
    close()
  }
}
