package graft.formats

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, MessageTypeParser, Type, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.parquet.schema.Type.Repetition
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.util.SerializableConfiguration

import graft.config.{CompressionType, OutputFieldType, SinkConfig}

/** Parquet format writer (SURVEY.md §2 O13/O14): one exact-named parquet
  * object per group, with the schema built from the CONFIGURED output fields
  * (`format.output.fields`, default `value` → schema `{value}` only) exactly
  * like the reference (`README.md:355-436`). Record-typed (struct) values
  * keep their nested schema as parquet nested groups (nested read-back
  * asserted `AvroParquetIntegrationTest.java:207-270`), and
  * `format.output.envelope=false` with a single record-typed `value` field
  * lifts the value's fields to the top level
  * (`ParquetIntegrationTest.java:278-344`; ignored for non-record values,
  * `README.md:434-436`).
  *
  * Compression parity (SURVEY.md §2 O15): the reference wraps the WHOLE
  * parquet object in the outer codec stream (`S3SinkTask.java:135-140`).
  * The default here is the idiomatic parquet-internal codec
  * (splittable, column-chunk-level, what every Spark reader expects);
  * `wholeObjectCompression = true` selects the strict-parity mode —
  * UNCOMPRESSED parquet spooled to a task-local temp file, then streamed
  * byte-for-byte through [[Compression.wrap]] to the destination, exactly
  * the reference's object layout. Strict-parity objects are NOT readable
  * by parquet readers without outer decompression first (true of the
  * reference's output too — its own test reader decompresses before
  * `AvroParquetReader`).
  *
  * Same streaming topology as [[GroupFileWriter]]: repartition by filename,
  * sort within partitions, one open writer per task at a time.
  */
object ParquetEnvelopeWriter {

  /** The reference's full envelope `{key, offset, timestamp, headers: map,
    * value}` (`README.md:357-405` — headers an Avro MAP with same-typed
    * values) — what [[schemaFor]] yields for
    * `format.output.fields=key,offset,timestamp,headers,value` with a
    * scalar value. Parquet MAP annotation reads back as Spark `MapType`. */
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

  /** Fewest bytes whose two's-complement range covers `precision` decimal
    * digits (mirrors Spark's `Decimal.minBytesForPrecision`). */
  private def minBytesForPrecision(precision: Int): Int = {
    var n = 1
    while (math.floor(math.log10(2) * (8 * n - 1)) < precision) n += 1
    n
  }

  private def codec(t: CompressionType): CompressionCodecName = t match {
    case CompressionType.None   => CompressionCodecName.UNCOMPRESSED
    case CompressionType.Gzip   => CompressionCodecName.GZIP
    case CompressionType.Snappy => CompressionCodecName.SNAPPY
    case CompressionType.Zstd   => CompressionCodecName.ZSTD
  }

  /** Spark type → parquet type, mirroring Spark's own parquet write mapping
    * so the objects read back with identical schemas. */
  private def parquetType(name: String, dt: DataType, nullable: Boolean): Type = {
    val rep = if (nullable) Repetition.OPTIONAL else Repetition.REQUIRED
    dt match {
      case StringType  => Types.primitive(BINARY, rep)
        .as(LogicalTypeAnnotation.stringType()).named(name)
      case BinaryType  => Types.primitive(BINARY, rep).named(name)
      case IntegerType => Types.primitive(INT32, rep).named(name)
      case LongType    => Types.primitive(INT64, rep).named(name)
      case ShortType   => Types.primitive(INT32, rep)
        .as(LogicalTypeAnnotation.intType(16, true)).named(name)
      case ByteType    => Types.primitive(INT32, rep)
        .as(LogicalTypeAnnotation.intType(8, true)).named(name)
      case FloatType   => Types.primitive(FLOAT, rep).named(name)
      case DoubleType  => Types.primitive(DOUBLE, rep).named(name)
      case BooleanType => Types.primitive(BOOLEAN, rep).named(name)
      case TimestampType => Types.primitive(INT64, rep)
        .as(LogicalTypeAnnotation.timestampType(true,
          LogicalTypeAnnotation.TimeUnit.MILLIS)).named(name)
      case DateType    => Types.primitive(INT32, rep)
        .as(LogicalTypeAnnotation.dateType()).named(name)
      case d: DecimalType =>
        // Spark's own parquet mapping (ParquetWriteSupport): INT32 for
        // precision <= 9, INT64 for <= 18, FIXED_LEN_BYTE_ARRAY above —
        // needed for Avro decimal logical types flowing through the
        // reference's Avro->parquet path.
        val ann = LogicalTypeAnnotation.decimalType(d.scale, d.precision)
        if (d.precision <= 9)
          Types.primitive(INT32, rep).as(ann).named(name)
        else if (d.precision <= 18)
          Types.primitive(INT64, rep).as(ann).named(name)
        else
          Types.primitive(FIXED_LEN_BYTE_ARRAY, rep)
            .length(minBytesForPrecision(d.precision)).as(ann).named(name)
      case st: StructType =>
        st.fields.foldLeft(Types.buildGroup(rep)) { (b, f) =>
          b.addField(parquetType(f.name, f.dataType, f.nullable))
        }.named(name)
      case ArrayType(et, containsNull) =>
        Types.buildGroup(rep).as(LogicalTypeAnnotation.listType())
          .addField(Types.repeatedGroup()
            .addField(parquetType("element", et, containsNull)).named("list"))
          .named(name)
      case MapType(kt, vt, valueContainsNull) =>
        Types.buildGroup(rep).as(LogicalTypeAnnotation.mapType())
          .addField(Types.repeatedGroup()
            .addField(parquetType("key", kt, nullable = false))
            .addField(parquetType("value", vt, valueContainsNull))
            .named("key_value"))
          .named(name)
      case other => throw new IllegalArgumentException(
        s"unsupported parquet output type for field $name: $other")
    }
  }

  /** Recursive Row → SimpleGroup value writer (executor side). */
  private def appendValue(g: Group, name: String, dt: DataType, v: Any): Unit =
    dt match {
      case StringType  => g.append(name, v.toString)
      case BinaryType  =>
        g.append(name, Binary.fromConstantByteArray(v.asInstanceOf[Array[Byte]]))
      case IntegerType => g.append(name, v.asInstanceOf[Int])
      case LongType    => g.append(name, v.asInstanceOf[Long])
      case ShortType   => g.append(name, v.asInstanceOf[Short].toInt)
      case ByteType    => g.append(name, v.asInstanceOf[Byte].toInt)
      case FloatType   => g.append(name, v.asInstanceOf[Float])
      case DoubleType  => g.append(name, v.asInstanceOf[Double])
      case BooleanType => g.append(name, v.asInstanceOf[Boolean])
      case TimestampType =>
        g.append(name, v.asInstanceOf[java.sql.Timestamp].getTime)
      case DateType =>
        g.append(name, v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
      case d: DecimalType =>
        val unscaled = v.asInstanceOf[java.math.BigDecimal]
          .setScale(d.scale).unscaledValue()
        if (d.precision <= 9) g.append(name, unscaled.intValueExact())
        else if (d.precision <= 18) g.append(name, unscaled.longValueExact())
        else {
          // sign-extended big-endian two's complement, left-padded to the
          // fixed width (same bytes Spark's parquet writer emits)
          val numBytes = minBytesForPrecision(d.precision)
          val raw = unscaled.toByteArray
          val padded = if (raw.length == numBytes) raw else {
            val out = Array.fill[Byte](numBytes)(
              if (unscaled.signum < 0) -1 else 0)
            System.arraycopy(raw, 0, out, numBytes - raw.length, raw.length)
            out
          }
          g.append(name, Binary.fromConstantByteArray(padded))
        }
      case st: StructType =>
        writeStructFields(g.addGroup(name), st, v.asInstanceOf[Row])
      case ArrayType(et, _) =>
        val list = g.addGroup(name)
        v.asInstanceOf[scala.collection.Seq[Any]].foreach { e =>
          val elem = list.addGroup("list")
          if (e != null) appendValue(elem, "element", et, e)
        }
      case MapType(kt, vt, _) =>
        val m = g.addGroup(name)
        v.asInstanceOf[scala.collection.Map[Any, Any]].foreach { case (k, mv) =>
          val kv = m.addGroup("key_value")
          appendValue(kv, "key", kt, k)
          if (mv != null) appendValue(kv, "value", vt, mv)
        }
      case other => throw new IllegalArgumentException(
        s"unsupported parquet output type for field $name: $other")
    }

  private def writeStructFields(g: Group, st: StructType, row: Row): Unit =
    st.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) appendValue(g, f.name, f.dataType, row.get(i))
    }

  /** One top-level output column: how to project it and how to write it.
    * `idx` is the column's position in the projected row (0 = `_filename`,
    * 1 = the hidden `_offset` sort key, data columns from 2). */
  private sealed trait FieldWriter extends Serializable {
    def idx: Int
    def write(g: Group, row: Row): Unit
    /** True if this record must not be written at all (see [[UnwrapField]]). */
    def skipsRecord(row: Row): Boolean = false
  }
  private final case class GenericField(name: String, dt: DataType, idx: Int)
      extends FieldWriter {
    def write(g: Group, row: Row): Unit =
      if (!row.isNullAt(idx)) appendValue(g, name, dt, row.get(idx))
  }
  /** Required int64 with the reference's null → 0 rendering (timestamp). */
  private final case class RequiredLongField(name: String, idx: Int)
      extends FieldWriter {
    def write(g: Group, row: Row): Unit =
      g.append(name, if (row.isNullAt(idx)) 0L else row.getLong(idx))
  }
  /** Headers: canonical `array<struct<key,value>>` written as a parquet MAP
    * group — duplicate keys and order survive as repeated key_value entries
    * (the reference's ConnectHeaders is an ordered multimap). */
  private final case class HeadersField(idx: Int) extends FieldWriter {
    def write(g: Group, row: Row): Unit =
      if (!row.isNullAt(idx)) {
        val hs = row.getSeq[Row](idx)
        if (hs.nonEmpty) {
          val m = g.addGroup("headers")
          hs.foreach { h =>
            val kv = m.addGroup("key_value")
            kv.append("key", h.getString(0))
            if (!h.isNullAt(1))
              kv.append("value",
                Binary.fromConstantByteArray(h.getAs[Array[Byte]](1)))
          }
        }
      }
  }
  /** O14 envelope unwrap: the record-typed value's fields at top level.
    *
    * Null-value policy: with no envelope there is nothing representable for
    * a null (tombstone) record — emitting an empty group would violate any
    * REQUIRED unwrapped field and corrupt the file mid-write — so null-valued
    * records are skipped entirely (see [[FieldWriter.skipsRecord]]). */
  private final case class UnwrapField(st: StructType, idx: Int)
      extends FieldWriter {
    def write(g: Group, row: Row): Unit =
      writeStructFields(g, st, row.getStruct(idx))
    override def skipsRecord(row: Row): Boolean = row.isNullAt(idx)
  }

  /** The parquet MessageType [[write]] will produce for this config +
    * record value type (exposed for tests/docs). */
  def schemaFor(config: SinkConfig, valueDt: DataType): MessageType =
    plan(config, valueDt)._3

  /** Whether O14 unwrap applies: envelope disabled, single `value` output
    * field, record-typed value (`README.md:434-436` — ignored otherwise).
    *
    * Intentional divergence from `README.md:436` (which lists Avro MAP as
    * also unwrappable): a map's keys are data, not schema, so they cannot
    * form a static parquet message — and parquet-avro itself
    * (`AvroSchemaConverter.convert`) only accepts a RECORD at the message
    * root, so the reference path could not produce a bare-map parquet file
    * either. MAP-typed values therefore stay wrapped in `{value}` here. */
  private def unwraps(config: SinkConfig, valueDt: DataType): Boolean =
    !config.envelopeEnabled &&
      config.outputFields.map(_.fieldType) == List(OutputFieldType.Value) &&
      valueDt.isInstanceOf[StructType]

  /** (projected data columns, field writers, message schema) for a config. */
  private def plan(config: SinkConfig, valueDt: DataType)
      : (Seq[Column], Seq[FieldWriter], MessageType) = {
    if (unwraps(config, valueDt)) {
      val st = valueDt.asInstanceOf[StructType]
      val fields = st.fields.map(f => parquetType(f.name, f.dataType, f.nullable))
      (Seq(col("value")), Seq(UnwrapField(st, 2)),
        new MessageType("envelope", fields.toList.asJava))
    } else {
      val planned = config.outputFields.zipWithIndex.map { case (f, i) =>
        val idx = i + 2
        f.fieldType match {
          case OutputFieldType.Key =>
            (col("key").cast("string").as("key"),
              GenericField("key", StringType, idx): FieldWriter,
              parquetType("key", StringType, nullable = true))
          case OutputFieldType.Offset =>
            (col("offset").as("offset"),
              RequiredLongField("offset", idx): FieldWriter,
              Types.primitive(INT64, Repetition.REQUIRED).named("offset"))
          case OutputFieldType.Timestamp =>
            // cast first: tolerate TIMESTAMP_NTZ frames (no-op for the
            // canonical zoned type) — unix_millis rejects NTZ input
            (unix_millis(col("timestamp").cast(TimestampType)).as("timestamp"),
              RequiredLongField("timestamp", idx): FieldWriter,
              Types.primitive(INT64, Repetition.REQUIRED).named("timestamp"))
          case OutputFieldType.Headers =>
            (col("headers").as("headers"),
              HeadersField(idx): FieldWriter,
              MessageTypeParser.parseMessageType(
                """message m { optional group headers (MAP) {
                  |  repeated group key_value {
                  |    required binary key (STRING);
                  |    optional binary value;
                  |  }
                  |} }""".stripMargin).getFields.get(0))
          case OutputFieldType.Value => valueDt match {
            case st: StructType =>
              (col("value"), GenericField("value", st, idx): FieldWriter,
                parquetType("value", st, nullable = true))
            case mt: MapType =>
              (col("value"), GenericField("value", mt, idx): FieldWriter,
                parquetType("value", mt, nullable = true))
            case _ =>
              (col("value").cast("string").as("value"),
                GenericField("value", StringType, idx): FieldWriter,
                parquetType("value", StringType, nullable = true))
          }
        }
      }
      (planned.map(_._1), planned.map(_._2),
        new MessageType("envelope", planned.map(_._3).asJava))
    }
  }

  /** Write records (must have `_filename`, `offset` plus whatever columns
    * the configured output fields need) as one parquet object per distinct
    * `_filename` under `baseUri`, with the schema determined by
    * `config.outputFields` / `config.envelopeEnabled`. */
  def write(records: DataFrame, baseUri: String, config: SinkConfig,
            groupCols: Seq[String] = Seq("_filename"),
            wholeObjectCompression: Boolean = false): Unit = {
    val serConf = new SerializableConfiguration(
      records.sparkSession.sparkContext.hadoopConfiguration)
    // strict-parity mode writes UNCOMPRESSED parquet and compresses the
    // whole object on the way out, like the reference's wrapped stream
    val codecName =
      if (wholeObjectCompression) CompressionCodecName.UNCOMPRESSED
      else codec(config.compression)
    val outerCodec =
      if (wholeObjectCompression) config.compression else CompressionType.None
    val valueDt = records.schema("value").dataType
    val (dataCols, writers, messageType) = plan(config, valueDt)
    val schemaStr = messageType.toString
    records
      .select((Seq(col("_filename"), col("offset").as("_offset")) ++ dataCols ++
        groupCols.filterNot(_ == "_filename").map(col)): _*)
      .repartition(groupCols.map(col): _*)
      .sortWithinPartitions(col("_filename"), col("_offset"))
      .foreachPartition { (it: Iterator[Row]) =>
        writePartition(it, baseUri, serConf.value, codecName, outerCodec,
          schemaStr, writers)
      }
  }

  private def writePartition(it: Iterator[Row], baseUri: String,
                             conf: Configuration,
                             codecName: CompressionCodecName,
                             outerCodec: CompressionType,
                             schemaStr: String,
                             writers: Seq[FieldWriter]): Unit = {
    val messageType = MessageTypeParser.parseMessageType(schemaStr)
    val factory = new SimpleGroupFactory(messageType)
    val wholeObject = outerCodec != CompressionType.None
    var current: String = null
    var writer: org.apache.parquet.hadoop.ParquetWriter[Group] = null
    var spool: java.io.File = null
    var dest: Path = null

    def close(): Unit = if (writer != null) {
      writer.close(); writer = null
      if (wholeObject) {
        // stream the finished parquet file through the outer codec to the
        // destination — the reference's exact object layout (parquet
        // bytes inside one codec stream, S3SinkTask.java:135-140)
        val fs = dest.getFileSystem(conf)
        val out = Compression.wrap(fs.create(dest, true), outerCodec)
        try java.nio.file.Files.copy(spool.toPath, out)
        finally out.close()
        spool.delete(); spool = null; dest = null
      }
    }

    def open(name: String): Unit = {
      val target = GroupFileWriter.resolveUnder(baseUri, name)
      val path = if (wholeObject) {
        dest = target
        spool = java.io.File.createTempFile("graft-parquet-spool", ".parquet")
        spool.delete() // ParquetWriter refuses to overwrite via raw-local fs
        new Path(spool.toURI)
      } else target
      writer = ExampleParquetWriter.builder(path)
        .withConf(conf)
        .withType(messageType)
        .withCompressionCodec(codecName)
        .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
        .build()
    }

    try {
      it.foreach { row =>
        val name = row.getString(0)
        if (name != current) { close(); open(name); current = name }
        if (!writers.exists(_.skipsRecord(row))) {
          val g = factory.newGroup()
          writers.foreach(_.write(g, row))
          writer.write(g)
        }
      }
      close()
    } finally {
      // a task failure between open() and close() must not leak the
      // still-open ParquetWriter (fd + native column buffers on a
      // long-lived executor) nor the task-local spool file (a full
      // uncompressed parquet object per retry). Close the writer FIRST —
      // deleting a file under an open handle is at best platform-dependent
      // — swallowing the secondary failure so the original task exception
      // stays the one that propagates.
      if (writer != null) {
        try writer.close() catch { case _: Throwable => () }
        writer = null
      }
      if (spool != null) spool.delete()
    }
  }
}
