package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.{OutputField, OutputFieldEncodingType => Enc, OutputFieldType => F}
import graft.connector.{Grouping, OutputFields, Records}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry re-expresses one operator from SURVEY.md §2 (the
  * reference S3-sink-connector surface) or one training-data-pipeline
  * operator as a batch DataFrame query over the driver's parquet tables;
  * `oracleSql` holds the equivalent DuckDB SQL. Column names and row order
  * are deterministic and identical on both sides.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2 minimum end-to-end slice): events →
    * canonical records → grouped by (topic, partition) → base64 CSV lines
    * with rendered `{{topic}}-{{partition}}-{{start_offset}}.gz` file names.
    */
  def entry(spark: SparkSession): DataFrame = {
    val records = Records.fromEvents(spark, "/root/testdata/sf0.001")
    val fields = Seq(
      OutputField(F.Value, Enc.Base64), OutputField(F.Key, Enc.Base64),
      OutputField(F.Timestamp, Enc.None), OutputField(F.Offset, Enc.None))
    val w = Window.partitionBy(col("topic"), col("partition"))
    records
      .withColumn("_start_offset", min(col("offset")).over(w))
      .select(
        concat(col("topic"), lit("-"), col("partition"), lit("-"),
          lpad(col("_start_offset").cast(StringType), 20, "0"), lit(".gz"))
          .as("filename"),
        OutputFields.csvLine(fields).as("line"))
  }

  // ---------------------------------------------------------------- helpers

  private def rec(s: SparkSession, dir: String): DataFrame =
    Records.fromEvents(s, dir)

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Shared DuckDB CTE prefix adapting `events` to the record model. */
  private val R = "WITH " + Records.duckRecordsCte + "\n"

  // ------------------------------------------------------- connector family

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O2 — topic-partition record grouping: group extents per flush.
    "sink_group_topic_partition" -> ((s, dir) => {
      rec(s, dir)
        .groupBy(col("topic"), col("partition").as("part"))
        .agg(
          min("offset").as("start_offset"),
          max("offset").as("end_offset"),
          count(lit(1)).as("cnt"))
        .orderBy(col("topic"), col("part"))
    }),

    // O16 — distributed filename rendering with zero-padded start_offset.
    "sink_filename_template" -> ((s, dir) => {
      rec(s, dir)
        .groupBy(col("topic"), col("partition").as("part"))
        .agg(min("offset").as("start_offset"), count(lit(1)).as("cnt"))
        .select(
          concat(col("topic"), lit("-"), col("part"), lit("-"),
            lpad(col("start_offset").cast(StringType), 20, "0"), lit(".gz"))
            .as("fname"),
          col("cnt"))
        .orderBy(col("fname"))
    }),

    // O3 — key compaction: latest record per key (deterministic tie-break).
    "sink_key_compaction" -> ((s, dir) => {
      Grouping.compactLatestByKey(rec(s, dir))
        .select(
          col("_k").as("rkey"),
          col("offset").as("off"),
          col("value").cast(StringType).as("rvalue"))
        .orderBy(col("rkey"))
    }),

    // O4 — time-bucket grouping (yyyy/MM/dd/HH bucket columns).
    "sink_time_bucket" -> ((s, dir) => {
      rec(s, dir)
        .groupBy(
          col("topic"),
          date_format(col("timestamp"), "yyyy").as("y"),
          date_format(col("timestamp"), "MM").as("m"),
          date_format(col("timestamp"), "dd").as("d"),
          date_format(col("timestamp"), "HH").as("h"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("topic"), col("y"), col("m"), col("d"), col("h"))
    }),

    // O5 — file.max.records=100 chunking: per-chunk extents.
    "sink_max_records_chunk" -> ((s, dir) => {
      val w = Window.partitionBy(col("topic"), col("partition")).orderBy(col("offset"))
      rec(s, dir)
        .withColumn("chunk",
          ((row_number().over(w) - 1).cast(LongType) / 100).cast(LongType))
        .groupBy(col("topic"), col("partition").as("part"), col("chunk"))
        .agg(min("offset").as("start_offset"), max("offset").as("end_offset"),
          count(lit(1)).as("cnt"))
        .orderBy(col("topic"), col("part"), col("chunk"))
    }),

    // O6 — output-field projection in configured order (value,key,ts,offset).
    "sink_projection_fields" -> ((s, dir) => {
      rec(s, dir)
        .select(
          col("value").cast(StringType).as("rvalue"),
          col("key").cast(StringType).as("rkey"),
          unix_millis(col("timestamp")).as("ts_ms"),
          col("offset").as("off"))
        .orderBy(col("off"))
    }),

    // O7 — base64 field encoding.
    "sink_base64_value" -> ((s, dir) => {
      rec(s, dir)
        .select(col("offset").as("off"),
          OutputFields.base64Encode(col("value")).as("v_b64"))
        .orderBy(col("off"))
    }),

    // O8 — header flattening b64(name):b64(value);… .
    "sink_header_flatten" -> ((s, dir) => {
      rec(s, dir)
        .select(col("offset").as("off"),
          OutputFields.flattenHeaders(col("headers")).as("headers_flat"))
        .orderBy(col("off"))
    }),

    // O9 — null handling: nulls become empty CSV cells.
    "sink_null_handling" -> ((s, dir) => {
      rec(s, dir)
        .select(col("offset").as("off"),
          OutputFields.nullToEmpty(
            when(col("topic") === "error", lit(null).cast(StringType))
              .otherwise(col("value").cast(StringType))).as("v_or_empty"))
        .orderBy(col("off"))
    }),

    // O10 — CSV line encode (raw comma join, base64 key/value).
    "sink_csv_line" -> ((s, dir) => {
      val fields = Seq(
        OutputField(F.Value, Enc.Base64), OutputField(F.Key, Enc.Base64),
        OutputField(F.Timestamp, Enc.None), OutputField(F.Offset, Enc.None),
        OutputField(F.Headers, Enc.Base64))
      rec(s, dir)
        .select(col("offset").as("off"), OutputFields.csvLine(fields).as("line"))
        .orderBy(col("off"))
    }),

    // O11 — JSONL line encode {"value": …, "key": …}.
    "sink_jsonl_line" -> ((s, dir) => {
      rec(s, dir)
        .select(col("offset").as("off"),
          to_json(struct(
            col("value").cast(StringType).as("value"),
            col("key").cast(StringType).as("key"))).as("line"))
        .orderBy(col("off"))
    }),

    // O14 — envelope unwrap: decode JSON value struct, project its fields.
    "sink_envelope_unwrap" -> ((s, dir) => {
      rec(s, dir)
        .select(col("offset").as("off"),
          from_json(col("value").cast(StringType), StructType(Seq(
            StructField("k", IntegerType)))).getField("k").as("k"))
        .orderBy(col("off"))
    }),

    // O1 — multi-topic subscription = union of topic streams.
    "sink_multi_topic_union" -> ((s, dir) => {
      val r = rec(s, dir)
      r.where(col("topic") === "error")
        .unionByName(r.where(col("topic") === "signup"))
        .groupBy(col("topic")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("topic"))
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "sink_group_topic_partition" -> (R +
      """SELECT topic, part, min(off) AS start_offset, max(off) AS end_offset,
        |       count(*) AS cnt
        |FROM records GROUP BY topic, part ORDER BY topic, part""".stripMargin),

    "sink_filename_template" -> (R +
      """SELECT topic || '-' || part || '-' ||
        |       lpad(CAST(min(off) AS VARCHAR), 20, '0') || '.gz' AS fname,
        |       count(*) AS cnt
        |FROM records GROUP BY topic, part ORDER BY fname""".stripMargin),

    "sink_key_compaction" -> (R +
      """SELECT rkey, off, rvalue FROM (
        |  SELECT rkey, off, rvalue,
        |         row_number() OVER (PARTITION BY rkey ORDER BY off DESC, part DESC) AS rn
        |  FROM records) t
        |WHERE rn = 1 ORDER BY rkey""".stripMargin),

    "sink_time_bucket" -> (R +
      """SELECT topic, strftime(rts, '%Y') AS y, strftime(rts, '%m') AS m,
        |       strftime(rts, '%d') AS d, strftime(rts, '%H') AS h,
        |       count(*) AS cnt
        |FROM records GROUP BY topic, y, m, d, h ORDER BY topic, y, m, d, h""".stripMargin),

    "sink_max_records_chunk" -> (R +
      """SELECT topic, part, chunk, min(off) AS start_offset,
        |       max(off) AS end_offset, count(*) AS cnt
        |FROM (
        |  SELECT topic, part, off,
        |         CAST((row_number() OVER (PARTITION BY topic, part ORDER BY off) - 1) // 100 AS BIGINT) AS chunk
        |  FROM records) t
        |GROUP BY topic, part, chunk ORDER BY topic, part, chunk""".stripMargin),

    "sink_projection_fields" -> (R +
      """SELECT rvalue, rkey, epoch_ms(rts) AS ts_ms, off
        |FROM records ORDER BY off""".stripMargin),

    "sink_base64_value" -> (R +
      """SELECT off, to_base64(encode(rvalue)) AS v_b64
        |FROM records ORDER BY off""".stripMargin),

    "sink_header_flatten" -> (R +
      """SELECT off,
        |       to_base64(encode('et')) || ':' || to_base64(encode(topic)) || ';' ||
        |       to_base64(encode('uid')) || ':' || to_base64(encode(rkey)) AS headers_flat
        |FROM records ORDER BY off""".stripMargin),

    "sink_null_handling" -> (R +
      """SELECT off,
        |       coalesce(CASE WHEN topic = 'error' THEN NULL ELSE rvalue END, '') AS v_or_empty
        |FROM records ORDER BY off""".stripMargin),

    "sink_csv_line" -> (R +
      """SELECT off,
        |       concat_ws(',', to_base64(encode(rvalue)), to_base64(encode(rkey)),
        |                 CAST(epoch_ms(rts) AS VARCHAR), CAST(off AS VARCHAR),
        |                 to_base64(encode('et')) || ':' || to_base64(encode(topic)) || ';' ||
        |                 to_base64(encode('uid')) || ':' || to_base64(encode(rkey))) AS line
        |FROM records ORDER BY off""".stripMargin),

    "sink_jsonl_line" -> (R +
      """SELECT off,
        |       CAST(to_json(struct_pack("value" := rvalue, "key" := rkey)) AS VARCHAR) AS line
        |FROM records ORDER BY off""".stripMargin),

    "sink_envelope_unwrap" -> (R +
      """SELECT off, CAST(json_extract_string(rvalue, '$.k') AS INT) AS k
        |FROM records ORDER BY off""".stripMargin),

    "sink_multi_topic_union" -> (R +
      """SELECT topic, count(*) AS cnt FROM (
        |  SELECT * FROM records WHERE topic = 'error'
        |  UNION ALL
        |  SELECT * FROM records WHERE topic = 'signup') t
        |GROUP BY topic ORDER BY topic""".stripMargin)
  )
}
