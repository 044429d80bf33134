package graft.formats

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.util.SerializableConfiguration

import graft.config.{CompressionType, FormatType}

/** The custom sink-side writer (SURVEY.md §4 item 1 and §7.3): writes one
  * object per group with the exact templated name, via Hadoop `FileSystem`
  * (s3a in production, file:// in tests). This is the only piece of the
  * connector Spark's built-in sinks can't express — Spark names files
  * `part-*`, the reference requires `{{topic}}-{{partition}}-…` names
  * (`S3SinkTask.java:169-205`).
  *
  * Scale design: the input is repartitioned BY the filename column and
  * sorted within partitions by (filename, offset), so each task streams
  * record-groups sequentially — one open stream at a time per task, O(1)
  * memory, never a per-group `collect()`. Deterministic names + overwrite
  * give the reference's at-least-once idempotent-retry contract
  * (`S3SinkTask.java:120-124`, SURVEY.md §3.2).
  *
  * JSON-array framing (O12) writes `[`, rows with trailing commas, `]` —
  * byte-exact with `IntegrationTest.java:504-511`; JSONL/CSV write one
  * record per `\n`-terminated line.
  */
object GroupFileWriter {

  /** Resolve a rendered file name under the sink base, refusing resolution
    * outside it. The reference's S3 object keys are flat strings that cannot
    * escape the bucket/prefix; on hierarchical FileSystems a record KEY
    * containing `..` (key-grouping mode feeds raw keys into names) could
    * otherwise walk out of `baseUri`. `/` inside a name is allowed — it
    * stays under the base, matching S3's treatment of `/` as a plain key
    * character. */
  private[formats] def resolveUnder(baseUri: String, name: String): Path = {
    val base = new Path(baseUri).toUri.normalize()
    val resolved = new Path(baseUri, name).toUri.normalize()
    // A name that itself parses as an absolute URI (e.g. a record key like
    // "s3a://other-bucket/...") wins Path resolution outright, so a
    // path-prefix check alone is not enough: the resolved URI must stay on
    // the base's scheme AND authority (bucket), not just under its path.
    require(resolved.getScheme == base.getScheme &&
        resolved.getAuthority == base.getAuthority,
      s"rendered file name '$name' escapes the sink base '$baseUri' " +
        "(foreign scheme or authority)")
    require(resolved.getPath.startsWith(base.getPath.stripSuffix("/") + "/"),
      s"rendered file name '$name' escapes the sink base '$baseUri'")
    new Path(resolved)
  }

  /** Write `df` — which must contain `_filename` (string) and `_line`
    * (string) columns plus an `offset` ordering column — one compressed
    * object per distinct `_filename` under `baseUri`. Returns nothing; the
    * write is the effect (used inside `foreachBatch`).
    */
  /** `groupCols` is any column set that determines `_filename` (e.g.
    * (topic, partition)) — repartitioning on it satisfies the upstream
    * grouping window's required distribution, so Catalyst plans ONE
    * exchange for annotate+write instead of two. Defaults to `_filename`
    * itself. */
  def writeLines(df: DataFrame, baseUri: String, format: FormatType,
                 compression: CompressionType,
                 groupCols: Seq[String] = Seq("_filename")): Unit = {
    val spark = df.sparkSession
    val serConf = new SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val jsonArray = format == FormatType.Json
    val keep = (Seq("_filename", "_line", "offset") ++ groupCols).distinct
    df.select(keep.map(col): _*)
      .repartition(groupCols.map(col): _*)
      .sortWithinPartitions(col("_filename"), col("offset"))
      .foreachPartition { (it: Iterator[Row]) =>
        writePartition(it, baseUri, serConf.value, compression, jsonArray)
      }
  }

  private def writePartition(it: Iterator[Row], baseUri: String,
                             conf: Configuration, compression: CompressionType,
                             jsonArray: Boolean): Unit = {
    var current: String = null
    var out: java.io.OutputStream = null
    var first = true

    def close(): Unit = if (out != null) {
      if (jsonArray) {
        if (!first) out.write('\n')
        out.write(']')
      }
      out.close()
      out = null
    }

    def open(name: String): Unit = {
      val path = resolveUnder(baseUri, name)
      val fs = FileSystem.get(path.toUri, conf)
      fs.mkdirs(path.getParent)
      // overwrite=true: deterministic names make retries idempotent
      out = Compression.wrap(fs.create(path, true), compression)
      if (jsonArray) out.write('[')
      first = true
    }

    it.foreach { row =>
      val name = row.getString(0)
      if (name != current) {
        close(); open(name); current = name
      }
      val line = row.getString(1)
      if (jsonArray) {
        if (!first) out.write(',')
        out.write('\n')
      }
      out.write(line.getBytes(StandardCharsets.UTF_8))
      if (!jsonArray) out.write('\n')
      first = false
    }
    close()
  }
}
