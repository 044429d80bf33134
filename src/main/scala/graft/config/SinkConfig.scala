package graft.config

import java.time.ZoneId
import scala.util.matching.Regex

import graft.template.Template

/** Compression codecs supported by the sink
  * (reference: `S3SinkConfig.java:802-813`; supported-set error
  * `S3SinkConfigTest.java:694-708`). Default when unset is GZIP. */
sealed abstract class CompressionType(val name: String, val extension: String)
object CompressionType {
  case object None   extends CompressionType("none", "")
  case object Gzip   extends CompressionType("gzip", ".gz")
  case object Snappy extends CompressionType("snappy", ".snappy")
  case object Zstd   extends CompressionType("zstd", ".zst")

  val all: List[CompressionType] = List(None, Gzip, Snappy, Zstd)
  val names: List[String] = all.map(_.name)

  def forName(n: String): Either[String, CompressionType] =
    all.find(_.name == n.trim.toLowerCase).toRight(
      s"Invalid value $n for configuration file.compression.type: " +
        s"supported values are: 'none', 'gzip', 'snappy', 'zstd'")
}

/** Output formats (reference `format.output.type`, `README.md:209-436`). */
sealed abstract class FormatType(val name: String)
object FormatType {
  case object Csv     extends FormatType("csv")
  case object Json    extends FormatType("json")
  case object Jsonl   extends FormatType("jsonl")
  case object Parquet extends FormatType("parquet")

  val all: List[FormatType] = List(Csv, Json, Jsonl, Parquet)
  def forName(n: String): Either[String, FormatType] =
    all.find(_.name == n.trim.toLowerCase).toRight(
      s"Invalid value $n for configuration format.output.type: " +
        s"supported values are: 'csv', 'json', 'jsonl', 'parquet'")
}

/** Record fields that may be projected into the output
  * (reference `format.output.fields`, `S3SinkConfigTest.java:100-108`;
  * order is preserved as configured, `S3SinkTaskTest.java:183,543-551`). */
sealed abstract class OutputFieldType(val name: String)
object OutputFieldType {
  case object Key       extends OutputFieldType("key")
  case object Value     extends OutputFieldType("value")
  case object Offset    extends OutputFieldType("offset")
  case object Timestamp extends OutputFieldType("timestamp")
  case object Headers   extends OutputFieldType("headers")

  val all: List[OutputFieldType] = List(Key, Value, Offset, Timestamp, Headers)
  def forName(n: String): Either[String, OutputFieldType] =
    all.find(_.name == n.trim.toLowerCase).toRight(
      s"Invalid value $n for configuration format.output.fields: " +
        s"supported values are: 'key', 'value', 'offset', 'timestamp', 'headers'")
}

/** base64 vs raw encoding of an output field (reference
  * `OutputFieldEncodingType`, `S3SinkConfig.java:827-844`). */
sealed abstract class OutputFieldEncodingType(val name: String)
object OutputFieldEncodingType {
  case object None   extends OutputFieldEncodingType("none")
  case object Base64 extends OutputFieldEncodingType("base64")
  def forName(n: String): Either[String, OutputFieldEncodingType] =
    List(None, Base64).find(_.name == n.trim.toLowerCase).toRight(
      s"Invalid value $n for configuration format.output.fields.value.encoding: " +
        s"supported values are: 'none', 'base64'")
}

final case class OutputField(fieldType: OutputFieldType, encoding: OutputFieldEncodingType)

/** How records are grouped into output files — resolved from the file-name
  * template's variable set, exactly like the reference's
  * `RecordGrouperFactory.resolveRecordGrouperType`
  * (`S3SinkConfig.java:730-737`, `README.md:84-91`):
  *   - `topic,partition,start_offset[,timestamp]` → topic-partition grouping
  *   - `key` or `key,topic,partition` → key (latest-wins compaction) grouping
  */
sealed trait GroupingMode
object GroupingMode {
  case object TopicPartitionRecord extends GroupingMode
  case object KeyRecord            extends GroupingMode

  def resolve(t: Template): Either[String, GroupingMode] = {
    val vars = t.variableNames
    val tpSets = Set(
      Set("topic", "partition", "start_offset"),
      Set("topic", "partition", "start_offset", "timestamp"))
    val keySets = Set(Set("key"), Set("key", "topic", "partition"))
    if (tpSets.contains(vars)) Right(TopicPartitionRecord)
    else if (keySets.contains(vars)) Right(KeyRecord)
    else Left(
      "unsupported set of template variables, supported sets are: " +
        "topic,partition,start_offset,timestamp; key; key,topic,partition")
  }
}

/** AWS credential modes (reference `AwsCredentialProviderFactory.java:28-67`):
  * static keys XOR STS assume-role XOR default provider chain. */
final case class StsRole(
    arn: String,
    sessionName: String,
    externalId: Option[String],
    durationSeconds: Int,
    stsEndpoint: Option[String])

/** Parsed + validated sink configuration — the rebuild of the reference's
  * `S3SinkConfig` (`/root/reference/src/main/java/io/aiven/kafka/connect/s3/
  * config/S3SinkConfig.java:138-187,687-738`). Pure Scala; the "planner
  * front-end" of the engine (SURVEY.md §3.1): parsing this config and
  * resolving [[GroupingMode]] is the reference's entire plan selection.
  */
final case class SinkConfig(
    bucketName: String,
    prefix: String,
    fileNameTemplate: Template,
    groupingMode: GroupingMode,
    compression: CompressionType,
    formatType: FormatType,
    outputFields: List[OutputField],
    envelopeEnabled: Boolean,
    maxRecordsPerFile: Int,
    timestampZone: ZoneId,
    partSizeBytes: Long,
    awsAccessKeyId: Option[String],
    awsSecretAccessKey: Option[String],
    stsRole: Option[StsRole],
    endpoint: Option[String],
    region: Option[String],
    backoffDelayMs: Long,
    backoffMaxDelayMs: Long,
    backoffMaxRetries: Int,
    kafkaRetryBackoffMs: Option[Long],
    topics: List[String],
    topicsRegex: Option[String],
    // graft extension (not a reference key): strict-parity whole-object
    // compression for parquet — the reference ALWAYS wraps the whole
    // parquet object in the outer codec (S3SinkTask.java:135-140); the
    // default here is the Spark-idiomatic parquet-internal codec, and
    // this flag opts into the reference's exact object layout.
    parquetWholeObjectCompression: Boolean = false) {

  /** Reference semantics (`S3SinkConfig.java:917-919`): a configured prefix
    * (either property style) switches naming to the LEGACY path — rendered
    * prefix template + `topic-partition-<%020d start_offset>` + extension
    * (`S3SinkTask.java:157-205`); `file.name.template` names files only
    * when no prefix is set. */
  def usesFileNameTemplate: Boolean = prefix.isEmpty

  /** The prefix parsed as a template (legacy vars incl. utc_date/local_date). */
  def prefixTemplate: Template = Template.of(prefix)

  /** s3a Hadoop configuration equivalent to the reference's AWS client setup
    * (SURVEY.md §2 O18/O21/O22: retry policy, endpoint, credentials map onto
    * `fs.s3a.*` — configuration, not code). */
  def s3aOptions: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    b += "fs.s3a.multipart.size" -> partSizeBytes.toString
    b += "fs.s3a.retry.limit" -> backoffMaxRetries.toString
    b += "fs.s3a.retry.interval" -> s"${backoffDelayMs}ms"
    awsAccessKeyId.foreach(k => b += "fs.s3a.access.key" -> k)
    awsSecretAccessKey.foreach(k => b += "fs.s3a.secret.key" -> k)
    endpoint.foreach(e => b += "fs.s3a.endpoint" -> e)
    region.foreach(r => b += "fs.s3a.endpoint.region" -> r)
    stsRole.foreach { r =>
      b += "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.auth.AssumedRoleCredentialProvider"
      b += "fs.s3a.assumed.role.arn" -> r.arn
      b += "fs.s3a.assumed.role.session.name" -> r.sessionName
      b += "fs.s3a.assumed.role.session.duration" -> s"${r.durationSeconds}s"
      r.stsEndpoint.foreach(e => b += "fs.s3a.assumed.role.sts.endpoint" -> e)
    }
    b.result()
  }
}

object SinkConfig {

  val DefaultPartSize: Long = 5L * 1024 * 1024 // 5 MiB (S3OutputStream.java:41)
  val MaxPartSize: Long = 2000000000L // "2GB" decimal bound (S3SinkConfigTest.java:277)
  val DefaultBackoffDelayMs = 100L     // S3SinkConfig.java:128
  val DefaultBackoffMaxDelayMs = 20000L // S3SinkConfig.java:129
  val DefaultBackoffMaxRetries = 3     // S3SinkConfig.java:136
  val MaxBackoffRetries = 30           // S3SinkConfig.java:327-341
  val MaxKafkaRetryBackoffMs: Long = 24L * 60 * 60 * 1000 // 24h cap (README.md:451)
  val DefaultTemplate = "{{topic}}-{{partition}}-{{start_offset}}"
  val StsDurationMin = 900
  val StsDurationMax = 43200

  private val UppercaseYyyy: Regex = """\{\{\s*timestamp\s*:\s*unit\s*=\s*YYYY\s*\}\}""".r

  /** Standard AWS commercial regions (mirrors the SDK `Regions` enum the
    * reference validates against, `AwsRegionValidator`). */
  val KnownRegions: Seq[String] = Seq(
    "us-east-1", "us-east-2", "us-west-1", "us-west-2",
    "eu-west-1", "eu-west-2", "eu-west-3", "eu-central-1", "eu-north-1",
    "eu-south-1", "ap-south-1", "ap-southeast-1", "ap-southeast-2",
    "ap-northeast-1", "ap-northeast-2", "ap-northeast-3", "ap-east-1",
    "sa-east-1", "ca-central-1", "me-south-1", "af-south-1",
    "us-gov-east-1", "us-gov-west-1", "cn-north-1", "cn-northwest-1")

  /** Old-style → new-style property precedence (reference
    * `S3SinkConfig.java:143-174`; asserted `S3SinkConfigTest.java:161-212`):
    * new names win when both are present. */
  private val OldToNew = Map(
    "aws_access_key_id"     -> "aws.access.key.id",
    "aws_secret_access_key" -> "aws.secret.access.key",
    "aws_s3_bucket"         -> "aws.s3.bucket.name",
    "aws_s3_endpoint"       -> "aws.s3.endpoint",
    "aws_s3_region"         -> "aws.s3.region",
    "aws_s3_prefix"         -> "aws.s3.prefix",
    "output_compression"    -> "file.compression.type",
    "output_fields"         -> "format.output.fields"
  )

  /** Pre-process raw props: old→new precedence and the `YYYY`→`yyyy`
    * rewrite — applied to the PREFIX only, like the reference
    * (`S3SinkConfig.java:143-174`); `YYYY` inside `file.name.template` is a
    * validation error (`S3SinkConfigTest.java:786-807`). */
  def preprocess(props: Map[String, String]): Map[String, String] = {
    val renamed = props.flatMap {
      case (k, v) if OldToNew.contains(k) =>
        val nk = OldToNew(k)
        if (props.contains(nk)) scala.None else Some(nk -> v)
      case kv => Some(kv)
    }
    renamed.get("aws.s3.prefix") match {
      case Some(t) =>
        renamed.updated("aws.s3.prefix",
          UppercaseYyyy.replaceAllIn(t, "{{timestamp:unit=yyyy}}"))
      case scala.None => renamed
    }
  }

  /** Pre-flight validation (reference entry point C, SURVEY.md §3.3: the
    * Connect REST `/config/validate` path) — returns all errors without
    * constructing a config. */
  def validate(rawProps: Map[String, String]): List[String] =
    parse(rawProps).left.getOrElse(Nil)

  /** Parse + validate; returns every error found (reference surfaces them via
    * ConfigDef validators + `validate()` cross-field checks,
    * `S3SinkConfig.java:687-738`). */
  def parse(rawProps: Map[String, String]): Either[List[String], SinkConfig] = {
    val props = preprocess(rawProps)
    val errs = List.newBuilder[String]

    def opt(k: String): Option[String] = props.get(k).map(_.trim).filter(_.nonEmpty)

    // present-but-empty strings get the reference's ConfigDef message
    // (`S3SinkConfigTest.java:309-421`)
    Seq("aws.s3.bucket.name", "aws.s3.prefix", "aws.s3.endpoint").foreach { k =>
      if (props.get(k).exists(_.trim.isEmpty))
        errs += s"Invalid value  for configuration $k: String must be non-empty"
    }
    Seq("aws.access.key.id", "aws.secret.access.key").foreach { k =>
      if (props.get(k).exists(_.trim.isEmpty))
        errs += s"Invalid value [hidden] for configuration $k: Password must be non-empty"
    }
    opt("aws.s3.endpoint").foreach { e =>
      val ok = try {
        val u = new java.net.URI(e)
        u.getScheme != null && Set("http", "https").contains(u.getScheme)
      } catch { case _: Exception => false }
      if (!ok)
        errs += s"Invalid value $e for configuration aws.s3.endpoint: should be valid URL"
    }
    // Region validated against the known set with the reference's message
    // shape (`S3SinkConfigTest.java:338-353`; the reference's list is the
    // AWS SDK's Regions enum — same structure, SDK-version-dependent tail)
    props.get("aws.s3.region").map(_.trim).foreach { r =>
      // "" gets this message too, like the reference (S3SinkConfigTest:332-342)
      if (!KnownRegions.contains(r))
        errs += s"Invalid value $r for configuration aws.s3.region: " +
          s"supported values are: ${KnownRegions.mkString(", ")}"
    }

    val bucket = opt("aws.s3.bucket.name")
    if (!props.contains("aws.s3.bucket.name") && bucket.isEmpty)
      errs += "Missing required configuration \"aws.s3.bucket.name\" which has no default value."

    val templateRaw = opt("file.name.template").getOrElse(DefaultTemplate)
    val template = Template.of(templateRaw)
    val varErrs = Template.validate(template, Template.FilenameVars)
    // parameter-level violations use the reference's "parameters" message
    // verbatim (S3SinkConfigTest.java:786-807); set-level use the set text
    errs ++= varErrs.map { e =>
      if (e.startsWith("unsupported parameter") || e.startsWith("unsupported value"))
        s"Invalid value $templateRaw for configuration file.name.template: " +
          "unsupported set of template variables parameters, supported sets are: " +
          "partition:padding=true|false,start_offset:padding=true|false," +
          "timestamp:unit=yyyy|MM|dd|HH"
      else e
    }.distinct
    opt("aws.s3.prefix").foreach { p =>
      errs ++= Template.validate(Template.of(p), Template.PrefixVars)
    }

    val grouping = GroupingMode.resolve(template) match {
      case Right(g) => g
      case Left(e)  => errs += e; GroupingMode.TopicPartitionRecord
    }

    val compression = opt("file.compression.type")
      .map(CompressionType.forName) match {
      case Some(Right(c)) => c
      case Some(Left(e))  => errs += e; CompressionType.Gzip
      case scala.None     => CompressionType.Gzip // default gzip (S3SinkConfig.java:802-813)
    }

    val formatType = opt("format.output.type").map(FormatType.forName) match {
      case Some(Right(f)) => f
      case Some(Left(e))  => errs += e; FormatType.Csv
      case scala.None     => FormatType.Csv
    }

    val valueEncoding = opt("format.output.fields.value.encoding")
      .map(OutputFieldEncodingType.forName) match {
      case Some(Right(e)) => e
      case Some(Left(e))  => errs += e; OutputFieldEncodingType.Base64
      case scala.None     => OutputFieldEncodingType.Base64
    }

    // Default projection is `value` alone (README.md:227); CSV key is always
    // base64 (README.md:239-250), value encoding is configurable. Invalid
    // names surface the reference's whole-list message
    // (`S3SinkConfigTest.java:526-539`); empty list is rejected (`:475-486`).
    val rawFieldNames = opt("format.output.fields")
      .map(_.split(",").toList.map(_.trim).filter(_.nonEmpty))
    if (props.contains("format.output.fields") && rawFieldNames.forall(_.isEmpty))
      errs += "Invalid value [] for configuration format.output.fields: cannot be empty"
    val fieldNames = rawFieldNames.getOrElse(List("value"))
    if (fieldNames.exists(n => OutputFieldType.forName(n).isLeft))
      errs += s"Invalid value [${fieldNames.mkString(", ")}] " +
        "for configuration format.output.fields: " +
        "supported values are: 'key', 'value', 'offset', 'timestamp', 'headers'"
    val outputFields = fieldNames
      .flatMap(n => OutputFieldType.forName(n).toOption)
      .map {
        case OutputFieldType.Value => OutputField(OutputFieldType.Value, valueEncoding)
        case t                     => OutputField(t, OutputFieldEncodingType.Base64)
      }

    val maxRecords = opt("file.max.records").map(_.toIntOption) match {
      case Some(Some(n)) if n >= 0 => n
      case Some(_) =>
        errs += "file.max.records must be a non-negative integer number"; 0
      case scala.None => 0
    }
    // key-grouping requires at most one record per file (S3SinkConfig.java:729-737)
    if (grouping == GroupingMode.KeyRecord && maxRecords > 1)
      errs += ("When file.name.template is " + template.raw +
        ", file.max.records must be either 1 or not set")

    val tz = opt("file.name.timestamp.timezone").map { z =>
      try ZoneId.of(z)
      catch {
        case _: Exception =>
          errs += s"Invalid value $z for configuration file.name.timestamp.timezone"
          ZoneId.of("Z")
      }
    }.getOrElse(ZoneId.of("Z"))

    opt("file.name.timestamp.source").foreach { s =>
      if (s.toLowerCase != "wallclock")
        errs += s"Invalid value $s for configuration file.name.timestamp.source"
    }

    // bounds + messages: S3SinkConfigTest.java:277-292
    val partSize = opt("aws.s3.part.size.bytes").map(_.toLongOption) match {
      case Some(Some(n)) if n > 0 && n <= MaxPartSize => n
      case Some(Some(n)) if n <= 0 =>
        errs += s"Invalid value $n for configuration aws.s3.part.size.bytes: " +
          "Part size must be greater than 0"
        DefaultPartSize
      case Some(Some(n)) =>
        errs += s"Invalid value $n for configuration aws.s3.part.size.bytes: " +
          s"Part size must be no more: $MaxPartSize bytes (2GB)"
        DefaultPartSize
      case Some(scala.None) =>
        errs += "aws.s3.part.size.bytes must be a number"; DefaultPartSize
      case scala.None => DefaultPartSize
    }

    val accessKey = opt("aws.access.key.id")
    val secretKey = opt("aws.secret.access.key")
    if (accessKey.isDefined != secretKey.isDefined)
      errs += "aws.access.key.id and aws.secret.access.key must be defined together"

    val stsArn = opt("aws.sts.role.arn")
    val stsRole = stsArn.map { arn =>
      val dur = opt("aws.sts.role.session.duration").flatMap(_.toIntOption).getOrElse(3600)
      // bounds text: S3SinkConfigTest.java:883-894
      if (dur < StsDurationMin)
        errs += s"Invalid value $dur for configuration aws.sts.role.session.duration: " +
          s"Value must be at least $StsDurationMin"
      else if (dur > StsDurationMax)
        errs += s"Invalid value $dur for configuration aws.sts.role.session.duration: " +
          s"Value must be no more than $StsDurationMax"
      val session = opt("aws.sts.role.session.name").getOrElse {
        errs += "aws.sts.role.session.name is mandatory when aws.sts.role.arn is set"; ""
      }
      StsRole(arn, session, opt("aws.sts.role.external.id"), dur, opt("aws.sts.config.endpoint"))
    }
    if (stsRole.isDefined && accessKey.isDefined)
      errs += "Either  static credential pair aws.access.key.id and aws.secret.access.key " +
        "must be set together, or assuming role properties aws.sts.role.arn, " +
        "aws.sts.role.session.name must be set together"

    // "Value must be at least 1" / "no more than 30": S3SinkConfigTest.java:574-614
    def atLeastOne(key: String, default: Long): Long =
      opt(key).flatMap(_.toLongOption) match {
        case Some(n) if n < 1 =>
          errs += s"Invalid value $n for configuration $key: Value must be at least 1"
          default
        case Some(n) => n
        case scala.None => default
      }
    val backoffDelay = atLeastOne("aws.s3.backoff.delay.ms", DefaultBackoffDelayMs)
    val backoffMaxDelay = atLeastOne("aws.s3.backoff.max.delay.ms", DefaultBackoffMaxDelayMs)
    val backoffRetries = atLeastOne("aws.s3.backoff.max.retries",
      DefaultBackoffMaxRetries.toLong).toInt
    if (backoffRetries > MaxBackoffRetries)
      errs += s"Invalid value $backoffRetries for configuration aws.s3.backoff.max.retries: " +
        s"Value must be no more than $MaxBackoffRetries"

    val kafkaBackoff = opt("kafka.retry.backoff.ms").flatMap(_.toLongOption).map { ms =>
      if (ms < 0 || ms > MaxKafkaRetryBackoffMs)
        errs += s"kafka.retry.backoff.ms must be in range [0, $MaxKafkaRetryBackoffMs]"
      ms
    }

    // BOOLEAN parse errors are collected like every other field (the
    // reference's ConfigDef BOOLEAN type reports a config error rather than
    // throwing, with this message shape)
    val envelope = opt("format.output.envelope") match {
      case Some(s) => s.toBooleanOption.getOrElse {
        errs += s"Invalid value $s for configuration format.output.envelope: " +
          "Expected value to be either true or false"
        true
      }
      case scala.None => true
    }

    // same BOOLEAN convention as format.output.envelope: case-insensitive
    // true/false, anything else is a collected config error (a silent
    // parse-to-false would quietly disable the strict-parity layout)
    val pqWholeObject = opt("graft.parquet.whole.object.compression") match {
      case Some(s) => s.toBooleanOption.getOrElse {
        errs += s"Invalid value $s for configuration " +
          "graft.parquet.whole.object.compression: " +
          "Expected value to be either true or false"
        false
      }
      case scala.None => false
    }

    val topics = opt("topics").map(_.split(",").toList.map(_.trim)).getOrElse(Nil)
    val topicsRegex = opt("topics.regex")

    val collected = errs.result()
    if (collected.nonEmpty) Left(collected)
    else
      Right(SinkConfig(
        bucketName = bucket.get,
        prefix = opt("aws.s3.prefix").getOrElse(""),
        fileNameTemplate = template,
        groupingMode = grouping,
        compression = compression,
        formatType = formatType,
        outputFields = outputFields,
        envelopeEnabled = envelope,
        maxRecordsPerFile = maxRecords,
        timestampZone = tz,
        partSizeBytes = partSize,
        awsAccessKeyId = accessKey,
        awsSecretAccessKey = secretKey,
        stsRole = stsRole,
        endpoint = opt("aws.s3.endpoint"),
        region = opt("aws.s3.region"),
        backoffDelayMs = backoffDelay,
        backoffMaxDelayMs = backoffMaxDelay,
        backoffMaxRetries = backoffRetries,
        kafkaRetryBackoffMs = kafkaBackoff,
        topics = topics,
        topicsRegex = topicsRegex,
        parquetWholeObjectCompression = pqWholeObject))
  }
}
