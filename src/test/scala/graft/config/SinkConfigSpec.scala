package graft.config

import org.scalatest.funsuite.AnyFunSuite

/** Config parsing/validation parity (reference `S3SinkConfigTest.java`). */
class SinkConfigSpec extends AnyFunSuite {

  private val minimal = Map("aws.s3.bucket.name" -> "b")

  private def ok(props: Map[String, String]): SinkConfig =
    SinkConfig.parse(props).fold(
      errs => fail(s"expected valid config, got $errs"), identity)

  private def errsOf(props: Map[String, String]): List[String] =
    SinkConfig.parse(props).fold(identity, c => fail(s"expected errors, got $c"))

  test("defaults: gzip compression, csv format, value-only fields, template") {
    val c = ok(minimal)
    assert(c.compression == CompressionType.Gzip) // S3SinkConfig.java:802-813
    assert(c.formatType == FormatType.Csv)
    assert(c.outputFields ==
      List(OutputField(OutputFieldType.Value, OutputFieldEncodingType.Base64)))
    assert(c.fileNameTemplate.raw == "{{topic}}-{{partition}}-{{start_offset}}")
    assert(c.groupingMode == GroupingMode.TopicPartitionRecord)
    assert(c.partSizeBytes == 5L * 1024 * 1024)
    assert(c.backoffDelayMs == 100L && c.backoffMaxDelayMs == 20000L &&
      c.backoffMaxRetries == 3)
    assert(c.envelopeEnabled)
  }

  test("non-boolean format.output.envelope is a collected config error, " +
    "not an exception (ConfigDef BOOLEAN semantics)") {
    val errs = errsOf(minimal + ("format.output.envelope" -> "yes"))
    assert(errs.contains("Invalid value yes for configuration " +
      "format.output.envelope: Expected value to be either true or false"))
    assert(ok(minimal + ("format.output.envelope" -> "false")).envelopeEnabled == false)
    assert(ok(minimal + ("format.output.envelope" -> "TRUE")).envelopeEnabled)
  }

  test("missing bucket is mandatory (ConfigDef-style message)") {
    assert(SinkConfig.parse(Map.empty).left.exists(_.contains(
      "Missing required configuration \"aws.s3.bucket.name\" which has no default value.")))
  }

  test("present-but-empty strings get the reference's non-empty message " +
    "(S3SinkConfigTest.java:309-421)") {
    val errs = errsOf(minimal ++ Map("aws.s3.endpoint" -> "", "aws.s3.region" -> " "))
    assert(errs.contains(
      "Invalid value  for configuration aws.s3.endpoint: String must be non-empty"))
    // region gets the supported-values message even when empty (:332-342)
    assert(errs.exists(_.startsWith(
      "Invalid value  for configuration aws.s3.region: supported values are: us-east-1")))
  }

  test("region validated against the known set; valid region accepted") {
    assert(errsOf(minimal + ("aws.s3.region" -> "mars-north-1")).exists(
      _.contains("for configuration aws.s3.region: supported values are:")))
    assert(ok(minimal + ("aws.s3.region" -> "eu-central-1"))
      .region.contains("eu-central-1"))
  }

  test("bad endpoint URL (S3SinkConfigTest.java:440-455)") {
    val errs = errsOf(minimal + ("aws.s3.endpoint" -> "ffff://asdsadas"))
    assert(errs.contains(
      "Invalid value ffff://asdsadas for configuration aws.s3.endpoint: should be valid URL"))
  }

  test("unsupported output field lists the whole configured value " +
    "(S3SinkConfigTest.java:526-539)") {
    val errs = errsOf(minimal +
      ("format.output.fields" -> "key,value,offset,timestamp,unsupported"))
    assert(errs.contains(
      "Invalid value [key, value, offset, timestamp, unsupported] " +
        "for configuration format.output.fields: " +
        "supported values are: 'key', 'value', 'offset', 'timestamp', 'headers'"))
  }

  test("part size bounds messages (S3SinkConfigTest.java:277-292)") {
    assert(errsOf(minimal + ("aws.s3.part.size.bytes" -> "2000000001")).contains(
      "Invalid value 2000000001 for configuration aws.s3.part.size.bytes: " +
        "Part size must be no more: 2000000000 bytes (2GB)"))
    assert(errsOf(minimal + ("aws.s3.part.size.bytes" -> "0")).contains(
      "Invalid value 0 for configuration aws.s3.part.size.bytes: " +
        "Part size must be greater than 0"))
  }

  test("backoff bounds messages (S3SinkConfigTest.java:574-614)") {
    assert(errsOf(minimal + ("aws.s3.backoff.delay.ms" -> "0")).contains(
      "Invalid value 0 for configuration aws.s3.backoff.delay.ms: Value must be at least 1"))
    assert(errsOf(minimal + ("aws.s3.backoff.max.retries" -> "35")).contains(
      "Invalid value 35 for configuration aws.s3.backoff.max.retries: " +
        "Value must be no more than 30"))
  }

  test("YYYY in file.name.template errors with the verbatim parameters " +
    "message (S3SinkConfigTest.java:786-807)") {
    val tpl = "{{topic}}-{{timestamp:unit=YYYY}}-{{partition}}-{{start_offset:padding=true}}.gz"
    val errs = errsOf(minimal + ("file.name.template" -> tpl))
    assert(errs.contains(
      s"Invalid value $tpl for configuration file.name.template: " +
        "unsupported set of template variables parameters, supported sets are: " +
        "partition:padding=true|false,start_offset:padding=true|false," +
        "timestamp:unit=yyyy|MM|dd|HH"))
  }

  test("bad compression lists the supported set") {
    val errs = errsOf(minimal + ("file.compression.type" -> "lz4"))
    assert(errs.exists(_.contains("'none', 'gzip', 'snappy', 'zstd'")))
  }

  test("key template selects key grouping; max.records>1 then rejected") {
    val c = ok(minimal + ("file.name.template" -> "{{key}}"))
    assert(c.groupingMode == GroupingMode.KeyRecord)
    val errs = errsOf(minimal +
      ("file.name.template" -> "{{key}}") + ("file.max.records" -> "5"))
    assert(errs.exists(_.contains("file.max.records must be either 1 or not set")))
  }

  test("unsupported template variable set is rejected") {
    val errs = errsOf(minimal + ("file.name.template" -> "{{topic}}"))
    assert(errs.exists(_.contains("unsupported set of template variables")))
  }

  test("YYYY is rewritten to yyyy in the PREFIX only (S3SinkConfig.java:143-174)") {
    val c = ok(minimal + ("aws.s3.prefix" -> "p-{{timestamp:unit=YYYY}}-"))
    assert(c.prefix.contains("{{timestamp:unit=yyyy}}"))
  }

  test("old-style property names resolve; new-style wins when both present") {
    val c = ok(Map("aws_s3_bucket" -> "oldb"))
    assert(c.bucketName == "oldb")
    val c2 = ok(Map("aws_s3_bucket" -> "oldb", "aws.s3.bucket.name" -> "newb"))
    assert(c2.bucketName == "newb")
    val c3 = ok(minimal + ("output_compression" -> "zstd"))
    assert(c3.compression == CompressionType.Zstd)
  }

  test("static keys and STS role are mutually exclusive") {
    val errs = errsOf(minimal ++ Map(
      "aws.access.key.id" -> "k", "aws.secret.access.key" -> "s",
      "aws.sts.role.arn" -> "arn:aws:iam::1:role/r",
      "aws.sts.role.session.name" -> "sess"))
    assert(errs.exists(_.contains("aws.sts.role.arn")))
  }

  test("sts duration bounds [900, 43200] (AwsStsRole.java:27-28)") {
    val errs = errsOf(minimal ++ Map(
      "aws.sts.role.arn" -> "arn:aws:iam::1:role/r",
      "aws.sts.role.session.name" -> "sess",
      "aws.sts.role.session.duration" -> "100"))
    assert(errs.exists(_.contains("aws.sts.role.session.duration")))
  }

  test("part size bounds (0, 2GB] (S3SinkConfig.java:257-295)") {
    assert(errsOf(minimal + ("aws.s3.part.size.bytes" -> "0"))
      .exists(_.contains("aws.s3.part.size.bytes")))
    assert(errsOf(minimal + ("aws.s3.part.size.bytes" -> "99999999999"))
      .exists(_.contains("aws.s3.part.size.bytes")))
    assert(ok(minimal + ("aws.s3.part.size.bytes" -> "1048576"))
      .partSizeBytes == 1048576L)
  }

  test("timestamp source supports wallclock only (S3SinkConfig.java:492-503)") {
    assert(errsOf(minimal + ("file.name.timestamp.source" -> "event"))
      .exists(_.contains("file.name.timestamp.source")))
  }

  test("output field order is preserved as configured") {
    val c = ok(minimal +
      ("format.output.fields" -> "value,key,timestamp,offset,headers"))
    assert(c.outputFields.map(_.fieldType) == List(
      OutputFieldType.Value, OutputFieldType.Key, OutputFieldType.Timestamp,
      OutputFieldType.Offset, OutputFieldType.Headers))
  }

  test("value encoding none vs base64; key always base64") {
    val c = ok(minimal ++ Map(
      "format.output.fields" -> "key,value",
      "format.output.fields.value.encoding" -> "none"))
    assert(c.outputFields == List(
      OutputField(OutputFieldType.Key, OutputFieldEncodingType.Base64),
      OutputField(OutputFieldType.Value, OutputFieldEncodingType.None)))
  }

  test("s3a option mapping carries retry/endpoint/credentials") {
    val c = ok(minimal ++ Map(
      "aws.access.key.id" -> "AK", "aws.secret.access.key" -> "SK",
      "aws.s3.endpoint" -> "http://localhost:9000",
      "aws.s3.backoff.max.retries" -> "7"))
    val o = c.s3aOptions
    assert(o("fs.s3a.access.key") == "AK")
    assert(o("fs.s3a.endpoint") == "http://localhost:9000")
    assert(o("fs.s3a.retry.limit") == "7")
  }
}
