package graft.formats

import org.apache.spark.sql.functions.{concat, lit}

import graft.SparkSuite

/** Avro envelope decode/encode: golden bytes (the binary-Avro framing is
  * fixed by the spec — zigzag varint length + UTF-8 body, no per-record
  * schema), round-trip identity on tricky payloads, and reused-decoder
  * state across a partition's iterator. */
class AvroEnvelopeSpec extends SparkSuite {

  import spark.implicits._

  test("encodePayload emits spec-exact binary Avro: zigzag length + UTF-8") {
    val df = Seq((1L, "hi")).toDF("id", "v")
    val bytes = AvroEnvelope.encodePayload(df, "id", "v")
      .collect().head.getAs[Array[Byte]]("avro")
    // {"payload":"hi"} -> [zigzag(2)=0x04, 'h', 'i']
    assert(bytes.toSeq == Seq[Byte](0x04, 'h'.toByte, 'i'.toByte))
  }

  test("decode(encode(x)) == x for empty, unicode, json-ish and long " +
    "payloads, including with one reused decoder across the partition") {
    val payloads = Seq(
      0L -> "",
      1L -> "plain ascii",
      2L -> """{"nested":"json","n":1}""",
      3L -> "unicode é中文 😀",
      4L -> "x" * 10000)
    val df = payloads.toDF("id", "v").coalesce(1) // one partition: state reuse
    val back = AvroEnvelope.decodePayload(
      AvroEnvelope.encodePayload(df, "id", "v"), "id", "avro")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, v) <- payloads) assert(back(id) == v, s"payload $id")
  }

  test("null payloads encode as the empty string (the coalesce contract)") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "ok")).toDF("id", "v")
    val back = AvroEnvelope.decodePayload(
      AvroEnvelope.encodePayload(df, "id", "v"), "id", "avro")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back(1L) == "" && back(2L) == "ok")
  }

  test("frame writes the exact Confluent wire header: 0x00 magic + " +
    "big-endian schema id + untouched body") {
    val df = Seq((1L, "hi")).toDF("id", "v")
    val framed = AvroEnvelope.frame(
      AvroEnvelope.encodePayload(df, "id", "v"), "avro", 0x01020304)
      .collect().head.getAs[Array[Byte]]("avro")
    assert(framed.toSeq == Seq[Byte](
      0x00, 0x01, 0x02, 0x03, 0x04, // magic + big-endian id
      0x04, 'h'.toByte, 'i'.toByte)) // the golden body from the spec above
  }

  test("decodeFramed round-trips framed bytes, reports the schema id, and " +
    "dispatches per id with one reused decoder across a partition") {
    val payloads = Seq(0L -> "", 1L -> "unicode é中文 😀", 2L -> "plain",
      3L -> """{"j":1}""", 4L -> "x" * 10000)
    val enc = AvroEnvelope.encodePayload(
      payloads.toDF("id", "v").coalesce(1), "id", "v")
    val framed = AvroEnvelope.frame(enc.where($"id" % 2 === 0), "avro", 7)
      .unionByName(AvroEnvelope.frame(enc.where($"id" % 2 === 1), "avro", 9))
      .coalesce(1) // one partition: reader cache + decoder reuse exercised
    val back = AvroEnvelope.decodeFramed(framed, "id", "avro",
      Map(7 -> AvroEnvelope.EnvelopeSchemaJson,
          9 -> AvroEnvelope.EnvelopeSchemaJson))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    for ((id, v) <- payloads)
      assert(back(id) == ((if (id % 2 == 0) 7 else 9, v)), s"record $id")
  }

  test("decodeFramed resolves an EVOLVED writer schema (extra field) into " +
    "the envelope reader schema — payload survives, extras drop") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    val evolvedJson =
      """{"type":"record","name":"Envelope","namespace":"graft","fields":[
        |{"name":"payload","type":"string"},
        |{"name":"extra","type":"long"}]}""".stripMargin
    // handcraft wire bytes a producer on the evolved schema would emit
    val schema = new Schema.Parser().parse(evolvedJson)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x00, 0, 0, 0, 42)) // magic + id 42
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    val rec = new GenericData.Record(schema)
    rec.put("payload", "survives")
    rec.put("extra", 99L)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val df = Seq((1L, out.toByteArray)).toDF("id", "avro")
    val got = AvroEnvelope.decodeFramed(df, "id", "avro",
      Map(42 -> evolvedJson)).collect().head
    assert((got.getInt(1), got.getString(2)) == ((42, "survives")))
  }

  test("decodeFramed fails loudly on a wrong magic byte and on an " +
    "unregistered schema id") {
    val enc = AvroEnvelope.encodePayload(Seq((1L, "x")).toDF("id", "v"), "id", "v")
    val badMagic = enc.withColumn("avro",
      concat(lit(Array[Byte](0x7f, 0, 0, 0, 1)), $"avro"))
    val e1 = intercept[org.apache.spark.SparkException] {
      AvroEnvelope.decodeFramed(badMagic, "id", "avro",
        Map(1 -> AvroEnvelope.EnvelopeSchemaJson)).collect()
    }
    assert(e1.getCause.getMessage.contains("not Schema-Registry framed"))
    val unknownId = AvroEnvelope.frame(enc, "avro", 5)
    val e2 = intercept[org.apache.spark.SparkException] {
      AvroEnvelope.decodeFramed(unknownId, "id", "avro",
        Map(1 -> AvroEnvelope.EnvelopeSchemaJson)).collect()
    }
    assert(e2.getCause.getMessage.contains("schema id 5 not in resolver"))
  }
}
