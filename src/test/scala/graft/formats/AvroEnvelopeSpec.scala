package graft.formats

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
}
