package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract runs as an
  * iterator-to-iterator `mapPartitions` (the Scala analog of a batched
  * Pandas UDF: no per-row task overhead, constant memory, codegen-friendly
  * boundaries on both sides).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * libraries — behind [[MediaCodec.decodeStub]], a deterministic fake that
  * derives a fixed-shape feature vector from the payload bytes. The
  * Spark-side contract (schema, partitioning, batch shape, null handling)
  * is real and tested; swapping the stub for a JNI/OpenCV decoder changes
  * no plan topology.
  */
object Multimodal {

  /** Typed media record: payload + metadata, the schema a 100 TB media lake
    * would partition by (modality, then format). */
  final case class MediaRecord(
      media_id: Long,
      modality: String, // image | audio | video
      format: String,   // sniffed container format
      payload: Array[Byte],
      byte_len: Long)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      feature: Array[Float], // fixed FeatureDim-sized embedding
      ok: Boolean)

  val FeatureDim = 8

  object MediaCodec {
    /** STUB decode: real systems would decode the image/audio here. The
      * deterministic fake folds payload bytes into FeatureDim accumulators —
      * same shape, same batch behavior, no media libs required. Accumulates
      * in double and narrows to float at the end, so the SQL oracle can
      * reproduce it exactly (sum-order last-bit noise dies in the float
      * cast). */
    def decodeStub(payload: Array[Byte]): Array[Float] = {
      val acc = new Array[Double](FeatureDim)
      if (payload != null) {
        var i = 0
        while (i < payload.length) {
          acc(i % FeatureDim) += (payload(i) & 0xff) / 255.0
          i += 1
        }
      }
      acc.map(_.toFloat)
    }
  }

  /** Adapt the `events` table into a fake media lake: props bytes as the
    * payload, modality derived from event_type. Stand-in for a real
    * `binaryFile` / parquet-with-binary source. */
  def mediaFromEvents(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.connector.Records.readEvents(spark, sfDir)
      .select(
        col("event_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("event_id") % 3).cast(IntegerType) + 1).as("modality"),
        when(substring(col("props"), 1, 1) === "{", "json").otherwise("raw")
          .as("format"),
        col("props").cast(BinaryType).as("payload"),
        length(col("props")).cast(LongType).as("byte_len"))
      .as[MediaRecord]
  }

  /** Batched feature extraction: one decode pass per partition, iterator in /
    * iterator out (never materializes a partition). */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val feat = MediaCodec.decodeStub(r.payload)
        MediaFeatures(r.media_id, r.modality, feat, ok = r.payload != null)
      }
    }
  }

  final case class ResizedMedia(
      media_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** STUB resize: real systems decode + rescale pixels; the stub derives a
    * deterministic fixed-size byte grid from the payload. The Spark-side
    * contract (typed Dataset in/out, iterator batching) is the real part. */
  def resizeStub(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val out = new Array[Byte](w * h)
        if (r.payload != null && r.payload.nonEmpty) {
          var i = 0
          while (i < out.length) {
            out(i) = r.payload(i % r.payload.length)
            i += 1
          }
        }
        ResizedMedia(r.media_id, w, h, out)
      }
    }
  }

  final case class Frame(media_id: Long, frame_no: Int, payload: Array[Byte])

  /** STUB frame sampling for video payloads: emits every `stride`-th fixed-
    * size chunk as a "frame" — a flatMap (1→N) iterator pipeline, the shape
    * a real decoder would use. */
  def frameSampleStub(media: Dataset[MediaRecord], frameBytes: Int,
                      stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.modality == "video").mapPartitions { it =>
      it.flatMap { r =>
        if (r.payload == null) Iterator.empty
        else r.payload.grouped(frameBytes).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, i) => Frame(r.media_id, i, chunk) }
      }
    }
  }

  /** Oracle-checkable metadata projection: byte length, md5 of the payload,
    * sniffed format — the plumbing the oracle can verify without a decoder. */
  def metaQuery(spark: SparkSession, sfDir: String): DataFrame =
    mediaFromEvents(spark, sfDir).toDF()
      .select(col("media_id"), col("modality"), col("format"), col("byte_len"),
        md5(col("payload")).as("payload_md5"))
      .orderBy("media_id")

  /** Asset-level exact dedup: one row per distinct payload, with the
    * canonical (lowest-id) copy and the copy count — the "same image
    * uploaded a million times" pass that runs BEFORE any decode in a media
    * pipeline, because dropping byte-identical assets is free and decoding
    * them is not.
    *
    * Scale: the md5 digest is computed map-side, so the shuffle carries
    * (16-byte digest, id) pairs and partial min/count aggregates — the
    * media bytes themselves never leave their scan partition. Same
    * one-shuffle shape as [[Dedup.exact]] on text. */
  def dedupBinary(media: Dataset[MediaRecord]): DataFrame =
    media.toDF()
      .groupBy(md5(col("payload")).as("asset_md5"))
      .agg(min(col("media_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sum(col("byte_len")).as("bytes_total"))
      .orderBy("keep_id")
}
