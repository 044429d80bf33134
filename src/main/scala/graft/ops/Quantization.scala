package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding storage quantization — the int8 compression step a
  * 100 TB-scale embedding pipeline runs before persisting vectors (4×
  * smaller than float32; FAISS/SCaNN-style symmetric per-vector scheme).
  *
  * Per vector: `scale = max(|x|) / 127`, `q_i = clamp(round(x_i / scale),
  * -127, 127)` — symmetric, zero-preserving (0.0 quantizes to 0 exactly),
  * reconstruction `x̂_i = q_i · scale` with per-element error ≤ scale/2.
  * An all-zero vector (a plausible empty-doc embedding) gets scale 0 and
  * an all-zero code, round-tripping to exactly itself.
  *
  * Scale shape: pure map — two `transform` passes and an `array_max` per
  * row, all inside whole-stage codegen; no shuffle, no UDF, no state. The
  * arithmetic is plain double ops mirrored digit-for-digit by the DuckDB
  * oracle (round-half-away-from-zero agrees between engines; the clamped
  * value is integral before the int cast, so cast semantics never differ).
  */
object Quantization {

  /** Append (scale, qvec) to a frame with a float-vector column. */
  def quantizeInt8(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df
      .withColumn("_amax",
        array_max(transform(col(vecCol), x => abs(x.cast("double")))))
      .withColumn("scale", col("_amax") / 127.0)
      .withColumn("qvec",
        when(col("_amax") > 0,
          transform(col(vecCol), x =>
            greatest(lit(-127), least(lit(127),
              round(x.cast("double") / col("scale")))).cast("int")))
          .otherwise(transform(col(vecCol), _ => lit(0))))
      .drop("_amax")

  /** Reconstruct an approximate float vector from (scale, qvec). */
  def dequantizeInt8(df: DataFrame, outCol: String = "embedding"): DataFrame =
    df.withColumn(outCol,
      transform(col("qvec"), q => (q.cast("double") * col("scale")).cast("float")))

  /** Code-scheme version baked into every store directory name. Bump
    * whenever [[quantizeInt8]]'s arithmetic changes (symmetric range,
    * clamp bounds, rounding) — an on-disk store written by an older scheme
    * then simply misses the new name and is rebuilt, instead of silently
    * serving incompatible codes. */
  val CodeStoreVersion = "v1-int8-sym127"

  /** Persistent int8 code store — the write-once/read-many shape a 100 TB
    * deployment actually runs: quantize the float corpus ONCE, persist
    * only `(id, scale, qvec)` (4× smaller than float32), and serve every
    * later search from the stored codes; the float embeddings are never
    * re-read. Keying, staleness invalidation, atomic publish, and the
    * concurrency contract are [[FingerprintStore]]'s (store key =
    * [[CodeStoreVersion]] + md5 of the source listing).
    *
    * `idCols` names the identity columns carried alongside the code
    * (default `vec_id`); everything else — the float vector above all —
    * is dropped from the stored artifact. */
  def int8CodeStore(spark: org.apache.spark.sql.SparkSession,
                    embeddings: DataFrame, sourcePath: String, tag: String,
                    storeRoot: Option[String] = None,
                    vecCol: String = "embedding",
                    idCols: Seq[String] = Seq("vec_id")): DataFrame =
    FingerprintStore.getOrBuild(spark, sourcePath, tag, CodeStoreVersion,
      storeRoot)(
      quantizeInt8(embeddings, vecCol)
        .select((idCols :+ "scale" :+ "qvec").map(col): _*))
}
