package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (big) side into `buckets`
  * sub-keys and replicate the small side across every bucket, so a hot key's
  * rows spread over `buckets` tasks instead of hammering one.
  *
  * This is the manual fallback when AQE's skew-join split can't help (e.g.
  * the skew is in a single key within one partition, or the small side is
  * too big to broadcast but small enough to replicate `buckets`×). Salt is
  * derived from a hash of the row's other columns — deterministic, no RNG
  * state, identical on retry (same contract as everything else in graft).
  *
  * Result is EXACTLY the plain join's result — salting is pure topology.
  */
object SaltedJoin {

  def join(big: DataFrame, small: DataFrame, key: String,
           buckets: Int = 16): DataFrame = {
    // deterministic per-row salt: hash of all big-side columns
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.toSeq.map(col): _*), lit(buckets)))
    val replicated = small
      .withColumn("_salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted
      .join(replicated,
        salted(key) === replicated(key) && salted("_salt") === replicated("_salt"))
      .drop(replicated(key))
      .drop("_salt")
  }
}
