package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Exact semi-join accelerated by a broadcast Bloom prefilter — the manual
  * form of the runtime row-level filtering Spark injects for some shuffled
  * joins, made explicit so it applies to any join shape.
  *
  * Topology: aggregate the (small) filter side's keys into one Bloom filter
  * value (`bloom_filter_agg` — a few MB for millions of keys), broadcast
  * that single row to every task scanning the big side, and drop rows whose
  * key `might_contain` rejects BEFORE the join's shuffle. The exact
  * semi-join then runs on the survivors, removing the Bloom's false
  * positives — the result is EXACTLY the plain semi-join's, the Bloom is
  * pure topology.
  *
  * Why it matters at 100 TB: a selective semi-join ("lineitems of
  * high-value orders") otherwise shuffles the ENTIRE fact table to match
  * keys; the Bloom turns that into a map-side filter that ships only
  * plausible rows — shuffle volume drops by ~the selectivity, at the cost
  * of one broadcast variable. The false-positive rate only wastes shuffle
  * bytes, never correctness.
  */
object BloomSemiJoin {

  /** `big LEFT SEMI JOIN small ON big(bigKey) = small(smallKey)`, Bloom
    * prefiltered. Keys must be integral (Bloom hashes longs).
    *
    * @param expectedItems sizing hint for the filter (small side's distinct
    *                      key count); `numBits` follows at ~10 bits/item
    *                      (~1% false positives) unless given explicitly. */
  /** `bloom_filter_agg` / `might_contain` live in Spark's INTERNAL function
    * registry (they back the optimizer's injected runtime filters), so the
    * Column API reaches the Catalyst classes directly via [[GraftBridge]]. */
  private def bloomAgg(key: Column, items: Long, bits: Long): Column =
    GraftBridge.column(
      BloomFilterAggregate(GraftBridge.expression(key),
        Literal(items), Literal(bits), 0, 0).toAggregateExpression())

  /** `might_contain` requires its Bloom input to be a constant or a scalar
    * subquery — the one-row aggregate rides in as the latter: Spark
    * materializes the subquery once and ships the Bloom bytes to every
    * scan task as a literal. */
  private def mightContain(bloom: DataFrame, key: Column): Column =
    GraftBridge.column(BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
        GraftBridge.analyzedPlan(bloom)),
      GraftBridge.expression(key)))

  private def isIntegral(df: DataFrame, key: String): Boolean =
    df.schema(key).dataType match {
      case _: org.apache.spark.sql.types.ByteType => true
      case _: org.apache.spark.sql.types.ShortType => true
      case _: org.apache.spark.sql.types.IntegerType => true
      case _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }

  /** One-row Bloom filter over ARBITRARY-typed keys via `xxhash64(key)` —
    * exposed for operators that compose the lossy prefilter with their own
    * exact verify ([[graft.ops.Curation.decontaminateCross]]). The hash
    * only feeds the prefilter; collisions and Bloom false positives cost
    * shuffle bytes downstream, never rows, as long as the caller's verify
    * joins on the key itself. */
  def bloomOf(keys: DataFrame, key: Column, expectedItems: Long,
              numBits: Long = 0L): DataFrame = {
    // a zero/negative sizing hint would flow into BloomFilterAggregate as
    // Literal(items) and fail at ANALYSIS time with an obscure internal-
    // function error far from the caller — fail here with a real message
    require(expectedItems > 0,
      s"bloomOf: expectedItems must be positive, got $expectedItems")
    val bits =
      if (numBits > 0) numBits else math.max(64L, expectedItems * 10L)
    keys.agg(bloomAgg(xxhash64(key), expectedItems, bits).as("_bf"))
  }

  /** The probe predicate for a [[bloomOf]] filter: true iff `key` MIGHT be
    * in the filter (definitely-absent keys are dropped map-side). */
  def bloomMightContain(bloom: DataFrame, key: Column): Column =
    mightContain(bloom, xxhash64(key))

  def semiJoin(big: DataFrame, small: DataFrame, bigKey: String,
               smallKey: String, expectedItems: Long,
               numBits: Long = 0L): DataFrame = {
    require(expectedItems > 0, // same analysis-time trap as bloomOf
      s"semiJoin: expectedItems must be positive, got $expectedItems")
    // Bloom hashes longs: a non-integral key would cast('long') to null,
    // might_contain(null) is null, and the prefilter would silently DROP
    // rows the exact semi-join matches. Preserve the "result is EXACTLY
    // the plain semi-join's" contract by skipping the prefilter instead.
    val prefiltered =
      if (isIntegral(big, bigKey) && isIntegral(small, smallKey)) {
        val bits =
          if (numBits > 0) numBits else math.max(64L, expectedItems * 10L)
        val bloom = small.agg(
          bloomAgg(col(smallKey).cast("long"), expectedItems, bits).as("_bf"))
        big.where(mightContain(bloom, col(bigKey).cast("long")))
      } else big
    val keys = small.select(col(smallKey).as("_k")).distinct()
    prefiltered.join(keys, prefiltered(bigKey) === keys("_k"), "left_semi")
  }
}
