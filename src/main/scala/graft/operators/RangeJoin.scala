package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join: match left rows whose point `ts` falls inside a
  * right-side interval `[start, end]`, WITHOUT an equi key.
  *
  * Naive formulations are O(|L|×|R|) nested-loop joins (Spark plans
  * BroadcastNestedLoopJoin for pure inequality conditions — a cluster
  * killer). The scalable shape is bucketization: quantize time into
  * `bucketMs` cells, explode each interval to the cells it overlaps, and
  * equi-join point-cell to interval-cell — candidate work is
  * O(|L| + Σ interval_len/bucket) with a cheap exact `between` filter
  * after. The bucket width trades replication factor against candidate
  * precision; pick ~median interval length.
  */
object RangeJoin {

  /** `left` must have a millis column `tsCol`; `right` must have millis
    * columns `startCol`/`endCol`. Returns left rows joined with every
    * containing interval (right columns carried as `range_`-prefixed). */
  def bucketed(left: DataFrame, tsCol: String,
               right: DataFrame, startCol: String, endCol: String,
               rightCols: Seq[String], bucketMs: Long): DataFrame = {
    val lb = left.withColumn("_bucket", (col(tsCol) / bucketMs).cast("long"))
    val rb = right.withColumn("_bucket",
      explode(sequence((col(startCol) / bucketMs).cast("long"),
        (col(endCol) / bucketMs).cast("long"))))
    lb.join(rb, Seq("_bucket"))
      .where(col(tsCol).between(col(startCol), col(endCol)))
      .select(left.columns.toSeq.map(col) ++
        rightCols.map(c => col(c).as(s"range_$c")): _*)
  }
}
