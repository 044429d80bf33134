package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** The full custom-operator ladder (SURVEY.md brief, preference (c)):
  * a whole-operator Catalyst extension for the as-of join —
  * [[AsOfJoinNode]] (logical) → [[AsOfJoinStrategy]] (planner) →
  * [[AsOfJoinExec]] (physical streaming merge).
  *
  * Physics: both children are hash-clustered on the key and sorted by
  * (key, ts); the exec then does a single forward merge scan per
  * partition — O(|L|+|R|) with O(1) state (ONE buffered right row), versus
  * the composed union+window formulation's full sort of L∪R and window
  * state machine. Semantics are identical (strict `right.ts < left.ts`,
  * latest match wins, unmatched lefts keep nulls) and are cross-validated
  * against both the composed operator and DuckDB's native ASOF JOIN in
  * tests.
  */
final case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    rightPayload: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts, payload) =>
      AsOfJoinExec(lk, lts, rk, rts, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(
    leftKey: Expression, leftTs: Expression,
    rightKey: Expression, rightTs: Expression,
    rightPayload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightPayload.map(_.withNullability(true))

  // report like the built-in joins: row count + match count in the SQL UI
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext,
      "number of rows with an as-of match"))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    val boundLeftKey = BindReferences.bindReference(leftKey, left.output)
    val boundLeftTs = BindReferences.bindReference(leftTs, left.output)
    val boundRightKey = BindReferences.bindReference(rightKey, right.output)
    val boundRightTs = BindReferences.bindReference(rightTs, right.output)
    val payloadAttrs = rightPayload
    val rightOutput = right.output
    val fullOutput = output
    val keyOrd = PhysicalDataType.ordering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = PhysicalDataType.ordering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val payloadProj = UnsafeProjection.create(payloadAttrs, rightOutput)
      val resultProj = UnsafeProjection.create(fullOutput, fullOutput)
      val joined = new JoinedRow
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(payloadAttrs.length)

      new Iterator[InternalRow] {
        private val rBuf = rIter.buffered
        // latest right row (payload-projected, copied) visible so far + key
        private var curKey: Any = null
        private var curPayload: InternalRow = null

        private def advanceRightUntil(lKey: Any, lTs: Any): Unit = {
          var continue = true
          while (continue && rBuf.hasNext) {
            val r = rBuf.head
            val rKey = boundRightKey.eval(r)
            val cmpKey = keyOrd.compare(rKey, lKey)
            // consume rights strictly behind (key, ts): same key AND
            // strictly earlier ts, or any earlier key (to skip ahead)
            if (cmpKey < 0 ||
              (cmpKey == 0 && tsOrd.compare(boundRightTs.eval(r), lTs) < 0)) {
              if (cmpKey == 0) {
                curKey = rKey
                curPayload = payloadProj(r).copy()
              } else {
                // different (earlier) key: just skip; its matches are gone
                curKey = null; curPayload = null
              }
              rBuf.next()
            } else continue = false
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKey = boundLeftKey.eval(l)
          val lTs = boundLeftTs.eval(l)
          advanceRightUntil(lKey, lTs)
          val matched = curPayload != null && curKey != null &&
            keyOrd.compare(curKey, lKey) == 0
          numOutputRows += 1
          if (matched) numMatchedRows += 1
          joined(l, if (matched) curPayload else nullRight)
          resultProj(joined)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
