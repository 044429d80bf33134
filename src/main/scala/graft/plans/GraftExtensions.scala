package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Round}
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.VectorDot

/** Optimizer rule: `round(round(x, n), m)` with `m >= n` is the inner round
  * alone — the outer re-round of an already-coarser value is a no-op. Shows
  * up when pre-rounded scores (cosines, quality) are re-rounded at query
  * boundaries; eliminating it removes a non-trivial BigDecimal round from
  * the per-row hot path.
  */
object CollapseRedundantRound extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case outer @ Round(inner @ Round(_, innerScale, _), outerScale, _)
          if innerScale.foldable && outerScale.foldable &&
            innerScale.eval() != null && outerScale.eval() != null &&
            outerScale.eval().asInstanceOf[Int] >=
              innerScale.eval().asInstanceOf[Int] &&
            // optimizer rules must preserve output types. float/double: the
            // inner round already has the outer's type — drop the outer.
            // DecimalType: Round widens precision by 1 for the carry digit
            // (decimal(p,s) -> round n>=s -> decimal(p+1,s)), so the inner
            // can't replace the outer verbatim; a widening CAST to the
            // outer's exact type is value-identical (same scale, more head
            // room) and far cheaper than a BigDecimal re-round per row.
            (outer.dataType == inner.dataType ||
              ((outer.dataType, inner.dataType) match {
                case (o: DecimalType, i: DecimalType) =>
                  o.scale == i.scale && o.precision >= i.precision
                case _ => false
              })) =>
        if (outer.dataType == inner.dataType) inner
        else Cast(inner, outer.dataType)
    }
}

/** SparkSessionExtensions installer: registers graft's native function,
  * optimizer rule, and planner strategy. Activate with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — after which
  * `SELECT vec_dot(a.embedding, b.embedding) FROM …` runs the codegen'd
  * kernel, redundant rounds collapse, and [[AsOfJoinNode]] plans natively.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        VectorDot(children.head, children(1))
      }))
    ext.injectOptimizerRule(_ => CollapseRedundantRound)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
