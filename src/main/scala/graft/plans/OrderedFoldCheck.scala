package graft.plans

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}

import graft.functions.{CusumAgg, EwmaAgg, EwVarAgg, HoltAgg, HoltWintersAgg, KalmanAgg}

/** Analysis-time rejection of ordered-fold aggregates (ewma / ewvar /
  * cusum / holt / holt_winters) inside a grouping `Aggregate`.
  *
  * These folds are order-dependent, so they are only defined over an
  * ordered running window frame (a logical `Window` node, where the
  * window processor feeds rows in frame order). The aggregates' own
  * `mergeExpressions` RAISE, which catches the common Partial+Final
  * physical plan — but a planner that ever chose Complete mode for a
  * hash aggregate would skip the merge path entirely and silently fold
  * rows in shuffle-arrival order. This check rule closes that hole at
  * ANALYSIS time, before any physical mode is chosen: a grouping
  * aggregate containing one of these functions is rejected regardless
  * of how it would have been executed.
  *
  * Installed by [[graft.sql.GraftExtensions]] via `injectCheckRule`.
  * Sessions without the extensions still get the merge-raise defense.
  */
object OrderedFoldCheck extends (LogicalPlan => Unit) {
  private def orderedFoldName(f: AggregateFunction): Option[String] =
    f match {
      case _: EwmaAgg        => Some("ewma")
      case _: EwVarAgg       => Some("ewvar")
      case _: CusumAgg       => Some("cusum")
      case _: HoltAgg        => Some("holt")
      case _: HoltWintersAgg => Some("holt_winters")
      case _: KalmanAgg      => Some("kalman")
      case _                 => None
    }

  override def apply(plan: LogicalPlan): Unit =
    // subqueriesAll: an ordered fold inside a scalar/IN/EXISTS subquery
    // lives in a nested plan the root foreach never visits — the
    // Complete-mode hole would stay open there without this
    (plan +: plan.subqueriesAll).foreach(_.foreach {
      case agg: Aggregate =>
        agg.aggregateExpressions.foreach(_.foreach {
          case ae: AggregateExpression =>
            orderedFoldName(ae.aggregateFunction).foreach { name =>
              throw new AnalysisException(
                "USER_RAISED_EXCEPTION",
                Map("errorMessage" ->
                  (s"$name is order-dependent and only defined over an " +
                    "ordered window frame (ORDER BY ... ROWS UNBOUNDED " +
                    "PRECEDING); it cannot be used as a groupBy " +
                    "aggregate")))
            }
          case _ =>
        })
      case _ =>
    })
}
