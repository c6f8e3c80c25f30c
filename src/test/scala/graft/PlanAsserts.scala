package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}

/** Shared plan-shape assertions: walk the executed plan through AQE
  * wrappers and count real shuffles (BroadcastExchange is not one, and
  * a ReusedExchange is the SAME shuffle, so instances are deduped by
  * identity). */
object PlanAsserts {

  def collectPlan(p: SparkPlan): Seq[SparkPlan] = {
    val next: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: ReusedExchangeExec => Seq(r.child)
      case _ => p.children
    }
    p +: next.flatMap(collectPlan)
  }

  /** Distinct shuffle exchanges executed by `df` (runs the query so
    * AQE finalizes its stages first). */
  def countShuffles(df: DataFrame): Int = {
    df.collect()
    collectPlan(df.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => System.identityHashCode(s) }
      .distinct.size
  }
}
