package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.catalyst.expressions.aggregate.{Complete, Final, Partial}
import org.apache.spark.sql.expressions.Window

import graft.functions.{Cusum, EwVar, Ewma, Holt, HoltWinters, Kalman}

/** Defense-in-depth for the ordered-fold aggregate family (ewma, ewvar,
  * cusum, holt, holt_winters, kalman): the groupBy refusal relies on the
  * planner choosing Partial+Final so the raising `mergeExpressions` is on
  * the execution path. If a future planner ever chose Complete mode for
  * these, merge would be skipped and rows would silently fold in
  * shuffle-arrival order. This spec pins the planned mode set so such a
  * change fails loudly here instead of producing order-dependent results.
  */
class OrderedFoldPlanSpec extends SparkTestBase {
  import spark.implicits._

  private val folds: Seq[(String, Column)] = Seq(
    "ewma" -> Ewma.ewma($"v", 0.5),
    "ewvar" -> EwVar.ewvar($"v", 0.5),
    "cusum" -> Cusum.cusum($"v", 0.0, 0.5),
    "holt" -> Holt.holt($"v", 0.5, 0.3),
    "holt_winters" -> HoltWinters.holtWinters($"v", 0.5, 0.3, 0.2, 4),
    "kalman" -> Kalman.kalman($"v", 0.01, 0.25)
  )

  test("groupBy plans every ordered fold as Partial+Final, never Complete") {
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    for ((name, col) <- folds) {
      // sparkPlan is the planner's output before (and regardless of) AQE;
      // aggregate modes are fixed at planning time.
      val plan = df.groupBy($"k").agg(col.as("f")).queryExecution.sparkPlan
      val modes = plan.collect { case a: BaseAggregateExec =>
        a.aggregateExpressions.map(_.mode)
      }.flatten
      assert(modes.nonEmpty, s"$name: no aggregate exec planned\n$plan")
      assert(!modes.contains(Complete),
        s"$name: planner chose Complete mode — the raising merge guard " +
          s"would be bypassed and the fold would be order-dependent\n$plan")
      assert(modes.contains(Partial) && modes.contains(Final),
        s"$name: expected Partial+Final, got $modes\n$plan")
    }
  }

  test("window use plans no aggregate exec (frame-ordered processor path)") {
    val w = Window.partitionBy($"k").orderBy($"t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = Seq(("a", 1, 1.0), ("a", 2, 2.0)).toDF("k", "t", "v")
    for ((name, col) <- folds) {
      val plan = df.withColumn("f", col.over(w)).queryExecution.sparkPlan
      val aggs = plan.collect { case a: BaseAggregateExec => a }
      assert(aggs.isEmpty, s"$name: unexpected aggregate exec\n$plan")
    }
  }
}
