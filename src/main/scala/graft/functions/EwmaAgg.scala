package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, Expression, If, IsNull, Literal, RaiseError}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}

/** Exponentially-weighted moving average as a native Catalyst
  * DeclarativeAggregate — the sensor-series smoother (`sₜ = α·xₜ +
  * (1−α)·sₜ₋₁`, seeded `s₁ = x₁`) that core Spark has no builtin for
  * and that a UDAF would run interpreted.
  *
  * EWMA is an ORDER-dependent fold, so it is only well-defined over an
  * ordered running window frame (`ORDER BY t ROWS UNBOUNDED PRECEDING`),
  * where Spark's window aggregate processor feeds rows to
  * `updateExpressions` one at a time in frame order — an exact
  * sequential IEEE fold, bit-reproducible across runs and engines.
  * `mergeExpressions` (only ever exercised by partial aggregation in a
  * groupBy, where row order does not exist and the statistic is
  * therefore meaningless) RAISES instead of silently folding
  * shuffle-arrival order into the result. That guard assumes the
  * planner picks Partial+Final for groupBy use — a Complete-mode plan
  * would skip merge entirely — so `OrderedFoldPlanSpec` pins the
  * planned mode set for the whole ordered-fold family.
  *
  * Scale shape: the window is one hash shuffle on the partition key +
  * an in-partition sort; state is a single double per key regardless of
  * series length. Null inputs carry the previous state (gaps don't
  * reset the smoother).
  *
  * Pure expression algebra (no imperative buffer), so the update fold
  * stays in the codegen'd aggregate-processor path with an 8-byte
  * mutable buffer — no per-row allocation.
  */
case class EwmaAgg(child: Expression, alpha: Double)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "ewma"

  private lazy val s = AttributeReference("s", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(s)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, DoubleType))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    Seq(If(IsNull(x), s,
      If(IsNull(s), x,
        Literal(alpha) * x + Literal(1.0 - alpha) * s)))
  }

  // order-free merge of an order-dependent fold would silently produce
  // shuffle-dependent garbage; fail loudly at the first merged partial
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Cast(new RaiseError(Literal.create(
      "ewma is order-dependent and only defined over an ordered window " +
        "frame (ORDER BY ... ROWS UNBOUNDED PRECEDING); it cannot be " +
        "used as a groupBy aggregate", StringType)), DoubleType))

  override lazy val evaluateExpression: Expression = s

  override protected def withNewChildInternal(c: Expression): EwmaAgg =
    copy(child = c)
}

object Ewma {
  /** `ewma(x, α)` — use `.over(Window.partitionBy(k).orderBy(t)
    * .rowsBetween(Window.unboundedPreceding, Window.currentRow))`. */
  def ewma(x: Column, alpha: Double): Column =
    GraftBridge.column(
      EwmaAgg(GraftBridge.expression(x), alpha).toAggregateExpression())
}
