package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, CreateNamedStruct, Expression, If, IsNull, Literal, RaiseError}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}

/** Holt linear-trend smoothing (double exponential, Holt 1957) as a
  * native DeclarativeAggregate — the third member of the ordered-fold
  * family ([[EwmaAgg]], [[CusumAgg]]): level AND slope state, so the
  * smoother tracks a drifting signal without the plain EWMA's lag,
  * and `level + trend` is the one-step-ahead forecast a sensor
  * pipeline alarms against.
  *
  *   sₜ = α·xₜ + (1−α)·(sₜ₋₁ + bₜ₋₁)
  *   bₜ = β·(sₜ − sₜ₋₁) + (1−β)·bₜ₋₁        seeded s₁ = x₁, b₁ = 0
  *
  * The zero-trend seed is the documented convention here (the common
  * alternative, b₁ = x₂ − x₁, needs lookahead a streaming fold does
  * not have); the slope warms up through β like every later step.
  *
  * Same execution contract as its siblings: only defined over an
  * ordered running window frame (exact sequential IEEE fold with a
  * pinned parenthesization — `α·x + (1−α)·(s + b)` then
  * `β·(s′ − s) + (1−β)·b` — that the q194 oracle replays step by
  * step); `mergeExpressions` raises; null inputs carry both states;
  * two doubles of state per key, one hash shuffle + sort.
  */
case class HoltAgg(child: Expression, alpha: Double, beta: Double)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
  require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1], got $beta")

  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType, nullable = true),
    StructField("trend", DoubleType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "holt"

  private lazy val s = AttributeReference("s", DoubleType)()
  private lazy val b = AttributeReference("b", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(s, b)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, DoubleType), Literal.create(null, DoubleType))

  // MutableProjection evaluates every update against the OLD buffer
  // before writing, so both expressions read the pre-step (s, b); the
  // new level is re-derived inside the trend update (cheap, exact)
  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    def newLevel =
      Literal(alpha) * x + Literal(1.0 - alpha) * (s + b)
    Seq(
      If(IsNull(x), s, If(IsNull(s), x, newLevel)),
      If(IsNull(x), b, If(IsNull(s), Literal(0.0),
        Literal(beta) * (newLevel - s) + Literal(1.0 - beta) * b)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    def raise = Cast(new RaiseError(Literal.create(
      "holt is order-dependent and only defined over an ordered window " +
        "frame (ORDER BY ... ROWS UNBOUNDED PRECEDING); it cannot be " +
        "used as a groupBy aggregate", StringType)), DoubleType)
    Seq(raise, raise)
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(Literal("level"), s, Literal("trend"), b))

  override protected def withNewChildInternal(c: Expression): HoltAgg =
    copy(child = c)
}

object Holt {
  /** `holt(x, α, β)` → struct(level, trend); use over a running window
    * frame, exactly like [[Ewma.ewma]]. One-step forecast =
    * `level + trend`. */
  def holt(x: Column, alpha: Double, beta: Double): Column =
    GraftBridge.column(
      HoltAgg(GraftBridge.expression(x), alpha, beta)
        .toAggregateExpression())
}
