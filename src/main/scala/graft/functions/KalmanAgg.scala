package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, CreateNamedStruct, Expression, If, IsNull, Literal, RaiseError}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}

/** Local-level Kalman filter (random-walk state, the textbook
  * steady-model form — Kalman 1960; Durbin & Koopman 2012 §2.2) as a
  * native DeclarativeAggregate — the sixth ordered fold: where
  * [[EwmaAgg]] smooths with a FIXED gain α, the Kalman gain ADAPTS to
  * the estimate's own uncertainty, converging to the steady-state
  * blend of process noise Q and measurement noise R and recovering
  * quickly after gaps or restarts.
  *
  *   P⁻ₜ = Pₜ₋₁ + Q                    (predict)
  *   Kₜ  = P⁻ₜ / (P⁻ₜ + R)             (gain)
  *   x̂ₜ  = x̂ₜ₋₁ + Kₜ·(zₜ − x̂ₜ₋₁)       (update)
  *   Pₜ  = (1 − Kₜ)·P⁻ₜ
  *
  * Seed convention (pinned, streaming folds have no lookahead):
  * x̂₁ = z₁, P₁ = R (first-estimate uncertainty = one measurement's
  * worth), gain reported as 0 at the seed step. The parenthesization
  * above is duplicated VERBATIM in every update expression (each
  * buffer slot re-derives P⁻ and K, the [[HoltAgg]] discipline), so
  * the q207 oracle replays the fold bit-for-bit.
  *
  * Same execution contract as its siblings: only defined over an
  * ordered running window frame; `mergeExpressions` raises (and
  * [[graft.plans.OrderedFoldCheck]] rejects grouping use at analysis
  * time); null inputs carry all state; three doubles of state per
  * key, one hash shuffle + sort.
  */
case class KalmanAgg(child: Expression, q: Double, r: Double)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  require(q > 0.0, s"process noise q must be positive, got $q")
  require(r > 0.0, s"measurement noise r must be positive, got $r")

  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = true),
    StructField("variance", DoubleType, nullable = true),
    StructField("gain", DoubleType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "kalman"

  private lazy val xh = AttributeReference("xh", DoubleType)()
  private lazy val p = AttributeReference("p", DoubleType)()
  private lazy val g = AttributeReference("g", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(xh, p, g)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, DoubleType), Literal.create(null, DoubleType),
    Literal.create(null, DoubleType))

  // MutableProjection evaluates every update against the OLD buffer,
  // so each expression re-derives P⁻ and K from the pre-step p
  override lazy val updateExpressions: Seq[Expression] = {
    val z = Cast(child, DoubleType)
    def pm = p + Literal(q)
    def kk = pm / (pm + Literal(r))
    Seq(
      If(IsNull(z), xh, If(IsNull(xh), z, xh + kk * (z - xh))),
      If(IsNull(z), p, If(IsNull(xh), Literal(r),
        (Literal(1.0) - kk) * pm)),
      If(IsNull(z), g, If(IsNull(xh), Literal(0.0), kk)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    def raise = Cast(new RaiseError(Literal.create(
      "kalman is order-dependent and only defined over an ordered " +
        "window frame (ORDER BY ... ROWS UNBOUNDED PRECEDING); it " +
        "cannot be used as a groupBy aggregate", StringType)), DoubleType)
    Seq(raise, raise, raise)
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(Literal("estimate"), xh,
      Literal("variance"), p, Literal("gain"), g))

  override protected def withNewChildInternal(c: Expression): KalmanAgg =
    copy(child = c)
}

object Kalman {
  /** `kalman(z, q, r)` → struct(estimate, variance, gain); use over a
    * running window frame, exactly like [[Ewma.ewma]]. */
  def kalman(z: Column, q: Double, r: Double): Column =
    GraftBridge.column(
      KalmanAgg(GraftBridge.expression(z), q, r).toAggregateExpression())
}
