package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, CreateNamedStruct, Expression, GetStructField, If, IsNotNull, IsNull, Literal, RaiseError}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}

/** Exponentially-weighted mean AND variance as a native
  * DeclarativeAggregate — the fifth member of the ordered-fold family
  * ([[EwmaAgg]], [[CusumAgg]], [[HoltAgg]], [[HoltWintersAgg]]): the
  * one-pass incremental update (West 1979 / the RiskMetrics EWMA
  * variance) that turns a raw stream into the (μ, σ²) state a z-score
  * anomaly detector thresholds against.
  *
  *   Δₜ  = xₜ − μₜ₋₁
  *   μₜ  = μₜ₋₁ + α·Δₜ
  *   σ²ₜ = (1−α)·(σ²ₜ₋₁ + Δₜ·(α·Δₜ))        seeded μ₁ = x₁, σ²₁ = 0
  *
  * The variance recurrence is algebraically the exponentially-weighted
  * second central moment; the Δ·(α·Δ) grouping is the PINNED
  * parenthesization (the q200 oracle replays the fold step by step
  * with the same association, so every intermediate is bit-identical).
  *
  * `seed` supports the maintained-view continuation
  * ([[graft.ops.AnomalyView]]): a row whose seed struct is non-null
  * RESTORES the buffer to exactly (seed.mean, seed.var) — the
  * two-component analogue of the EWMA pseudo-row trick (which can
  * seed only a single state value via s₁ = x₁). Plain aggregate use
  * passes a null literal and never takes the branch.
  *
  * Same execution contract as its siblings: only defined over an
  * ordered running window frame; `mergeExpressions` raises (and
  * [[graft.plans.OrderedFoldCheck]] rejects grouping use at analysis
  * time); null inputs carry both states; two doubles of state per key,
  * one hash shuffle + sort.
  */
case class EwVarAgg(child: Expression, alpha: Double,
    seed: Expression = EwVarAgg.nullSeed)
    extends DeclarativeAggregate {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")

  override def children: Seq[Expression] = Seq(child, seed)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): EwVarAgg =
    copy(child = cs(0), seed = cs(1))

  override def dataType: DataType = EwVarAgg.stateType
  override def nullable: Boolean = false
  override def prettyName: String = "ewvar"

  private lazy val m = AttributeReference("m", DoubleType)()
  private lazy val s2 = AttributeReference("s2", DoubleType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(m, s2)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, DoubleType), Literal.create(null, DoubleType))

  // MutableProjection evaluates every update against the OLD buffer
  // before writing, so both expressions read the pre-step (m, s2)
  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    def diff = x - m
    Seq(
      If(IsNotNull(seed), GetStructField(seed, 0, Some("mean")),
        If(IsNull(x), m, If(IsNull(m), x, m + Literal(alpha) * diff))),
      If(IsNotNull(seed), GetStructField(seed, 1, Some("var")),
        If(IsNull(x), s2, If(IsNull(m), Literal(0.0),
          Literal(1.0 - alpha) * (s2 + diff * (Literal(alpha) * diff))))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    def raise = Cast(new RaiseError(Literal.create(
      "ewvar is order-dependent and only defined over an ordered window " +
        "frame (ORDER BY ... ROWS UNBOUNDED PRECEDING); it cannot be " +
        "used as a groupBy aggregate", StringType)), DoubleType)
    Seq(raise, raise)
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(Literal("mean"), m, Literal("var"), s2))
}

object EwVarAgg {
  val stateType: StructType = StructType(Seq(
    StructField("mean", DoubleType, nullable = true),
    StructField("var", DoubleType, nullable = true)))
  def nullSeed: Expression = Literal.create(null, stateType)
}

object EwVar {
  /** `ewvar(x, α)` → struct(mean, var); use over a running window
    * frame, exactly like [[Ewma.ewma]]. A z-score anomaly flag is
    * `(x − lag(mean)) / sqrt(lag(var))` thresholded downstream — the
    * PRIOR state, so the tested point never absorbs itself first. */
  def ewvar(x: Column, alpha: Double): Column =
    GraftBridge.column(
      EwVarAgg(GraftBridge.expression(x), alpha).toAggregateExpression())

  /** The maintained-view continuation: rows with a non-null `seed`
    * struct restore the buffer to exactly that state. */
  private[graft] def ewvarSeeded(x: Column, alpha: Double,
      seed: Column): Column =
    GraftBridge.column(
      EwVarAgg(GraftBridge.expression(x), alpha,
        GraftBridge.expression(seed)).toAggregateExpression())
}
