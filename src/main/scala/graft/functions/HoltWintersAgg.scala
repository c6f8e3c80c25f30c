package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{Add, AttributeReference, Cast, Concat, CreateArray, CreateNamedStruct, ElementAt, Expression, If, IsNull, Literal, RaiseError, Slice}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}

/** Holt-Winters additive seasonal smoothing (triple exponential,
  * Winters 1960) as a native DeclarativeAggregate — the fourth member
  * of the ordered-fold family ([[EwmaAgg]], [[CusumAgg]], [[HoltAgg]]).
  * Level + trend + a period-`m` seasonal cycle, the classic smoother
  * for daily-periodic hourly series (the reference's electricity
  * domain: 24 rows/day × 30 days,
  * `producers/producer_electricity_csv.py:46-56`), which plain Holt
  * cannot track.
  *
  *   ℓₜ = α·(xₜ − sₜ₋ₘ) + (1−α)·(ℓₜ₋₁ + bₜ₋₁)
  *   bₜ = β·(ℓₜ − ℓₜ₋₁) + (1−β)·bₜ₋₁
  *   sₜ = γ·(xₜ − ℓₜ) + (1−γ)·sₜ₋ₘ
  *
  * Seeding is the fold-friendly convention of its siblings (no
  * lookahead): ℓ₁ = x₁, b₁ = 0, seasonal cycle all-zero; every slot
  * warms up through γ exactly like the trend warms through β (the
  * textbook alternative — first-season averages — needs a full season
  * of lookahead a streaming fold does not have). The first observation
  * leaves its slot at 0 by construction (γ·(x₁ − ℓ₁) = 0).
  *
  * The seasonal INDEX counts observations, not timestamps: slot =
  * (#prior non-null observations) mod m, and null inputs carry ALL
  * state without advancing the cycle — so align the series to a
  * regular grid first ([[graft.ops.Resample]]) when wall-clock
  * periodicity is the intent.
  *
  * Execution contract identical to its siblings: only defined over an
  * ordered running window frame (exact sequential IEEE fold with the
  * pinned parenthesization the q195 oracle replays step by step);
  * `mergeExpressions` RAISES (an order-free merge of an order-dependent
  * fold would emit shuffle-dependent garbage), and
  * [[graft.plans.OrderedFoldCheck]] additionally rejects grouping-
  * aggregate use at analysis time. State per key is m+2 doubles + one
  * long regardless of series length; the per-step seasonal-cycle
  * rewrite allocates one m-element array per row (m ≈ 24: bytes, not
  * buffers).
  *
  * Returns struct(level, trend, seasonal, forecast): `seasonal` is the
  * current row's updated seasonal component sₜ; `forecast` is the
  * one-step-ahead x̂ₜ₊₁ = ℓₜ + bₜ + sₜ₊₁₋ₘ (next slot of the updated
  * cycle).
  */
case class HoltWintersAgg(child: Expression, alpha: Double, beta: Double,
    gamma: Double, m: Int)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
  require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0, 1], got $beta")
  require(gamma >= 0.0 && gamma <= 1.0, s"gamma must be in [0, 1], got $gamma")
  require(m >= 2, s"season length m must be >= 2, got $m")

  override def dataType: DataType = StructType(Seq(
    StructField("level", DoubleType, nullable = true),
    StructField("trend", DoubleType, nullable = true),
    StructField("seasonal", DoubleType, nullable = true),
    StructField("forecast", DoubleType, nullable = true)))
  override def nullable: Boolean = false
  override def prettyName: String = "holt_winters"

  private lazy val l = AttributeReference("l", DoubleType)()
  private lazy val b = AttributeReference("b", DoubleType)()
  private lazy val seas = AttributeReference("seas",
    ArrayType(DoubleType, containsNull = false), nullable = false)()
  // count of non-null observations folded so far (cycle position)
  private lazy val n = AttributeReference("n", LongType, nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(l, b, seas, n)

  private def zeros: Expression = Literal.create(
    Seq.fill(m)(0.0), ArrayType(DoubleType, containsNull = false))

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, DoubleType), Literal.create(null, DoubleType),
    zeros, Literal(0L))

  // slot of observation number `cnt` (0-based), as a 1-based list index
  private def slot1(cnt: Expression): Expression =
    Cast(cnt % Literal(m.toLong), IntegerType) + Literal(1)

  /** seasonal cycle with 1-based slot `at` replaced by `v` (concat of
    * slices — no element-update expression exists in Catalyst, and an
    * m-element copy per step is bytes) */
  private def cycleWith(at: Expression, v: Expression): Expression =
    Concat(Seq(
      Slice(seas, Literal(1), at - Literal(1)),
      CreateArray(Seq(v)),
      Slice(seas, at + Literal(1), Literal(m) - at)))

  // MutableProjection evaluates every update against the OLD buffer
  // before writing, so all four expressions read the pre-step state;
  // the new level is re-derived where needed (cheap, exact — the same
  // duplication discipline as HoltAgg, replayed verbatim by the oracle)
  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    def sm = ElementAt(seas, slot1(n))
    def newLevel = Literal(alpha) * (x - sm) +
      Literal(1.0 - alpha) * (l + b)
    def newSeason = Literal(gamma) * (x - newLevel) +
      Literal(1.0 - gamma) * sm
    Seq(
      If(IsNull(x), l, If(IsNull(l), x, newLevel)),
      If(IsNull(x), b, If(IsNull(l), Literal(0.0),
        Literal(beta) * (newLevel - l) + Literal(1.0 - beta) * b)),
      // first observation: γ·(x − ℓ₁) = γ·(x − x) = 0 = the slot's
      // initial value, so the cycle is carried unchanged
      If(IsNull(x), seas, If(IsNull(l), seas,
        cycleWith(slot1(n), newSeason))),
      If(IsNull(x), n, Add(n, Literal(1L))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    def raise(to: DataType) = Cast(new RaiseError(Literal.create(
      "holt_winters is order-dependent and only defined over an ordered " +
        "window frame (ORDER BY ... ROWS UNBOUNDED PRECEDING); it " +
        "cannot be used as a groupBy aggregate", StringType)), to)
    Seq(raise(DoubleType), raise(DoubleType),
      raise(ArrayType(DoubleType, containsNull = false)), raise(LongType))
  }

  override lazy val evaluateExpression: Expression = {
    // current row's seasonal = slot of obs n−1 (post-update buffer);
    // forecast = ℓ + b + next slot (obs n). Before any observation both
    // are null alongside the null level.
    val cur = If(n > Literal(0L),
      ElementAt(seas, slot1(n - Literal(1L))),
      Literal.create(null, DoubleType))
    val nxt = If(n > Literal(0L), l + b + ElementAt(seas, slot1(n)),
      Literal.create(null, DoubleType))
    CreateNamedStruct(Seq(
      Literal("level"), l, Literal("trend"), b,
      Literal("seasonal"), cur, Literal("forecast"), nxt))
  }

  override protected def withNewChildInternal(c: Expression): HoltWintersAgg =
    copy(child = c)
}

object HoltWinters {
  /** `holt_winters(x, α, β, γ, m)` → struct(level, trend, seasonal,
    * forecast); use over a running window frame, exactly like
    * [[Ewma.ewma]]. */
  def holtWinters(x: Column, alpha: Double, beta: Double, gamma: Double,
      m: Int): Column =
    GraftBridge.column(
      HoltWintersAgg(GraftBridge.expression(x), alpha, beta, gamma, m)
        .toAggregateExpression())
}
