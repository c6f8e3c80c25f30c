package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, CreateNamedStruct, Expression, Greatest, If, IsNull, Literal, RaiseError}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, StringType, StructField, StructType}

/** Two-sided CUSUM (Page 1954) mean-shift detector as a native
  * DeclarativeAggregate — the sequential control chart behind sensor
  * drift alarms, which (like [[EwmaAgg]]) core Spark cannot express:
  * both one-sided statistics are order-dependent recurrences,
  *
  *   s⁺ₜ = max(0, s⁺ₜ₋₁ + (xₜ − μ − κ))
  *   s⁻ₜ = max(0, s⁻ₜ₋₁ + (μ − xₜ − κ))
  *
  * against a known target mean μ with slack κ (drift smaller than κ per
  * observation accumulates no evidence). An alarm is `s > h` downstream;
  * the aggregate emits both statistics so callers pick thresholds.
  *
  * Same execution contract as [[EwmaAgg]]: only defined over an ordered
  * running window frame, where the window aggregate processor folds rows
  * in frame order (exact sequential IEEE arithmetic, engine-reproducible);
  * `mergeExpressions` raises because an unordered groupBy merge of an
  * order-dependent fold is meaningless. Buffer is two doubles per key —
  * constant state at any series length; one hash shuffle + in-partition
  * sort, the same cost as any window. Null inputs carry the state.
  */
case class CusumAgg(child: Expression, mu: Double, slack: Double)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  require(slack >= 0.0, s"slack must be non-negative, got $slack")

  override def dataType: DataType = StructType(Seq(
    StructField("s_pos", DoubleType, nullable = false),
    StructField("s_neg", DoubleType, nullable = false)))
  override def nullable: Boolean = false
  override def prettyName: String = "cusum"

  private lazy val sPos = AttributeReference("sPos", DoubleType,
    nullable = false)()
  private lazy val sNeg = AttributeReference("sNeg", DoubleType,
    nullable = false)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(sPos, sNeg)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0.0), Literal(0.0))

  // parenthesization is part of the contract: s + ((x - mu) - slack)
  // is the exact IEEE sequence the oracle replays
  override lazy val updateExpressions: Seq[Expression] = {
    val x = Cast(child, DoubleType)
    Seq(
      If(IsNull(x), sPos,
        Greatest(Seq(Literal(0.0),
          sPos + (x - Literal(mu) - Literal(slack))))),
      If(IsNull(x), sNeg,
        Greatest(Seq(Literal(0.0),
          sNeg + (Literal(mu) - x - Literal(slack))))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    def raise = Cast(new RaiseError(Literal.create(
      "cusum is order-dependent and only defined over an ordered window " +
        "frame (ORDER BY ... ROWS UNBOUNDED PRECEDING); it cannot be " +
        "used as a groupBy aggregate", StringType)), DoubleType)
    Seq(raise, raise)
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(
      Literal("s_pos"), sPos, Literal("s_neg"), sNeg))

  override protected def withNewChildInternal(c: Expression): CusumAgg =
    copy(child = c)
}

object Cusum {
  /** `cusum(x, μ, κ)` → struct(s_pos, s_neg); use over a running window
    * frame, exactly like [[Ewma.ewma]]. */
  def cusum(x: Column, mu: Double, slack: Double): Column =
    GraftBridge.column(
      CusumAgg(GraftBridge.expression(x), mu, slack).toAggregateExpression())
}
