package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite point-in-interval range joins into bucketed
  * equi-joins — [[graft.ops.RangeJoin.pointInInterval]] applied
  * automatically to plain SQL, via
  * `spark.sql.extensions=graft.sql.GraftExtensions`.
  *
  * Spark plans `a JOIN b ON a.x BETWEEN b.lo AND b.hi` (no equality
  * conjunct) as BroadcastNestedLoopJoin or CartesianProduct — O(|a|·|b|)
  * work that dies at scale, and SQL users hit it constantly (validity
  * windows, IP ranges, sessionization audits). With
  * `spark.graft.rangeJoin.binSize = B` (> 0; off by default), an inner
  * join whose condition contains `x >= lo AND x <= hi` across the two
  * sides and NO cross-side equality:
  *
  *   - buckets the point side by `floor(x / B)` (one narrow projection),
  *   - explodes each interval to the buckets it spans
  *     (`sequence(floor(lo/B), floor(hi/B))` — ~(hi-lo)/B + 1 rows),
  *   - hash-joins on the bucket, keeping EVERY original conjunct in the
  *     join condition, so results are exactly the naive join's.
  *
  * Linear shuffle volume instead of a quadratic loop; pick B near the
  * typical interval width so the explode factor stays ~2. Applies to
  * integral (int/long) columns — timestamps should be bucketed as
  * `unix_micros`/`unix_seconds` upstream. Floor division is implemented
  * as `(x - pmod(x, B)) / B`, which is exact for negatives (integral
  * divide truncates toward zero and would misalign buckets across the
  * two sides).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val BinSizeConf = "spark.graft.rangeJoin.binSize"
  private val LbName = "__graft_range_lb"
  private val RbName = "__graft_range_rb"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin = conf.getConfString(BinSizeConf, "0").toLong
    if (bin <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _)
          if j.resolved && !alreadyRewritten(cond) =>
        rewrite(j, left, right, cond, bin).getOrElse(j)
    }
  }

  /** The operator-optimization batch runs to fixed point, so the rule
    * sees its own output again — the marker attribute names make the
    * rewrite idempotent. */
  private def alreadyRewritten(cond: Expression): Boolean =
    cond.references.exists(a => a.name == LbName || a.name == RbName)

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** Find (point, lo, hi, pointSideIsLeft): `point >= lo` and
    * `point <= hi` conjuncts with the point expression on one side and
    * both bounds on the other. Flipped comparisons are normalized. */
  private def findRange(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression, Boolean)] = {
    // normalize every inequality to (point-candidate, bound, isLower)
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(x, lo) => (x, lo)
      case LessThanOrEqual(lo, x) => (x, lo)
    }
    val uppers = conjuncts.collect {
      case LessThanOrEqual(x, hi) => (x, hi)
      case GreaterThanOrEqual(hi, x) => (x, hi)
    }
    (for {
      (x1, lo) <- lowers
      (x2, hi) <- uppers
      if x1.semanticEquals(x2) && integral(x1)
      ptLeft <- (refsOnly(x1, left), refsOnly(x1, right)) match {
        case (true, false) if refsOnly(lo, right) && refsOnly(hi, right) =>
          Some(true)
        case (false, true) if refsOnly(lo, left) && refsOnly(hi, left) =>
          Some(false)
        case _ => None
      }
    } yield (x1, lo, hi, ptLeft)).headOption
  }

  private def floorDiv(x: Expression, bin: Long): Expression = {
    val b = Literal(bin, LongType)
    val xl = Cast(x, LongType)
    IntegralDivide(Subtract(xl, Pmod(xl, b)), b)
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, bin: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    // with a cross-side equality Spark already plans a hash join and
    // evaluates the range as an extra condition — leave those alone
    val hasEquiKey = conjuncts.exists {
      case EqualTo(l, r) =>
        (refsOnly(l, left) && refsOnly(r, right)) ||
          (refsOnly(l, right) && refsOnly(r, left))
      case _ => false
    }
    if (hasEquiKey) return None
    findRange(conjuncts, left, right).map { case (x, lo, hi, ptLeft) =>
      val (ptSide, ivSide) = if (ptLeft) (left, right) else (right, left)
      val lbAlias = Alias(floorDiv(x, bin), LbName)()
      val ptBucketed = Project(ptSide.output :+ lbAlias, ptSide)
      // Sequence is TimeZoneAware (it also builds timestamp ranges):
      // without an explicit zone the expression stays unresolved and
      // the optimizer rejects the rewritten plan. No explicit step:
      // with step=+1 an inverted interval (hi < lo, dirty data) would
      // THROW at runtime, where the pre-rewrite nested-loop join just
      // matched nothing — the two-arg form auto-negates the step and
      // generates a descending bucket list whose rows then fail the
      // original `cond` re-check, preserving match-nothing semantics
      val seqExpr = Sequence(floorDiv(lo, bin), floorDiv(hi, bin),
        None, Some(conf.sessionLocalTimeZone))
      val rbAttr = AttributeReference(RbName, LongType,
        nullable = false)()
      val ivExploded = Generate(Explode(seqExpr), Nil, outer = false,
        None, Seq(rbAttr), ivSide)
      val bucketEq = EqualTo(lbAlias.toAttribute, rbAttr)
      val (newLeft, newRight) =
        if (ptLeft) (ptBucketed, ivExploded) else (ivExploded, ptBucketed)
      val joined = Join(newLeft, newRight, Inner,
        Some(And(bucketEq, cond)), j.hint)
      Project(j.output, joined)
    }
  }
}
