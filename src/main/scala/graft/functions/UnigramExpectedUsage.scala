package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Forward-backward EXPECTED piece usage of one word under a unigram
  * piece vocabulary — the soft-EM E-step of Kudo 2018 (the
  * probabilistic counterpart of [[UnigramSegmentPieces]]' hard Viterbi
  * assignment), kept engine-replayable by construction:
  *
  *  - piece probabilities are the exact rationals `cnt / total`
  *    (IEEE division of two BIGINTs — no `exp`/`ln` in the lattice, so
  *    no libm divergence between engines);
  *  - the α/β recursions sum their ≤ `maxPieceLen` terms in FIXED
  *    ascending-length order; every op (div/mul/add) is exactly
  *    specified by IEEE-754, so an oracle replaying the same op order
  *    reproduces the same bits (absent pieces contribute nothing,
  *    which equals adding `0.0` — finite `x + 0.0 == x`);
  *  - each occurrence's posterior `α(i)·p·β(j)/Z` is rounded to a
  *    scaled integer at 1e6 PER OCCURRENCE (i ascending, length
  *    ascending) and summed as longs, so the cross-word aggregation
  *    upstream is order-free exact integer arithmetic — the q120 GD
  *    discipline applied to expected counts.
  *
  * The DP is code-point indexed ([[UnigramSegment.segment]]'s
  * rationale). A word whose lattice has zero total mass (`Z == 0` —
  * a character outside the vocabulary, or α underflow on a
  * pathologically long word) yields the EMPTY usage array; callers
  * (and the oracle) must apply the same guard. Returns
  * `array<struct<piece string, u bigint>>`, entries sorted by piece. */
case class UnigramExpectedUsage(child: Expression, pieces: Seq[String],
    cnts: Seq[Long], total: Long, maxPieceLen: Int)
    extends UnaryExpression {

  require(pieces.nonEmpty && pieces.size == cnts.size,
    "pieces and cnts must be same-length and non-empty")
  require(total > 0, "total must be > 0")
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_expected_usage expects STRING, got " +
        s"${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("piece", StringType, nullable = false),
    StructField("u", LongType, nullable = false))),
    containsNull = false)

  @transient private lazy val prob
      : java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](
      pieces.size * 2)
    var i = 0
    while (i < pieces.size) {
      // the same division the oracle runs: CAST(cnt AS DOUBLE) / t
      m.put(pieces(i),
        java.lang.Double.valueOf(cnts(i).toDouble / total.toDouble))
      i += 1
    }
    m
  }

  /** Public for generated code. */
  def usage(s: UTF8String): GenericArrayData = {
    val w = s.toString
    if (w.isEmpty) return new GenericArrayData(Array.empty[Any])
    val n = w.codePointCount(0, w.length)
    val offsets = new Array[Int](n + 1)
    var k = 0
    var o = 0
    while (k < n) {
      offsets(k) = o
      o = w.offsetByCodePoints(o, 1)
      k += 1
    }
    offsets(n) = w.length
    // forward: alpha(j) = sum over piece lengths l = 1..maxPieceLen
    // (ascending — the pinned op order) of alpha(j-l) * p(piece)
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var t = 0.0
      var l = 1
      val lMax = math.min(maxPieceLen, j)
      while (l <= lMax) {
        val p = prob.get(w.substring(offsets(j - l), offsets(j)))
        if (p ne null) t += alpha(j - l) * p.doubleValue
        l += 1
      }
      alpha(j) = t
      j += 1
    }
    val z = alpha(n)
    if (z == 0.0) return new GenericArrayData(Array.empty[Any])
    // backward: beta(i) = sum over l ascending of p(piece) * beta(i+l)
    val beta = new Array[Double](n + 1)
    beta(n) = 1.0
    var i = n - 1
    while (i >= 0) {
      var t = 0.0
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        val p = prob.get(w.substring(offsets(i), offsets(i + l)))
        if (p ne null) t += p.doubleValue * beta(i + l)
        l += 1
      }
      beta(i) = t
      i -= 1
    }
    // occurrences in (i ascending, l ascending) order; per-occurrence
    // posterior rounds to 1e6-scaled long BEFORE the per-piece sum —
    // integer accumulation is order-free, so only the pinned op chain
    // ((alpha*p)*beta/z)*1e6 carries float semantics
    val acc = new java.util.TreeMap[String, java.lang.Long]()
    i = 0
    while (i < n) {
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        val piece = w.substring(offsets(i), offsets(i + l))
        val p = prob.get(piece)
        if (p ne null) {
          val u = Math.round(
            alpha(i) * p.doubleValue * beta(i + l) / z * 1e6)
          val prev = acc.get(piece)
          acc.put(piece, java.lang.Long.valueOf(
            if (prev eq null) u else prev.longValue + u))
        }
        l += 1
      }
      i += 1
    }
    val out = new Array[Any](acc.size)
    val it = acc.entrySet().iterator()
    var x = 0
    while (it.hasNext) {
      val e = it.next()
      out(x) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue.longValue))
      x += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    usage(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("unigramUsageExpr", this,
      getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.usage($c);")
  }

  override protected def withNewChildInternal(c: Expression)
      : UnigramExpectedUsage = copy(child = c)
  override def prettyName: String = "unigram_expected_usage"
}

object UnigramExpectedUsage {
  def column(c: Column, pieces: Seq[String], cnts: Seq[Long],
      total: Long, maxPieceLen: Int): Column =
    GraftBridge.column(UnigramExpectedUsage(GraftBridge.expression(c),
      pieces, cnts, total, maxPieceLen))
}
