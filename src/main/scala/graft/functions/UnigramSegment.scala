package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram piece vocabulary
  * ([[graft.operators.Unigram]]) — a codegen'd expression carrying
  * the (piece → scaled-int score) table as expression state (the
  * [[AhoContains]] shape: ships the arrays, builds the transient
  * lookup once per JVM).
  *
  * Returns the combined exact-integer objective of the OPTIMAL
  * segmentation: `bestScore·1024 − pieceCount` (maximized — scores
  * are ≤ 0 scaled log-probs, and a count difference < 1024 can never
  * outvote one 10⁻⁶-of-ln score step, so the single BIGINT encodes
  * "max score, then min pieces" with no float compare). Callers
  * recover both parts arithmetically: `nv = −value; count = nv mod
  * 1024; score = −((nv − count) / 1024)` — the identical integer ops
  * the DuckDB oracle runs. A position coverable by no piece consumes
  * one character at the [[UnigramSegment.UnkScore]] penalty (cannot
  * happen when encoding the corpus the vocab was trained on — single
  * characters are always kept). The empty string segments to 0. */
case class UnigramSegment(child: Expression, pieces: Seq[String],
    scores: Seq[Long], maxPieceLen: Int) extends UnaryExpression {

  require(pieces.nonEmpty && pieces.size == scores.size,
    "pieces and scores must be same-length and non-empty")
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_segment expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType

  @transient private lazy val table
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](
      pieces.size * 2)
    var i = 0
    while (i < pieces.size) {
      m.put(pieces(i), java.lang.Long.valueOf(scores(i)))
      i += 1
    }
    m
  }

  /** Public for generated code. The DP runs over CODE POINTS, not
    * UTF-16 units — the vocabulary is trained with Spark SQL `substr`
    * (code-point semantics), and a UTF-16-indexed DP would misalign
    * on non-BMP characters (split surrogate pairs into pieces the
    * vocab can never contain). */
  def segment(s: UTF8String): Long = {
    val w = s.toString
    if (w.isEmpty) return 0L
    // offsets(i) = UTF-16 index of the i-th code point; n code points
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
    // best(i) = optimal combined objective for the first i code points
    val best = new Array[Long](n + 1)
    var i = 1
    while (i <= n) {
      var b = Long.MinValue
      var j = math.max(0, i - maxPieceLen)
      while (j < i) {
        val sc = table.get(w.substring(offsets(j), offsets(i)))
        if (sc ne null) {
          val v = best(j) + sc.longValue * 1024L - 1L
          if (v > b) b = v
        }
        j += 1
      }
      if (b == Long.MinValue) {
        // no piece ends here from any split: consume one CODE POINT
        // as UNK
        b = best(i - 1) + UnigramSegment.UnkScore * 1024L - 1L
      }
      best(i) = b
      i += 1
    }
    best(n)
  }

  override def nullSafeEval(input: Any): Any =
    segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("unigramExpr", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segment($c);")
  }

  override protected def withNewChildInternal(c: Expression)
      : UnigramSegment = copy(child = c)
  override def prettyName: String = "unigram_segment"
}

object UnigramSegment {

  /** Scaled-int score charged per unknown character. */
  val UnkScore: Long = -30000000L

  def column(c: Column, pieces: Seq[String], scores: Seq[Long],
      maxPieceLen: Int): Column =
    GraftBridge.column(UnigramSegment(GraftBridge.expression(c),
      pieces, scores, maxPieceLen))
}

/** The CANONICAL optimal segmentation itself (array of pieces), for
  * the EM re-estimation step ([[graft.operators.Unigram.pieceVocabEm]])
  * where the optimizer needs per-piece usage, not just the objective.
  *
  * Among all segmentations maximizing the [[UnigramSegment]] objective
  * `score·1024 − count`, ties are broken by the LEXICOGRAPHICALLY
  * SMALLEST piece array. Because every candidate piece at a given
  * position is a substring of the word starting at that position, two
  * distinct candidates are always one-a-strict-prefix-of-the-other, so
  * "lex-smallest array" ≡ "greedy shortest piece at every step among
  * optimal continuations" — computed by one right-to-left suffix DP
  * (`best(i)` = optimal objective of the suffix from code point i)
  * followed by a left-to-right walk that takes the SHORTEST piece `p`
  * at `i` with `obj(p) + best(i+|p|) = best(i)`. The same canonical
  * choice is replayable in SQL as `ORDER BY objective DESC, piece_list
  * ASC LIMIT 1` over the full recursive enumeration — which is exactly
  * what the q182 oracle runs.
  *
  * Intended for corpus-encode (every single character of the training
  * corpus is in the vocabulary, so the UNK fallback never fires
  * there); a position no piece covers consumes one code point at
  * [[UnigramSegment.UnkScore]] and emits that character verbatim. */
case class UnigramSegmentPieces(child: Expression, pieces: Seq[String],
    scores: Seq[Long], maxPieceLen: Int) extends UnaryExpression {

  require(pieces.nonEmpty && pieces.size == scores.size,
    "pieces and scores must be same-length and non-empty")
  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unigram_segment_pieces expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  @transient private lazy val table
      : java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](
      pieces.size * 2)
    var i = 0
    while (i < pieces.size) {
      m.put(pieces(i), java.lang.Long.valueOf(scores(i)))
      i += 1
    }
    m
  }

  /** Public for generated code. Code-point indexed like
    * [[UnigramSegment.segment]]. */
  def segmentPieces(s: UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val w = s.toString
    if (w.isEmpty)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
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
    // best(i) = optimal objective for the suffix starting at code
    // point i (best(n) = 0)
    val best = new Array[Long](n + 1)
    var i = n - 1
    while (i >= 0) {
      var b = Long.MinValue
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        val sc = table.get(w.substring(offsets(i), offsets(i + l)))
        if (sc ne null) {
          val v = best(i + l) + sc.longValue * 1024L - 1L
          if (v > b) b = v
        }
        l += 1
      }
      if (b == Long.MinValue)
        b = best(i + 1) + UnigramSegment.UnkScore * 1024L - 1L
      best(i) = b
      i -= 1
    }
    // greedy walk: shortest piece achieving the optimum at each step
    // = lex-smallest piece array among all optimal segmentations
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    i = 0
    while (i < n) {
      var taken = false
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (!taken && l <= lMax) {
        val p = w.substring(offsets(i), offsets(i + l))
        val sc = table.get(p)
        if ((sc ne null) &&
            best(i + l) + sc.longValue * 1024L - 1L == best(i)) {
          out += UTF8String.fromString(p)
          i += l
          taken = true
        }
        l += 1
      }
      if (!taken) {
        out += UTF8String.fromString(
          w.substring(offsets(i), offsets(i + 1)))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    segmentPieces(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val ref = ctx.addReferenceObj("unigramPiecesExpr", this,
      getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segmentPieces($c);")
  }

  override protected def withNewChildInternal(c: Expression)
      : UnigramSegmentPieces = copy(child = c)
  override def prettyName: String = "unigram_segment_pieces"
}

object UnigramSegmentPieces {
  def column(c: Column, pieces: Seq[String], scores: Seq[Long],
      maxPieceLen: Int): Column =
    GraftBridge.column(UnigramSegmentPieces(GraftBridge.expression(c),
      pieces, scores, maxPieceLen))
}
