package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: word n-gram shingles of an
  * `array<string>` of tokens, one pass, one output object per shingle.
  *
  * The pure-builtin formulation (`transform(sequence(...), i =>
  * concat_ws(" ", slice(tokens, i, n)))`) allocates a sequence array, a
  * sliced array and a concat per position — measured 20-37 s on 5000
  * ~50-token docs at sf0.1; this does it in ~0.1 s.
  * If the document has fewer than n tokens, the single shingle is the
  * whole token list joined (matching the builtin fallback semantics).
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingles requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = WordShingles.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.shingle($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordShingles = copy(child = newChild)
  override def prettyName: String = "word_shingles"
}

object WordShingles {
  private val Space = UTF8String.fromString(" ")

  def shingle(arr: ArrayData, n: Int): ArrayData = {
    val count = arr.numElements()
    val toks = new Array[UTF8String](count)
    var i = 0
    while (i < count) {
      toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8
                else arr.getUTF8String(i)
      i += 1
    }
    if (count < n) {
      return new GenericArrayData(
        Array[Any](UTF8String.concatWs(Space, toks.toIndexedSeq: _*)))
    }
    val out = new Array[Any](count - n + 1)
    i = 0
    while (i <= count - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = toks(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Space, parts.toIndexedSeq: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(c: Column, n: Int): Column = GraftBridge.column(
    WordShingles(GraftBridge.expression(c), n))
}
