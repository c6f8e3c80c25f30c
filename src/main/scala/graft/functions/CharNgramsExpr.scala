package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: character n-grams of a string, one
  * pass over the code points (the [[WordShingles]] argument applied to
  * characters: the builtin `transform(sequence(...), i ->
  * substring(...))` chain allocates per position and re-walks the
  * UTF-8 bytes per substring).
  *
  * Semantics (mirrored by the DuckDB oracles):
  *  - code-point n-grams, so multi-byte characters count as one;
  *  - text shorter than n ⇒ the single gram is the whole text;
  *  - empty text ⇒ empty array.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_ngrams requires string, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    CharNgrams.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = CharNgrams.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.grams($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : CharNgrams = copy(child = newChild)
  override def prettyName: String = "char_ngrams"
}

object CharNgrams {
  def grams(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    if (len < n)
      return new GenericArrayData(Array[Any](s.clone()))
    val out = new Array[Any](len - n + 1)
    var i = 0
    while (i <= len - n) {
      out(i) = s.substring(i, i + n)
      i += 1
    }
    new GenericArrayData(out)
  }

  def column(c: Column, n: Int): Column = GraftBridge.column(
    CharNgrams(GraftBridge.expression(c), n))
}
