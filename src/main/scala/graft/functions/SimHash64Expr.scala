package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of an `array<string>` of
  * tokens. For each of the 64 bit positions, tokens vote +1/-1 by their
  * hash's bit; the result bit is the sign of the vote sum.
  *
  * A pure-builtin formulation needs 64 separate `aggregate` passes over
  * the token array (measured 68 s on 500 docs at sf0.01); this single
  * expression does one pass per row with an int[64] on the stack, with
  * full codegen (`doGenCode`) so it stays inside WholeStageCodegen.
  *
  * Token hash = 64-bit combination of two murmur3 passes (seeds 42/7) —
  * deterministic, seed-stable across partitions and runs.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hashTokens(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.hashTokens($c);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64 = copy(child = newChild)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** 64-bit token hash from two 32-bit murmur3 passes over the UTF-8
    * bytes. Public because generated code calls it. */
  def tokenHash64(t: UTF8String): Long = {
    val bytes = t.getBytes
    val h1 = Murmur3_x86_32.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 42)
    val h2 = Murmur3_x86_32.hashUnsafeBytes(
      bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
      bytes.length, 7)
    (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
  }

  def hashTokens(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = tokenHash64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def column(c: Column): Column = GraftBridge.column(
    SimHash64(GraftBridge.expression(c)))
}
