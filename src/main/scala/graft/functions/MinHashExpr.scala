package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: k-value MinHash signature of an
  * `array<string>` of shingles, in ONE pass over the array.
  *
  * Uses the standard double-hashing minwise scheme (Kirsch–Mitzenmacher):
  * h_j(s) = h1(s) + j·h2(s), so each shingle is hashed twice regardless
  * of k, and the k running minima update with adds only. The pure-builtin
  * formulation (k × `array_min(transform(_, xxhash64))`) re-hashed every
  * shingle k times — measured 10.9 s steady-state on 500 docs; this
  * expression makes it sub-second.
  */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash requires array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.signature(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = MinHashSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $cls.signature($c, $k);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSignature = copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

object MinHashSignature {
  /** murmur3 64-bit finalizer — bijective, so uniformity is preserved
    * while correlations between the k linear probes are destroyed. */
  private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33; k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33; k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33; k
  }

  def signature(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        val h1 = Murmur3_x86_32.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 42).toLong
        val h2 = Murmur3_x86_32.hashUnsafeBytes(
          bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
          bytes.length, 7).toLong | 1L // odd → full-period stride
        var j = 0
        var h = h1
        while (j < k) {
          // WITHOUT the finalizer, raw h1 + j·h2 minima are dominated
          // across ALL positions by whichever shingle has the most
          // negative h2 (observed: a 0.99-jaccard pair agreeing on
          // 2/64 positions); fmix64 makes each position's hash family
          // behave independently
          val v = fmix64(h)
          if (v < mins(j)) mins(j) = v
          h += h2
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  def column(c: Column, k: Int): Column = GraftBridge.column(
    MinHashSignature(GraftBridge.expression(c), k))
}
