package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Fixed-length PCM resample — the audio twin of [[ImageResize]]: the
  * ingestion step that turns variable-length clips into the fixed-size
  * sample tensor an embedding or feature model consumes.
  *
  * `wav_resample(bytes, outN)` → `array<float>` of `outN` samples in
  * the raw 16-bit domain (−32768…32767; callers normalize at their
  * model's convention), linearly interpolated at half-sample-center
  * positions `(o + 0.5) · n / outN − 0.5` clamped to the clip — the
  * exact 1-D instance of the resize sampling law, with the same
  * documented double operation order the q193 oracle replays.
  *
  * Mono 16-bit PCM only (the shape the [[MediaDecode.wavPcm]] walk
  * validates byte-tight); multi-channel, non-PCM, other bit depths,
  * and malformed containers null out — never crash. Sampling reads
  * the input bytes IN PLACE (zero copy, like the BMP resize path):
  * in-row codegen'd work, no shuffle, no Python round-trip.
  */
object AudioResample {

  def resample(b: Array[Byte], outN: Int): ArrayData = {
    if (outN <= 0 || outN > (1 << 22)) return null
    val pcm = MediaDecode.wavPcm(b)
    if (pcm == null) return null
    val (_, channels, dataPos, n) = pcm
    if (channels != 1 || n <= 0) return null
    def at(i: Int): Int = {
      val p = (dataPos + 2L * i).toInt // bounded by the wavPcm guard
      ((b(p) & 0xff) | (b(p + 1) << 8)).toShort.toInt
    }
    val out = new Array[Float](outN)
    var o = 0
    while (o < outN) {
      val sx = math.min(math.max((o + 0.5) * n / outN - 0.5, 0.0),
        (n - 1).toDouble)
      val x0 = sx.toInt; val fx = sx - x0
      val x1 = math.min(x0 + 1, n - 1)
      out(o) = ((1.0 - fx) * at(x0) + fx * at(x1)).toFloat
      o += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  def column(bytes: Column, outN: Int): Column =
    GraftBridge.column(
      AudioResampleExpr(GraftBridge.expression(bytes), outN))
}

case class AudioResampleExpr(child: Expression, outN: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_resample expects BINARY, got ${child.dataType.simpleString}")
  override def dataType: DataType =
    ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    AudioResample.resample(input.asInstanceOf[Array[Byte]], outN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = AudioResample.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.resample($c, $outN);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(c: Expression)
      : AudioResampleExpr = copy(child = c)
  override def prettyName: String = "wav_resample"
}
