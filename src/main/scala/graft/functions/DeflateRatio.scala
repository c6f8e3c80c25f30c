package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: DEFLATE the document's UTF-8
  * bytes and report the compressed length. `deflate_len / n_bytes` is
  * the classic corpus-curation repetitiveness filter (machine-
  * generated boilerplate, keyword stuffing, template spam compress
  * far below natural prose — the signal the n-gram heuristics q66/q70
  * approximate, computed by an actual compressor): curation drops or
  * down-weights documents whose ratio falls under a floor.
  *
  * Same no-codec-library stance as [[Gunzip]]: the JDK ships zlib
  * (`java.util.zip.Deflater`). Level 6 (zlib default), raw stream
  * (no zlib/gzip envelope), no preset dictionary — pinned so the
  * measurement is a stable function of the bytes. Deterministic for a
  * given zlib, and [[DeflateRatioSpec]] pins the LAWS (lossless
  * roundtrip against `Inflater`, determinism, repetitive < random)
  * rather than absolute lengths, which are zlib-build-specific.
  *
  * Per-row in-expression work inside whole-stage codegen — a narrow
  * map over the scan, corpus-parallel. No DuckDB oracle exists for
  * this one (DuckDB SQL exposes no deflate), so the catalog row is a
  * rows-only check; correctness rides the roundtrip law.
  */
object Deflate {

  /** Raw-DEFLATE compress (level 6, nowrap) — the measurement
    * primitive, also used by the spec's roundtrip law. */
  def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(data)
      d.finish()
      val out = new java.io.ByteArrayOutputStream(
        math.max(64, data.length / 3))
      val buf = new Array[Byte](8192)
      while (!d.finished()) {
        val n = d.deflate(buf)
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally d.end()
  }

  /** Compressed length of a string's UTF-8 bytes. */
  def deflateLen(s: UTF8String): Int = deflate(s.getBytes).length

  def column(c: Column): Column =
    GraftBridge.column(DeflateLenExpr(GraftBridge.expression(c)))

  /** `deflate_len / n_bytes`, NULL for the empty string (no bytes to
    * measure; raw deflate still emits a 2-byte empty block, and a
    * 0-denominator ratio would be noise, not signal). */
  def ratio(c: Column): Column =
    when(octet_length(c) === 0, lit(null).cast("double"))
      .otherwise(column(c).cast("double") /
        octet_length(c).cast("double"))
}

case class DeflateLenExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len expects STRING, got ${child.dataType.simpleString}")
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Deflate.deflateLen(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = Deflate.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls.deflateLen($c);")
  }
  override protected def withNewChildInternal(c: Expression)
      : DeflateLenExpr = copy(child = c)
  override def prettyName: String = "deflate_len"
}
