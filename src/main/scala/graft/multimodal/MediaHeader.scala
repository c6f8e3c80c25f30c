package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL media metadata extraction from raw bytes — no codec library
  * needed, because container headers are plain byte arithmetic:
  * PNG (IHDR big-endian dims), GIF (logical-screen little-endian),
  * BMP (BITMAPINFOHEADER), JPEG (SOF marker scan), WAV (RIFF/WAVE
  * fmt chunk → sample rate). Sniffing + dimensions are exact; full
  * pixel/sample DECODE lives in [[MediaDecode]] (BMP/PNG/WAV) and
  * [[JpegDecode]] (baseline JPEG).
  *
  * Output: struct(format string, width int, height int, sample_rate
  * int) — fields null where the format doesn't define them, all null
  * (but non-null struct) for unrecognized bytes.
  */
case class MediaHeaderExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"media_header expects BINARY, got ${child.dataType.simpleString}")

  override def dataType: DataType = MediaHeader.schema

  override def nullSafeEval(input: Any): Any =
    MediaHeader.parseRow(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = MediaHeader.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = $cls.parseRow($c);")
  }

  override protected def withNewChildInternal(c: Expression)
      : MediaHeaderExpr = copy(child = c)
  override def prettyName: String = "media_header"
}

object MediaHeader {

  val schema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) |
      u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3) << 24)

  /** (format, width, height, sampleRate); -1 = undefined field,
    * null format = unrecognized. */
  def parse(b: Array[Byte]): (String, Int, Int, Int) = {
    if (b == null || b.length < 2) return (null, -1, -1, -1)
    // PNG: 89 'PNG' \r \n 1A \n, then len+“IHDR”, dims at 16/20 (BE)
    if (b.length >= 24 && u8(b, 0) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G')
      return ("png", be32(b, 16), be32(b, 20), -1)
    // GIF87a/GIF89a: logical screen size at 6/8 (LE)
    if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      return ("gif", le16(b, 6), le16(b, 8), -1)
    // BMP: BITMAPINFOHEADER at 14, dims at 18/22 (LE, height signed)
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
      return ("bmp", le32(b, 18), math.abs(le32(b, 22)), -1)
    // WAV: RIFF....WAVE, fmt sample rate at 24 (LE)
    if (b.length >= 28 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E')
      return ("wav", -1, -1, le32(b, 24))
    // JPEG: FF D8, then scan markers for a SOFn frame header
    if (u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      var i = 2
      while (i + 9 < b.length && u8(b, i) == 0xff) {
        val marker = u8(b, i + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
          i += 2 // standalone markers have no length field
        } else {
          val len = be16(b, i + 2)
          if (len < 2) return ("jpeg", -1, -1, -1)
          val isSof = (marker >= 0xc0 && marker <= 0xcf) &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof && i + 9 <= b.length)
            return ("jpeg", be16(b, i + 7), be16(b, i + 5), -1)
          i += 2 + len
        }
      }
      return ("jpeg", -1, -1, -1)
    }
    (null, -1, -1, -1)
  }

  def parseRow(b: Array[Byte]): InternalRow = {
    val (fmt, w, h, sr) = parse(b)
    val row = new GenericInternalRow(4)
    row.update(0, if (fmt == null) null else UTF8String.fromString(fmt))
    if (w >= 0) row.setInt(1, w) else row.setNullAt(1)
    if (h >= 0) row.setInt(2, h) else row.setNullAt(2)
    if (sr >= 0) row.setInt(3, sr) else row.setNullAt(3)
    row
  }

  def column(c: Column): Column =
    GraftBridge.column(MediaHeaderExpr(GraftBridge.expression(c)))
}
