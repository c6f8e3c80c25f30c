package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL pixel/sample decode for the two fixed-layout media containers
  * — no codec library required, just byte arithmetic, which is why
  * these two (unlike JPEG/PNG/MP3, stubbed in
  * [[MultimodalOps.extractFeatures]]) can be decoded natively:
  *
  *  - BMP, uncompressed 24-bpp BI_RGB: pixel rows bottom-up (or
  *    top-down when height is negative), BGR byte order, each row
  *    padded to a 4-byte boundary;
  *  - WAV, 16-bit PCM: RIFF chunk walk to `fmt ` (format/width
  *    validation) and `data` (little-endian signed 16-bit samples,
  *    chunk sizes padded to even offsets).
  *
  * Both expressions emit EXACT integer accumulations (sums / sums of
  * squares / counts / peaks) rather than floating means: the caller
  * derives means and RMS with explicit rounding, so a DuckDB oracle
  * reproducing the same integer sums compares bit-exactly. Decode is
  * per-row in-expression work inside whole-stage codegen — a narrow
  * map over the asset table, no shuffle, no driver involvement; at
  * 100 TB the scan parallelism is the partitioning of the asset
  * files, exactly like any other projected column.
  *
  * Undecodable bytes (wrong magic, compressed BMP, non-16-bit or
  * non-PCM WAV, truncated payload) yield NULL, not an error — media
  * QA filters on decodability.
  */
object MediaDecode {

  val bmpSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType)))

  val wavSchema: StructType = StructType(Seq(
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_samples", LongType),
    StructField("sum_amp", LongType),
    StructField("sum_sq", LongType),
    StructField("peak_abs", IntegerType)))

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  private def le16s(b: Array[Byte], i: Int): Int =
    (le16(b, i) << 16) >> 16 // sign-extend
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) |
      (u8(b, i + 3) << 24)

  /** Decode an uncompressed 24-bpp BMP; null when not one. Pixel
    * order never matters for the emitted aggregates, so bottom-up vs
    * top-down rows only affects bounds, not results — but row PADDING
    * does, and is skipped per the spec (rows stride to 4 bytes). */
  def bmpStats(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M')
      return null
    val offset = le32(b, 10)
    val infoSize = le32(b, 14)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    // abs(Int.MinValue) is still negative — fold it into the h<=0
    // reject rather than produce a garbage non-null row
    val h = if (hRaw == Int.MinValue) 0 else math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (infoSize < 40 || w <= 0 || h <= 0 || bpp != 24 ||
      compression != 0) return null
    // rowSize in Long: a crafted width near Int.MaxValue would wrap
    // (w*3+3) negative, defeat the bounds guard, and crash the task
    // on one bad asset instead of nulling it out. The h-side guard is
    // a DIVISION, not rowSizeL*h: with w and h both near Int.MaxValue
    // the product overflows Long too (~1.4e19 > Long.MaxValue), wraps
    // negative, and would pass a multiply-form check
    val rowSizeL = (w.toLong * 3 + 3) / 4 * 4
    if (offset < 54 || offset >= b.length ||
      rowSizeL > (b.length.toLong - offset) / h)
      return null
    val rowSize = rowSizeL.toInt // bounded by b.length after the guard
    var sr = 0L; var sg = 0L; var sb = 0L
    var y = 0
    while (y < h) {
      var p = offset + y * rowSize
      var x = 0
      while (x < w) {
        sb += u8(b, p); sg += u8(b, p + 1); sr += u8(b, p + 2)
        p += 3; x += 1
      }
      y += 1
    }
    val row = new GenericInternalRow(6)
    row.setInt(0, w); row.setInt(1, h)
    row.setLong(2, w.toLong * h)
    row.setLong(3, sr); row.setLong(4, sg); row.setLong(5, sb)
    row
  }

  /** Decode a 16-bit PCM WAV via the RIFF chunk walk; null when not
    * one (non-PCM format tag, other bit depths, missing/truncated
    * `data` chunk). Samples across all channels are accumulated
    * together (channel stats are a trivial variant). */
  def wavStats(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44 || b(0) != 'R' || b(1) != 'I' ||
      b(2) != 'F' || b(3) != 'F' || b(8) != 'W' || b(9) != 'A' ||
      b(10) != 'V' || b(11) != 'E') return null
    // walk position in Long: a crafted chunk size near Int.MaxValue
    // would wrap `pos` negative and index the array out of bounds —
    // undecodable bytes must null out, never crash the task
    var pos = 12L
    var rate = -1; var channels = -1
    var dataPos = -1L; var dataLen = -1
    while (pos + 8 <= b.length && (rate < 0 || dataPos < 0)) {
      val p = pos.toInt // safe: pos + 8 <= b.length
      val sz = le32(b, p + 4)
      if (sz < 0) return null
      if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' &&
        b(p + 3) == ' ') {
        if (sz < 16 || p + 8 + 16 > b.length) return null
        val audioFormat = le16(b, p + 8)
        channels = le16(b, p + 10)
        rate = le32(b, p + 12)
        val bits = le16(b, p + 22)
        if (audioFormat != 1 || bits != 16 || channels < 1) return null
      } else if (b(p) == 'd' && b(p + 1) == 'a' &&
        b(p + 2) == 't' && b(p + 3) == 'a') {
        dataPos = p + 8L; dataLen = sz
      }
      pos += 8L + sz + (sz & 1) // chunks are word-aligned
    }
    if (rate < 0 || dataPos < 0 ||
      dataPos + dataLen > b.length) return null
    val n = dataLen / 2
    var sum = 0L; var sumSq = 0L; var peak = 0
    var i = 0
    while (i < n) {
      val s = le16s(b, (dataPos + 2L * i).toInt) // bounded by guard
      sum += s; sumSq += s.toLong * s
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    val row = new GenericInternalRow(6)
    row.setInt(0, rate); row.setInt(1, channels)
    row.setLong(2, n.toLong)
    row.setLong(3, sum); row.setLong(4, sumSq); row.setInt(5, peak)
    row
  }

  def bmpColumn(c: Column): Column =
    GraftBridge.column(BmpPixelStatsExpr(GraftBridge.expression(c)))
  def wavColumn(c: Column): Column =
    GraftBridge.column(WavPcmStatsExpr(GraftBridge.expression(c)))
}

case class BmpPixelStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bmp_pixel_stats expects BINARY, got ${child.dataType.simpleString}")
  override def dataType: DataType = MediaDecode.bmpSchema
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    MediaDecode.bmpStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = MediaDecode.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.bmpStats($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(c: Expression)
      : BmpPixelStatsExpr = copy(child = c)
  override def prettyName: String = "bmp_pixel_stats"
}

case class WavPcmStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_pcm_stats expects BINARY, got ${child.dataType.simpleString}")
  override def dataType: DataType = MediaDecode.wavSchema
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    MediaDecode.wavStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = MediaDecode.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.wavStats($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(c: Expression)
      : WavPcmStatsExpr = copy(child = c)
  override def prettyName: String = "wav_pcm_stats"
}
