package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** REAL pixel/sample decode for the fixed-layout media containers
  * (baseline JPEG decode — Huffman + IDCT — lives in [[JpegDecode]];
  * MP3 remains honestly out of scope, no codec ships here):
  *
  *  - BMP, uncompressed 24-bpp BI_RGB: pixel rows bottom-up (or
  *    top-down when height is negative), BGR byte order, each row
  *    padded to a 4-byte boundary;
  *  - WAV, 16-bit PCM: RIFF chunk walk to `fmt ` (format/width
  *    validation) and `data` (little-endian signed 16-bit samples,
  *    chunk sizes padded to even offsets);
  *  - PNG, 8-bit truecolor RGB/RGBA non-interlaced: chunk walk with
  *    CRC validation, IDAT inflate via `java.util.zip.Inflater`
  *    (zlib ships in the JDK), per-row scanline unfilter
  *    (None/Sub/Up/Average/Paeth) — see [[pngStats]].
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

  val pngSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_pixels", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("sum_a", LongType)))

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
    val pcm = wavPcm(b)
    if (pcm == null) return null
    val (rate, channels, dataPos, n) = pcm
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

  /** The RIFF walk shared by [[wavStats]] and [[AudioResample]]:
    * validates a 16-bit PCM WAV and returns (sampleRate, channels,
    * dataOffset, nSamples) — samples across ALL channels, interleaved
    * at `dataOffset` as little-endian shorts — or null on anything
    * malformed ([[wavStats]]'s exact reject set). */
  private[multimodal] def wavPcm(b: Array[Byte])
      : (Int, Int, Long, Int) = {
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
    (rate, channels, dataPos, dataLen / 2)
  }

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  /** REAL PNG pixel decode — no codec library: the JDK ships zlib
    * (`java.util.zip.Inflater`), and past the IDAT inflate a PNG is
    * byte arithmetic like BMP. Supported: 8-bit-depth truecolor
    * (color type 2, RGB) and truecolor+alpha (6, RGBA),
    * non-interlaced — the shapes image pipelines actually emit.
    * Palette/gray/16-bit/interlaced, bad signature, chunk CRC
    * mismatch (every chunk is CRC-validated, so ANY corrupted byte
    * nulls out rather than producing silently-wrong pixels), inflate
    * errors, and scanline over/underrun all yield NULL.
    *
    * Decode streams row-by-row: the Inflater fills one
    * (1 + w·bpp)-byte scanline buffer at a time from the IDAT
    * segments, each row is unfiltered against the previous
    * reconstructed row (filter types 0 None / 1 Sub / 2 Up /
    * 3 Average / 4 Paeth per the PNG spec §9), and channel sums
    * accumulate as exact Longs — memory is two scanlines regardless
    * of image size, and the whole decode is per-row in-expression
    * work inside whole-stage codegen, exactly like [[bmpStats]]. */
  def pngStats(b: Array[Byte]): InternalRow = {
    var sr = 0L; var sg = 0L; var sb = 0L; var sa = 0L
    val dims = pngScan(b, 1L << 34) { (curRow, stride, bpp) =>
      var px = 0
      while (px < stride) {
        sr += curRow(px) & 0xff
        sg += curRow(px + 1) & 0xff
        sb += curRow(px + 2) & 0xff
        if (bpp == 4) sa += curRow(px + 3) & 0xff
        px += bpp
      }
    }
    if (dims == null) return null
    val (w, h, channels) = dims
    val row = new GenericInternalRow(8)
    row.setInt(0, w); row.setInt(1, h); row.setInt(2, channels)
    row.setLong(3, w.toLong * h)
    row.setLong(4, sr); row.setLong(5, sg); row.setLong(6, sb)
    row.setLong(7, sa)
    row
  }

  /** The PNG decode walk shared by [[pngStats]] and
    * [[ImageResize]]: signature + CRC-checked chunk walk, IDAT
    * inflate, per-row unfilter across all five filter types. Invokes
    * `onRow(scanline, stride, bytesPerPixel)` once per row, top-down —
    * the buffer is REUSED between rows, so callbacks copy what they
    * keep. Returns (width, height, channels), or null on any
    * malformation (exactly [[pngStats]]'s reject set, with the
    * pixel-count envelope as the one caller-chosen knob: the streaming
    * stats path tolerates far larger images than one that must
    * materialize). */
  private[multimodal] def pngScan(b: Array[Byte], maxPixels: Long,
      onHeader: (Int, Int, Int) => Unit = (_, _, _) => ())(
      onRow: (Array[Byte], Int, Int) => Unit): (Int, Int, Int) = {
    if (b == null || b.length < 57) return null // sig+IHDR+IDAT+IEND
    if ((b(0) & 0xff) != 0x89 || b(1) != 'P' || b(2) != 'N' ||
      b(3) != 'G' || b(4) != 0x0d || b(5) != 0x0a || b(6) != 0x1a ||
      b(7) != 0x0a) return null
    // chunk walk (positions in Long: crafted lengths must not wrap)
    val crc = new java.util.zip.CRC32()
    var pos = 8L
    var w = -1; var h = -1; var channels = 0
    var sawIhdr = false; var sawIend = false
    val idatOff = new scala.collection.mutable.ArrayBuffer[Int]()
    val idatLen = new scala.collection.mutable.ArrayBuffer[Int]()
    while (pos + 12 <= b.length && !sawIend) {
      val p = pos.toInt
      val len = be32(b, p)
      if (len < 0 || pos + 12 + len > b.length) return null
      crc.reset(); crc.update(b, p + 4, 4 + len)
      if (crc.getValue.toInt != be32(b, p + 8 + len)) return null
      val t0 = b(p + 4); val t1 = b(p + 5)
      val t2 = b(p + 6); val t3 = b(p + 7)
      if (t0 == 'I' && t1 == 'H' && t2 == 'D' && t3 == 'R') {
        if (sawIhdr || len != 13) return null
        sawIhdr = true
        w = be32(b, p + 8); h = be32(b, p + 12)
        val bitDepth = b(p + 16) & 0xff
        val colorType = b(p + 17) & 0xff
        val compression = b(p + 18) & 0xff
        val filterMethod = b(p + 19) & 0xff
        val interlace = b(p + 20) & 0xff
        if (w <= 0 || h <= 0 || bitDepth != 8 || compression != 0 ||
          filterMethod != 0 || interlace != 0) return null
        channels = colorType match {
          case 2 => 3
          case 6 => 4
          case _ => return null
        }
        // sanity envelope: a crafted IHDR must not allocate past any
        // plausible asset (the scanline buffers are O(w), but the
        // decode loop is w·h work on a task thread — and a
        // materializing caller passes a much smaller maxPixels)
        if (w > (1 << 24) || h > (1 << 24) ||
          w.toLong * h > maxPixels) return null
      } else if (t0 == 'I' && t1 == 'D' && t2 == 'A' && t3 == 'T') {
        if (!sawIhdr) return null
        idatOff += p + 8; idatLen += len
      } else if (t0 == 'I' && t1 == 'E' && t2 == 'N' && t3 == 'D') {
        sawIend = true
      }
      pos += 12L + len
    }
    if (!sawIhdr || !sawIend || idatOff.isEmpty) return null
    // dims are validated before any row streams: a materializing
    // caller sizes its buffer EXACTLY here instead of guessing
    onHeader(w, h, channels)
    val bpp = channels
    val stride = w * bpp
    val inf = new java.util.zip.Inflater()
    try {
      var seg = 0
      // fill `buf` completely from the concatenated IDAT stream;
      // false = stream ended early / needs a preset dict (malformed)
      def fill(buf: Array[Byte]): Boolean = {
        var off = 0
        while (off < buf.length) {
          if (inf.needsInput && seg < idatOff.length) {
            inf.setInput(b, idatOff(seg), idatLen(seg)); seg += 1
          }
          val n = inf.inflate(buf, off, buf.length - off)
          if (n == 0 && (inf.finished() || inf.needsDictionary() ||
            (inf.needsInput && seg >= idatOff.length))) return false
          off += n
        }
        true
      }
      val rowBuf = new Array[Byte](stride + 1)
      var prevRow = new Array[Byte](stride)
      var curRow = new Array[Byte](stride)
      var y = 0
      while (y < h) {
        if (!fill(rowBuf)) return null
        val ft = rowBuf(0) & 0xff
        if (ft > 4) return null
        var k = 0
        while (k < stride) {
          val x = rowBuf(k + 1) & 0xff
          val a = if (k >= bpp) curRow(k - bpp) & 0xff else 0
          val up = prevRow(k) & 0xff
          val c = if (k >= bpp) prevRow(k - bpp) & 0xff else 0
          val recon = ft match {
            case 0 => x
            case 1 => x + a
            case 2 => x + up
            case 3 => x + ((a + up) >> 1)
            case _ => // Paeth predictor (PNG spec §9.4)
              val pp = a + up - c
              val pa = math.abs(pp - a)
              val pb = math.abs(pp - up)
              val pc = math.abs(pp - c)
              x + (if (pa <= pb && pa <= pc) a
                   else if (pb <= pc) up else c)
          }
          curRow(k) = recon.toByte
          k += 1
        }
        onRow(curRow, stride, bpp)
        val t = prevRow; prevRow = curRow; curRow = t
        y += 1
      }
      // strict tail check: the zlib stream must contain EXACTLY
      // h scanlines — trailing pixel data means a lying IHDR
      val probe = new Array[Byte](1)
      var extra = inf.inflate(probe)
      while (extra == 0 && !inf.finished() && !inf.needsDictionary() &&
        seg < idatOff.length) {
        inf.setInput(b, idatOff(seg), idatLen(seg)); seg += 1
        extra = inf.inflate(probe)
      }
      if (extra > 0) return null
      (w, h, channels)
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  def bmpColumn(c: Column): Column =
    GraftBridge.column(BmpPixelStatsExpr(GraftBridge.expression(c)))
  def wavColumn(c: Column): Column =
    GraftBridge.column(WavPcmStatsExpr(GraftBridge.expression(c)))
  def pngColumn(c: Column): Column =
    GraftBridge.column(PngPixelStatsExpr(GraftBridge.expression(c)))
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

case class PngPixelStatsExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"png_pixel_stats expects BINARY, got ${child.dataType.simpleString}")
  override def dataType: DataType = MediaDecode.pngSchema
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    MediaDecode.pngStats(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = MediaDecode.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.pngStats($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(c: Expression)
      : PngPixelStatsExpr = copy(child = c)
  override def prettyName: String = "png_pixel_stats"
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
