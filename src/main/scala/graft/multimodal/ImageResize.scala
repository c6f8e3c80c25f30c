package graft.multimodal

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType}

/** Fixed-size bilinear image resize — the thumbnail/tensor-ingestion
  * step of a multimodal training pipeline (decode → RESIZE → embed),
  * over the same pure-JVM decoders as the q39/q161 feature extraction.
  *
  * `image_resize(bytes, outW, outH)` → `array<float>` of length
  * `outW·outH·3`, row-major RGB in the 0–255 domain (callers normalize
  * at their model's convention; emitting raw keeps the arithmetic
  * oracle-replayable). Per format:
  *
  *  - BMP (24-bpp uncompressed): sampled ZERO-COPY from the input
  *    bytes — bottom-up or top-down row order per the height sign;
  *  - PNG (8-bit RGB/RGBA): the [[MediaDecode.pngScan]] walk
  *    materializes rows under a resize-sized envelope (`w·h ≤ 2²⁴`,
  *    the JPEG decoder's bound — a resize must hold the image, unlike
  *    the streaming stats path); alpha is dropped;
  *  - JPEG (baseline): [[JpegDecode.decode]]'s materialized pixels;
  *    grayscale replicates luma into all three channels.
  *
  * Sampling is standard half-pixel-center bilinear: source coordinate
  * `(o + 0.5) · src / out − 0.5`, clamped to the source rectangle, in
  * DOUBLE arithmetic with the exact operation order the q192 oracle
  * replays — cast to float only at the output write. Anything
  * malformed, truncated, or unsupported decodes to NULL, never a
  * crash (the corpus-hygiene contract shared by every decoder here).
  *
  * Scale shape: a narrow per-row map over the asset scan — in-row
  * work bounded by the envelope, no shuffle, no Python round-trip.
  */
object ImageResize {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Max source pixels a resize will materialize (PNG/JPEG paths).
    * BMP needs no buffer but honours the same bound for symmetry. */
  val MaxPixels: Long = 1L << 24

  def resize(b: Array[Byte], outW: Int, outH: Int): ArrayData = {
    if (outW <= 0 || outH <= 0 || outW.toLong * outH > (1 << 22))
      return null
    if (b == null || b.length < 2) return null
    val sampled: Array[Float] =
      if (b(0) == 'B' && b(1) == 'M') bmp(b, outW, outH)
      else if ((b(0) & 0xff) == 0x89 && b(1) == 'P') png(b, outW, outH)
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
        jpeg(b, outW, outH)
      else null
    if (sampled == null) null
    else UnsafeArrayData.fromPrimitiveArray(sampled)
  }

  /** Shared bilinear core over a random-access RGB getter. */
  private def bilinear(w: Int, h: Int, outW: Int, outH: Int,
      get: (Int, Int, Int) => Int): Array[Float] = {
    val out = new Array[Float](outW * outH * 3)
    var oy = 0
    while (oy < outH) {
      val sy = math.min(math.max((oy + 0.5) * h / outH - 0.5, 0.0),
        (h - 1).toDouble)
      val y0 = sy.toInt; val fy = sy - y0
      val y1 = math.min(y0 + 1, h - 1)
      var ox = 0
      while (ox < outW) {
        val sx = math.min(math.max((ox + 0.5) * w / outW - 0.5, 0.0),
          (w - 1).toDouble)
        val x0 = sx.toInt; val fx = sx - x0
        val x1 = math.min(x0 + 1, w - 1)
        var c = 0
        while (c < 3) {
          val top = (1.0 - fx) * get(x0, y0, c) + fx * get(x1, y0, c)
          val bot = (1.0 - fx) * get(x0, y1, c) + fx * get(x1, y1, c)
          out((oy * outW + ox) * 3 + c) =
            ((1.0 - fy) * top + fy * bot).toFloat
          c += 1
        }
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** 24-bpp uncompressed BMP, sampled in place: the pixel rectangle
    * already sits in `b`, so the only allocation is the output.
    * Validation mirrors [[MediaDecode.bmpStats]], plus the height-sign
    * row order the sum-invariant stats path could ignore. */
  private def bmp(b: Array[Byte], outW: Int, outH: Int): Array[Float] = {
    if (b.length < 54) return null
    val offset = le32(b, 10)
    val infoSize = le32(b, 14)
    val w = le32(b, 18)
    val hRaw = le32(b, 22)
    val bottomUp = hRaw > 0
    val h = if (hRaw == Int.MinValue) 0 else math.abs(hRaw)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (infoSize < 40 || w <= 0 || h <= 0 || bpp != 24 ||
      compression != 0) return null
    if (w.toLong * h > MaxPixels) return null
    val rowSizeL = (w.toLong * 3 + 3) / 4 * 4
    if (offset < 54 || offset >= b.length ||
      rowSizeL > (b.length.toLong - offset) / h) return null
    val rowSize = rowSizeL.toInt
    bilinear(w, h, outW, outH, (x, y, c) => {
      val fileRow = if (bottomUp) h - 1 - y else y
      u8(b, offset + fileRow * rowSize + x * 3 + (2 - c)) // BGR order
    })
  }

  private def png(b: Array[Byte], outW: Int, outH: Int): Array[Float] = {
    var buf: Array[Byte] = null
    var at = 0
    var chans = 0
    // the onHeader hook sizes the buffer EXACTLY from the validated
    // (envelope-bounded) dims — a guessed initial size could be driven
    // far past the envelope by a crafted wide-and-short header
    val dims = MediaDecode.pngScan(b, MaxPixels,
      onHeader = (w, h, ch) => {
        chans = ch
        // Long math + toIntExact: safe under ANY future envelope, not
        // just this caller's 2^24 (where the product tops out at 2^26)
        buf = new Array[Byte](math.toIntExact(w.toLong * h * ch))
      }) { (row, stride, _) =>
      System.arraycopy(row, 0, buf, at, stride)
      at += stride
    }
    if (dims == null) return null
    val (w, h, _) = dims
    bilinear(w, h, outW, outH,
      (x, y, c) => u8(buf, (y * w + x) * chans + c))
  }

  private def jpeg(b: Array[Byte], outW: Int, outH: Int): Array[Float] = {
    val img = JpegDecode.decode(b)
    if (img == null) return null
    val w = img.width; val h = img.height; val ch = img.channels
    val pix = img.pix
    bilinear(w, h, outW, outH, (x, y, c) =>
      if (ch == 3) pix((y * w + x) * 3 + c) & 0xff
      else pix(y * w + x) & 0xff) // grayscale: luma on every channel
  }

  def column(bytes: Column, outW: Int, outH: Int): Column =
    GraftBridge.column(
      ImageResizeExpr(GraftBridge.expression(bytes), outW, outH))
}

case class ImageResizeExpr(child: Expression, outW: Int, outH: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_resize expects BINARY, got ${child.dataType.simpleString}")
  override def dataType: DataType =
    ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    ImageResize.resize(input.asInstanceOf[Array[Byte]], outW, outH)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = ImageResize.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.resize($c, $outW, $outH);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(c: Expression)
      : ImageResizeExpr = copy(child = c)
  override def prettyName: String = "image_resize"
}
