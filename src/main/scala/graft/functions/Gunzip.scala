package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** REAL gzip (RFC 1952) decompression for compressed text/payload
  * columns — the ingestion shape of every crawled corpus, where
  * documents arrive as gzipped records and a 100 TB pipeline
  * decompresses in-flight rather than staging an inflated copy. No
  * codec library: the JDK ships zlib (`java.util.zip.Inflater`), and
  * the gzip envelope is byte arithmetic (header flag walk, CRC32 +
  * ISIZE trailer validation).
  *
  * Strictness contract: single-member gzip; the deflate stream must
  * consume exactly the bytes between header and 8-byte trailer; the
  * trailer's CRC32 and ISIZE must match the decompressed output. Any
  * violation — bad magic, reserved flag bits, truncation, inflate
  * error, trailing junk, CRC/length mismatch — yields NULL, never
  * silently-wrong bytes (corrupt-record QA filters on decodability).
  * Header metadata bytes (MTIME/XFL/OS) are not integrity-checked by
  * the format and do not affect the output. Output is capped at
  * [[Gunzip.MaxDecoded]] (decompression-bomb guard): larger payloads
  * null out rather than exhausting task memory.
  *
  * Both expressions are per-row in-expression work inside whole-stage
  * codegen — a narrow map over the scan, corpus-parallel like any
  * projected column ([[graft.multimodal.MediaDecode]] discipline).
  */
object Gunzip {

  /** Decompression-bomb guard: decoded payloads above this size null
    * out (64 MiB — far above any sane document record). */
  val MaxDecoded: Int = 1 << 26

  private def le32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL)) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** Strict single-member gunzip; null on any malformation. */
  def gunzip(b: Array[Byte]): Array[Byte] = {
    if (b == null || b.length < 18) return null
    if ((b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b || b(2) != 8)
      return null
    val flg = b(3) & 0xff
    if ((flg & 0xe0) != 0) return null // reserved bits must be zero
    var pos = 10
    if ((flg & 4) != 0) { // FEXTRA: 2-byte LE length + payload
      if (pos + 2 > b.length) return null
      pos += 2 + ((b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8))
    }
    if ((flg & 8) != 0) { // FNAME: zero-terminated
      while (pos < b.length && b(pos) != 0) pos += 1
      pos += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT: zero-terminated
      while (pos < b.length && b(pos) != 0) pos += 1
      pos += 1
    }
    if ((flg & 2) != 0) pos += 2 // FHCRC
    if (pos + 8 > b.length) return null // room for deflate + trailer
    val inf = new java.util.zip.Inflater(true) // raw deflate
    try {
      inf.setInput(b, pos, b.length - pos - 8)
      val out = new java.io.ByteArrayOutputStream(
        math.min(MaxDecoded, math.max(64, (b.length - pos) * 4)))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && !inf.finished()) return null // truncated / dict
        out.write(buf, 0, n)
        if (out.size() > MaxDecoded) return null // bomb guard
      }
      if (inf.getRemaining != 0) return null // junk before trailer
      val data = out.toByteArray
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      val tp = b.length - 8
      if (crc.getValue != le32(b, tp)) return null
      if ((data.length.toLong & 0xffffffffL) != le32(b, tp + 4))
        return null
      data
    } catch {
      case _: java.util.zip.DataFormatException => null
    } finally inf.end()
  }

  /** [[gunzip]] then UTF-8 decode; null when undecodable as gzip. */
  def gunzipText(b: Array[Byte]): UTF8String = {
    val data = gunzip(b)
    if (data == null) null else UTF8String.fromBytes(data)
  }

  def column(c: Column): Column =
    GraftBridge.column(GunzipExpr(GraftBridge.expression(c)))
  def textColumn(c: Column): Column =
    GraftBridge.column(GunzipTextExpr(GraftBridge.expression(c)))

  /** Deterministic gzipped-document fixture: every doc's text follows
    * a closed-form token formula (so a DuckDB oracle rebuilds the
    * exact string with `string_agg` and compares an md5), compressed
    * with the JDK's gzip writer; every third payload has one byte
    * flipped mid-stream (the undecodable case — CRC catches it). */
  def syntheticGzipDocs(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until n).map { i =>
      val text = (0 until (20 + i % 30))
        .map(j => s"w${(i * 7 + j * 3) % 11}").mkString(" ")
      val good = gzipBytes(text.getBytes("UTF-8"))
      val bytes =
        if (i % 3 == 2) {
          val c = good.clone()
          val at = c.length / 2 // mid-deflate-stream for these sizes
          c(at) = (c(at) ^ 0x5a).toByte
          c
        } else good
      (i.toLong, bytes)
    }
    rows.toDF("doc_id", "gz_bytes")
  }

  /** Test/fixture-side gzip writer (single member). */
  private[graft] def gzipBytes(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(64 + data.length / 2)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }
}

case class GunzipExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gunzip expects BINARY, got ${child.dataType.simpleString}")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Gunzip.gunzip(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = Gunzip.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.gunzip($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(c: Expression)
      : GunzipExpr = copy(child = c)
  override def prettyName: String = "gunzip"
}

case class GunzipTextExpr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"gunzip_text expects BINARY, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    Gunzip.gunzipText(input.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val cls = Gunzip.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $cls.gunzipText($c);
      if (${ev.value} == null) { ${ev.isNull} = true; }""")
  }
  override protected def withNewChildInternal(c: Expression)
      : GunzipTextExpr = copy(child = c)
  override def prettyName: String = "gunzip_text"
}
