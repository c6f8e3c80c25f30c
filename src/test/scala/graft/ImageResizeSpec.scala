package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import graft.multimodal.{ImageResize, MultimodalOps}

/** Bilinear resize (q192): exact identity/orientation/math fixtures,
  * the cross-format law (PNG and BMP of the same pixels resize
  * identically), alpha drop, JPEG tolerance, and the reject set. */
class ImageResizeSpec extends SparkTestBase {

  private def floats(b: Array[Byte], w: Int, h: Int): Array[Float] = {
    val a = ImageResize.resize(b, w, h)
    if (a == null) null else a.toFloatArray()
  }

  private val fmt: (Int, Int) => (Int, Int, Int) =
    (x, y) => ((7 * x + 3 * y + 11) % 256, (13 * x + 5 * y) % 256,
      (3 * x + 17 * y + 101) % 256)

  test("identity resize returns the exact source pixels") {
    // out == src makes every sample coordinate land exactly on a
    // pixel center: fx = fy = 0, so bilinear must be a passthrough
    val b = MultimodalOps.bmpFile(5, 4, fmt)
    val out = floats(b, 5, 4)
    assert(out != null && out.length == 5 * 4 * 3)
    for (y <- 0 until 4; x <- 0 until 5) {
      val (r, g, bl) = fmt(x, y)
      val i = (y * 5 + x) * 3
      assert(out(i) == r.toFloat && out(i + 1) == g.toFloat &&
        out(i + 2) == bl.toFloat, s"($x,$y)")
    }
  }

  test("BMP bottom-up storage reads in top-down image order") {
    // top row pure red, bottom row pure blue: a flipped reader would
    // swap them (bmpStats never catches this — sums are orientation-
    // invariant, which is exactly why resize needs its own check)
    val b = MultimodalOps.bmpFile(1, 2,
      (_, y) => if (y == 0) (255, 0, 0) else (0, 0, 255))
    val out = floats(b, 1, 2)
    assert(out.toSeq == Seq(255f, 0f, 0f, 0f, 0f, 255f))
  }

  test("downscale mixes with the documented half-pixel-center weights") {
    // 2x1 -> 1x1: sx = 0.5 -> equal mix of both pixels
    val b = MultimodalOps.bmpFile(2, 1,
      (x, _) => if (x == 0) (10, 0, 0) else (30, 0, 0))
    assert(floats(b, 1, 1).toSeq == Seq(20f, 0f, 0f))
    // 1x2 -> 1x1 vertically
    val v = MultimodalOps.bmpFile(1, 2,
      (_, y) => if (y == 0) (0, 100, 0) else (0, 50, 0))
    assert(floats(v, 1, 1).toSeq == Seq(0f, 75f, 0f))
  }

  test("cross-format law: PNG resizes exactly like the BMP of the " +
      "same pixels, and RGBA drops alpha without disturbing RGB") {
    val w = 9; val h = 7
    val bmp = MultimodalOps.bmpFile(w, h, fmt)
    val png = MultimodalOps.pngFile(w, h, alpha = false,
      (x, y) => { val (r, g, b) = fmt(x, y); (r, g, b, 0) })
    val pngA = MultimodalOps.pngFile(w, h, alpha = true,
      (x, y) => { val (r, g, b) = fmt(x, y); (r, g, b, (x + y) % 256) })
    val viaBmp = floats(bmp, 4, 3).toSeq
    assert(floats(png, 4, 3).toSeq == viaBmp)
    assert(floats(pngA, 4, 3).toSeq == viaBmp)
  }

  test("JPEG resize lands within codec tolerance and grayscale " +
      "replicates luma") {
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8) img.setRGB(x, y, 0x808080)
    val out = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "jpg", out))
    val rs = floats(out.toByteArray, 2, 2)
    assert(rs != null && rs.length == 12)
    rs.foreach(v => assert(math.abs(v - 128f) <= 4f, v))

    val gray = new BufferedImage(8, 8, BufferedImage.TYPE_BYTE_GRAY)
    // raster writes, not setRGB: setRGB on TYPE_BYTE_GRAY converts
    // sRGB->linear (0x40 would land as ~13) before encoding
    for (y <- 0 until 8; x <- 0 until 8)
      gray.getRaster.setSample(x, y, 0, 0x40)
    val out2 = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(gray, "jpg", out2))
    val g2 = floats(out2.toByteArray, 1, 1)
    assert(g2 != null && g2.length == 3)
    assert(g2(0) == g2(1) && g2(1) == g2(2)) // luma on every channel
    assert(math.abs(g2(0) - 64f) <= 4f, g2(0)) // and it IS the 0x40 luma
  }

  test("malformed, unsupported, and abusive inputs null out") {
    assert(ImageResize.resize(null, 2, 2) == null)
    assert(ImageResize.resize(Array[Byte](1, 2, 3), 2, 2) == null)
    val junk = Array.fill[Byte](128)(0x42)
    assert(ImageResize.resize(junk, 2, 2) == null)
    val ok = MultimodalOps.bmpFile(2, 2, fmt)
    assert(ImageResize.resize(ok, 0, 2) == null)
    assert(ImageResize.resize(ok, 1 << 12, 1 << 12) == null) // out cap
    val truncated = ok.take(40)
    assert(ImageResize.resize(truncated, 2, 2) == null)
  }
}
