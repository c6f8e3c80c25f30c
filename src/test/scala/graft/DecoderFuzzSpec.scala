package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Gunzip
import graft.multimodal.{MediaDecode, MediaHeader}

/** Adversarial-input fuzz over every byte-level decoder: arbitrary
  * blobs, truncated/mutated valid containers, and magic-prefixed
  * garbage must all yield null (or a null-ish header tuple) — never
  * throw. A decoder that crashes a task on one bad asset takes the
  * whole 100 TB scan down with it. */
class DecoderFuzzSpec extends SparkTestBase {

  private def blob(seed: Long, n: Int): Array[Byte] =
    Array.tabulate[Byte](n) { i =>
      var v = seed + i * 2654435761L
      v ^= v >>> 13; v *= 0x9e3779b97f4a7c15L; v ^= v >>> 29
      v.toByte
    }

  private val magics: Seq[Array[Byte]] = Seq(
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte),
    Array[Byte](0x1f.toByte, 0x8b.toByte, 8, 0),
    "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII"),
    Array[Byte]('B', 'M'),
    Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte))

  private def decodeAll(b: Array[Byte]): Unit = {
    MediaDecode.pngStats(b)
    MediaDecode.bmpStats(b)
    MediaDecode.wavStats(b)
    graft.multimodal.JpegDecode.jpegStats(b)
    Gunzip.gunzip(b)
    MediaHeader.parse(b)
    ()
  }

  test("random blobs never crash any decoder") {
    val gen = for {
      n <- Gen.oneOf(Gen.choose(0, 64), Gen.choose(64, 4096))
      s <- Gen.choose(Long.MinValue, Long.MaxValue)
    } yield blob(s, n)
    (1 to 400).foreach { i =>
      val b = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      decodeAll(b)
    }
  }

  test("magic-prefixed garbage never crashes any decoder") {
    (1 to 200).foreach { i =>
      val tail = blob(i * 7919L, 16 + (i * 31) % 512)
      magics.foreach(m => decodeAll(m ++ tail))
    }
  }

  test("mutated valid containers never crash any decoder") {
    val png = graft.multimodal.MultimodalOps
      .pngFile(7, 5, alpha = true, (x, y) => (x, y, x + y, 9))
    val gz = Gunzip.gzipBytes(blob(42L, 300))
    val bmp = graft.multimodal.MultimodalOps
      .bmpFile(5, 4, (x, y) => (x, y, x + y))
    val wav = graft.multimodal.MultimodalOps
      .wavFile(8000, Array.tabulate[Short](40)(t => (t * 321).toShort))
    val jpg = {
      val img = new java.awt.image.BufferedImage(16, 12,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 12; x <- 0 until 16)
        img.setRGB(x, y, (x * 16 << 16) | (y * 20 << 8) | 128)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    for (valid <- Seq(png, gz, bmp, wav, jpg); i <- 1 to 150) {
      val c = valid.clone()
      // corrupt a seeded random window of up to 4 bytes
      val at = (i * 2654435761L % c.length).toInt.abs
      c(at) = (c(at) ^ (i * 37)).toByte
      if (at + 3 < c.length && i % 3 == 0) {
        c(at + 1) = 0x7f; c(at + 2) = 0x80.toByte; c(at + 3) = 0xff.toByte
      }
      decodeAll(c)
      decodeAll(c.take(at)) // and truncated at the mutation point
    }
  }
}
