package graft

import graft.multimodal.{AudioResample, MultimodalOps}

/** Fixed-length PCM resample (q193): identity passthrough, exact
  * half-sample-center interpolation, and the mono/reject contract. */
class AudioResampleSpec extends SparkTestBase {

  private def floats(b: Array[Byte], n: Int): Array[Float] = {
    val a = AudioResample.resample(b, n)
    if (a == null) null else a.toFloatArray()
  }

  test("identity resample returns the exact samples") {
    val samples = Array[Short](100, -200, 32767, -32768, 0, 7)
    val b = MultimodalOps.wavFile(8000, samples)
    assert(floats(b, 6).toSeq == samples.map(_.toFloat).toSeq)
  }

  test("downsample interpolates at half-sample centers") {
    // 4 -> 2: sx = (o+0.5)*2 - 0.5 = {0.5, 2.5} -> midpoints of each pair
    val b = MultimodalOps.wavFile(8000, Array[Short](10, 30, -10, -30))
    assert(floats(b, 2).toSeq == Seq(20f, -20f))
  }

  test("upsample clamps at the clip edges") {
    // 2 -> 4: sx = {-0.25->0, 0.25, 0.75, 1.25->1-capped pair}
    val b = MultimodalOps.wavFile(8000, Array[Short](0, 100))
    assert(floats(b, 4).toSeq == Seq(0f, 25f, 75f, 100f))
  }

  test("non-mono, malformed, and abusive inputs null out") {
    assert(AudioResample.resample(null, 4) == null)
    assert(AudioResample.resample(Array[Byte](1, 2), 4) == null)
    val junk = Array.fill[Byte](96)(0x55)
    assert(AudioResample.resample(junk, 4) == null)
    val ok = MultimodalOps.wavFile(8000, Array[Short](1, 2, 3))
    assert(AudioResample.resample(ok, 0) == null)
    assert(AudioResample.resample(ok, 1 << 23) == null)
    // flip the channel count to stereo: the mono-only contract rejects
    val stereo = ok.clone(); stereo(22) = 2
    assert(AudioResample.resample(stereo, 2) == null)
    // truncated data chunk
    assert(AudioResample.resample(ok.take(ok.length - 2), 2) == null)
  }
}
