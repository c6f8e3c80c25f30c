package graft

import org.apache.spark.sql.functions._

import graft.multimodal.MultimodalOps

class MultimodalSpec extends SparkTestBase {

  test("extractFeatures produces deterministic fixed-dim features") {
    val assets = MultimodalOps.syntheticAssets(spark, 30)
    val f1 = MultimodalOps.extractFeatures(assets, dim = 16,
      partitions = 4)
    assert(f1.schema == MultimodalOps.featureSchema)
    assert(f1.count() == 30)
    val row = f1.filter(col("asset_id") === 5).collect().head
    assert(row.getSeq[Float](3).length == 16)
    assert(row.getLong(2) > 0)
    // determinism across runs and partitionings
    val f2 = MultimodalOps.extractFeatures(assets, dim = 16,
      partitions = 2)
    val v1 = f1.orderBy("asset_id").collect().map(_.getSeq[Float](3))
    val v2 = f2.orderBy("asset_id").collect().map(_.getSeq[Float](3))
    assert(v1.zip(v2).forall { case (a, b) => a == b })
  }

  test("null media bytes yield zero-feature row, not a crash") {
    import spark.implicits._
    val assets = Seq((1L, "image", null: Array[Byte], None: Option[String],
      None: Option[Int], None: Option[Int], None: Option[Long]))
      .toDF("asset_id", "modality", "media_bytes", "mime_type", "width",
        "height", "duration_ms")
    val f = MultimodalOps.extractFeatures(assets, dim = 8).collect().head
    assert(f.getLong(2) == 0L)
    assert(f.getSeq[Float](3).forall(_ == 0.0f))
  }

  test("MediaHeader parses PNG/GIF/BMP/JPEG/WAV headers exactly") {
    import graft.multimodal.MediaHeader
    assert(MediaHeader.parse(MultimodalOps.pngHeader(800, 600)) ==
      ("png", 800, 600, -1))
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](0x40, 0x01, 0xf0.toByte, 0x00) // 320 × 240 LE
    assert(MediaHeader.parse(gif) == ("gif", 320, 240, -1))
    val bmp = new Array[Byte](26)
    bmp(0) = 'B'; bmp(1) = 'M'
    bmp(18) = 0x64; bmp(22) = 0x32 // 100 × 50 LE
    assert(MediaHeader.parse(bmp) == ("bmp", 100, 50, -1))
    // JPEG: SOI, APP0 (len 4), SOF0 with height 10 width 20
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe0.toByte, 0, 4, 0, 0, // APP0, len 4
      0xff.toByte, 0xc0.toByte, 0, 11, 8, 0, 10, 0, 20, 1, 0)
    assert(MediaHeader.parse(jpeg) == ("jpeg", 20, 10, -1))
    assert(MediaHeader.parse(MultimodalOps.wavHeader(44100)) ==
      ("wav", -1, -1, 44100))
    assert(MediaHeader.parse(Array[Byte](1, 2, 3, 4)) ==
      ((null, -1, -1, -1)))
    assert(MediaHeader.parse(null) == ((null, -1, -1, -1)))
  }

  test("annotateAssets sniffs real formats from synthetic bytes") {
    val ann = MultimodalOps.annotateAssets(
      MultimodalOps.syntheticAssets(spark, 9))
    val byId = ann.select("asset_id", "modality", "sniffed_format",
        "sniffed_width", "sniffed_sample_rate", "width")
      .collect().map(r => r.getLong(0) -> r).toMap
    // images (0,3,6): png with dims matching the declared metadata
    Seq(0L, 3L, 6L).foreach { id =>
      assert(byId(id).getAs[String]("sniffed_format") == "png")
      assert(byId(id).getAs[Int]("sniffed_width") ==
        byId(id).getAs[Int]("width"))
    }
    // audio (1,4,7): wav with a sample rate
    Seq(1L, 4L, 7L).foreach { id =>
      assert(byId(id).getAs[String]("sniffed_format") == "wav")
      assert(byId(id).getAs[Int]("sniffed_sample_rate") >= 8000)
    }
    // video (2,5,8): headerless noise → no sniffed format
    Seq(2L, 5L, 8L).foreach { id =>
      assert(byId(id).getAs[String]("sniffed_format") == null)
    }
  }

  test("sampleFramePlan emits one row per sampled frame, video only") {
    val assets = MultimodalOps.syntheticAssets(spark, 9)
    val plan = MultimodalOps.sampleFramePlan(assets, everyMs = 1000L)
    // videos are ids 2,5,8 with duration 5000+id → 6 frames each
    assert(plan.select("asset_id").distinct().count() == 3)
    val frames = plan.filter(col("asset_id") === 2)
      .orderBy("frame_ms").collect().map(_.getLong(1)).toSeq
    assert(frames == Seq(0L, 1000L, 2000L, 3000L, 4000L, 5000L))
  }
}
