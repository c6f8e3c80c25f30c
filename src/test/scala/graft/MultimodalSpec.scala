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
