package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.SensorPipeline

/** Streaming dedup with bounded state (`dropDuplicatesWithinWatermark`):
  * duplicates inside the watermark window are dropped even across
  * micro-batches; state for old keys is evicted as the watermark
  * advances. */
class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def kafkaRow(poolId: Int, sensorTs: String, ph: Double)
      : KafkaLike = {
    val json = s"""{"pool_id":$poolId,"sensor_ts":"$sensorTs",""" +
      s""""ph":$ph,"chlorine_mg_l":1.0,"temp_c":25.0,""" +
      s""""turbidity_ntu":1.0,"water_level_pct":90.0,""" +
      s""""pump_kwh_est":0.2}"""
    KafkaLike(poolId.toString.getBytes, json.getBytes, "sensors", 0, 0L,
      Timestamp.valueOf("2026-01-25 10:00:00"))
  }

  test("duplicates within the watermark are dropped across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[KafkaLike]
    val deduped = SensorPipeline.dedupWithinWatermark(
      SensorPipeline.silver(SensorPipeline.bronze(mem.toDF()),
        watermark = "10 minutes"))
    val q = deduped.select("pool_id", "sensor_ts", "ph").writeStream
      .format("memory").queryName("dedup_out").outputMode("append")
      .start()

    mem.addData(
      kafkaRow(1, "2026-01-25T10:00:10Z", 7.2),
      kafkaRow(1, "2026-01-25T10:00:10Z", 7.2)) // same-batch dup
    q.processAllAvailable()
    mem.addData(
      kafkaRow(1, "2026-01-25T10:00:10Z", 7.2), // cross-batch redelivery
      kafkaRow(2, "2026-01-25T10:00:20Z", 7.5)) // distinct key survives
    q.processAllAvailable()
    val out = spark.table("dedup_out").collect()
    q.stop()
    assert(out.length == 2, s"expected 2 deduped rows, got ${out.length}")
    assert(out.map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }
}
