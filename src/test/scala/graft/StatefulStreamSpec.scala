package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.SensorReading
import graft.streaming.StatefulOps

class StatefulStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def r(pool: Int, t: String, ph: Double) =
    SensorReading(pool, Timestamp.valueOf(t), Some(ph), Some(1.0),
      Some(25.0), Some(1.0), Some(90.0), Some(0.2))

  test("anomaly-run state machine alerts after 3 and emits recovery") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[SensorReading]
    val out = StatefulOps.detectAnomalyRuns(mem.toDS(), minRun = 3)
    val q = out.writeStream.format("memory").queryName("anom")
      .outputMode("append").start()

    // batch 1: two anomalous readings — below threshold, no alert
    mem.addData(
      r(1, "2026-01-25 10:00:00", 9.0),
      r(1, "2026-01-25 10:00:10", 9.1))
    q.processAllAvailable()
    assert(spark.table("anom").isEmpty)

    // batch 2: third anomalous → alert fires; pool 2 stays quiet
    mem.addData(
      r(1, "2026-01-25 10:00:20", 9.2),
      r(2, "2026-01-25 10:00:20", 7.4))
    q.processAllAvailable()
    val alerts = spark.table("anom").collect()
    assert(alerts.length == 1)
    assert(alerts.head.getAs[String]("kind") == "alert")
    assert(alerts.head.getAs[Int]("pool_id") == 1)
    assert(alerts.head.getAs[Int]("run_length") == 3)
    assert(alerts.head.getAs[Timestamp]("run_start") ==
      Timestamp.valueOf("2026-01-25 10:00:00"))

    // batch 3: normal reading → recovery marker, state resets
    mem.addData(r(1, "2026-01-25 10:00:30", 7.5))
    q.processAllAvailable()
    val all = spark.table("anom").collect()
    q.stop()
    assert(all.length == 2)
    assert(all.map(_.getAs[String]("kind")).sorted.toSeq ==
      Seq("alert", "recovery"))
  }
}
