package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.TwsOps

/** transformWithState (Spark 4 stateful API, RocksDB-backed): running
  * per-key totals accumulate across micro-batches and survive a
  * checkpoint restart.
  *
  * Own session: the RocksDB state-store provider must be set when the
  * streaming query plans, and other suites run on the default HDFS
  * provider. */
class TwsSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def rocksSession: SparkSession = {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-tws-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("running totals accumulate across micro-batches per key") {
    val spark = rocksSession
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val mem = MemoryStream[(Long, Double)]
      val q = TwsOps.runningTotals(mem.toDS())
        .writeStream.format("memory").queryName("tws")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("tws_ckpt").toString)
        .start()
      mem.addData((7L, 1.0), (7L, 2.0), (8L, 10.0))
      q.processAllAvailable()
      mem.addData((7L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("tws")
        .as[TwsOps.RunningTotal].collect()
        .groupBy(_.userId).view.mapValues(_.maxBy(_.nEvents)).toMap
      // key 7: batch1 (2, 3.0) then batch2 (3, 7.0); key 8: (1, 10.0)
      assert(rows(7L).nEvents == 3L && rows(7L).sumValue == 7.0)
      assert(rows(8L).nEvents == 1L && rows(8L).sumValue == 10.0)
      q.stop()
    } finally spark.stop()
  }

  test("a real TTL starts (ProcessingTime mode) and still accumulates") {
    // TTLConfig != NONE is rejected by the state store under
    // TimeMode.None — runningTotals must switch to ProcessingTime so
    // the documented bounded-state path actually runs
    val spark = rocksSession
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      // under ProcessingTime the no-data trigger schedules an endless
      // chain of empty batches to advance the TTL clock (even
      // AvailableNow never terminates) — turn no-data batches off so
      // processAllAvailable settles once the data batches commit
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        "false")
      val mem = MemoryStream[(Long, Double)]
      val q = TwsOps.runningTotals(mem.toDS(),
        ttl = org.apache.spark.sql.streaming.TTLConfig(
          java.time.Duration.ofHours(1)))
        .writeStream.format("memory").queryName("tws_ttl")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("tws_ckpt_ttl").toString)
        .start()
      mem.addData((3L, 2.0), (3L, 3.0))
      q.processAllAvailable()
      mem.addData((3L, 5.0))
      q.processAllAvailable()
      q.stop()
      // within the 1 h TTL both batches contribute: (3, 10.0)
      val r = spark.table("tws_ttl").as[TwsOps.RunningTotal]
        .collect().maxBy(_.nEvents)
      assert(r.userId == 3L && r.nEvents == 3L && r.sumValue == 10.0)
    } finally spark.stop()
  }

  test("state survives a query restart from the checkpoint") {
    val spark = rocksSession
    try {
      import spark.implicits._
      implicit val sqlCtx = spark.sqlContext
      val ckpt = Files.createTempDirectory("tws_ckpt2").toString
      val mem = MemoryStream[(Long, Double)]
      // memory sink cannot recover from a checkpoint; foreachBatch can
      val seen =
        new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Double)]
      def start() = TwsOps.runningTotals(mem.toDS())
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.Dataset[TwsOps.RunningTotal],
              _: Long) =>
            batch.collect().foreach(r =>
              seen.add((r.userId, r.nEvents, r.sumValue)))
        }
        .outputMode("update")
        .option("checkpointLocation", ckpt).start()
      val q1 = start()
      mem.addData((1L, 5.0))
      q1.processAllAvailable()
      q1.stop()
      // same source + checkpoint → the (1, 5.0) state must be restored
      mem.addData((1L, 7.0))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      val r = seen.toArray(Array.empty[(Long, Long, Double)])
        .maxBy(_._2)
      assert(r == ((1L, 2L, 12.0)))
    } finally spark.stop()
  }
}
