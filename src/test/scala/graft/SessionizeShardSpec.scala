package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, md5}

import graft.operators.ShardExport
import graft.streaming.Sessionize

case class Tap(user: Int, tap_ts: Timestamp)

class SessionizeShardSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming sessions merge within gap and close on watermark") {
    implicit val sqlCtx = spark.sqlContext
    val taps = MemoryStream[Tap]
    val q = Sessionize.sessions(taps.toDF(), "user", "tap_ts",
      gap = "5 minutes", delayThreshold = "1 minutes")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()

    taps.addData(
      Tap(1, ts("2026-01-25 10:00:00")),
      Tap(1, ts("2026-01-25 10:02:00")), // merges: within 5-min gap
      Tap(1, ts("2026-01-25 10:20:00")), // new session
      Tap(2, ts("2026-01-25 10:00:00")))
    q.processAllAvailable()
    taps.addData(Tap(9, ts("2026-01-25 12:00:00"))) // advance watermark
    q.processAllAvailable()
    val out = spark.table("sess_out")
      .select("user", "session_start", "session_end", "n_events")
      .as[(Int, Timestamp, Timestamp, Long)].collect().toSet
    q.stop()
    assert(out.contains((1, ts("2026-01-25 10:00:00"),
      ts("2026-01-25 10:07:00"), 2L)), s"merged session missing: $out")
    assert(out.contains((1, ts("2026-01-25 10:20:00"),
      ts("2026-01-25 10:25:00"), 1L)), s"second session missing: $out")
    assert(out.contains((2, ts("2026-01-25 10:00:00"),
      ts("2026-01-25 10:05:00"), 1L)), s"user-2 session missing: $out")
  }

  test("shard export: global order across shards, no range overlap") {
    val dir = Files.createTempDirectory("graft_shards").toString + "/docs"
    val docs = spark.range(0, 1000).toDF("doc_id")
      .withColumn("doc_id", (col("doc_id") * 7919) % 1000) // scrambled
      .withColumn("payload", md5(col("doc_id").cast("string")))
    ShardExport.write(docs, dir, "doc_id", shards = 4)

    val m = ShardExport.manifest(spark, dir, "doc_id")
      .as[(String, Long, Long, Long)].collect()
    assert(m.length == 4, s"expected 4 shards, got ${m.length}")
    assert(m.map(_._2).sum == 1000L)
    // manifest is ordered by key_min; ranges must not overlap
    m.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 < hi._3,
        s"shard ranges overlap: ${lo._1} [${lo._3},${lo._4}] vs " +
          s"${hi._1} [${hi._3},${hi._4}]")
    }
    // each shard file is internally sorted
    for ((f, _, _, _) <- m) {
      val keys = spark.read.parquet(f).select("doc_id")
        .as[Long].collect()
      assert(keys.sameElements(keys.sorted), s"shard $f not sorted")
    }
  }

  test("training order: a seeded, reproducible permutation") {
    val ids = (1L to 200L).toDF("doc_id")
    val a = ShardExport.trainingOrder(ids, "doc_id", seed = 7L,
      shards = 4).as[(Long, Long, Long)].collect().sortBy(_._1)
    // every row addressed, (shard, pos) is a bijection onto
    // contiguous 1..n_shard positions
    assert(a.length == 200)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1L to rows.length))
    }
    // deterministic: same seed → identical, new seed → different order
    val b = ShardExport.trainingOrder(ids, "doc_id", seed = 7L,
      shards = 4).as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.sameElements(b))
    val c = ShardExport.trainingOrder(ids, "doc_id", seed = 8L,
      shards = 4).as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(!a.sameElements(c))
  }

  test("multi-epoch order: per-epoch bijections, epochs differ, " +
      "epoch 0 ≠ a reshuffle of itself") {
    val ids = (1L to 200L).toDF("doc_id")
    val o = ShardExport.multiEpochOrder(ids, "doc_id", seed = 7L,
      shards = 4, epochs = 3)
      .as[(Long, Int, Long, Long)].collect()
    assert(o.length == 600)
    // each (epoch, shard) is a contiguous 1..n position space
    o.groupBy(t => (t._2, t._3)).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.sameElements(1L to rows.length))
    }
    // epochs produce genuinely different addresses for the same doc
    val byDoc = o.groupBy(_._1).values
    assert(byDoc.exists(rows =>
      rows.map(t => (t._3, t._4)).distinct.length > 1))
    // and epoch 0 equals the run-again epoch 0 (determinism)
    val o2 = ShardExport.multiEpochOrder(ids, "doc_id", seed = 7L,
      shards = 4, epochs = 3)
      .as[(Long, Int, Long, Long)].collect()
    assert(o.sortBy(t => (t._1, t._2)).sameElements(
      o2.sortBy(t => (t._1, t._2))))
  }
}
