package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamStreamJoin

case class Reading(pool_id: Int, read_ts: Timestamp, ph: Double)
case class Ack(pool_id: Int, ack_ts: Timestamp, op: String)

/** Stream-stream interval join with watermarks on both sides: matches
  * land inside the interval, out-of-interval rows don't, and the time
  * bound keeps join state finite. */
class StreamStreamJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("interval join matches within the window only") {
    implicit val sqlCtx = spark.sqlContext
    val readings = MemoryStream[Reading]
    val acks = MemoryStream[Ack]
    val joined = StreamStreamJoin.intervalJoin(
      readings.toDF(), acks.toDF(), "pool_id",
      "read_ts", "ack_ts", delayThreshold = "10 minutes",
      within = "5 minutes")
    val q = joined
      .select($"l.pool_id", $"read_ts", $"ack_ts", $"op")
      .writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()

    readings.addData(
      Reading(1, ts("2026-01-25 10:00:00"), 7.2),
      Reading(2, ts("2026-01-25 10:00:00"), 7.4))
    acks.addData(
      Ack(1, ts("2026-01-25 10:03:00"), "ok"),     // within 5 min
      Ack(2, ts("2026-01-25 10:09:00"), "late"),   // outside window
      Ack(3, ts("2026-01-25 10:01:00"), "nokey"))  // no left match
    q.processAllAvailable()
    // advance both watermarks so results finalize
    readings.addData(Reading(9, ts("2026-01-25 11:00:00"), 7.0))
    acks.addData(Ack(9, ts("2026-01-25 11:30:00"), "tick"))
    q.processAllAvailable()

    val out = spark.table("ssj_out")
      .select("pool_id", "op").as[(Int, String)].collect().toSet
    q.stop()
    assert(out.contains((1, "ok")), s"expected pool 1 match, got $out")
    assert(!out.exists(_._2 == "late"), "ack outside interval joined")
    assert(!out.exists(_._2 == "nokey"), "ack without reading joined")
  }

  test("left-outer interval join emits unmatched lefts with nulls") {
    implicit val sqlCtx = spark.sqlContext
    val readings = MemoryStream[Reading]
    val acks = MemoryStream[Ack]
    val joined = StreamStreamJoin.intervalJoinLeftOuter(
      readings.toDF(), acks.toDF(), "pool_id",
      "read_ts", "ack_ts", delayThreshold = "10 minutes",
      within = "5 minutes")
    val q = joined
      .select($"l.pool_id", $"read_ts", $"op")
      .writeStream.format("memory").queryName("ssj_outer")
      .outputMode("append").start()

    readings.addData(
      Reading(1, ts("2026-01-25 10:00:00"), 7.2),   // will be acked
      Reading(2, ts("2026-01-25 10:00:00"), 7.4))   // never acked
    acks.addData(Ack(1, ts("2026-01-25 10:03:00"), "ok"))
    q.processAllAvailable()
    // before the watermark proves no match can arrive, the unmatched
    // left must NOT have emitted a null row yet
    val early = spark.table("ssj_outer")
      .select("pool_id", "op").as[(Int, Option[String])].collect().toSet
    assert(!early.contains((2, None)),
      s"null row emitted before watermark proof: $early")
    // advance both watermarks past read_ts + within + delay
    readings.addData(Reading(9, ts("2026-01-25 11:00:00"), 7.0))
    acks.addData(Ack(9, ts("2026-01-25 11:30:00"), "tick"))
    q.processAllAvailable()
    readings.addData(Reading(9, ts("2026-01-25 12:00:00"), 7.0))
    acks.addData(Ack(9, ts("2026-01-25 12:30:00"), "tick"))
    q.processAllAvailable()

    val out = spark.table("ssj_outer")
      .select("pool_id", "op").as[(Int, Option[String])].collect().toSet
    q.stop()
    assert(out.contains((1, Some("ok"))), s"matched row missing: $out")
    assert(out.contains((2, None)),
      s"unmatched left never emitted: $out")
  }

  test("join state is bounded: stateful operator reports watermark eviction") {
    implicit val sqlCtx = spark.sqlContext
    val readings = MemoryStream[Reading]
    val acks = MemoryStream[Ack]
    val joined = StreamStreamJoin.intervalJoin(
      readings.toDF(), acks.toDF(), "pool_id",
      "read_ts", "ack_ts", delayThreshold = "1 minutes",
      within = "2 minutes")
    val q = joined.select($"l.pool_id").writeStream
      .format("memory").queryName("ssj_state")
      .outputMode("append").start()
    // old rows, then jump the clock far ahead twice so the watermark
    // passes (old_ts + within) and state is evicted
    readings.addData(Reading(1, ts("2026-01-25 10:00:00"), 7.2))
    acks.addData(Ack(1, ts("2026-01-25 10:00:30"), "ok"))
    q.processAllAvailable()
    for (h <- Seq("12:00:00", "14:00:00")) {
      readings.addData(Reading(2, ts(s"2026-01-25 $h"), 7.0))
      acks.addData(Ack(2, ts(s"2026-01-25 $h"), "t"))
      q.processAllAvailable()
    }
    val progress = q.lastProgress
    val stateRows = progress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    // only the freshest rows may remain in state (2 sides x 1 row),
    // the 10:00 pair must be gone
    assert(stateRows <= 4, s"state not evicted: $stateRows rows")
  }
}
