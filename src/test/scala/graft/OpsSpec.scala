package graft

import org.apache.spark.sql.functions._

import graft.ops._

class OpsSpec extends SparkTestBase {
  import spark.implicits._

  private def versions = Seq(
    (1, "a-v1", ts("2026-01-01 10:00:00")),
    (1, "a-v2", ts("2026-01-02 10:00:00")),
    (2, "b-v1", ts("2026-01-01 09:00:00")),
    (3, "c-v1", ts("2026-01-03 08:00:00")),
    (3, "c-v2", ts("2026-01-03 08:00:00")) // exact-tie on ts
  ).toDF("id", "payload", "updated_at")

  test("DedupLatest keeps exactly one latest row per key") {
    val out = DedupLatest(versions, Seq("id"),
      Seq(col("updated_at").desc, col("payload").desc))
      .orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(out.map(_.getString(1)).toSeq == Seq("a-v2", "b-v1", "c-v2"))
  }

  test("DedupLatest is idempotent") {
    val once = DedupLatest(versions, Seq("id"),
      Seq(col("updated_at").desc, col("payload").desc))
    val twice = DedupLatest(once, Seq("id"),
      Seq(col("updated_at").desc, col("payload").desc))
    assert(once.orderBy("id").collect().toSeq ==
      twice.orderBy("id").collect().toSeq)
  }

  test("TopNPerGroup.rowNumber returns exactly n per group") {
    val df = Seq(("g1", 1, 5.0), ("g1", 2, 9.0), ("g1", 3, 7.0),
      ("g2", 4, 1.0)).toDF("g", "id", "v")
    val out = TopNPerGroup.rowNumber(df, Seq("g"),
      Seq(col("v").desc, col("id")), 2).orderBy("g", "rn").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("g1", 2), ("g1", 3), ("g2", 4)))
  }

  test("TopNPerGroup.denseRank keeps ties in the same rank") {
    val df = Seq(("g", 1, 9.0), ("g", 2, 9.0), ("g", 3, 5.0))
      .toDF("g", "id", "v")
    val out = TopNPerGroup.denseRank(df, Seq("g"),
      Seq(col("v").desc), 1)
    assert(out.count() == 2) // both 9.0 rows are rank 1
  }

  test("Upsert = matched-update + not-matched-insert, latest-wins source") {
    val target = Seq((1, "old-1", ts("2026-01-01 00:00:00")),
      (2, "old-2", ts("2026-01-01 00:00:00")))
      .toDF("id", "payload", "updated_at")
    val source = Seq(
      (2, "new-2-a", ts("2026-01-02 00:00:00")),
      (2, "new-2-b", ts("2026-01-03 00:00:00")), // later wins
      (3, "new-3", ts("2026-01-02 00:00:00")))
      .toDF("id", "payload", "updated_at")
    val out = Upsert(target, source, Seq("id"),
      Seq(col("updated_at").desc), broadcastSource = true)
      .orderBy("id").collect()
    assert(out.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "old-1"), (2, "new-2-b"), (3, "new-3")))
  }

  test("ConditionalCounts pivots domain values into count columns") {
    val df = Seq(("p1", "chlorine"), ("p1", "chlorine"), ("p1", "refill"),
      ("p2", "refill")).toDF("pool", "itype")
    val out = ConditionalCounts(df, Seq("pool"), "itype",
      Seq("chlorine", "refill")).orderBy("pool").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("p1", 2L, 1L), ("p2", 0L, 1L)))
  }

  test("DataQuality catches dups, nulls, domain and FK violations") {
    val pools = Seq((1, "a"), (2, "b")).toDF("pool_id", "name")
    val events = Seq((10, 1, "chlorine"), (10, 1, "chlorine"),
      (11, 9, "bogus")).toDF("id", "pool_id", "itype")
    assert(DataQuality.duplicateKeys(events, Seq("id")).count() == 1)
    assert(DataQuality.domainViolations(events, "itype",
      Seq("chlorine", "refill")).count() == 1)
    assert(DataQuality.orphanForeignKeys(events, pools, "pool_id",
      "pool_id").count() == 1)
    val withNull = Seq((Some(1), None: Option[String]))
      .toDF("id", "name")
    assert(DataQuality.nullViolations(withNull, Seq("name")).count() == 1)
    intercept[IllegalArgumentException] {
      DataQuality.assertEmpty("dup check",
        DataQuality.duplicateKeys(events, Seq("id")))
    }
  }
}
