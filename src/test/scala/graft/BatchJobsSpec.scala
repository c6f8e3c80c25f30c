package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.batch.{ElectricityBatchJob, StructuredBatchJob}
import graft.core.{LakeLayout, TableIO}
import graft.sources.CsvVariants

class BatchJobsSpec extends SparkTestBase {
  import spark.implicits._

  private def rawPools = Seq(
    (1, "Pool A", "Madrid", 50000, true, "hotel",
      ts("2026-01-01 10:00:00")),
    (1, "Pool A renamed", "Madrid", 50000, true, "hotel",
      ts("2026-01-02 10:00:00")), // later version wins
    (2, "Pool B", "Sevilla", 30000, false, "private",
      ts("2026-01-01 11:00:00")))
    .toDF("pool_id", "pool_name", "location", "volume_liters",
      "is_heated", "owner_type", "updated_at")

  private def rawEvents = Seq(
    (10, 1, ts("2026-01-05 09:00:00"), "chlorine", Option("dichloro"),
      Option(2.0), Option("ok"), ts("2026-01-05 09:00:00")),
    (10, 1, ts("2026-01-05 09:00:00"), "chlorine", Option("dichloro"),
      Option(2.5), Option("corrected"),
      ts("2026-01-06 09:00:00")), // dup id, later wins
    (11, 2, ts("2026-01-05 12:00:00"), "refill", None: Option[String],
      None: Option[Double], None: Option[String],
      ts("2026-01-05 12:00:00")),
    (12, 9, ts("2026-01-05 13:00:00"), "chlorine", None: Option[String],
      Option(1.0), Option("orphan pool"),
      ts("2026-01-05 13:00:00")),  // FK violation
    (13, 1, ts("2026-01-05 14:00:00"), "bogus_type",
      None: Option[String], None: Option[Double], None: Option[String],
      ts("2026-01-05 14:00:00")))  // domain violation
    .toDF("id", "pool_id", "event_time", "intervention_type",
      "product_type", "product_amount", "notes", "updated_at")

  test("EP1 medallion run: dedup, DQ, FK filter, cost model, metrics") {
    val layout = LakeLayout(
      Files.createTempDirectory("graft-ep1").toString)
    StructuredBatchJob.run(spark, layout, rawPools, rawEvents)

    val silverPools = TableIO.readSnapshot(spark,
      layout.silver("pools_dim"))
    assert(silverPools.count() == 2)
    assert(silverPools.filter(col("pool_id") === 1)
      .select("pool_name").as[String].head() == "Pool A renamed")

    val silverEvents = TableIO.readSnapshot(spark,
      layout.silver("maintenance_events"))
    // 10 (deduped) + 11; orphan 12 and bogus 13 dropped
    assert(silverEvents.select("id").as[Int].collect().sorted.toSeq ==
      Seq(10, 11))
    assert(silverEvents.filter(col("id") === 10)
      .select("product_amount").as[Double].head() == 2.5)

    val enriched = TableIO.readSnapshot(spark,
      layout.gold("events_enriched"))
    val costById = enriched.select(col("id"), col("est_cost_eur"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(costById(10) - 2.5 * 3.5) < 1e-9)
    assert(math.abs(costById(11) - 30000 / 1000.0 * 1.8) < 1e-9)

    val daily = TableIO.readSnapshot(spark, layout.gold("daily_metrics"))
    assert(daily.count() == 2) // (pool1, 01-05) and (pool2, 01-05)
    val latest = TableIO.readSnapshot(spark, layout.gold("latest_event"))
    assert(latest.count() == 2)
  }

  test("EP1 re-run upserts silver instead of duplicating") {
    val layout = LakeLayout(
      Files.createTempDirectory("graft-ep1b").toString)
    StructuredBatchJob.run(spark, layout, rawPools, rawEvents)
    // second batch: newer version of pool 2 + new pool 3
    val batch2 = Seq(
      (2, "Pool B v2", "Sevilla", 30000, false, "airbnb",
        ts("2026-02-01 10:00:00")),
      (3, "Pool C", "Bilbao", 20000, true, "sports_center",
        ts("2026-02-01 10:00:00")))
      .toDF("pool_id", "pool_name", "location", "volume_liters",
        "is_heated", "owner_type", "updated_at")
    // a reader that resolved the silver table BEFORE the second run
    // must keep v1's snapshot while the re-publish commits
    val preRerun = TableIO.readSnapshot(spark, layout.silver("pools_dim"))
    StructuredBatchJob.run(spark, layout, batch2, rawEvents)
    assert(preRerun.count() == 2,
      "concurrent reader lost its snapshot during re-publish")
    val silverPools = TableIO.readSnapshot(spark,
      layout.silver("pools_dim")).orderBy("pool_id")
    assert(silverPools.count() == 3)
    assert(silverPools.filter(col("pool_id") === 2)
      .select("owner_type").as[String].head() == "airbnb")
  }

  test("CSV variant dispatch normalizes A, B and C shapes identically") {
    val a = Seq(("2026-01-15T14:00:00Z", "2026-01-15", "14", "85.1",
      "0.0851", "ES", "synthetic"))
      .toDF("ts_utc", "date", "hour", "price_eur_mwh", "price_eur_kwh",
        "region", "source")
    val b = Seq(("2026-01-15 14:00:00", "85.1")).toDF("ts",
      "price_eur_mwh")
    val c = Seq(("2026-01-15", "14", "85.1")).toDF("date", "hour",
      "price_eur_mwh")
    for (raw <- Seq(a, b, c)) {
      val n = CsvVariants.normalizeElectricity(raw).collect().head
      assert(n.getAs[java.sql.Date]("date").toString == "2026-01-15")
      assert(n.getAs[Int]("hour") == 14)
      assert(math.abs(n.getAs[Double]("price_eur_mwh") - 85.1) < 1e-9)
      assert(n.getAs[Double]("price_eur_kwh") > 0.08)
    }
  }

  test("EP2 incremental run ingests only new landing partitions") {
    val tmp = Files.createTempDirectory("graft-ep2").toString
    val landing = s"$tmp/landing"
    val layout = LakeLayout(s"$tmp/lake")
    (0 until 24).map(h => (f"2026-01-15 $h%02d:00:00", "50.0"))
      .toDF("ts", "price_eur_mwh")
      .coalesce(1).write.option("header", "true")
      .csv(s"$landing/date=2026-01-15")
    ElectricityBatchJob.run(spark, layout, landing)
    val silver1 = spark.read.parquet(layout.silver("electricity_prices"))
    assert(silver1.count() == 24)

    // day 2 lands; re-run reads ONLY the new partition
    (0 until 24).map(h => (f"2026-01-16 $h%02d:00:00", "60.0"))
      .toDF("ts", "price_eur_mwh")
      .coalesce(1).write.option("header", "true")
      .csv(s"$landing/date=2026-01-16")
    ElectricityBatchJob.run(spark, layout, landing)
    val silver2 = spark.read.parquet(layout.silver("electricity_prices"))
    assert(silver2.count() == 48)
    val daily = spark.read.parquet(layout.gold("electricity_daily"))
      .orderBy("date")
    assert(daily.count() == 2)
    assert(daily.select("avg_price").as[Double].collect().toSeq ==
      Seq(50.0, 60.0))
    val peaks = spark.read.parquet(layout.gold("electricity_peak_hours"))
    assert(peaks.filter(col("date") === "2026-01-15").count() == 5)

    // third run with nothing new is a no-op
    ElectricityBatchJob.run(spark, layout, landing)
    assert(spark.read.parquet(layout.silver("electricity_prices"))
      .count() == 48)
  }
}
