package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TimeParse
import graft.model.Schemas

/** The EP3 streaming topology (SURVEY.md §2.9), notebook variant —
  * Kafka → bronze (raw) → silver (parse + data-quality ranges) → gold
  * 1-minute windowed agg → gold enriched (stream-static joins). Each
  * stage is a pure DataFrame→DataFrame function so tests drive it with
  * `MemoryStream` and batch fixtures, and production wires it to
  * `readStream.format("kafka")`.
  *
  * Reference: spark-apps/07_kafka_smartpool_sensors.py:59-160 and
  * notebooks/07_kafka_smartpool_sensors.ipynb §4-§7.
  */
object SensorPipeline {

  /** Kafka envelope → bronze: cast key/value binary→string, keep
    * provenance, stamp ingest date (07:…py:67-74). */
  def bronze(kafka: DataFrame): DataFrame =
    kafka.select(
      col("key").cast("string").as("key"),
      col("value").cast("string").as("value"),
      col("topic"), col("partition"), col("offset"),
      col("timestamp").as("kafka_ts"))
      .withColumn("ingest_date", to_date(col("kafka_ts")))

  /** Bronze → silver: parse JSON (multi-format sensor_ts chain,
    * 07_kafka….ipynb §5), enforce validity ranges, require key fields. */
  def silver(bronze: DataFrame, watermark: String = "2 minutes")
      : DataFrame = {
    val parsed = bronze
      .withColumn("j", from_json(col("value"), Schemas.sensorReadingRaw))
      .select(col("j.*"), col("kafka_ts"))
      .withColumn("sensor_ts", TimeParse.parseTimestamp(col("sensor_ts")))
      .filter(col("pool_id").isNotNull && col("sensor_ts").isNotNull)
    val ranged = Schemas.sensorValidRanges.foldLeft(parsed) {
      case (df, (c, (lo, hi))) =>
        df.filter(col(c).isNull || col(c).between(lo, hi))
    }
    ranged
      .withColumn("event_date", to_date(col("sensor_ts")))
      .withWatermark("sensor_ts", watermark)
  }

  /** Streaming dedup with BOUNDED state: at-least-once sources (Kafka
    * redelivery, replayed producers) re-emit readings, and a plain
    * `dropDuplicates` would hold every key seen since stream start —
    * state grows forever. `dropDuplicatesWithinWatermark` evicts seen
    * keys once the watermark passes them, so state is O(traffic within
    * the watermark window): the only dedup shape that survives an
    * unbounded stream. Requires the event-time watermark set upstream
    * ([[silver]] sets it on sensor_ts). */
  def dedupWithinWatermark(silver: DataFrame,
      keys: Seq[String] = Seq("pool_id", "sensor_ts")): DataFrame =
    silver.dropDuplicatesWithinWatermark(keys)

  /** Silver → gold: tumbling 1-minute agg per pool with range flags
    * (07:…py:103-132). Emits on watermark passage in append mode. */
  def goldMinuteAgg(silver: DataFrame, window_ : String = "1 minute")
      : DataFrame = {
    val (phLo, phHi) = Schemas.phAlertRange
    val (clLo, clHi) = Schemas.chlorineAlertRange
    silver
      .groupBy(col("pool_id"), window(col("sensor_ts"), window_))
      .agg(
        count(lit(1)).as("num_readings"),
        avg(col("ph")).as("avg_ph"),
        max(col("ph")).as("max_ph"),
        avg(col("chlorine_mg_l")).as("avg_chlorine"),
        avg(col("temp_c")).as("avg_temp"),
        sum(col("pump_kwh_est")).as("pump_kwh_sum"))
      .select(
        col("pool_id"),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("num_readings"), col("avg_ph"), col("max_ph"),
        col("avg_chlorine"), col("avg_temp"), col("pump_kwh_sum"))
      .withColumn("ph_out_of_range",
        col("avg_ph") < phLo || col("avg_ph") > phHi)
      .withColumn("chlorine_out_of_range",
        col("avg_chlorine") < clLo || col("avg_chlorine") > clHi)
      .withColumn("calc_date", to_date(col("window_start")))
  }

  /** Gold agg → enriched: stream-static double join with the pools dim
    * (dedup'd on pool_id) and the electricity price table on
    * (date, hour), plus the map-based cost estimate
    * (07:…py:144-151; 07_kafka….ipynb §7). `broadcast` on both static
    * sides: dims are small; never shuffle the stream. */
  def goldEnriched(goldAgg: DataFrame, pools: DataFrame,
      prices: DataFrame): DataFrame = {
    val dim = broadcast(pools.dropDuplicates(Seq("pool_id"))
      .select(col("pool_id"), col("pool_name"), col("owner_type"),
        col("is_heated")))
    val px = broadcast(prices.select(col("date").as("calc_date"),
      col("hour").as("calc_hour"), col("price_eur_kwh")))
    goldAgg
      .withColumn("calc_hour", hour(col("window_start")))
      .join(dim, Seq("pool_id"), "left")
      .join(px, Seq("calc_date", "calc_hour"), "left")
      .withColumn("energy_cost_est",
        round(col("pump_kwh_sum") * coalesce(col("price_eur_kwh"),
          lit(0.0)), 6))
  }
}
