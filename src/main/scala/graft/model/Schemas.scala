package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** Schema constants + case classes for the reference's domain
  * (FIXTURES.md §1-§5). Declared explicitly — streaming JSON parsing and
  * Silver casts re-assert these types (reference:
  * 07_kafka_smartpool_sensors.py:25-35; 03_silver_smartpool.ipynb §3-§4).
  */
object Schemas {

  /** dbo.pools_dim (reference: sql-scripts/CREATE DATABASE.sql:7-15). */
  val poolsDim: StructType = StructType(Seq(
    StructField("pool_id", IntegerType, nullable = false),
    StructField("pool_name", StringType),
    StructField("location", StringType),
    StructField("volume_liters", IntegerType),
    StructField("is_heated", BooleanType, nullable = false),
    StructField("owner_type", StringType),
    StructField("updated_at", TimestampType, nullable = false)))

  /** dbo.maintenance_events (CREATE DATABASE.sql:30-39). */
  val maintenanceEvents: StructType = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("pool_id", IntegerType, nullable = false),
    StructField("event_time", TimestampType, nullable = false),
    StructField("intervention_type", StringType, nullable = false),
    StructField("product_type", StringType),
    StructField("product_amount", DoubleType),
    StructField("notes", StringType),
    StructField("updated_at", TimestampType, nullable = false)))

  /** Allowed intervention types (03_silver_smartpool.ipynb §4). */
  val interventionTypes: Seq[String] =
    Seq("chlorine", "refill", "ph_correction", "filter_backwash")

  /** Sensor JSON payload (07_kafka_smartpool_sensors.py:25-35). */
  val sensorReading: StructType = StructType(Seq(
    StructField("pool_id", IntegerType, nullable = false),
    StructField("sensor_ts", TimestampType, nullable = false),
    StructField("ph", DoubleType),
    StructField("chlorine_mg_l", DoubleType),
    StructField("temp_c", DoubleType),
    StructField("turbidity_ntu", DoubleType),
    StructField("water_level_pct", DoubleType),
    StructField("pump_kwh_est", DoubleType)))

  /** Raw sensor JSON with string ts — for the multi-format parse path
    * (07_kafka_smartpool_sensors.ipynb §5). */
  val sensorReadingRaw: StructType = StructType(
    sensorReading.fields.map {
      case StructField("sensor_ts", _, n, m) =>
        StructField("sensor_ts", StringType, n, m)
      case f => f
    })

  /** Electricity price row after normalization (FIXTURES.md §3 A). */
  val electricityPrice: StructType = StructType(Seq(
    StructField("ts_utc", TimestampType),
    StructField("date", DateType, nullable = false),
    StructField("hour", IntegerType, nullable = false),
    StructField("price_eur_mwh", DoubleType, nullable = false),
    StructField("price_eur_kwh", DoubleType),
    StructField("region", StringType),
    StructField("source", StringType)))

  /** Silver validity ranges (07_kafka….ipynb §5). */
  val sensorValidRanges: Map[String, (Double, Double)] = Map(
    "ph" -> (0.0, 14.0), "chlorine_mg_l" -> (0.0, 10.0),
    "temp_c" -> (-5.0, 60.0), "turbidity_ntu" -> (0.0, 200.0),
    "water_level_pct" -> (0.0, 100.0))

  /** Gold alert thresholds (07_kafka_smartpool_sensors.py:125-128). */
  val phAlertRange: (Double, Double) = (7.1, 7.8)
  val chlorineAlertRange: (Double, Double) = (0.4, 1.5)
}

case class Pool(pool_id: Int, pool_name: String, location: String,
    volume_liters: Int, is_heated: Boolean, owner_type: String,
    updated_at: Timestamp)

case class MaintenanceEvent(id: Int, pool_id: Int, event_time: Timestamp,
    intervention_type: String, product_type: Option[String],
    product_amount: Option[Double], notes: Option[String],
    updated_at: Timestamp)

case class SensorReading(pool_id: Int, sensor_ts: Timestamp,
    ph: Option[Double], chlorine_mg_l: Option[Double],
    temp_c: Option[Double], turbidity_ntu: Option[Double],
    water_level_pct: Option[Double], pump_kwh_est: Option[Double])
