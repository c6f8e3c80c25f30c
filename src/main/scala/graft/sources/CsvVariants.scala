package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TimeParse

/** Column-presence dispatch for the electricity-price CSV schema
  * variants (FIXTURES.md §3; reference:
  * spark-apps/05_ingest_electricity_csv.py:26-46):
  *   A: ts_utc + date + hour + price_eur_mwh + price_eur_kwh + region + source
  *   B: ts + price_eur_mwh
  *   C: date + hour (no ts column)
  * Output always matches [[graft.model.Schemas.electricityPrice]].
  */
object CsvVariants {

  def normalizeElectricity(raw: DataFrame, defaultRegion: String = "ES")
      : DataFrame = {
    val cols = raw.columns.toSet
    val withTs =
      if (cols.contains("ts_utc"))
        raw.withColumn("ts_utc", TimeParse.parseTimestamp(col("ts_utc")))
      else if (cols.contains("ts"))
        raw.withColumn("ts_utc", TimeParse.parseTimestamp(col("ts")))
      else if (cols.contains("date") && cols.contains("hour"))
        // build ts from date + zero-padded hour (05:…py:37-44)
        raw.withColumn("ts_utc", to_timestamp(concat_ws(" ",
          col("date").cast("string"),
          concat(lpad(col("hour").cast("string"), 2, "0"), lit(":00:00")))))
      else
        raw.withColumn("ts_utc", lit(null).cast("timestamp"))
    withTs
      .withColumn("date",
        if (cols.contains("date")) col("date").cast("date")
        else to_date(col("ts_utc")))
      .withColumn("hour",
        if (cols.contains("hour")) col("hour").cast("int")
        else hour(col("ts_utc")))
      .withColumn("price_eur_mwh", col("price_eur_mwh").cast("double"))
      .withColumn("price_eur_kwh",
        if (cols.contains("price_eur_kwh"))
          col("price_eur_kwh").cast("double")
        else round(col("price_eur_mwh") / 1000.0, 6))
      .withColumn("region",
        if (cols.contains("region")) col("region")
        else lit(defaultRegion))
      .withColumn("source",
        if (cols.contains("source")) col("source") else lit("unknown"))
      .select("ts_utc", "date", "hour", "price_eur_mwh", "price_eur_kwh",
        "region", "source")
  }
}
