package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided star schema (TESTDATA.md). One parquet
  * file per table under `sfDir`. At cluster scale these would be
  * partitioned directories; the API is path-based either way.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.parquet has shipped as TIMESTAMP(NANOS) (which Spark's
    // vectorized reader rejects — read the ns epoch as long and
    // floor-convert to µs) and as plain TIMESTAMP(MICROS) without the
    // UTC flag (reads as TIMESTAMP_NTZ). Normalize both layouts to a
    // session-TZ TimestampType `ts` so every downstream query and the
    // DuckDB oracle see identical µs instants (session TZ is UTC).
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }
  }
}
