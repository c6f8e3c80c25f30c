package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Last-mile training-shard export: write a curated corpus as
  * contiguous, internally-sorted shard files.
  *
  * `repartitionByRange` samples split points and range-partitions the
  * data, `sortWithinPartitions` sorts each shard locally — together a
  * GLOBAL total order across shard files without any global
  * sort-merge: shard i's highest key is below shard i+1's lowest. A
  * training loader can then stream shards in filename order (or any
  * subset by key range) and see ordered, non-overlapping data. One
  * range exchange total; each shard sorts independently — the same
  * plan at 100 shards or 100 000.
  */
object ShardExport {

  def write(df: DataFrame, path: String, sortCol: String,
      shards: Int): Unit = {
    require(shards > 0)
    df.repartitionByRange(shards, col(sortCol))
      .sortWithinPartitions(col(sortCol))
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Shard audit: per output file, its row count and key range —
    * the loader-facing manifest, and the proof that shard ranges do
    * not overlap. */
  def manifest(spark: SparkSession, path: String, sortCol: String)
      : DataFrame =
    spark.read.parquet(path)
      .select(col(sortCol), input_file_name().as("shard_file"))
      .groupBy(col("shard_file"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(sortCol)).as("key_min"),
        max(col(sortCol)).as("key_max"))
      .orderBy(col("key_min"))
}
