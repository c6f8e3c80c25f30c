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

  /** Deterministic training-order permutation: every row gets a
    * (shard, pos) address under a seeded hash order — the "global
    * shuffle" a training run needs, reproducible across engines and
    * re-runs (resume from any (shard, pos) checkpoint).
    *
    * Scale shape: no global sort. The hash assigns shards in a narrow
    * map; `pos` is a row_number per shard, so the only exchange is the
    * shard hash partition and each shard sorts independently —
    * corpus/shards rows per sort, the same plan at any corpus size.
    * The hash is the engine-portable md5-prefix (cf. [[graft.operators.Dsir]])
    * so the oracle replicates the exact permutation bit-for-bit. */
  def trainingOrder(df: DataFrame, idCol: String, seed: Long,
      shards: Int): DataFrame = {
    require(shards > 0)
    val h = conv(substring(md5(concat(lit(s"$seed:"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    df.select(col(idCol), h.as("order_key"))
      .withColumn("shard", pmod(col("order_key"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard"))
          .orderBy(col("order_key"), col(idCol))).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Multi-epoch variant of [[trainingOrder]]: one independent
    * deterministic permutation PER EPOCH (epoch folded into the hash
    * seed), so a multi-epoch training run sees genuinely different
    * data orders — repeating epoch 0's order every epoch measurably
    * hurts convergence — while staying fully reproducible and
    * resumable from any (epoch, shard, pos) address.
    *
    * Same shape as the single-epoch form, ×`epochs`: the epoch column
    * comes from an in-row explode (no extra scan of the corpus per
    * epoch), each (epoch, shard) partition sorts its own hash-sized
    * slice, no global sort. */
  def multiEpochOrder(df: DataFrame, idCol: String, seed: Long,
      shards: Int, epochs: Int): DataFrame = {
    require(shards > 0 && epochs > 0)
    val withEpoch = df.select(col(idCol),
      explode(sequence(lit(0), lit(epochs - 1))).as("epoch"))
    val h = conv(substring(md5(concat(lit(s"$seed:"),
      col("epoch").cast("string"), lit(":"),
      col(idCol).cast("string"))), 1, 8), 16, 10).cast("long")
    withEpoch.withColumn("order_key", h)
      .withColumn("shard", pmod(col("order_key"), lit(shards.toLong)))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("epoch"), col("shard"))
          .orderBy(col("order_key"), col(idCol))).cast("long"))
      .select(col(idCol), col("epoch"), col("shard"), col("pos"))
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
