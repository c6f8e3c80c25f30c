package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Path-addressed medallion table IO (SURVEY.md §1.1): the reference's
  * Delta-on-MinIO layout re-expressed with a pluggable format — parquet
  * in this offline environment, delta when the jars are present. Write
  * modes mirror the reference's append (bronze), overwrite (silver/gold
  * snapshot) and partitioned-write semantics
  * (02_ingest_smartpool.py:68-72; 03_silver_smartpool.py:29-43;
  * 05_ingest_electricity_csv.py:82-87).
  */
final case class LakeLayout(root: String, format: String = "parquet") {
  def bronze(name: String): String = s"$root/bronze/$name"
  def silver(name: String): String = s"$root/silver/$name"
  def gold(name: String): String = s"$root/gold/$name"
  def state(name: String): String = s"$root/_state/$name"
  def checkpoints(name: String): String = s"$root/_checkpoints/$name"
}

object TableIO {

  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p)
  }

  def read(spark: SparkSession, layout: LakeLayout, path: String)
      : DataFrame =
    spark.read.format(layout.format).load(path)

  def append(df: DataFrame, layout: LakeLayout, path: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.format(layout.format).mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path)
  }

  def overwrite(df: DataFrame, layout: LakeLayout, path: String,
      partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.format(layout.format).mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path)
  }

  /** Pre-create an empty table to fix the schema before streams start
    * (reference `ensure_delta`, 07_kafka….ipynb §3). */
  def ensureTable(spark: SparkSession, layout: LakeLayout, path: String,
      schema: StructType, partitionCols: Seq[String] = Nil): Unit =
    if (!exists(spark, path)) {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      val w = empty.write.format(layout.format).mode(SaveMode.Overwrite)
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .save(path)
    }
}
