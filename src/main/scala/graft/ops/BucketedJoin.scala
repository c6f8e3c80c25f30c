package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shuffle-free co-located join via bucketed tables (SURVEY.md §4 /
  * builder brief: "co-locate joins via bucketing").
  *
  * A plain big-big equi join sort-merge-shuffles BOTH sides on every
  * run. When the same join key is hit repeatedly (fact-to-fact joins in
  * a 100 TB warehouse), the winning layout is to pay the shuffle ONCE at
  * write time: persist both sides bucketed (and sorted) by the key, and
  * every subsequent join reads co-located buckets directly — the plan
  * has no Exchange on either side (asserted in SqlAndPlanSpec).
  *
  * Bucket counts must match (or divide) across the two tables for the
  * co-location to hold; the bucket file count is per-table-per-key a
  * one-time layout decision — at 100 TB pick buckets so each bucket is a
  * few hundred MB.
  */
object BucketedJoin {

  /** Persist `df` as a bucketed+sorted catalog table (overwriting any
    * previous layout) and return the catalog-backed frame. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String): DataFrame = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    // a crashed previous run can leave the managed location behind with
    // no catalog entry (in-memory catalog) — clear it or CTAS refuses
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
    s.table(table)
  }

  /** Like [[writeBucketed]], but skips the write when `table` already
    * exists in this session's catalog — the production shape: the
    * bucketed layout is paid once at ingest, every subsequent join
    * reads it. Callers must key `table` to the source data (e.g. a
    * digest of the input path) so a reused name never serves stale
    * rows. */
  def ensureBucketed(df: DataFrame, table: String, buckets: Int,
      key: String): DataFrame = {
    val s = df.sparkSession
    if (s.catalog.tableExists(table)) s.table(table)
    else writeBucketed(df, table, buckets, key)
  }

  def table(s: SparkSession, name: String): DataFrame = s.table(name)
}
