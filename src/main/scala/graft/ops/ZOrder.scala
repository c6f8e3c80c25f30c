package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Range-partitioning by a single column gives perfect file-level
  * min/max pruning on that column and none on any other. Interleaving
  * the bits of several columns into one Morton code and range-
  * partitioning on THAT gives every interleaved column locality ∝
  * 1/k of its bits — a multi-column box predicate then touches a small
  * fraction of files instead of all of them. This is the layout trick
  * behind Delta/Iceberg `ZORDER BY`, built here from plain Catalyst
  * bit expressions (shiftright/&/shiftleft/|) — fully codegen'd, a
  * narrow map followed by one range repartition (sampling pass + one
  * shuffle, both linear).
  *
  * Inputs must be non-negative ints that fit `bitsPerCol` bits; scale
  * or rank upstream (bucketized timestamps, dictionary codes, …).
  */
object ZOrder {

  /** 64-bit Morton code over up to 4 columns, `bitsPerCol` bits each
    * (cols.size * bitsPerCol must be ≤ 64). */
  def zvalue(cols: Seq[Column], bitsPerCol: Int = 16): Column = {
    require(cols.nonEmpty && cols.size * bitsPerCol <= 64,
      "interleave must fit in 64 bits")
    val n = cols.size
    cols.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, i)) =>
      (0 until bitsPerCol).foldLeft(acc) { (a, b) =>
        a.bitwiseOR(shiftleft(
          shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
          b * n + i))
      }
    }
  }

  /** Rewrite `df` into `partitions` range partitions ordered by the
    * Morton code of `cols`, sorted within each partition — write the
    * result with any sink and every file carries tight min/max ranges
    * on ALL of `cols`. */
  def layout(df: DataFrame, cols: Seq[String], partitions: Int,
      bitsPerCol: Int = 16): DataFrame = {
    val z = zvalue(cols.map(col), bitsPerCol)
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** `OPTIMIZE ... ZORDER BY` for a [[graft.core.VersionedTable]]:
    * commit a new version whose files are [[layout]]-clustered on
    * `cols` and publish the min/max stats sidecar over them, so
    * [[graft.core.VersionedTable.readPruned]] range scans on ANY of
    * the clustered columns skip most files. Content is identical (a
    * table is unordered); history and concurrent pinned readers are
    * untouched — this is maintenance, the same copy-on-write
    * discipline as [[graft.core.VersionedTable.compact]], and like
    * compaction it should run on a cadence, not per commit. Returns
    * the clustered version. */
  def clusterTable(spark: org.apache.spark.sql.SparkSession,
      path: String, cols: Seq[String], partitions: Int,
      bitsPerCol: Int = 16): Int = {
    val cur = graft.core.VersionedTable.read(spark, path)
    val v = graft.core.VersionedTable.commitOverwrite(
      layout(cur, cols, partitions, bitsPerCol), path)
    graft.core.VersionedTable.publishStats(spark, path, cols, Some(v))
    v
  }
}
