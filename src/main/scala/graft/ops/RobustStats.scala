package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround

/** Outlier-robust statistics: winsorization (clip at global exact
  * percentiles, then aggregate the clipped value).
  *
  * The percentile bounds are ONE 2-column row, computed in a single
  * pass and broadcast back onto the fact scan (a broadcast nested-loop
  * of 1 row — no shuffle of the fact side beyond the final group-by).
  * Exact `percentile` is a sort-based aggregate: acceptable for a
  * numeric measure column at any scale because only (value) pairs
  * reach the aggregate, and Spark spills it; swap `percentile` for
  * `approx_percentile` when a 1e-3-relative bound is enough and a
  * single-pass sketch is preferred at 100 TB.
  */
object RobustStats {

  def winsorized(df: DataFrame, valueCol: String, groupCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    val v: Column = col(valueCol)
    val bounds = df.agg(
      expr(s"percentile($valueCol, $pLo)").as("__lo"),
      expr(s"percentile($valueCol, $pHi)").as("__hi"))
    val clipped = least(greatest(v, col("__lo")), col("__hi"))
    df.crossJoin(broadcast(bounds))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(v < col("__lo") || v > col("__hi"), 1L).otherwise(0L))
          .as("n_clipped"),
        dround(avg(clipped), 4).as("mean_w"),
        dround(stddev_samp(clipped), 4).as("sd_w"))
  }
}
