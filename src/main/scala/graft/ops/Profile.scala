package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass column profiling — the ANALYZE-TABLE shape of data
  * quality: row count, null count, min/max, and a distinct-count
  * estimate for EVERY column in one scan and one reduce. The naive
  * formulation (one query per column) re-reads the table N_cols times;
  * at 100 TB the only acceptable plan is one pass that computes all
  * aggregates simultaneously (they're all map-side-combinable).
  *
  * Distinct counts are HLL estimates by default — `exact = true` adds
  * `count(DISTINCT)` per column, which Spark plans via one Expand
  * (rows duplicated per column, still a single scan; fine for audits,
  * expensive as a default at scale).
  *
  * Output: one row per column — (col_name, n_rows, n_nulls, min_value,
  * max_value [both as strings], n_distinct_est [+ distinct_ok when
  * exact]).
  */
object Profile {

  def profile(df: DataFrame, exact: Boolean = false): DataFrame = {
    val cols = df.columns.toSeq
    val aggs =
      count(lit(1)).as("__rows") +:
        cols.flatMap { c =>
          Seq(count(col(c)).as(s"__cnt_$c"),
            min(col(c)).cast("string").as(s"__min_$c"),
            max(col(c)).cast("string").as(s"__max_$c"),
            approx_count_distinct(col(c), 0.01).as(s"__apx_$c")) ++
            (if (exact) Seq(countDistinct(col(c)).as(s"__ex_$c"))
             else Nil)
        }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      val base = Seq(
        lit(c).as("col_name"),
        col("__rows").as("n_rows"),
        (col("__rows") - col(s"__cnt_$c")).as("n_nulls"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))
      val dist =
        if (exact)
          // envelope flag, like q33: the estimate is impl-specific, the
          // property "within 10% of exact" is not
          Seq((col(s"__ex_$c") === 0 ||
            abs(col(s"__apx_$c") - col(s"__ex_$c")).cast("double") /
              col(s"__ex_$c") < 0.10).as("distinct_ok"))
        else Seq(col(s"__apx_$c").as("n_distinct_est"))
      struct(base ++ dist: _*)
    }
    wide.select(explode(array(entries: _*)).as("__p")).select("__p.*")
  }
}
