package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot-like conditional aggregation (SURVEY.md §2.5 A3):
  * `sum(when(col === v, 1).otherwise(0))` per domain value.
  * Reference: notebooks/04_gold_smartpool.ipynb §3 (per-intervention-type
  * counts), 06_gold_electricity_enrichment.ipynb §6-§7 (null-count QA).
  *
  * Entirely map-side combinable: one shuffle on the grouping keys, partial
  * aggregation before it — the right shape at any scale.
  */
object ConditionalCounts {
  /** One `<prefix><value>` long column per domain value. */
  def exprs(discriminator: Column, values: Seq[String], prefix: String = "n_")
      : Seq[Column] =
    values.map(v =>
      sum(when(discriminator === v, 1L).otherwise(0L)).as(s"$prefix$v"))

  def apply(df: DataFrame, groupKeys: Seq[String], discriminator: String,
      values: Seq[String], extraAggs: Seq[Column] = Nil): DataFrame = {
    val aggs = exprs(col(discriminator), values) ++ extraAggs
    df.groupBy(groupKeys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
