package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins dedup (SURVEY.md §2.6 W1): `row_number()` over
  * `partitionBy(keys).orderBy(order desc…)`, keep rn==1.
  * Reference semantics: spark-apps/03_silver_smartpool.py:14-20 and the
  * tie-broken notebook variants (03_silver_smartpool.ipynb §3-§4).
  *
  * Scale note: one hash shuffle on `keys`; Spark plans a single
  * window-sort per partition. For 100 TB the keys must be high-cardinality
  * (they are: primary keys); skew on a hot key would need salting upstream.
  */
object DedupLatest {
  def apply(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}

/** Top-N per group (SURVEY.md §2.6 W2/W3).
  * Reference: 06_gold_electricity_enrichment.ipynb §3 (row_number ≤ 5),
  * 06_gold_electricity_enrichment.py:51-54 (dense_rank ≤ 3).
  */
object TopNPerGroup {
  def rowNumber(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int,
      rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, row_number().over(w)).filter(col(rankCol) <= n)
  }

  def denseRank(df: DataFrame, keys: Seq[String], order: Seq[Column], n: Int,
      rankCol: String = "rnk"): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn(rankCol, dense_rank().over(w)).filter(col(rankCol) <= n)
  }
}

/** Merge/upsert without assuming a Delta runtime (SURVEY.md §2.2 K4,
  * §7.3): `whenMatchedUpdateAll.whenNotMatchedInsertAll` semantics as
  * target ▷ (left-anti on keys) ∪ source-latest.
  * Reference: notebooks/03_silver_smartpool.ipynb §4 (Delta MERGE on id).
  *
  * The source side is deduped latest-wins first so a batch carrying two
  * versions of one key upserts deterministically. Both the anti-join and
  * the union keep the target's column order. At scale: the anti join
  * shuffles both sides on `keys` unless the source is small enough to
  * broadcast — callers with small change-sets should pass
  * `broadcastSource = true`.
  */
object Upsert {
  def apply(target: DataFrame, source: DataFrame, keys: Seq[String],
      order: Seq[Column], broadcastSource: Boolean = false): DataFrame = {
    val latest = DedupLatest(source, keys, order).select(
      target.columns.map(col).toIndexedSeq: _*)
    val src = if (broadcastSource) broadcast(latest) else latest
    val keep = target.join(src, keys, "left_anti")
    keep.unionByName(src)
  }
}
