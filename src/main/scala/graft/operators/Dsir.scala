package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{Rounding, TextFunctions}

/** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling", arXiv:2302.03169):
  * score every document by how much more likely its hashed-bigram
  * features are under a target distribution than under the background
  * corpus — the standard way to tilt a 100 TB crawl toward a small
  * high-quality target domain without training a classifier.
  *
  * Scale shape:
  *  - bigrams are formed in-row (no shuffle of text);
  *  - each bigram maps to one of [[Buckets]] hashed feature buckets,
  *    so BOTH distributions reduce to a `Buckets`-row count table via
  *    one map-side-combined aggregate — corpus-size-independent;
  *  - the per-bucket log-likelihood-ratio table is broadcast back and
  *    documents re-aggregate (id → Σ log-ratio) with partial
  *    aggregation, so the only wide exchange carries (id, partial sum)
  *    pairs.
  *
  * The feature hash is the first 8 hex chars of md5 (mod buckets) —
  * deliberately engine-portable (the DuckDB oracle replicates it
  * bit-for-bit), unlike xxhash64. Per-bucket smoothing is add-1 over
  * `Buckets` cells; ratios are rounded to 6 dp before the per-doc sum
  * so the oracle's libm and summation order cannot drift the result.
  */
object Dsir {

  val Buckets = 256

  /** In-row lowercase word bigrams; <2 tokens → empty array. */
  def bigrams(text: Column): Column = {
    val toks = TextFunctions.tokens(lower(text))
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1),
          element_at(toks, i + 2))))
  }

  /** Engine-portable feature bucket: first 8 md5 hex chars mod B. */
  def featBucket(s: Column): Column =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long") % Buckets

  /** One row per input document: (id, n_feats, weight) where weight =
    * Σ over the doc's bigram occurrences of
    * ln( p̂_target(bucket) / p̂_background(bucket) ), add-1 smoothed.
    * Documents with no bigrams get weight 0. `isTarget` marks the rows
    * whose features define the target distribution; the background is
    * everything else. */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val base = df.select(col(idCol), col(textCol),
      isTarget.cast("boolean").as("__t"))
    val feats = base
      .select(col(idCol), col("__t"),
        explode(bigrams(col(textCol))).as("__bg"))
      .withColumn("__fb", featBucket(col("__bg")))
    val counts = feats.groupBy(col("__fb")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("__cs"))
    val totals = counts.agg(sum(col("__ct")).as("__nt"),
      sum(col("__cs")).as("__ns"))
    val ratio = counts.crossJoin(broadcast(totals))
      .withColumn("__lr", Rounding.dround(
        log(((col("__ct") + 1).cast("double")
            / (col("__nt") + Buckets).cast("double"))
          / ((col("__cs") + 1).cast("double")
            / (col("__ns") + Buckets).cast("double"))), 6))
    val scored = feats
      .join(broadcast(ratio.select(col("__fb"), col("__lr"))), "__fb")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_feats"),
        (Rounding.dround(sum(col("__lr")), 4) + lit(0)).as("weight"))
    base.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
  }
}
