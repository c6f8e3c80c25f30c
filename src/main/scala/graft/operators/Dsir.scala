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
  *  - the per-bucket log-likelihood-ratio table (≤ `Buckets` rows) is
  *    collected as model metadata — like a codebook — and rides the
  *    plan as an array literal, so per-doc scoring is a NARROW in-row
  *    fold over the doc's bigrams in document order: no explode, no
  *    join, no per-doc aggregation exchange at all.
  *
  * The feature hash is the first 8 hex chars of md5 (mod buckets) —
  * deliberately engine-portable (the DuckDB oracle replicates it
  * bit-for-bit), unlike xxhash64. Per-bucket smoothing is add-1 over
  * `Buckets` cells; ratios are rounded to 6 dp before the per-doc sum.
  * The in-row fold is also what makes the 4-dp doc weight
  * bit-reproducible: a groupBy sum's association order is
  * partition-dependent, and at sf0.1 ~0.4% of docs landed on 4-dp
  * rounding boundaries where that last-bit drift flipped the digit vs
  * the oracle — a left fold in document order is the same
  * parenthesization on both engines.
  */
object Dsir {

  val Buckets = 256

  /** In-row lowercase word bigrams via the native shingle expression
    * (the builtin transform/sequence/concat_ws chain costs tens of
    * seconds per corpus pass at sf0.1 — see [[graft.functions
    * .WordShingles]]); <2 tokens → empty array. */
  def bigrams(text: Column): Column = {
    val toks = TextFunctions.tokens(lower(text))
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(graft.functions.WordShingles.column(toks, 2))
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
      .select(col("__t"), explode(bigrams(col(textCol))).as("__bg"))
      .withColumn("__fb", featBucket(col("__bg")))
    val counts = feats.groupBy(col("__fb")).agg(
      sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
      sum(when(!col("__t"), 1L).otherwise(0L)).as("__cs"))
    val totals = counts.agg(sum(col("__ct")).as("__nt"),
      sum(col("__cs")).as("__ns"))
    // bounded collect: the ≤Buckets-row LR table is model metadata
    // (buckets no bigram maps to never get referenced; 0.0 fill)
    val lrRows = counts.crossJoin(broadcast(totals))
      .select(col("__fb"), Rounding.dround(
        log(((col("__ct") + 1).cast("double")
            / (col("__nt") + Buckets).cast("double"))
          / ((col("__cs") + 1).cast("double")
            / (col("__ns") + Buckets).cast("double"))), 6).as("__lr"))
      .collect()
    val lrArr = Array.fill(Buckets)(0.0)
    lrRows.foreach(r => lrArr(r.getLong(0).toInt) = r.getDouble(1))
    // typedLit → a single constant ArrayType Literal; array(lit...)
    // would be a CreateArray re-evaluating 256 children on every row
    val lrLit = typedLit(lrArr.toSeq)
    // narrow scoring: left fold over the doc's bigrams in document
    // order — deterministic parenthesization, no shuffle
    val bg = bigrams(col(textCol))
    base.select(col(idCol),
      size(bg).cast("long").as("n_feats"),
      (Rounding.dround(aggregate(
        transform(bg, b => element_at(lrLit,
          featBucket(b).cast("int") + 1)),
        lit(0.0d), (acc, v) => acc + v), 4) + lit(0)).as("weight"))
  }
}
