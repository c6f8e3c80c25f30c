package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data selection under a token budget: keep the highest-quality
  * documents whose token counts sum to at most `budget` — the step
  * that turns "score every document" (q21) into an actual training
  * mix of a target size.
  *
  * The naive formulation is a global sort by score with a running
  * token sum — a full-corpus range shuffle plus an effectively serial
  * cumulative window at 100 TB. Instead the score is quantized to its
  * native 4-dp resolution (quality scores ARE 4-dp; see
  * [[graft.functions.TextFunctions.qualityScore]]) and selection runs
  * in two bounded passes:
  *
  *  1. one map-side-combined hash aggregate to
  *     `(bucket, sum_tokens)` — at most 10001 rows no matter how
  *     large the corpus;
  *  2. a cumulative window over that tiny aggregate (descending
  *     bucket) finds each bucket's token mass above it. Buckets that
  *     fit entirely under the budget are admitted wholesale via a
  *     broadcast join — no sort of their documents at all. Only the
  *     single boundary bucket's documents go through an id-ordered
  *     cumulative window to fill the remaining budget exactly.
  *
  * Within the boundary bucket, admission is the longest id-ordered
  * prefix that fits: the running total is monotone, so the filter
  * `tokens_before + own ≤ remaining` admits a prefix and nothing
  * after the first overflow. Deterministic, and the whole plan never
  * sorts more than one bucket's worth of documents.
  */
object TokenBudget {

  /** Documents under budget, as (id, quality, n_tokens) — the kept
    * set. `scoreCol`/`tokensCol` are computed columns over `textCol`
    * by default (quality score + whitespace token count). */
  def selectToBudget(df: DataFrame, idCol: String, textCol: String,
      budget: Long): DataFrame = {
    val doc = df.select(col(idCol),
      graft.functions.TextFunctions.qualityScore(col(textCol))
        .as("quality"),
      graft.functions.TextFunctions.tokenCount(col(textCol))
        .cast("long").as("n_tokens"))
    selectScoredToBudget(doc, idCol, col("quality"), col("n_tokens"),
      budget)
  }

  /** Core selection over a pre-scored frame. `score` must be 4-dp
    * quantized (values × 10000 integral up to float error). */
  def selectScoredToBudget(doc: DataFrame, idCol: String, score: Column,
      tokens: Column, budget: Long): DataFrame = {
    val d = doc.withColumn("__b", round(score * 10000).cast("int"))
    val buckets = d.groupBy(col("__b"))
      .agg(sum(tokens).as("__tok"))
    // tiny frame (≤10001 rows): the single-partition window is fine
    val w = Window.orderBy(col("__b").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = buckets.withColumn("__cum_before",
      coalesce(sum(col("__tok")).over(w), lit(0L)))
    val flagged = cum.withColumn("__full",
      col("__cum_before") + col("__tok") <= budget)
    val joined = d.join(
      broadcast(flagged.select(col("__b"), col("__full"),
        col("__cum_before"))), "__b")
    val fullDocs = joined.filter(col("__full"))
    // the (single) partially-admitted bucket: id-ordered prefix fill
    val boundary = joined
      .filter(!col("__full") && col("__cum_before") < budget)
    val wb = Window.partitionBy(col("__b")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val part = boundary.withColumn("__doc_before",
        coalesce(sum(tokens).over(wb), lit(0L)))
      .filter(col("__cum_before") + col("__doc_before") + tokens
        <= budget)
    fullDocs.select(col(idCol), score.as("quality"),
        tokens.as("n_tokens"))
      .unionByName(part.select(col(idCol), score.as("quality"),
        tokens.as("n_tokens")))
  }
}
