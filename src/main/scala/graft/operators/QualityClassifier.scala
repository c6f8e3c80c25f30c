package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround
import graft.functions.TextFunctions

/** Trained quality classifier: full-batch logistic regression over
  * cheap in-row text features — the stand-in for the fasttext-style
  * quality filters real pretraining pipelines train on a curated
  * positive set and apply corpus-wide (GPT-3 §2.2, LLaMA's CCNet
  * filtering).
  *
  * Scale design:
  *  - each gradient-descent iteration is ONE corpus scan ending in a
  *    single map-side-combined aggregate that reduces to 4 longs — the
  *    driver holds only the weight vector, never data;
  *  - per-document gradient contributions are rounded to 6 dp and
  *    scaled to 64-bit integers BEFORE the sum, so the distributed
  *    reduction is integer addition — associative and therefore
  *    independent of partitioning and combine order. (A double sum's
  *    association order is partition-dependent; q108 hit exactly that
  *    class of last-bit drift.) Headroom: |contrib| ≤ 10⁶ per doc, so
  *    the sum stays inside Long up to ~9·10¹² documents — comfortably
  *    past 100 TB corpora;
  *  - all in-row math is IEEE doubles with the same literal operand
  *    order the DuckDB oracle uses, so both engines compute
  *    bit-identical values; `exp` is the only libm call (1-ulp
  *    divergence risk ~1e-10 per cell after 6-dp rounding).
  *
  * Determinism contract: weights after each iteration are a pure
  * function of (corpus, label rule, lr, iters) — the oracle unrolls the
  * same iterations in SQL CTEs and must land on the same weights.
  */
object QualityClassifier {

  /** Feature columns (all 6-dp rounded): bias-less triple of
    * length score, type/token diversity, stopword ratio — the same
    * signals [[TextFunctions.qualityScore]] composes heuristically,
    * here left free for the classifier to weight. */
  def featureFrame(df: DataFrame, idCol: String, textCol: String,
      isPositive: Column): DataFrame = {
    val toks = TextFunctions.tokens(lower(col(textCol)))
    val total = greatest(size(toks).cast("double"), lit(1.0))
    df.select(col(idCol), isPositive.as("__y"),
      dround(least(length(col(textCol)).cast("double") / lit(500.0),
        lit(1.0)), 6).as("f1"),
      dround(sqrt(size(array_distinct(toks)).cast("double") / total), 6)
        .as("f2"),
      dround(size(filter(toks,
        t => t.isin(TextFunctions.EnglishStopwords: _*)))
        .cast("double") / total, 6).as("f3"))
  }

  /** z = w·(1, f1, f2, f3) with the exact literal order the oracle
    * uses (left-associated adds). */
  private def zCol(w: Array[Double]): Column =
    lit(w(0)) + lit(w(1)) * col("f1") + lit(w(2)) * col("f2") +
      lit(w(3)) * col("f3")

  private def sigmoid(z: Column): Column =
    lit(1.0) / (lit(1.0) + exp(-z))

  /** Driver-side 6-dp rounding mirroring [[dround]]'s scale-first
    * sequence (IEEE multiply, HALF_UP on the exact expansion) so
    * driver-held weights equal what Spark/DuckDB would round. */
  private def r6(x: Double): Double = {
    val y = x * 1e6
    new java.math.BigDecimal(y)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue() / 1e6
  }

  /** The one-job-per-iteration gradient aggregate for weights `w`:
    * per-doc residual×feature contributions rounded, integer-scaled
    * and summed to 4 longs, plus the row count N in the SAME aggregate
    * (all map-side combinable) — train needs N every update and a
    * separate `count()` would cost one whole extra corpus scan. */
  def gradientFrame(feats: DataFrame, w: Array[Double]): DataFrame = {
    val p = dround(sigmoid(zCol(w)), 6)
    val resid = when(col("__y"), 1.0).otherwise(0.0) - p
    def g(x: Column) = sum(round(x * lit(1000000.0), 0).cast("long"))
    feats.select(g(resid).as("s0"), g(resid * col("f1")).as("s1"),
      g(resid * col("f2")).as("s2"), g(resid * col("f3")).as("s3"),
      count(lit(1)).as("n"))
  }

  /** Full-batch GD: w ← round₆(w + lr·Σround₆ₛ((y−p)·x)/(10⁶·N)),
    * starting from 0⃗. One aggregate job per iteration, N folded into
    * the first iteration's aggregate (no standalone count job).
    *
    * `feats` is consumed `iters` times — pass a materialized frame
    * ([[graft.core.Scratch.materialize]], as [[scoreDF]] does) when it
    * is derived from raw text, or each iteration re-tokenizes the
    * corpus and the (dominant at 100 TB) feature-extraction I/O
    * multiplies by the iteration count. */
  def train(feats: DataFrame, lr: Double = 0.5, iters: Int = 3)
      : Array[Double] = {
    var w = Array(0.0, 0.0, 0.0, 0.0)
    var it = 0
    while (it < iters) {
      val r = gradientFrame(feats, w).collect()(0)
      // empty corpus: sums are NULL and any update would be NaN — the
      // zero vector is the defined result (read n before the sums)
      if (r.getLong(4) == 0L) return w
      val n = r.getLong(4).toDouble
      w = Array.tabulate(4)(j =>
        r6(w(j) + lr * r.getLong(j) / (1000000.0 * n)))
      it += 1
    }
    w
  }

  /** Train on the full frame, then score every document: (id, label,
    * score, pred) with score = σ(w·x) at 4 dp and pred thresholded on
    * the rounded score.
    *
    * The feature frame is MATERIALIZED once (scratch write + read):
    * tokenization + array ops dominate the per-scan cost, and the
    * unmaterialized form re-derived them for every one of the `iters`
    * gradient jobs plus the final scoring pass — iters+1 full
    * feature-extraction scans where one suffices. After
    * materialization each gradient job is a scan of a 5-column
    * (id, label, 3 doubles) parquet — the shape you want at 100 TB. */
  def scoreDF(df: DataFrame, idCol: String, textCol: String,
      isPositive: Column, lr: Double = 0.5, iters: Int = 3): DataFrame = {
    val feats = graft.core.Scratch.materialize(
      featureFrame(df, idCol, textCol, isPositive), "clf_feats")
    val w = train(feats, lr, iters)
    feats.select(col(idCol), col("__y").as("label"),
      (dround(sigmoid(zCol(w)), 4) + lit(0)).as("score"))
      .withColumn("pred", col("score") >= 0.5)
  }

  /** Score an arbitrary document frame with already-trained weights —
    * the deployment shape: train once in batch, apply everywhere. A
    * pure narrow map (features, σ, threshold all in-row), so the same
    * call scores a Structured Streaming micro-batch unchanged. */
  def scoreWith(df: DataFrame, idCol: String, textCol: String,
      w: Array[Double]): DataFrame =
    featureFrame(df, idCol, textCol, lit(false))
      .select(col(idCol),
        (dround(sigmoid(zCol(w)), 4) + lit(0)).as("score"))
      .withColumn("pred", col("score") >= 0.5)

  /** Reliability diagram for the trained classifier: bucket documents
    * by predicted score (`buckets` equal-width bins) and compare the
    * bucket's mean prediction with its empirical positive rate — the
    * calibration check that decides whether the score can gate on a
    * fixed threshold, or needs recalibration first. `gap` per bucket
    * is the reliability-diagram deviation (its n-weighted sum is ECE).
    *
    * Cross-engine exactness: scores are 4-dp-rounded, so the bucket
    * index is a deterministic floor; the bucket's score sum crosses
    * the exchange as a ×10⁴-scaled integer and the positive count as a
    * long — no float association order anywhere. One aggregation over
    * the scored frame; output is `buckets` rows. */
  def calibrationCurve(df: DataFrame, idCol: String, textCol: String,
      isPositive: Column, buckets: Int = 10, lr: Double = 0.5,
      iters: Int = 3): DataFrame = {
    val scored = scoreDF(df, idCol, textCol, isPositive, lr, iters)
    val agg = scored
      .withColumn("bucket", least(
        floor(col("score") * buckets).cast("int"), lit(buckets - 1)))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("score") * 1e4).cast("long")).as("__ss"),
        sum(when(col("label"), 1L).otherwise(0L)).as("__np"))
      .select(col("bucket"), col("n"),
        (dround(col("__ss").cast("double") /
          (lit(1e4) * col("n")), 6) + lit(0)).as("mean_score"),
        (dround(col("__np").cast("double") / col("n"), 6) + lit(0))
          .as("pos_rate"))
    agg.withColumn("gap",
      dround(abs(col("mean_score") - col("pos_rate")), 6) + lit(0))
  }
}
