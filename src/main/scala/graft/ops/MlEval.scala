package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation and feature-encoding statistics for the training
  * pipeline — the operations that gate a classifier (did the quality
  * model actually rank positives above negatives?) and feed it
  * (leakage-safe categorical encodings) at corpus scale.
  *
  * Both operators are built on the same discipline as [[DriftMonitor]]:
  * integer-exact distributed arithmetic (callers pass integer-quantized
  * scores/targets), so every sum is a BIGINT that commutes across
  * partitions, and the only floating-point ops are the final fixed-order
  * divisions — partition-independent and DuckDB-replayable.
  */
object MlEval {

  /** ROC AUC via the bucketed Mann–Whitney statistic, optionally per
    * group.
    *
    * The naive formulation ranks every row globally (`rank().over` with
    * no partition key = one executor sorting the corpus). This one never
    * ranks rows: scores arrive integer-quantized, so equal scores
    * collapse into buckets first —
    *
    * {{{ 2·U = Σ_buckets pos_b · (2·negBelow_b + neg_b) }}}
    *
    * which is exactly Mann–Whitney with average-rank tie correction, and
    * `AUC = 2U / (2·P·N)`. Shape at scale: one map-side-combined
    * aggregation to (group, score) buckets, a window over the bounded
    * bucket table (partitioned by group — quantization bounds buckets per
    * group), and a final per-group aggregate that reuses the window's
    * partitioning. Two shuffles total, none of them row-count-sized
    * after the first combine.
    *
    * @param df       input rows
    * @param score    integer-quantized score (higher = more positive)
    * @param label    1 for positive, 0 for negative
    * @param byCols   grouping columns ("" group = global when empty)
    * @return one row per group: `auc` (null when a class is absent),
    *         `n_pos`, `n_neg`
    */
  def rocAuc(df: DataFrame, score: Column, label: Column,
      byCols: Seq[String] = Nil): DataFrame = {
    val g = byCols.map(col)
    val buckets = df
      .groupBy((g :+ score.as("__s")): _*)
      .agg(count(lit(1)).as("__tot"),
        sum(label.cast("long")).as("__pos"))
    aucFromCounts(buckets, "__s", "__pos", "__tot", byCols)
  }

  /** AUC from a PRE-AGGREGATED (score-bucket, positives, total) count
    * table — the monitoring shape: an incrementally maintained bucket
    * view ([[IncrementalAgg.maintain]] with `keys = byCols :+ score`,
    * `valueCol = label`) is additive under appends, so a model's AUC
    * over a growing eval log refreshes from deltas and this post-math
    * runs on the bounded bucket table. Bit-identical to [[rocAuc]] on
    * the same rows by construction (same buckets, same 2U algebra). */
  def aucFromCounts(counts: DataFrame, score: String, pos: String,
      tot: String, byCols: Seq[String] = Nil): DataFrame = {
    val g = byCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(score))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = counts
      .withColumn("__negb", (col(tot) - col(pos)).cast("long"))
      .withColumn("__negBelow",
        sum(col("__negb")).over(w) - col("__negb"))
      .withColumn("__u2",
        col(pos) * (lit(2) * col("__negBelow") + col("__negb")))
    scored
      .groupBy(g: _*)
      .agg(sum(col("__u2")).as("__u2"), sum(col(pos)).as("n_pos"),
        sum(col("__negb")).as("n_neg"))
      .withColumn("auc",
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("__u2").cast("double")
            / (lit(2.0) * col("n_pos") * col("n_neg"))))
      .drop("__u2")
  }

  /** Average precision (PR AUC) from the same integer score buckets as
    * [[rocAuc]] — the class-imbalance metric ROC flatters (a 1:1000
    * positive rate barely moves ROC AUC but collapses precision).
    *
    * Ties form threshold BLOCKS (each distinct score is one threshold,
    * the sklearn step-wise definition):
    *
    * {{{ AP = Σ_blocks (posᵦ / P) · precision_at_block
    *        = Σ_blocks posᵦ · cumPosᵦ / (cumPosᵦ + cumNegᵦ) / P }}}
    *
    * cumulative counts run from the HIGHEST score down. Counts are
    * exact longs; each block term is scaled to BIGINT at 1e-9 before
    * the cross-exchange sum (the PSI discipline), so the result is
    * partition-independent and oracle-replayable. Same two-shuffle
    * bucket shape as [[rocAuc]]. */
  def prAuc(df: DataFrame, score: Column, label: Column,
      byCols: Seq[String] = Nil): DataFrame = {
    val g = byCols.map(col)
    val buckets = df
      .groupBy((g :+ score.as("__s")): _*)
      .agg(sum(label.cast("long")).as("__pos"),
        (count(lit(1)) - sum(label.cast("long"))).as("__neg"))
    val w = Window.partitionBy(g: _*).orderBy(col("__s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = buckets
      .withColumn("__cp", sum(col("__pos")).over(w))
      .withColumn("__cn", sum(col("__neg")).over(w))
      .withColumn("__term_s", when(col("__pos") > 0, round(
        col("__pos").cast("double") * (col("__cp").cast("double")
          / (col("__cp") + col("__cn")).cast("double")) * lit(1e9))
        .cast("long")).otherwise(lit(0L)))
    scored
      .groupBy(g: _*)
      .agg(sum(col("__term_s")).as("__ts"), sum(col("__pos")).as("n_pos"),
        sum(col("__neg")).as("n_neg"))
      .withColumn("pr_auc",
        when(col("n_pos") > 0,
          col("__ts").cast("double") / lit(1e9)
            / col("n_pos").cast("double")))
      .drop("__ts")
  }

  /** Split conformal prediction intervals — the distribution-free
    * coverage guarantee for ANY point forecaster: with calibration
    * nonconformity scores `e₁..eₙ` (held out from the forecaster's
    * fit), the interval `ŷ ± qhat` with
    *
    * {{{ qhat = k-th smallest calibration score,
    *     k = ⌈(1−α)(n+1)⌉ }}}
    *
    * covers a fresh exchangeable point with probability ≥ 1−α. When
    * `k > n` (too little calibration data for the requested level) the
    * finite guarantee does not exist and `qhat` is null — honest,
    * never a clamped pretend-quantile.
    *
    * Scores arrive integral (the fixed-point contract), so the order
    * statistic is exact: `row_number` ties pick an arbitrary row but
    * the k-th smallest VALUE is unique. One window sort per key for
    * the rank, a keys-sized join of qhat back onto the test rows, one
    * aggregation for coverage.
    *
    * @param errors per-observation nonconformity scores
    * @param keys   series/group identity
    * @param errCol integral (quantized) score column
    * @param calCol boolean: true = calibration row, false = test row
    * @param alpha  miscoverage level (e.g. 0.2 for 80% intervals)
    * @return per key: n_cal, qhat (null when k > n_cal), n_test,
    *         n_covered, coverage (round 4; null without a qhat)
    */
  def conformalSplit(errors: DataFrame, keys: Seq[String],
      errCol: String, calCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    val dt = errors.schema(errCol).dataType.simpleString
    require(Seq("bigint", "int", "smallint", "tinyint").contains(dt),
      s"conformal scores must be integral (exact order statistic); " +
        s"$errCol is $dt — scale doubles to a fixed-point long first")
    val g = keys.map(col)
    // a NULL score would sort FIRST under Spark's ascending order and
    // silently shift the k-th order statistic; a null split flag has no
    // defined side. Neither is a score — drop both up front.
    val scored = errors.filter(
      col(errCol).isNotNull && col(calCol).isNotNull)
    val cal = scored.filter(col(calCol))
    val wk = Window.partitionBy(g: _*)
    val qhat = cal
      .withColumn("__rn", row_number().over(wk.orderBy(col(errCol))))
      .withColumn("__n", count(lit(1)).over(wk))
      .filter(col("__rn") ===
        ceil(lit(1.0 - alpha) * (col("__n") + lit(1)).cast("double")))
      .select((g :+ col("__n").as("n_cal")
        :+ col(errCol).cast("long").as("qhat")): _*)
    val nCalAll = cal.groupBy(g: _*).agg(count(lit(1)).as("__ncal"))
    scored.filter(!col(calCol))
      .join(qhat, keys, "left")
      .groupBy(g: _*)
      .agg(max(col("n_cal")).as("n_cal"), max(col("qhat")).as("qhat"),
        count(lit(1)).as("n_test"),
        sum(when(col(errCol) <= col("qhat"), 1L).otherwise(0L))
          .as("n_covered"))
      // a key whose k exceeded n_cal joined nothing: recover the true
      // n_cal (max over an empty join is null) and null the coverage
      .join(nCalAll, keys, "left")
      .withColumn("n_cal", coalesce(col("n_cal"), col("__ncal"), lit(0L)))
      .withColumn("n_covered",
        when(col("qhat").isNotNull, col("n_covered")))
      .withColumn("coverage",
        when(col("qhat").isNotNull && col("n_test") > 0,
          graft.functions.Rounding.dround(
            col("n_covered").cast("double")
              / col("n_test").cast("double"), 4)))
      .drop("__ncal")
  }

  /** Leakage-safe (out-of-fold) mean target encoding with additive
    * prior smoothing — the standard high-cardinality categorical
    * encoder for gradient-boosted / linear models:
    *
    * {{{ enc(c, f) = (Σ_{c, ¬f} t + m · prior_{¬f})
    *               / (n_{c, ¬f} + m) }}}
    *
    * A row in fold `f` is encoded from every fold EXCEPT `f`, and the
    * smoothing prior is itself out-of-fold, so no row's target ever
    * reaches its own feature value. Returns the bounded encoding TABLE
    * (|categories| × |folds| rows) — joining it back onto the corpus is
    * the caller's broadcast join, so the encode itself is one
    * map-side-combined aggregation over the scan plus window math on
    * the small table.
    *
    * @param df        input rows
    * @param cat       categorical column to encode
    * @param fold      integer fold assignment (deterministic, e.g.
    *                  `key % k` — the caller owns the split protocol)
    * @param target    integer-quantized target (e.g. 0/1 flag, price e2)
    * @param smoothing prior weight `m` (rows of pseudo-evidence)
    * @return (cat, fold, n_oof, enc) — `enc` null when a (cat, fold)
    *         has no out-of-fold evidence and `m = 0`
    */
  def targetEncode(df: DataFrame, cat: Column, fold: Column,
      target: Column, smoothing: Double): DataFrame = {
    val perFold = df
      .groupBy(cat.as("cat"), fold.as("fold"))
      .agg(sum(target.cast("long")).as("__sum"),
        count(lit(1)).as("__cnt"))
    // all totals derive from the bounded (cat, fold) table: per-cat via
    // a window, per-fold and global via broadcast-joined aggregates
    val wc = Window.partitionBy(col("cat"))
    val byFold = perFold.groupBy(col("fold"))
      .agg(sum(col("__sum")).as("__fsum"), sum(col("__cnt")).as("__fcnt"))
    val global = perFold.agg(sum(col("__sum")).as("__gsum"),
      sum(col("__cnt")).as("__gcnt"))
    perFold
      .withColumn("__csum", sum(col("__sum")).over(wc))
      .withColumn("__ccnt", sum(col("__cnt")).over(wc))
      .join(broadcast(byFold), "fold")
      .crossJoin(broadcast(global))
      .withColumn("__oofSum", col("__csum") - col("__sum"))
      .withColumn("__oofCnt", col("__ccnt") - col("__cnt"))
      .withColumn("__priorNum",
        (col("__gsum") - col("__fsum")).cast("double"))
      .withColumn("__priorDen",
        (col("__gcnt") - col("__fcnt")).cast("double"))
      .withColumn("n_oof", col("__oofCnt"))
      .withColumn("enc",
        when(col("__oofCnt") + lit(smoothing) > 0 && col("__priorDen") > 0,
          (col("__oofSum").cast("double")
            + lit(smoothing) * (col("__priorNum") / col("__priorDen")))
            / (col("__oofCnt").cast("double") + lit(smoothing))))
      .select(col("cat"), col("fold"), col("n_oof"), col("enc"))
  }
}
