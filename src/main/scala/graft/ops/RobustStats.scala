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

  /** Per-key MAD outlier flags: a row is an outlier when its absolute
    * deviation from the key's exact median exceeds k × the key's
    * median absolute deviation — the robust z-score that a handful of
    * extreme points cannot drag the way μ/σ thresholds can (the
    * complement to the EW z-score in q201, which tests against a
    * FORWARD state; this one tests against the whole series).
    *
    * Determinism contract: values are quantized to integers at
    * 1/`scale` on entry, so both exact percentiles interpolate over
    * integer-valued (then half-integer-valued) doubles — every
    * intermediate is an exact binary fraction and the comparison is
    * engine-replayable bit-for-bit (the q199 discipline applied to
    * order statistics). Duplicate timestamps collapse by max, nulls
    * drop.
    *
    * Scale shape: two keyed exact-percentile aggregates (sort-based,
    * only (key, value) pairs reach them, Spark spills) and two
    * keys-sized joins back onto the facts.
    *
    * `approx = true` is the 100 TB code path: both medians come from
    * `approx_percentile` (Greenwald-Khanna, single-pass, mergeable
    * partials — map-side combinable, nothing sorts) with rank error ≤
    * 1/`accuracy`. The flags it emits are exact COMPARISONS against
    * slightly-off medians: a point flips only when its robust z-score
    * sits within the sketch error of the k·MAD boundary, so the
    * envelope to assert (q221's oracle) is agreement with the exact
    * flags away from the boundary — not bit-identity. */
  def madOutliers(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, k: Double, scale: Int = 100,
      approx: Boolean = false, accuracy: Int = 10000): DataFrame = {
    require(k > 0.0, s"k must be positive, got $k")
    require(accuracy >= 100,
      s"approx_percentile accuracy must be >= 100, got $accuracy")
    val kc = keys.map(col)
    val base = df.filter(col(valCol).isNotNull)
      .groupBy((kc :+ col(tsCol)): _*)
      .agg(max(col(valCol)).cast("double").as("v"))
      .withColumn("__ve", round(col("v") * lit(scale), 0).cast("long"))
    // null-safe key matches: a NULL-keyed series is a real group
    def joinStats(facts: DataFrame, stats: DataFrame): DataFrame = {
      val s = keys.foldLeft(stats)((f, k) =>
        f.withColumnRenamed(k, s"__s_$k"))
      facts.join(s,
          keys.map(k => col(k) <=> col(s"__s_$k")).reduce(_ && _))
        .drop(keys.map(k => s"__s_$k"): _*)
    }
    def median(c: String): Column =
      if (approx)
        expr(s"approx_percentile($c, 0.5, $accuracy)").cast("double")
      else expr(s"percentile($c, 0.5)")
    val med = base.groupBy(kc: _*)
      .agg(median("__ve").as("__med"))
    val dev = joinStats(base, med)
      .withColumn("__ad", abs(col("__ve") - col("__med")))
    val mad = dev.groupBy(kc: _*)
      .agg(median("__ad").as("__mad"))
    joinStats(dev, mad)
      .select((kc :+ col(tsCol) :+ col("v") :+
        (col("__med") / lit(scale.toDouble)).as("med") :+
        (col("__mad") / lit(scale.toDouble)).as("mad") :+
        (col("__ad") > lit(k) * col("__mad")).as("outlier")): _*)
  }

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

  /** Gini coefficient of non-negative integral masses — the
    * concentration audit a corpus-mix pipeline runs per stratum (is
    * 90% of the German text coming from one domain?). 0 = perfectly
    * even shares, → 1 = one entity holds everything.
    *
    * Exact rank formulation over masses sorted ascending (ties
    * contribute identically under any tie order, so row_number's
    * arbitrariness cannot change the sum):
    *
    * {{{ G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n }}}
    *
    * `Σ i·xᵢ` stays in BIGINTs (exact while rank·mass sums fit 2^63);
    * the two divisions run once per group in fixed order. Input rows
    * are one-per-entity (the caller's aggregation output), so the
    * rank window runs over a vocabulary-sized table, never the corpus.
    * Returns per group: n_entities, total, gini (null for empty or
    * zero-mass groups). */
  def gini(masses: DataFrame, valueCol: String,
      byCols: Seq[String] = Nil): DataFrame = {
    val dt = masses.schema(valueCol).dataType.simpleString
    require(Seq("bigint", "int", "smallint", "tinyint").contains(dt),
      s"gini needs an integral mass column; $valueCol is $dt")
    val g = byCols.map(col)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(g: _*)
    val ranked = masses
      .filter(col(valueCol).isNotNull && col(valueCol) >= 0)
      .withColumn("__x", col(valueCol).cast("long"))
      .withColumn("__i", row_number().over(w.orderBy(col("__x"))))
    ranked
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_entities"),
        sum(col("__x")).as("total"),
        sum(col("__i") * col("__x")).as("__ix"))
      .withColumn("gini",
        when(col("n_entities") > 0 && col("total") > 0, dround(
          lit(2.0) * col("__ix").cast("double")
            / (col("n_entities") * col("total")).cast("double")
            - (col("n_entities") + lit(1)).cast("double")
              / col("n_entities").cast("double"), 6)))
      .drop("__ix")
  }
}
