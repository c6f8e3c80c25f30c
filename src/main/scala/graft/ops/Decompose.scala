package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical additive seasonal decomposition (the moving-average
  * decomposition behind `statsmodels seasonal_decompose`):
  *
  *   trend    = centered moving average of period m
  *              (even m: the 2×m MA — half weight on the endpoints)
  *   seasonal = per-slot mean of the detrended series, centered so the
  *              slots present sum to zero
  *   resid    = value − trend − seasonal
  *
  * The complement to the ordered-fold smoothers ([[graft.functions
  * .EwmaAgg]] family): those track a series forward with O(1) state,
  * this one explains a FINISHED series into trend/seasonal/noise — the
  * two-sided view a seasonality audit or anomaly post-mortem wants.
  *
  * Determinism contract (the q108 lesson): every distributed sum here
  * is over LONGS. Values are quantized at 1e-4 on entry (exact for the
  * ≤4-decimal measures this engine rounds to everywhere), the MA
  * numerator and the per-slot sums are integer arithmetic, and each
  * double division happens once on identical operands — so the result
  * is partitioning-independent and an external engine can replay it
  * hash-exactly. The seasonal index counts OBSERVATIONS per key
  * (slot = (row_number−1) mod m, the q195 convention); resample onto a
  * regular grid first ([[Resample]]) when wall-clock periodicity is
  * meant.
  *
  * Scale shape: one keyed window sort carries the row number, the MA
  * frame sum and both endpoint lags in a single pass; the slot table
  * is keys×m rows joined back on (keys, slot). No shuffle touches the
  * fact rows beyond the one keyed sort and the slot-grain join.
  */
object Decompose {

  /** Duplicate timestamps collapse by max() first (partitioning-
    * independent, the [[Resample]] discipline); null values drop.
    * Output: keys ++ (tsCol, v, slot, trend, seasonal, resid) —
    * trend/resid are null where the centered window is incomplete,
    * seasonal is null only for slots with no detrended observation. */
  def additive(df: DataFrame, keys: Seq[String], tsCol: String,
      valCol: String, period: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2, got $period")
    val kc = keys.map(col)
    val base = df
      .filter(col(valCol).isNotNull)
      .groupBy((kc :+ col(tsCol)): _*)
      .agg(max(col(valCol)).cast("double").as("v"))
    val w0 = Window.partitionBy(kc: _*).orderBy(col(tsCol))
    val ve = round(col("v") * lit(10000), 0).cast("long")

    val even = period % 2 == 0
    val h = if (even) period / 2 else (period - 1) / 2
    val frame = w0.rowsBetween(-h, h)
    val full = if (even) period + 1 else period
    // even m: (0.5·v₋ₕ + v₋ₕ₊₁ + … + vₕ₋₁ + 0.5·vₕ)/m, as the exact
    // integer numerator (2·Σ − v₋ₕ − vₕ) over 2m·10⁴
    val trendCol: Column = {
      val s = sum(ve).over(frame)
      val cnt = count(lit(1)).over(frame)
      val num =
        if (even) lit(2) * s - lag(ve, h).over(w0) - lead(ve, h).over(w0)
        else s
      val den = if (even) period * 20000.0 else period * 10000.0
      when(cnt === full, num.cast("double") / lit(den))
    }

    val staged = base
      .withColumn("slot",
        ((row_number().over(w0) - lit(1)) % lit(period)).cast("int"))
      .withColumn("trend", trendCol)
      .withColumn("__de",
        round((col("v") - col("trend")) * lit(10000), 0).cast("long"))

    // per-slot mean of the detrended series, centered over the slots
    // PRESENT for the key; all integer sums, one division per term
    val slots = staged
      .filter(col("__de").isNotNull)
      .groupBy((kc :+ col("slot")): _*)
      .agg(sum(col("__de")).as("__ssum"), count(lit(1)).as("__scnt"))
      .withColumn("__sme",
        round(col("__ssum").cast("double") / col("__scnt"), 0)
          .cast("long"))
    val wk = Window.partitionBy(kc: _*)
    val centered = slots
      .withColumn("__gsum", sum(col("__sme")).over(wk))
      .withColumn("__gcnt", count(lit(1)).over(wk))
      .select((kc :+ col("slot") :+
        ((col("__sme").cast("double") -
          col("__gsum").cast("double") / col("__gcnt")) / lit(10000.0))
          .as("seasonal")): _*)

    // null-safe key match: a NULL-keyed series is a real group for
    // groupBy/Window, so the seasonal join-back must not drop it
    val centKeyed = (keys :+ "slot").foldLeft(centered)((f, k) =>
      f.withColumnRenamed(k, s"__c_$k"))
    val cond = (keys :+ "slot")
      .map(k => col(k) <=> col(s"__c_$k")).reduce(_ && _)
    staged
      .join(centKeyed, cond, "left")
      .select((kc :+ col(tsCol) :+ col("v") :+ col("slot") :+
        col("trend") :+ col("seasonal") :+
        (col("v") - col("trend") - col("seasonal")).as("resid")): _*)
  }
}
