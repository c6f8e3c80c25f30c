package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.VersionedTable
import graft.functions.{EwVar, EwVarAgg}

/** Streaming-maintained anomaly log: the q201 composition (EW
  * mean/variance fold → prior-state z-score → |z| > k flag) kept up to
  * date from a [[VersionedTable]] base WITHOUT re-folding history —
  * the alerting twin of [[TimeSeriesView]]'s smoothing gold table, and
  * the view a sensor pipeline pages on.
  *
  * Why incremental is possible: the detector's entire memory is the
  * per-key (μ, σ²) EW state plus the last observation time. A
  * micro-batch of strictly-later observations folds FORWARD from a
  * keys-sized state table: one pseudo-row per key RESTORES the
  * aggregate buffer to the stored state ([[EwVarAgg]]'s seed struct —
  * the two-component analogue of the EWMA seed trick), the new rows
  * fold after it in time order, and `lag(1)` over the union hands each
  * new row exactly the state its batch-twin z-score would have seen.
  * Per-batch cost ∝ batch + one keys-sized join; the log advances
  * append-only.
  *
  * Exactness: the spec asserts stream-built log == batch twin to the
  * last bit (same IEEE fold, same lag, same comparison).
  *
  * Honesty rules (the [[IncrementalAgg]] / [[TimeSeriesView]]
  * discipline): late or duplicate-timestamp data → full recompute
  * (already-emitted rows' z-scores would be lies otherwise);
  * non-append-only base lineage → full; an α/k change → full (pinned
  * `__alpha`/`__k`); log and state are separate commits, so the state
  * pins the log version it describes (`__log_version`) and a crash
  * between the two commits is healed by a full recompute at the next
  * maintain instead of double-appending the same delta.
  */
object AnomalyView {

  final case class MaintainResult(logVersion: Int, mode: String,
      filesScanned: Int)

  private val BaseVCol = "__base_version"
  private val AlphaCol = "__alpha"
  private val KCol = "__k"
  private val LogVCol = "__log_version"

  def statePath(logPath: String): String = logPath + "_state"

  private def nullSeed = lit(null).cast(EwVarAgg.stateType)

  /** Fold + score. Input: keys ++ (__t_us, __v nullable, __seed);
    * output keeps the fold state `__e` for state derivation. Seed
    * rows (null `__v`) are retained — callers drop them. */
  private def score(series: DataFrame, keys: Seq[String], alpha: Double,
      k: Double): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__t_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wo = Window.partitionBy(keys.map(col): _*).orderBy(col("__t_us"))
    val z = (col("__v") - col("__pm")) / sqrt(col("__pv"))
    series
      .withColumn("__e",
        EwVar.ewvarSeeded(col("__v"), alpha, col("__seed")).over(w))
      .withColumn("__pm", lag(col("__e").getField("mean"), 1).over(wo))
      .withColumn("__pv", lag(col("__e").getField("var"), 1).over(wo))
      .withColumn("zscore", when(col("__pv") > 0, z))
      .withColumn("anomaly",
        coalesce(when(col("__pv") > 0, abs(z) > lit(k)), lit(false)))
      .drop("__pm", "__pv", "__seed")
  }

  private def toLog(scored: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    scored.select(keys.map(col) :+ col("__t_us").as("t_us") :+
      col("__v").as(valueCol) :+ col("zscore") :+ col("anomaly"): _*)

  /** The batch twin (what the maintained log must equal): the q201
    * composition over the whole series. Emits
    * `keys :+ t_us :+ valueCol :+ zscore :+ anomaly`. */
  def anomalyBatch(readings: DataFrame, keys: Seq[String], tsCol: String,
      valueCol: String, alpha: Double, k: Double): DataFrame =
    toLog(score(
      Resample.series(readings, keys, tsCol, valueCol)
        .withColumn("__seed", nullSeed), keys, alpha, k), keys, valueCol)

  private def deriveState(scored: DataFrame, keys: Seq[String])
      : DataFrame =
    scored.groupBy(keys.map(col): _*).agg(
      max(col("__t_us")).as("last_obs_t"),
      max_by(col("__e").getField("mean"), col("__t_us")).as("mean_state"),
      max_by(col("__e").getField("var"), col("__t_us")).as("var_state"))

  /** Create or refresh the anomaly log at `logPath` to reflect the
    * latest committed version of `basePath`. */
  def maintainAnomalies(spark: SparkSession, basePath: String,
      logPath: String, keys: Seq[String], tsCol: String, valueCol: String,
      alpha: Double, k: Double): MaintainResult = {
    require(k > 0.0, s"k must be positive, got $k")
    val stPath = statePath(logPath)
    val vBase = VersionedTable.latestVersion(spark, basePath)
    require(vBase > 0, s"$basePath has no committed version to score")
    val baseFiles = VersionedTable.files(spark, basePath, Some(vBase))

    def fullCompute(mode: String): MaintainResult = {
      val base = VersionedTable.read(spark, basePath, Some(vBase))
      val sc = score(Resample.series(base, keys, tsCol, valueCol)
        .withColumn("__seed", nullSeed), keys, alpha, k)
      val logV = VersionedTable.commitOverwrite(
        toLog(sc, keys, valueCol), logPath)
      val state = deriveState(sc, keys)
        .withColumn(AlphaCol, lit(alpha))
        .withColumn(KCol, lit(k))
        .withColumn(BaseVCol, lit(vBase))
        .withColumn(LogVCol, lit(logV))
      VersionedTable.commitOverwrite(state, stPath)
      MaintainResult(logV, mode, baseFiles.size)
    }

    val vState = VersionedTable.latestVersion(spark, stPath)
    val stateEmpty = vState == 0 ||
      VersionedTable.files(spark, stPath, Some(vState)).isEmpty

    if (baseFiles.isEmpty) {
      // an emptied base scores to the empty log
      val vLog = VersionedTable.latestVersion(spark, logPath)
      val logEmpty = vLog == 0 ||
        VersionedTable.files(spark, logPath, Some(vLog)).isEmpty
      if (logEmpty && stateEmpty) return MaintainResult(vLog, "noop", 0)
      val logV =
        if (logEmpty) vLog
        else VersionedTable.commitOverwrite(
          VersionedTable.read(spark, logPath, Some(vLog))
            .filter(lit(false)), logPath)
      if (!stateEmpty) VersionedTable.commitOverwrite(
        VersionedTable.read(spark, stPath, Some(vState))
          .filter(lit(false)), stPath)
      return MaintainResult(logV, "full", 0)
    }
    if (vState == 0) return fullCompute("init")
    if (stateEmpty) return fullCompute("full")

    val state = VersionedTable.read(spark, stPath, Some(vState))
    if (!Seq(BaseVCol, AlphaCol, KCol, LogVCol)
        .forall(state.columns.contains(_)))
      return fullCompute("full")
    // one metadata job: reflected base/log versions + pinned params
    val head = state.select(max(col(BaseVCol)), max(col(AlphaCol)),
      max(col(KCol)), max(col(LogVCol))).collect().head
    if (Option(head.get(1)).forall(_ != alpha) ||
        Option(head.get(2)).forall(_ != k))
      return fullCompute("full")
    // crash-window detection (see TimeSeriesView): log ahead of the
    // state's pin means the previous maintain died between commits
    val logNow = VersionedTable.latestVersion(spark, logPath)
    if (Option(head.get(3)).map(_.toString.toInt).getOrElse(-1)
        != logNow)
      return fullCompute("full")
    val reflected = Option(head.get(0))
      .map(_.toString.toInt).getOrElse(0)
    if (reflected == vBase) return MaintainResult(logNow, "noop", 0)
    if (reflected > vBase) return fullCompute("full")

    val oldFiles =
      VersionedTable.files(spark, basePath, Some(reflected)).toSet
    val newFiles = baseFiles.filterNot(oldFiles.contains)
    if (!oldFiles.subsetOf(baseFiles.toSet)) return fullCompute("full")
    if (newFiles.isEmpty) {
      // empty append: bump the reflected version, keys-sized write
      VersionedTable.commitOverwrite(
        state.withColumn(BaseVCol, lit(vBase)), stPath)
      return MaintainResult(logNow, "incremental", 0)
    }

    val rd =
      if (VersionedTable.isEvolved(spark, basePath))
        spark.read.option("mergeSchema", "true")
      else spark.read
    val delta = Resample.series(rd.parquet(newFiles: _*), keys, tsCol,
      valueCol)

    val st = state.drop(BaseVCol, AlphaCol, KCol, LogVCol)
    // a NULL-keyed series never matches the plain-equality state joins
    // below — its late data would slip the guard — so it takes the
    // honest full-recompute path (the batch twin handles NULL keys as
    // real groups through groupBy/Window)
    if (!delta.filter(keys.map(col(_).isNull).reduce(_ || _)).isEmpty)
      return fullCompute("full")
    // LATE data: an observation at or before a key's recorded last one
    // would change already-emitted z-scores — honest recompute
    val lateJoin = delta.join(st, keys)
      .filter(col("__t_us") <= col("last_obs_t"))
    if (!lateJoin.isEmpty) return fullCompute("full")

    // one seed pseudo-row per delta key with prior state: restores the
    // (μ, σ²) buffer at last_obs_t, then the delta folds after it
    val seeds = st
      .join(delta.select(keys.map(col): _*).distinct(), keys, "left_semi")
      .select(keys.map(col) :+ col("last_obs_t").as("__t_us") :+
        lit(null).cast("double").as("__v") :+
        struct(col("mean_state").as("mean"), col("var_state").as("var"))
          .as("__seed"): _*)
    val sc = score(
      delta.withColumn("__seed", nullSeed).unionByName(seeds),
      keys, alpha, k)
      .filter(col("__v").isNotNull) // drop the seed rows
    val logV = VersionedTable.commitAppend(
      toLog(sc, keys, valueCol), logPath)

    // fold state forward: delta keys take the new extremes/state,
    // untouched keys carry verbatim
    val upd = deriveState(sc, keys)
    val updKeyed = keys.foldLeft(
      upd.withColumnRenamed("last_obs_t", "__n_t")
        .withColumnRenamed("mean_state", "__n_m")
        .withColumnRenamed("var_state", "__n_v"))((f, kcol) =>
      f.withColumnRenamed(kcol, s"__k_$kcol"))
    val cond = keys.map(kcol => col(kcol) <=> col(s"__k_$kcol"))
      .reduce(_ && _)
    val newState = st.join(updKeyed, cond, "full_outer")
      .select(keys.map(kcol =>
        coalesce(col(kcol), col(s"__k_$kcol")).as(kcol)) ++ Seq(
        coalesce(col("__n_t"), col("last_obs_t")).as("last_obs_t"),
        coalesce(col("__n_m"), col("mean_state")).as("mean_state"),
        coalesce(col("__n_v"), col("var_state")).as("var_state")): _*)
      .withColumn(AlphaCol, lit(alpha))
      .withColumn(KCol, lit(k))
      .withColumn(BaseVCol, lit(vBase))
      .withColumn(LogVCol, lit(logV))
    VersionedTable.commitOverwrite(newState, stPath)
    MaintainResult(logV, "incremental", newFiles.size)
  }

  /** Streaming sink: exactly-once micro-batch append to the base
    * (marker protocol) then [[maintainAnomalies]] — a replayed batch
    * finds its marker (no second append) and the maintain no-ops at
    * the unchanged base version; a crash between append and maintain
    * leaves the log one version behind until the next batch's
    * multi-version delta catch-up. */
  def foreachBatchMaintainAnomalies(basePath: String, logPath: String,
      keys: Seq[String], tsCol: String, valueCol: String, alpha: Double,
      k: Double): (DataFrame, Long) => Unit = {
    val append = VersionedTable.foreachBatchAppend(basePath)
    (batch, batchId) => {
      append(batch, batchId)
      maintainAnomalies(batch.sparkSession, basePath, logPath, keys,
        tsCol, valueCol, alpha, k)
      ()
    }
  }

  /** The maintained log (clean by construction). */
  def read(spark: SparkSession, logPath: String): DataFrame =
    VersionedTable.read(spark, logPath)
}
