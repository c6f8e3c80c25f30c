package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.VersionedTable

/** Incrementally maintained aggregate table — the materialized-view
  * shape over a [[VersionedTable]] base: `GROUP BY keys → (n_rows,
  * sum_val)` kept up to date WITHOUT rescanning the base.
  *
  * Round 6 made ingestion incremental end-to-end (dedup admission,
  * BM25 postings, IVF assignment); aggregates were the last consumer
  * that still recomputed from scratch. At 100 TB a nightly `GROUP BY`
  * over the full corpus is the single most wasteful recurring job a
  * pipeline runs: the base grows by appends, and the aggregate's
  * change is exactly the aggregate OF THE APPENDED FILES. [[maintain]]
  * exploits that: when the base advanced append-only (the old
  * version's file set nests inside the new one's — commitAppend
  * lineages, including every streaming sink in this repo), it scans
  * ONLY the new files, partial-aggregates them (map-side combinable),
  * and merges into the existing aggregate with one keys-sized
  * full-outer join. Cost is proportional to the DELTA, not the table.
  *
  * Non-nesting lineages (overwrite / MERGE / RESTORE rewrote history)
  * fall back to a full recompute at the new snapshot — honestly: a
  * rewrite invalidates per-file deltas, and a "diff"-based repair
  * would scan both snapshots anyway, which is strictly more than the
  * recompute. The mode taken is reported in the result so callers
  * (and specs) can see which path ran.
  *
  * Aggregate semantics: `n_rows = count(*)`,
  * `sum_val = sum(coalesce(valueCol, 0))` — the null-as-zero
  * convention keeps the merge algebra total (a group's sum is never
  * NULL, so increments never need three-valued handling); `valueCol`
  * must be integral, making the distributed sum exact and
  * order-free (the q108/q120 lesson: double sums are
  * partition-order-dependent). Averages derive as sum/count.
  *
  * The aggregate table records the base version it reflects in a
  * constant `__base_version` column (snapshot-consistent by
  * construction: the column is part of the committed version). A
  * concurrent base commit between maintains is picked up by the next
  * [[maintain]]; the aggregate itself publishes via commitOverwrite
  * (keys-sized rewrite — the base is never rewritten).
  */
object IncrementalAgg {

  /** What a [[maintain]] call did: the committed aggregate version,
    * which path ran ("init" | "incremental" | "full" | "noop"), and
    * how many base files were scanned to get there. */
  final case class MaintainResult(aggVersion: Int, mode: String,
      filesScanned: Int)

  private val BaseVCol = "__base_version"

  private def aggregate(rows: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(coalesce(col(valueCol).cast("long"), lit(0L))).as("sum_val"))

  private def requireIntegral(df: DataFrame, c: String): Unit = {
    val dt = df.schema(c).dataType.simpleString
    require(Seq("bigint", "int", "smallint", "tinyint").contains(dt),
      s"incremental sums must be integral (exact, order-free); " +
        s"$c is $dt — scale doubles to a fixed-point long first")
  }

  /** Create or refresh the aggregate at `aggPath` to reflect the
    * latest committed version of `basePath`. */
  def maintain(spark: SparkSession, basePath: String, aggPath: String,
      keys: Seq[String], valueCol: String): MaintainResult = {
    val vBase = VersionedTable.latestVersion(spark, basePath)
    require(vBase > 0, s"$basePath has no committed version to aggregate")
    val baseFiles = VersionedTable.files(spark, basePath, Some(vBase))

    def fullCompute(mode: String): MaintainResult = {
      val agg = aggregate(
        VersionedTable.read(spark, basePath, Some(vBase)), keys, valueCol)
        .withColumn(BaseVCol, lit(vBase))
      val v = VersionedTable.commitOverwrite(agg, aggPath)
      MaintainResult(v, mode, baseFiles.size)
    }

    val vAgg = VersionedTable.latestVersion(spark, aggPath)
    val aggEmpty = vAgg == 0 ||
      VersionedTable.files(spark, aggPath, Some(vAgg)).isEmpty

    // an EMPTY base snapshot (zero files — a legal version in this
    // format, e.g. overwrite with a 0-row frame) aggregates to the
    // empty table: commit an empty agg version, or no-op if the agg
    // is already empty/absent
    if (baseFiles.isEmpty) {
      if (aggEmpty) return MaintainResult(vAgg, "noop", 0)
      val current = VersionedTable.read(spark, aggPath, Some(vAgg))
      val v = VersionedTable.commitOverwrite(
        current.filter(lit(false)), aggPath)
      return MaintainResult(v, "full", 0)
    }
    requireIntegral(VersionedTable.read(spark, basePath, Some(vBase)),
      valueCol)
    if (vAgg == 0) return fullCompute("init")
    // the agg exists but its latest version is empty (the base was
    // emptied and refilled): per-file deltas are gone — rebuild
    if (aggEmpty) return fullCompute("full")

    val current = VersionedTable.read(spark, aggPath, Some(vAgg))
    require(current.columns.contains(BaseVCol),
      s"$aggPath is not an IncrementalAgg table (missing $BaseVCol)")
    val reflected = current.select(max(col(BaseVCol))).collect()
      .headOption.flatMap(r => Option(r.get(0)))
      .map(_.toString.toInt).getOrElse(0)
    if (reflected == vBase)
      return MaintainResult(vAgg, "noop", 0)
    // a RESTORE (or lost history) can move the base BACKWARD: the
    // reflected version may exceed the latest — recompute
    if (reflected > vBase) return fullCompute("full")

    val oldFiles =
      VersionedTable.files(spark, basePath, Some(reflected)).toSet
    val newFiles = baseFiles.filterNot(oldFiles.contains)
    if (!oldFiles.subsetOf(baseFiles.toSet)) return fullCompute("full")

    // append-only advance: aggregate ONLY the new files and merge.
    // An append that added zero files (empty batch) is a no-op at the
    // new base version
    val delta =
      if (newFiles.isEmpty) null
      else {
        // a multi-version catch-up delta can span a commitAppendEvolve
        // boundary (mixed-schema files): merge footers exactly when
        // VersionedTable.read would, so the delta path resolves the
        // evolved column the same way the full-recompute path does
        val rd =
          if (VersionedTable.isEvolved(spark, basePath))
            spark.read.option("mergeSchema", "true")
          else spark.read
        val d = aggregate(rd.parquet(newFiles: _*), keys, valueCol)
          .withColumnRenamed("n_rows", "__dn")
          .withColumnRenamed("sum_val", "__dsum")
        keys.foldLeft(d)((f, k) => f.withColumnRenamed(k, s"__k_$k"))
      }
    val merged =
      if (delta == null) current.withColumn(BaseVCol, lit(vBase))
      else {
        // null-safe key match: a NULL-keyed group is a real group for
        // GROUP BY, but plain join equality would never match it and
        // the merge would emit it twice
        val cond = keys.map(k => col(k) <=> col(s"__k_$k"))
          .reduce(_ && _)
        current.drop(BaseVCol).join(delta, cond, "full_outer")
          .select(keys.map(k =>
            when(col("n_rows").isNotNull, col(k))
              .otherwise(col(s"__k_$k")).as(k)) ++ Seq(
            (coalesce(col("n_rows"), lit(0L)) +
              coalesce(col("__dn"), lit(0L))).as("n_rows"),
            (coalesce(col("sum_val"), lit(0L)) +
              coalesce(col("__dsum"), lit(0L))).as("sum_val")): _*)
          .filter(col("n_rows") > 0)
          .withColumn(BaseVCol, lit(vBase))
      }
    val v = VersionedTable.commitOverwrite(merged, aggPath)
    MaintainResult(v, "incremental", newFiles.size)
  }

  /** The maintained aggregate, without the bookkeeping column. */
  def read(spark: SparkSession, aggPath: String): DataFrame =
    VersionedTable.read(spark, aggPath).drop(BaseVCol)

  /** Streaming materialized view: a `foreachBatch` sink that appends
    * each micro-batch to the base table (the [[VersionedTable
    * .foreachBatchAppend]] marker protocol — exactly-once under
    * replay) and then [[maintain]]s the aggregate. The composition is
    * crash-safe WITHOUT a joint transaction because maintain is
    * idempotent per base version: a replayed batch finds its commit
    * marker (no second append) and maintain no-ops at the unchanged
    * version; a crash BETWEEN append and maintain just leaves the
    * aggregate one version behind, and the next batch's maintain
    * aggregates every file appended since the version it reflects —
    * the delta path is multi-version by construction. */
  def foreachBatchMaintain(basePath: String, aggPath: String,
      keys: Seq[String], valueCol: String): (DataFrame, Long) => Unit = {
    val append = VersionedTable.foreachBatchAppend(basePath)
    (batch, batchId) => {
      append(batch, batchId)
      maintain(batch.sparkSession, basePath, aggPath, keys, valueCol)
      ()
    }
  }
}
