package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level statistics manifest for a path-addressed parquet table —
  * the data-skipping index Delta/Iceberg keep in their transaction log
  * (min/max/null-count per column per file), for engines that address
  * raw parquet directories.
  *
  * `build` is ONE scan: `groupBy(input_file_name())` with per-column
  * min/max/null aggregates, all map-side combinable — at 100 TB the
  * shuffle carries one row per (file) with a handful of scalar stats,
  * never data rows. `pruneFiles` then answers a range predicate from
  * the manifest alone (files × columns rows, usually kilobytes), so a
  * point/range query plans a scan over only the files whose [min, max]
  * envelope intersects the predicate — the same skipping a
  * Z-ordered layout (ops/ZOrder) makes effective, made queryable.
  */
object ManifestStats {

  /** One row per (file, column): row/null counts and the min/max
    * envelope, stringified so a single manifest covers heterogeneous
    * column types (the consumer compares typed via `pruneFiles`). */
  def build(spark: SparkSession, path: String, cols: Seq[String])
      : DataFrame =
    buildFiles(spark, Seq(path), cols)

  /** [[build]] over an explicit file list — the versioned-table form
    * ([[VersionedTable.publishStats]] passes one version's manifest
    * files, so stats are computed for exactly that snapshot). */
  def buildFiles(spark: SparkSession, paths: Seq[String],
      cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(paths: _*)
    val perFile = df
      .select(input_file_name().as("file") +: cols.map(col): _*)
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"),
        cols.flatMap(c => Seq(
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c")))
          : _*)
    // long form: (file, n_rows, col_name, min_value, max_value, n_nulls)
    perFile.select(col("file"), col("n_rows"),
      explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"),
        col(s"__nulls_$c").as("n_nulls"))): _*)).as("__s"))
      .select(col("file"), col("n_rows"), col("__s.col_name"),
        col("__s.min_value"), col("__s.max_value"), col("__s.n_nulls"))
  }

  /** Files whose [min, max] envelope for `colName` intersects
    * [lo, hi] (string-comparable form — callers pass values in the
    * column's natural string order, e.g. ISO dates, zero-padded
    * numerics, or use a numeric manifest column directly). Files whose
    * stats row is all-null (every value null) are kept only if the
    * predicate admits nulls — here they are skipped, matching
    * predicate semantics `colName BETWEEN lo AND hi`. */
  def pruneFiles(manifest: DataFrame, colName: String,
      lo: String, hi: String): Seq[String] =
    manifest.filter(col("col_name") === colName &&
        col("min_value").isNotNull && col("max_value").isNotNull &&
        !(col("max_value") < lo || col("min_value") > hi))
      .select(col("file")).collect().map(_.getString(0)).toSeq

  /** Scan only the manifest-selected files. The caller re-applies the
    * row-level predicate: skipping is file-granular, not row-exact.
    * When every file is pruned the result is an empty frame WITH the
    * table's schema (read from one manifest file), so the caller's
    * follow-up `.filter(col(colName)...)` still resolves. */
  def readPruned(spark: SparkSession, manifest: DataFrame,
      colName: String, lo: String, hi: String): DataFrame = {
    val files = pruneFiles(manifest, colName, lo, hi)
    readFilesOrEmpty(spark, manifest, files)
  }

  private def readFilesOrEmpty(spark: SparkSession, manifest: DataFrame,
      files: Seq[String]): DataFrame =
    if (files.nonEmpty) spark.read.parquet(files: _*)
    else {
      val any = manifest.select(col("file")).limit(1)
        .collect().map(_.getString(0))
      if (any.isEmpty) spark.emptyDataFrame
      else spark.read.parquet(any.head).limit(0)
    }

  /** Per-file BLOOM manifest for a BIGINT column — the equality-probe
    * complement of [[buildFiles]]' min/max envelopes: on a
    * high-cardinality key whose values interleave across files, every
    * file's [min, max] spans the whole domain and range pruning keeps
    * everything, while the Bloom bitset keeps only the files that
    * (probably) hold the probed key. One scan, one row per file; the
    * bitsets are [[graft.functions.BloomState]] partials, merged
    * map-side like any TypedImperativeAggregate — at 100 TB the
    * shuffle carries `numBits/8` bytes per FILE, never data rows.
    *
    * Keys must be integral ([[graft.functions.BloomState]] contract);
    * hash strings explicitly at build and probe time. */
  def buildBloomFiles(spark: SparkSession, paths: Seq[String],
      colName: String, numBits: Int = 1 << 20, numHashes: Int = 6)
      : DataFrame = {
    val df = spark.read.parquet(paths: _*)
    val dt = df.schema(colName).dataType.simpleString
    require(Seq("bigint", "int", "smallint", "tinyint").contains(dt),
      s"bloom manifests need an integral key; $colName is $dt")
    df.select(input_file_name().as("file"),
        col(colName).cast("long").as("__k"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.BloomState.agg(col("__k"), numBits, numHashes)
          .as("bloom"))
      .select(col("file"), col("n_rows"), lit(colName).as("col_name"),
        col("bloom"))
  }

  /** Files whose bitset (probably) contains ANY of `keys` — no false
    * negatives; false positives only cost a wasted file read, and the
    * caller's row-level re-filter keeps the result exact. The probe
    * runs DRIVER-side over the files-sized manifest. */
  def pruneFilesPoint(manifest: DataFrame, colName: String,
      keys: Seq[Long]): Seq[String] =
    manifest.filter(col("col_name") === colName)
      .select(col("file"), col("bloom")).collect()
      .filter { r =>
        val bits = r.getAs[Array[Byte]]("bloom")
        keys.exists(graft.functions.BloomState
          .mightContainSerialized(bits, _))
      }
      .map(_.getString(0)).toSeq

  /** Scan only the files whose Bloom bitset admits one of `keys`; the
    * caller re-applies the row-level equality predicate. */
  def readPoint(spark: SparkSession, manifest: DataFrame,
      colName: String, keys: Seq[Long]): DataFrame =
    readFilesOrEmpty(spark, manifest,
      pruneFilesPoint(manifest, colName, keys))
}
