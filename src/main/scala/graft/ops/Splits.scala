package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/val/test split assignment — the reproducibility
  * primitive of a training-data pipeline. The split of a document must
  * be a PURE FUNCTION of (seed, id): stable across runs, cluster sizes,
  * partitionings, and engines (so an oracle in another SQL engine
  * derives the identical assignment). `rand(seed)` fails all of these —
  * its value depends on partition layout — and modulo-on-id fails
  * whenever ids carry structure (every 97th doc is an eval doc, etc.).
  *
  * Bucket = first two hex chars of md5("seed:id") → 0..255, mapped to
  * train/val/test at 205/25/26 (~80/10/10). Pure projection: no
  * shuffle, no state, codegen'd string ops.
  */
object Splits {

  /** 0..255 bucket from the first two hex nibbles of md5(seed:id).
    * Engine-portable: md5 hex + POSITION over the hex alphabet exist
    * everywhere (Spark `conv` does the same job but has no DuckDB
    * twin). */
  def bucket256(id: Column, seed: String): Column = {
    val h = md5(concat_ws(":", lit(seed), id.cast("string")))
    def nibble(i: Int): Column =
      call_function("position", substring(h, i, 1),
        lit("0123456789abcdef")) - 1
    nibble(1) * 16 + nibble(2)
  }

  /** Adds a `split` column ∈ {train, val, test}. Fractions are fixed at
    * 205/25/26 of 256 (~80/10/10). */
  def assign(df: DataFrame, id: Column, seed: String): DataFrame = {
    val b = bucket256(id, seed)
    df.withColumn("split",
      when(b < 205, "train").when(b < 230, "val").otherwise("test"))
  }

  /** Leakage-safe split: the split unit is the NEAR-DUP CLUSTER, not
    * the document. Splitting per-document leaks evaluation data — a
    * val doc whose near-duplicate sits in train is effectively
    * memorizable — so every cluster member inherits the split hashed
    * from its cluster id (the component min). Composition of the
    * oracle-proven pieces: MinHash-LSH pairs → connected components →
    * pure-function split of the cluster id. Singleton docs hash on
    * their own id, identical to [[assign]].
    *
    * Scale shape: inherits the dedup pipeline's (banded hash
    * equi-joins, O(log n) CC rounds on edge-sized rows); the split
    * itself is an in-row projection. Output: (`idCol`, cluster_id,
    * split). */
  def leakageSafe(docs: DataFrame, idCol: String, textCol: String,
      seed: String, threshold: Double = 0.95): DataFrame =
    leakageSafeFrom(graft.operators.DedupClusters.clusterMap(
      docs, idCol, textCol, threshold), idCol, seed)

  /** k-fold cross-validation assignment: fold ∈ 0..k-1 as a pure
    * function of (seed, id) — `bucket256 % k`. Same engine-portable
    * determinism contract as [[assign]]; with 256 % k ≠ 0 the low
    * folds carry at most one extra bucket out of 256 (~0.4% skew),
    * which CV tolerates and determinism requires. Leakage-safe
    * variant: pass a cluster id (the [[leakageSafeFrom]] pattern) so
    * near-duplicates never straddle a fold boundary. */
  def kfold(df: DataFrame, id: Column, seed: String, k: Int)
      : DataFrame = {
    require(k > 1 && k <= 256, s"k must be in 2..256, got $k")
    df.withColumn("fold", pmod(bucket256(id, seed), lit(k)))
  }

  /** [[leakageSafe]] over a PRECOMPUTED (`idCol`, cluster_id) map
    * (from [[graft.operators.DedupClusters.clusterMap]] or a published
    * artifact table): the split is a pure in-row projection of
    * (seed, cluster_id), so consuming the artifact makes this a single
    * narrow pass. */
  def leakageSafeFrom(clusterMap: DataFrame, idCol: String,
      seed: String): DataFrame =
    assign(clusterMap, col("cluster_id"), seed)
      .select(col(idCol), col("cluster_id"), col("split"))
}
