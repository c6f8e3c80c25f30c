package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround

/** Scalar int8 quantization of embedding vectors — the standard storage/
  * bandwidth optimization for ANN at scale (4× smaller than float32,
  * 8× smaller than float64; distance math stays SIMD-friendly).
  *
  * Symmetric per-vector scheme: `scale = max|x| / 127`, `q_i =
  * clamp(floor(x_i/scale + 0.5), -127, 127)`. `floor(x + 0.5)` (not
  * rint) so the half-way tie-break is identical in every engine —
  * rint's half-to-even would disagree with SQL `round` exactly at the
  * boundaries a hash-compare notices.
  *
  * Everything is built-in higher-order functions over the array column
  * (transform / aggregate / zip_with) — codegen'd, zero UDFs, a narrow
  * map over the corpus: no shuffle at any scale.
  */
object Quantization {

  /** Per-vector quantization scale (double). `floor` guard keeps a
    * zero vector from dividing by zero. */
  def int8Scale(vec: Column): Column =
    greatest(array_max(transform(vec, x => abs(x.cast("double")))),
      lit(1e-12)) / lit(127.0)

  /** The quantized int8 codes, as array<int> (tinyint in storage). */
  def int8Codes(vec: Column, scale: Column): Column =
    transform(vec, x =>
      least(greatest(floor(x.cast("double") / scale + lit(0.5)),
        lit(-127.0)), lit(127.0)).cast("int"))

  /** Mean squared dequantization error — the quality metric that decides
    * whether int8 is acceptable for a given corpus. */
  def int8Mse(vec: Column, scale: Column): Column = {
    val codes = int8Codes(vec, scale)
    val sqErr = zip_with(vec, codes,
      (x, q) => pow(x.cast("double") - q.cast("double") * scale, 2))
    aggregate(sqErr, lit(0.0), (acc, e) => acc + e) /
      size(vec).cast("double")
  }

  /** Catalog-shaped summary: one row per vector with the scale and the
    * reconstruction error (the arrays themselves hash poorly in
    * cross-engine comparators; scale+mse pin the full semantics). */
  def summary(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val s = int8Scale(col(vecCol))
    df.select(col(idCol),
      dround(s, 6).as("scale"),
      dround(int8Mse(col(vecCol), s), 8).as("mse"))
  }
}
