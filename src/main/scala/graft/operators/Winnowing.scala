package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the
  * MOSS algorithm): a Karp-Rabin rolling hash over token k-grams,
  * then the minimum hash of every w-hash window is selected, so any
  * shared run of ≥ w+k-1 tokens between two documents is guaranteed
  * to share at least one fingerprint. The local-fingerprint
  * complement of q27's whole-document hash: it survives edits outside
  * the shared region.
  *
  * Scale shape: fingerprints are computed entirely in-row (token
  * hashing, the k-gram polynomial, and the window minima are all
  * higher-order array expressions inside WholeStageCodegen — zero
  * shuffle to fingerprint a corpus). The overlap detector shuffles
  * (8-byte fp, id) pairs only, and drops fingerprints shared by more
  * than `maxDocFreq` documents before pairing — the standard MOSS
  * guard that keeps a boilerplate fingerprint from generating
  * O(N²) candidate pairs at corpus scale.
  *
  * All arithmetic is engine-portable (md5-derived token values, a
  * 31-bit modulus so products stay far from 2^63 overflow under ANSI
  * mode) — the DuckDB oracle reproduces every fingerprint
  * bit-for-bit; nothing here needs a fixture dump.
  */
object Winnowing {

  /** 31-bit prime modulus; with base B=131, v·B² < 2^46 — no ANSI
    * overflow, and identical arithmetic in any engine with 64-bit
    * integers. */
  val P = 2147483587L
  val B = 131L

  val K = 3 // tokens per k-gram
  val W = 4 // k-gram hashes per winnowing window

  /** Portable per-token hash value in [0, P). */
  private def tokenVals(text: Column): Column =
    transform(TextFunctions.tokens(lower(text)),
      t => conv(substring(md5(t), 1, 8), 16, 10).cast("long") % P)

  /** Karp-Rabin k-gram hashes over an ALREADY-MATERIALIZED token-value
    * array attribute: h_i = (v_i·B² + v_{i+1}·B + v_{i+2}) mod P. (The
    * direct polynomial — the O(1) rolling update computes the same
    * values.) `v` must be a column reference, not the tokenVals
    * expression itself: each element_at would otherwise re-inline the
    * whole md5 transform chain, turning a linear pass into O(n²) hash
    * evaluations per row. */
  private def kgramHashesOf(v: Column): Column =
    when(size(v) < K, array().cast("array<long>"))
      .otherwise(transform(sequence(lit(0), size(v) - K),
        i => (element_at(v, i + 1) * B * B
          + element_at(v, i + 2) * B
          + element_at(v, i + 3)) % P))

  /** Distinct window-min fingerprints of a materialized k-gram-hash
    * array attribute (same inlining caveat as [[kgramHashesOf]]). */
  private def winnowOf(kh: Column): Column =
    when(size(kh) === 0, array().cast("array<long>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), greatest(size(kh) - W, lit(0))),
        j => array_min(slice(kh, j + 1, lit(W))))))

  /** (id, fp) rows — one per distinct selected fingerprint per doc.
    * Each pipeline stage is its own projection so every array is
    * computed once per row and referenced by attribute. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    df.select(col(idCol), tokenVals(col(textCol)).as("__tv"))
      .select(col(idCol), kgramHashesOf(col("__tv")).as("__kh"))
      .select(col(idCol), explode(winnowOf(col("__kh"))).as("fp"))

  /** MOSS-style overlap candidates: pairs of documents sharing at
    * least `minShared` selected fingerprints, after dropping
    * fingerprints present in more than `maxDocFreq` documents
    * (boilerplate guard). Returns (id_a, id_b, n_shared). */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
      minShared: Int = 2, maxDocFreq: Int = 50): DataFrame = {
    // materialized once: the fingerprint subtree otherwise re-runs the
    // md5/k-gram/winnow chain for the doc-freq filter, the prune join,
    // AND both sides of the pair self-join (4 corpus passes) — at any
    // scale the (id, fp) table is the thing you persist, not recompute
    val fps = graft.core.Scratch.materialize(
      fingerprints(df, idCol, textCol), "winnow_fps")
    val rare = fps.groupBy(col("fp"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDocFreq)
    val pruned = fps.join(rare.select(col("fp")), "fp")
    val a = pruned.select(col("fp"), col(idCol).as("id_a"))
    val b = pruned.select(col("fp"), col(idCol).as("id_b"))
    a.join(b, "fp").filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
