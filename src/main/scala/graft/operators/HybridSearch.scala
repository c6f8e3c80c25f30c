package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround

/** Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke &
  * Büttcher 2009: "Reciprocal rank fusion outperforms Condorcet and
  * individual rank learning methods"): combine a sparse (BM25) and a
  * dense (vector) ranked list without score calibration —
  * `rrf(d) = Σ_sys 1/(c + rank_sys(d))`, ranks only, so the two
  * systems' incomparable score scales never mix. The standard fusion
  * every production RAG stack runs in front of a reranker; `c = 60`
  * is the paper's constant.
  *
  * Determinism across engines: contributions are `1/(c + rank)` on
  * INTEGER ranks — two IEEE divisions and one fixed-order add — so
  * Spark and the DuckDB oracle agree bit-for-bit; ties rank by doc id.
  *
  * Shape at scale: both inputs are already top-k lists (queries×k
  * rows, corpus-size-independent); fusion is one full-outer equi-join
  * on (query, doc) plus a bounded-heap top-k. The corpus is never
  * touched — all the heavy lifting stayed in the retrieval stages,
  * which keep their own scale shapes (BM25's postings broadcast, the
  * vector side's bucket/IVF candidates).
  */
object HybridSearch {

  /** Fuse two ranked lists. Inputs need (query_id, <docCol>, rn) and
    * must ALREADY be cut to their retrieval depth — every input row's
    * `rn` contributes 1/(c+rn) to the fusion; rrf does no input
    * filtering of its own. `k` cuts only the OUTPUT (fused top-k per
    * query). Output: (query_id, doc_id, rrf_score, rank_sparse,
    * rank_dense, rn) — per-system ranks kept (null where one system
    * missed the doc) because "dense-only hit" vs "both agree" IS the
    * error-analysis signal.
    */
  def rrf(sparse: DataFrame, sparseDocCol: String,
      dense: DataFrame, denseDocCol: String,
      k: Int, c: Int = 60): DataFrame = {
    val s = sparse.select(col("query_id"),
      col(sparseDocCol).cast("long").as("doc_id"),
      col("rn").cast("int").as("rank_sparse"))
    val dn = dense.select(col("query_id"),
      col(denseDocCol).cast("long").as("doc_id"),
      col("rn").cast("int").as("rank_dense"))
    val fused = s.join(dn, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("__rrf",
        coalesce(lit(1.0) / (lit(c.toDouble) + col("rank_sparse")),
          lit(0.0)) +
        coalesce(lit(1.0) / (lit(c.toDouble) + col("rank_dense")),
          lit(0.0)))
    // bounded-heap top-k on (rrf desc, doc asc); per-system ranks are
    // re-joined afterwards (the heap carries only (score, id) — the
    // join-back is fused×fused sized, queries×k rows)
    graft.functions.TopKByScore.explodeTopK(fused,
        Seq("query_id"), col("__rrf"), col("doc_id"), k,
        outId = "doc_id", outScore = "__rrf")
      .join(fused.select(col("query_id"), col("doc_id"),
        col("rank_sparse"), col("rank_dense")), Seq("query_id", "doc_id"))
      .select(col("query_id"), col("doc_id"),
        (dround(col("__rrf"), 6) + lit(0)).as("rrf_score"),
        col("rank_sparse"), col("rank_dense"), col("rn"))
  }
}
