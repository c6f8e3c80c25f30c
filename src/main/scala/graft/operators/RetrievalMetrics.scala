package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround

/** Retrieval evaluation metrics — the quality gate every retrieval
  * stack (BM25, IVF/PQ ANN, hybrid) runs against labeled (query,
  * relevant-doc) pairs: reciprocal rank and hit@k per query. The
  * aggregate (MRR, recall@k) is a trivial mean over the per-query
  * table; emitting per-query rows keeps the hard cases inspectable
  * (the rows with rr = 0 ARE the error analysis).
  *
  * Shape at scale: one equi-join of the qrels (queries-sized) against
  * the result list on (query, doc) — never touches the corpus; the
  * result list is already ≤ queries×k rows.
  */
object RetrievalMetrics {

  /** @param results ranked retrieval output: (query_id, `idCol`, rn)
    *                with rn = 1-based rank (e.g. [[Bm25.topK]])
    *  @param qrels  (query_id, `posCol`) — the relevant doc per query
    *  @param k      hit@k cutoff
    *  @return (query_id, pos_rank, rr, hit_at_k): pos_rank NULL and
    *          rr 0.0 when the relevant doc is not retrieved at all
    */
  def evaluate(results: DataFrame, idCol: String, qrels: DataFrame,
      posCol: String, k: Int): DataFrame = {
    val hits = results.select(col("query_id"),
      col(idCol).as(posCol), col("rn").as("pos_rank"))
    qrels.select(col("query_id"), col(posCol))
      .join(hits, Seq("query_id", posCol), "left")
      .select(col("query_id"), col("pos_rank"),
        coalesce(dround(lit(1.0) / col("pos_rank").cast("double"), 6),
          lit(0.0)).as("rr"),
        coalesce(col("pos_rank") <= k, lit(false)).as("hit_at_k"))
      .orderBy(col("query_id"))
  }
}
