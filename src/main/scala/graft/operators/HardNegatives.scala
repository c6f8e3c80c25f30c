package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hard-negative mining for retrieval/embedding training — the
  * standard contrastive-training data op (e.g. DPR, Karpukhin 2020:
  * BM25 hard negatives): for each (query, positive) pair, take the
  * top-scoring BM25 candidates that are NOT the positive and NOT
  * near-duplicates of it. Skipping the near-dup exclusion poisons
  * training with FALSE negatives — the top-ranked "negative" for a
  * query is very often a near-copy of its positive, exactly because
  * retrieval put it on top.
  *
  * Composes oracle-proven stages: [[Bm25.topK]] candidates → anti-
  * filter on the positive's near-dup cluster
  * ([[DedupClusters.clusterMap]]) → re-rank. Shape at scale: inherits
  * BM25's broadcast-postings shape; the cluster-map join is an
  * id-keyed equi-join of the candidate set (queries×candidateK rows)
  * against the map; the final re-rank windows over ≤candidateK rows
  * per query.
  */
object HardNegatives {

  /** @param queries    (qIdCol, qTextCol, posCol) — one positive per
    *                   query
    *  @param clusterMap (idCol, cluster_id) covering the corpus (near-
    *                   dup components; singletons map to themselves)
    *  @param n          negatives to emit per query
    *  @param candidateK BM25 candidates to consider before exclusion —
    *                   headroom so exclusions don't starve the output
    *  @return (query_id, idCol, score, neg_rank) ordered by
    *          (query_id, neg_rank)
    */
  def mine(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      posCol: String, clusterMap: DataFrame, n: Int,
      candidateK: Int, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    val cands = Bm25.topK(docs, idCol, textCol,
      queries, qIdCol, qTextCol, candidateK, k1, b)
    val pos = queries
      .select(col(qIdCol).as("query_id"), col(posCol).as("__pos"))
      .join(clusterMap.select(col(idCol).as("__pos"),
        col("cluster_id").as("__pos_cluster")), Seq("__pos"), "left")
    val candCl = clusterMap.select(col(idCol),
      col("cluster_id").as("__cand_cluster"))
    val kept = cands
      .join(broadcast(pos), "query_id")
      .join(candCl, Seq(idCol), "left")
      .filter(col(idCol) =!= col("__pos"))
      .filter(col("__cand_cluster").isNull ||
        col("__pos_cluster").isNull ||
        col("__cand_cluster") =!= col("__pos_cluster"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("rn"))
    kept.withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= n)
      .select(col("query_id"), col(idCol), col("score"),
        col("neg_rank"))
      .orderBy(col("query_id"), col("neg_rank"))
  }

  /** Training-ready contrastive triplets: one row per query with its
    * positive and the mined negatives packed in rank order — the
    * (anchor, positive, negatives) record a DPR/contrastive trainer
    * consumes directly. Negative ids serialize to csv (the driver
    * comparator hashes scalar cells); order is pinned by an in-row
    * `array_sort` over (rank, id) structs, never by `collect_list`'s
    * arrival order. One queries-sized aggregation over [[mine]]'s
    * output. */
  def triplets(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      posCol: String, clusterMap: DataFrame, n: Int,
      candidateK: Int): DataFrame = {
    val negs = mine(docs, idCol, textCol, queries, qIdCol, qTextCol,
      posCol, clusterMap, n, candidateK)
    negs
      .groupBy(col("query_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("neg_rank"),
            col(idCol).cast("long").as("neg_id")))),
          x => x.getField("neg_id").cast("string")), ",")
          .as("neg_ids_csv"),
        count(lit(1)).as("n_negs"))
      .join(queries.select(col(qIdCol).as("query_id"),
        col(qTextCol).as("qtext"), col(posCol).as("pos_id")),
        Seq("query_id"))
      .select(col("query_id"), col("qtext"), col("pos_id"),
        col("neg_ids_csv"), col("n_negs"))
  }
}
