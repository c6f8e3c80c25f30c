package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
  * — diversify a retrieval shortlist so the k results are not k
  * near-copies of the same document. The standard re-rank between a
  * retriever and a consumer (RAG context assembly, annotation-batch
  * sampling), and on a deduplicated-by-construction corpus the piece
  * that keeps "top-k similar" useful when the top of the list is one
  * topic cluster.
  *
  * Greedy selection: step 1 takes the highest-relevance candidate;
  * each later step takes
  * `argmax λ·rel(c) − (1−λ)·max_{s ∈ selected} sim(c, s)` — ties
  * break by candidate id.
  *
  * Shape at scale: works on a SHORTLIST (queries×n rows from any
  * retriever — brute-force, IVF, IVF-PQ), never the corpus. The
  * candidate-candidate similarity frame is queries×n² but n is the
  * shortlist cut (20–100): bounded, corpus-size-independent. The
  * shortlist and pair-sim frames are scratch-materialized ONCE; the k
  * greedy rounds then join only (queries×n)-sized frames, with the
  * tiny selected set re-materialized per round so lineage stays O(1)
  * (the DedupClusters/PageRank iterative discipline). The selection is
  * itself a per-query bounded-heap argmax — per round, one row per
  * query crosses the exchange.
  *
  * Determinism across engines: rel and sim are the CosineSim doubles
  * the oracles already replicate with `list_cosine_similarity`; the
  * MMR score is two IEEE multiplies and one subtract in fixed order,
  * and the argmax tie-breaks on id — the DuckDB oracle unrolls the
  * same k rounds bit-for-bit.
  *
  * @param candidates shortlist: (query_id, neighbor_id, `relCol`)
  * @param corpus     (idCol, vecCol) — joined only at shortlist ids
  */
object MmrRerank {

  /** Hard ceiling on the per-query shortlist size. The pair frame is
    * n² rows PER QUERY: real shortlists are 20–100 (k top of a
    * retriever), but a caller passing a 100k-row "shortlist" would
    * silently build a 10¹⁰-row frame. Fail loudly instead. */
  val MaxShortlistPerQuery = 1024

  def rerank(candidates: DataFrame, relCol: String,
      corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, lambda: Double = 0.7): DataFrame = {
    require(k >= 1, "mmr: k must be >= 1")
    val spark = candidates.sparkSession
    val vecs = corpus.select(col(idCol).cast("long").as("__vid"),
      col(vecCol).cast("array<double>").as("__v"))
    val (cand, candPath) = graft.core.Scratch.materializeWithPath(
      candidates.select(col("query_id"),
        col("neighbor_id").cast("long").as("neighbor_id"),
        col(relCol).cast("double").as("__rel")),
      "mmr_cand")
    try rerankOn(spark, cand, candPath, vecs, k, lambda)
    catch {
      case e: Throwable =>
        // a failed greedy round must not leak the materialized scratch
        // dirs for the rest of the session
        graft.core.Scratch.drop(spark, candPath)
        throw e
    }
  }

  private def rerankOn(spark: org.apache.spark.sql.SparkSession,
      cand: DataFrame, candPath: String, vecs: DataFrame,
      k: Int, lambda: Double): DataFrame = {
    val worst = cand.groupBy("query_id").count()
      .agg(max("count")).collect()(0)
    if (!worst.isNullAt(0)) {
      val n = worst.getLong(0)
      require(n <= MaxShortlistPerQuery,
        s"mmr: a query has a $n-row shortlist (max " +
          s"$MaxShortlistPerQuery); the pair frame is n^2 per query — " +
          "cut the retriever's candidate list before reranking")
    }
    // candidate-candidate cosines within each query's shortlist:
    // queries×n² rows, n = shortlist size — bounded by the require
    // above. k == 1 never consults the diversity term — skip the frame
    val ids = cand.select(col("query_id"), col("neighbor_id"))
    val (pairs, pairsPath) =
      if (k == 1) (null: DataFrame, null: String)
      else graft.core.Scratch.materializeWithPath(
        ids.join(ids.withColumnRenamed("neighbor_id", "__other"),
            Seq("query_id"))
          .filter(col("neighbor_id") =!= col("__other"))
          .join(vecs.withColumnRenamed("__vid", "neighbor_id"),
            Seq("neighbor_id"))
          .join(vecs.select(col("__vid").as("__other"),
            col("__v").as("__v2")), Seq("__other"))
          .select(col("query_id"), col("neighbor_id"), col("__other"),
            graft.functions.CosineSim.column(col("__v"), col("__v2"))
              .as("__sim")),
        "mmr_pairs")

    // round 1: relevance argmax (score λ·rel — the selected set is
    // empty, so the diversity term is 0)
    var selected: DataFrame =
      graft.functions.TopKByScore.explodeTopK(
          cand.withColumn("__m0", lit(lambda) * col("__rel")),
          Seq("query_id"), col("__m0"), col("neighbor_id"), 1,
          outId = "neighbor_id", outScore = "__mmr")
        .select(col("query_id"), col("neighbor_id"), col("__mmr"),
          lit(1).as("rn"))
    // k−1 greedy rounds with ZERO per-round Spark jobs. The old shape
    // wrote/read/dropped a scratch parquet per round (write job + FS
    // listing each — at 48 jobs/call the dominant cost of a rerank);
    // but the per-round result only needs LINEAGE TRUNCATION, not
    // durability: wrapping the round's RDD in a fresh LogicalRDD
    // (`createDataFrame(df.rdd, schema)`) keeps the logical plan O(1)
    // per round while the rounds share one physical DAG — each
    // round's shuffle is computed once and re-read by the three
    // references the next round makes (Spark reuses shuffle outputs
    // of a shared RDD as skipped stages), and fault tolerance stays
    // full lineage-recompute (unlike localCheckpoint). Everything
    // evaluates in the single action the caller runs.
    try {
      for (step <- 2 to k) {
        val remaining = cand.join(
          selected.select(col("query_id"), col("neighbor_id")),
          Seq("query_id", "neighbor_id"), "left_anti")
        val maxSim = pairs
          .join(selected.select(col("query_id"),
            col("neighbor_id").as("__other")),
            Seq("query_id", "__other"))
          .groupBy(col("query_id"), col("neighbor_id"))
          .agg(max(col("__sim")).as("__maxsim"))
        val scored = remaining
          .join(maxSim, Seq("query_id", "neighbor_id"), "left")
          .withColumn("__mmr", lit(lambda) * col("__rel") -
            lit(1.0 - lambda) * coalesce(col("__maxsim"), lit(0.0)))
        val pick = graft.functions.TopKByScore.explodeTopK(scored,
            Seq("query_id"), col("__mmr"), col("neighbor_id"), 1,
            outId = "neighbor_id", outScore = "__mmr")
          .select(col("query_id"), col("neighbor_id"), col("__mmr"),
            lit(step).as("rn"))
        val next = selected.union(pick)
        selected = spark.createDataFrame(next.rdd, next.schema)
      }
      // ONE materialization of the (queries×k)-sized final selection —
      // the single action that evaluates the whole greedy chain — so
      // the shortlist and pair-sim scratch can still be dropped
      // eagerly before returning (the pre-existing lifetime contract)
      selected = graft.core.Scratch.materialize(selected, "mmr_sel")
    } finally {
      graft.core.Scratch.drop(spark, candPath)
      if (pairsPath != null) graft.core.Scratch.drop(spark, pairsPath)
    }
    selected.select(col("query_id"), col("neighbor_id"),
      (dround(col("__mmr"), 4) + lit(0)).as("mmr_score"), col("rn"))
  }
}
