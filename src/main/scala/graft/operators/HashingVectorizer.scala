package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround

/** Hashing-trick TF-IDF document vectors (Weinberger et al. 2009,
  * "Feature Hashing for Large Scale Multitask Learning") — fixed-dim
  * sparse vectors for text similarity WITHOUT an embedding model: the
  * lexical-overlap complement to the embedding-based ANN path, and the
  * standard cheap vectorizer a curation pipeline runs corpus-wide.
  *
  * Engine-portable by construction: the term→bucket hash is the first
  * 8 hex digits of md5 (identical in Spark and DuckDB, so the oracle
  * re-derives the same buckets — unlike xxhash64), and every
  * aggregation happens on SCALED INTEGERS (TF-IDF rounded to 4 dp ×
  * 10⁴), so sums are exact and association-order-free; doubles appear
  * only in the final normalize/cosine step as a fixed op chain on
  * exact inputs. No floating-point sum ever crosses a shuffle.
  *
  * Shape at scale: tokenize→explode narrow; TF one (doc, term)
  * shuffle; DF a vocabulary-sized shuffle; bucket aggregation shuffles
  * at most `dim` rows per doc; the norm join is id-keyed. The
  * vocabulary/bucket tables are corpus-size-independent.
  */
object HashingVectorizer {

  /** Term→bucket: first 32 bits of md5 mod `dim` — the same value
    * DuckDB's `CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % dim`
    * produces. */
  def bucket(token: Column, dim: Int): Column =
    pmod(conv(substring(md5(token), 1, 8), 16, 10).cast("long"),
      lit(dim.toLong))

  /** Long-form vectors before normalization: (`idCol`, bucket, __ws
    * scaled-int weight, __n2 scaled-int squared norm).
    *
    * Computed once per session per (corpus snapshot, params) and
    * MATERIALIZED to scratch parquet — the same first-class-ARTIFACT
    * exception to per-query isolation as
    * [[DedupClusters.clusterMap]]: a real pipeline vectorizes the
    * corpus once and fans every consumer (normalized vectors, dense
    * bridge, brute-force search, IVF search) out from the vector
    * table. The in-heap cache stores only the scratch PATH; staleness
    * semantics (session identity, file snapshot) are
    * [[graft.core.ModelCache]]'s. */
  private def scaledBuckets(docs: DataFrame, idCol: String,
      textCol: String, dim: Int): DataFrame = {
    val path = graft.core.ModelCache.cached(docs,
      s"hashvec:$idCol:$textCol:$dim") {
      val byBucket = TfIdf.score(docs, idCol, textCol)
        .withColumn("bucket", bucket(col("token"), dim))
        .withColumn("__w", round(col("tfidf") * 1e4).cast("long"))
        .groupBy(col(idCol), col("bucket"))
        .agg(sum(col("__w")).as("__ws"))
      val norms = byBucket.groupBy(col(idCol))
        .agg(sum(col("__ws") * col("__ws")).as("__n2"))
      graft.core.Scratch.materializeWithPath(
        byBucket.join(norms, Seq(idCol)), "hashvec")._2
    }
    docs.sparkSession.read.parquet(path)
  }

  /** L2-normalized hashed TF-IDF vectors in long form:
    * (`idCol`, bucket, weight) — only nonzero buckets appear. */
  def hashedTfIdf(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame =
    scaledBuckets(docs, idCol, textCol, dim)
      .select(col(idCol), col("bucket"),
        (dround(col("__ws").cast("double") /
          sqrt(col("__n2").cast("double")), 6) + lit(0)).as("weight"))

  /** Dense `array<double>` form of [[hashedTfIdf]] — the bridge onto
    * the embedding ANN stack: the output plugs directly into
    * [[SimilarityOps.ivfTopK]] / [[SimilarityOps.ivfPqTopK]], which IS
    * the scale path for text similarity search (brute-force
    * [[textTopK]] is the exactness baseline). One extra id-keyed
    * aggregation; `dim` doubles per doc. */
  def denseVectors(docs: DataFrame, idCol: String, textCol: String,
      dim: Int = 64): DataFrame = {
    // second-stage artifact over the scaledBuckets one: consumers
    // (codebook init, corpus assignment, query probing) each scan the
    // dense table — materialize the densify once per session
    val path = graft.core.ModelCache.cached(docs,
      s"hashvec-dense:$idCol:$textCol:$dim") {
      graft.core.Scratch.materializeWithPath(
        hashedTfIdf(docs, idCol, textCol, dim)
          .groupBy(col(idCol))
          .agg(map_from_entries(collect_list(
            struct(col("bucket"), col("weight")))).as("__m"))
          .select(col(idCol),
            transform(sequence(lit(0L), lit(dim - 1L)),
              i => coalesce(element_at(col("__m"), i), lit(0.0)))
              .as("vec")),
        "hashvec_dense")._2
    }
    docs.sparkSession.read.parquet(path)
  }

  /** Query-SIDE hashed vectors: an external query relation vectorized
    * against the CORPUS statistics — the piece a real search system
    * needs that [[textTopK]]/q130 (queries drawn from the corpus)
    * sidesteps. The query's TF comes from its own text; IDF comes from
    * the corpus document frequencies (reused from the BM25 postings
    * artifact, so the corpus tokenize pass is shared with the sparse
    * retrieval stack and runs ONCE per session); the scaled-integer
    * bucket discipline is identical to [[hashedTfIdf]], so query·doc
    * cosine numerators stay exact integer sums. Query terms absent
    * from the corpus vocabulary drop at the inner DF join — they can't
    * match any document anyway (the same semantics BM25 has for
    * out-of-vocabulary terms).
    *
    * Shape at scale: queries are a small relation; the only
    * corpus-sized input is the materialized DF table (vocabulary-sized
    * in practice), joined at query-term cardinality. */
  private[operators] def queryScaledBuckets(docs: DataFrame,
      idCol: String, textCol: String, queries: DataFrame,
      qIdCol: String, qTextCol: String, dim: Int): DataFrame = {
    val dfreq = Bm25.buildPostings(docs, idCol, textCol).dfreq
    // corpus size for the smoothed IDF: count over the doc relation
    // itself (docs with empty text still count, as in TfIdf.score)
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    val qtf = queries.select(col(qIdCol).as("query_id"),
        explode(graft.functions.TextFunctions.tokens(
          lower(col(qTextCol)))).as("token"))
      .groupBy(col("query_id"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val byBucket = qtf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("__tfidf", dround(
        col("tf").cast("double") *
          (log((col("n_docs").cast("double") + 1.0) /
            (col("df").cast("double") + 1.0)) + 1.0), 4))
      .withColumn("bucket", bucket(col("token"), dim))
      .withColumn("__w", round(col("__tfidf") * 1e4).cast("long"))
      .groupBy(col("query_id"), col("bucket"))
      .agg(sum(col("__w")).as("__ws"))
    val norms = byBucket.groupBy(col("query_id"))
      .agg(sum(col("__ws") * col("__ws")).as("__n2"))
    byBucket.join(norms, Seq("query_id"))
  }

  /** Dense `array<double>` query vectors for EXTERNAL text queries —
    * [[denseVectors]]'s shape from [[queryScaledBuckets]]'s corpus-idf
    * weighting: the form that plugs external queries into the IVF
    * stack ([[SimilarityOps.ivfTopK]]) for scale-path text retrieval.
    * Queries are small by contract, so no artifact materialization. */
  def queryDenseVectors(docs: DataFrame, idCol: String,
      textCol: String, queries: DataFrame, qIdCol: String,
      qTextCol: String, dim: Int = 64): DataFrame =
    queryScaledBuckets(docs, idCol, textCol, queries, qIdCol,
        qTextCol, dim)
      .select(col("query_id"), col("bucket"),
        (dround(col("__ws").cast("double") /
          sqrt(col("__n2").cast("double")), 6) + lit(0)).as("__w"))
      .groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(
        struct(col("bucket"), col("__w")))).as("__m"))
      .select(col("query_id"),
        transform(sequence(lit(0L), lit(dim - 1L)),
          i => coalesce(element_at(col("__m"), i), lit(0.0)))
          .as("vec"))

  /** Cosine top-k retrieval for EXTERNAL text queries over the hashed
    * corpus vectors — the dense half of a hybrid (BM25 + vector)
    * search stack when no embedding model is in the loop. Unlike
    * [[textTopK]] (the exhaustive baseline), candidates are only the
    * documents sharing ≥1 hash bucket with the query — the inverted
    * retrieval shape: the queries×corpus frame never forms, and a
    * query touches only the postings of its own buckets. No self
    * exclusion: queries are a separate relation, and retrieving the
    * query's source document (if any) is correct retrieval behavior. */
  def textTopKFor(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, dim: Int = 64): DataFrame = {
    val c = scaledBuckets(docs, idCol, textCol, dim)
      .select(col(idCol).as("neighbor_id"), col("bucket"),
        col("__ws").as("__wc"), col("__n2").as("__nc"))
    val q = queryScaledBuckets(docs, idCol, textCol,
      queries, qIdCol, qTextCol, dim)
      .select(col("query_id"), col("bucket"),
        col("__ws").as("__wq"), col("__n2").as("__nq"))
    val scored = q.join(c, Seq("bucket"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__wq") * col("__wc")).as("__num"),
        first(col("__nq")).as("__nq"), first(col("__nc")).as("__nc"))
      .withColumn("__cos", col("__num").cast("double") /
        (sqrt(col("__nq").cast("double")) *
          sqrt(col("__nc").cast("double"))))
    graft.functions.TopKByScore.explodeTopK(scored,
        Seq("query_id"), col("__cos"), col("neighbor_id"), k,
        outId = "neighbor_id", outScore = "__cos")
      .select(col("query_id"), col("neighbor_id"),
        (dround(col("__cos"), 4) + lit(0)).as("cos_sim"), col("rn"))
  }

  /** Brute-force cosine top-k between documents over the hashed
    * vectors — text ANN with no embedding model. The cosine numerator
    * is an EXACT integer sum over shared buckets (Σ ws_q·ws_d), the
    * denominator one sqrt-product on exact ints, so the score is
    * bit-identical across engines and partitionings; ranking is the
    * bounded-heap top-k (score desc, id asc). Pairs sharing no bucket
    * score 0 via the left join from the full query×corpus frame —
    * this is the exhaustive BASELINE (queries×corpus work, the text
    * twin of q28); the scale path is IVF over [[hashedTfIdf]]'s
    * output, exactly as for embeddings. */
  def textTopK(docs: DataFrame, idCol: String, textCol: String,
      queryPred: Column => Column, k: Int, dim: Int = 64): DataFrame = {
    // scaledBuckets is already a materialized session artifact
    val sb = scaledBuckets(docs, idCol, textCol, dim)
    val q = sb.select(col(idCol).as("query_id"),
      col("bucket"), col("__ws").as("__wq"), col("__n2").as("__nq"))
      .where(queryPred(col("query_id")))
    val c = sb.select(col(idCol).as("neighbor_id"),
      col("bucket"), col("__ws").as("__wc"), col("__n2").as("__nc"))
    val num = q.join(c, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(sum(col("__wq") * col("__wc")).as("__num"),
        first(col("__nq")).as("__nq"), first(col("__nc")).as("__nc"))
    val allPairs = q.select(col("query_id"), col("__nq")).distinct()
      .crossJoin(c.select(col("neighbor_id"), col("__nc")).distinct())
      .filter(col("neighbor_id") =!= col("query_id"))
      .join(num.select(col("query_id"), col("neighbor_id"),
        col("__num")), Seq("query_id", "neighbor_id"), "left")
      .withColumn("__cos",
        coalesce(col("__num"), lit(0L)).cast("double") /
          (sqrt(col("__nq").cast("double")) *
            sqrt(col("__nc").cast("double"))))
    graft.functions.TopKByScore.explodeTopK(allPairs,
        Seq("query_id"), col("__cos"), col("neighbor_id"), k,
        outId = "neighbor_id", outScore = "__cos")
      .select(col("query_id"), col("neighbor_id"),
        (dround(col("__cos"), 4) + lit(0)).as("cos_sim"), col("rn"))
  }
}
