package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround
import graft.functions.TextFunctions

/** BM25 lexical top-k retrieval over a document corpus — the exact
  * sparse-retrieval baseline every RAG / retrieval-training pipeline
  * pairs with the dense-ANN stack (IVF/PQ in [[SimilarityOps]]): dense
  * recall + BM25 precision is the standard hybrid. Not in the reference
  * (part of the LLM-pipeline extension surface).
  *
  * Scoring is Lucene-shaped Okapi BM25:
  * {{{
  *   idf(t)        = ln((N - df + 0.5) / (df + 0.5) + 1)      // always > 0
  *   score(q, d)   = Σ_{t ∈ q ∩ d} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
  * }}}
  *
  * Determinism across engines (the DuckDB oracle recomputes this): each
  * per-term contribution is rounded to 6 dp and scaled to an integer
  * BEFORE the per-(query, doc) sum, so no float addition order ever
  * crosses an exchange; the reported score re-scales and rounds to 4 dp.
  *
  * Shape at scale:
  *  - docs are tokenized ONCE (narrow map); TF is one map-side-combined
  *    shuffle on (doc, term), doc length one on doc, DF one on term —
  *    all the postings statistics an inverted index holds, as
  *    DataFrames;
  *  - corpus N and avgdl come from a single-row aggregate broadcast
  *    back (never a driver `.count()`);
  *  - query terms are BROADCAST onto the TF table, so the corpus-sized
  *    postings relation is filtered to matched (query, doc, term) rows
  *    before anything else joins — the queries×corpus frame never
  *    forms;
  *  - final ranking is a per-query window over the scored candidates
  *    (bounded by docs sharing ≥1 query term), never over the corpus.
  */
object Bm25 {

  private val Scale = 1e6

  /** The postings statistics BM25 needs — what an inverted index
    * stores, as DataFrames. Built in one tokenize pass. */
  private[operators] case class Postings(tf: DataFrame, dl: DataFrame,
    dfreq: DataFrame, stats: DataFrame)

  private[operators] def buildPostings(docs: DataFrame, idCol: String,
      textCol: String): Postings = {
    // session artifact (the signature-store pattern): the postings
    // statistics for one corpus snapshot are computed in one tokenize
    // pass and materialized once — every consumer in the session
    // (search, index publish, hard-negative mining, eval) reads the
    // scratch tables instead of re-tokenizing the corpus. Cached
    // VALUES are the three path strings (bounded); invalidated by
    // plan + file snapshot.
    val spark = docs.sparkSession
    val (tfP, dlP, dfP) = graft.core.ModelCache.cached(docs,
      s"bm25postings:$idCol:$textCol") {
      val toks = docs.select(col(idCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
      val tf = toks.groupBy(col(idCol), col("token"))
        .agg(count(lit(1)).as("tf"))
      val tfPath = graft.core.Scratch
        .materializeWithPath(tf, "bm25_tf")._2
      val tfM = spark.read.parquet(tfPath)
      // derive dl and df from the materialized tf, not the raw text —
      // the tokenize pass runs exactly once
      val dlPath = graft.core.Scratch.materializeWithPath(
        tfM.groupBy(col(idCol)).agg(sum(col("tf")).as("dl")),
        "bm25_dl")._2
      val dfPath = graft.core.Scratch.materializeWithPath(
        tfM.groupBy(col("token")).agg(count(lit(1)).as("df")),
        "bm25_df")._2
      (tfPath, dlPath, dfPath)
    }
    val dl = spark.read.parquet(dlP)
    // N and avgdl in one single-row pass over the doc-length table
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      avg(col("dl").cast("double")).as("avgdl"))
    Postings(spark.read.parquet(tfP), dl,
      spark.read.parquet(dfP), stats)
  }

  /** Per-(query, doc) BM25 scores for the top `k` docs per query.
    * Output: (query_id, doc_id…, score, rn), ordered (query, rn).
    *
    * @param queries small relation of (query id, query text) — one row
    *                per query; tokenized with the same rules as docs.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    topKFrom(buildPostings(docs, idCol, textCol), idCol,
      queries, qIdCol, qTextCol, k, k1, b)

  /** [[topK]] over prebuilt postings (from [[buildPostings]] or a
    * persisted [[Bm25Index]] artifact — the production path: search
    * never re-tokenizes the corpus). */
  private[operators] def topKFrom(p: Postings, idCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val Postings(tf, dl, dfreq, stats) = p
    // distinct query terms, broadcast: duplicated terms in a query text
    // must not double-count (standard BM25 treats the query as a set)
    val qterms = queries.select(col(qIdCol).as("query_id"),
      explode(TextFunctions.tokens(lower(col(qTextCol)))).as("token"))
      .distinct()

    val matched = tf.join(broadcast(qterms), "token")
      .join(dfreq, "token")
      .join(dl, idCol)
      .crossJoin(broadcast(stats))

    val tfd = col("tf").cast("double")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df").cast("double") + 0.5) + 1.0)
    val denom = tfd + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl"))
    val contrib = idf * tfd * lit(k1 + 1.0) / denom

    val scored = matched
      .withColumn("contrib_s",
        round(contrib * lit(Scale)).cast("long"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("contrib_s")).as("score_s"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_s").desc, col(idCol))
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("query_id"), col(idCol),
        dround(col("score_s").cast("double") / Scale, 4).as("score"),
        col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }
}
