package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround
import graft.functions.TextFunctions

/** TF-IDF term scoring over a document corpus (training-data text
  * analysis; not in the reference — part of the LLM-pipeline surface).
  *
  * Smoothed IDF: `idf(t) = ln((N + 1) / (df(t) + 1)) + 1` (the standard
  * add-one formulation — never divides by zero, never goes negative).
  *
  * Shape at scale: tokenize → explode is a narrow map; TF is one shuffle
  * on (doc, term); DF is one map-side-combinable shuffle on term; the
  * corpus size N joins in as a broadcast single-row aggregate (NOT a
  * driver-side `.count()` — the plan stays fully lazy/distributed). The
  * TF×DF join shuffles on term, where cardinality is vocabulary-sized,
  * orders of magnitude below corpus-sized.
  */
object TfIdf {

  /** Per-(doc, term) TF-IDF scores, rounded to 4 decimals. */
  def score(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextFunctions.tokens(lower(col(textCol)))).as("token"))
    val tf = toks.groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col(idCol)).as("n_docs"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", dround(
        col("tf").cast("double") *
          (log((col("n_docs").cast("double") + 1.0) /
            (col("df").cast("double") + 1.0)) + 1.0), 4))
      .select(col(idCol), col("token"), col("tf"), col("tfidf"))
  }

  /** Top-k most characteristic terms per document, ranked by rounded
    * TF-IDF (rank on the rounded value so any two engines computing ln()
    * a ulp apart still agree), token as the deterministic tie-break.
    *
    * Deliberately a window, not the bounded-heap TopKByScore used by
    * the other top-k paths: the heap's payload is a LONG id (terms are
    * strings — they'd need a surrogate dictionary and a join back),
    * its (score desc, id asc) tie-break can't express "token asc",
    * and the input here is the per-doc TERM table (vocabulary-bounded
    * per doc), not a corpus×query scored relation — the window sorts
    * what the group-by already shuffled, so the scale argument that
    * motivated the heap elsewhere doesn't apply. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("token"))
    score(docs, idCol, textCol)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
