package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-level text profiling that needs a shuffle (unlike the
  * per-row signals in [[graft.functions.TextFunctions]]).
  */
object TextProfile {

  /** The Gopher-style "top n-gram share": the fraction of a document's
    * n-gram occurrences taken by its single most frequent n-gram
    * (boilerplate detector — complements the duplicate-fraction
    * signal, which counts ALL repeats).
    *
    * Shape: explode → count per (doc, gram hash) → max/sum per doc.
    * Both aggregations combine map-side and shuffle only
    * (id, 8-byte hash, count) rows — never gram text. A per-row
    * higher-order-function formulation would be O(tokens²) per
    * document, quadratic in document length at 100 TB; this is linear.
    */
  def topNgramShare(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val grams = docs.select(col(idCol),
      explode(DedupOps.shingles(col(textCol), n)).as("__g"))
      .select(col(idCol), xxhash64(col("__g")).as("__h"))
    grams.groupBy(col(idCol), col("__h"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(max(col("__c")).as("top_ngram_count"),
        sum(col("__c")).as("n_ngrams"))
      .select(col(idCol), col("n_ngrams"), col("top_ngram_count"),
        graft.functions.Rounding.dround(
          col("top_ngram_count").cast("double") /
            col("n_ngrams").cast("double"), 4).as("top_ngram_share"))
  }
}
