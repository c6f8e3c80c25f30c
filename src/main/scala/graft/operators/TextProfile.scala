package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround
import graft.functions.TextFunctions

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

  /** PMI bigram collocations over the whole corpus:
    * pmi(w1,w2) = ln(c12 · N / (c1 · c2)) with N = total token count.
    *
    * Bigrams are formed WITHIN each row (a `transform` over token
    * indices) — no positional self-join of the exploded token stream,
    * which would shuffle every token twice. What shuffles is only the
    * (w1, w2) → count aggregation (map-side combinable) and two
    * equi-joins of the `c12 >= minCount`-filtered bigram table against
    * the unigram counts: at 100 TB the bigram table after the support
    * filter is vocabulary-sized, not corpus-sized.
    */
  def pmiBigrams(docs: DataFrame, textCol: String,
      minCount: Long = 5L): DataFrame = {
    val tokDocs = docs.filter(trim(col(textCol)) =!= "")
      .select(TextFunctions.tokens(lower(col(textCol))).as("__toks"))
    val uni = tokDocs.select(explode(col("__toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__c"))
    val n1 = uni.agg(sum(col("__c")).cast("long").as("__n"))
    val bi = tokDocs.filter(size(col("__toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__toks) - 1), " +
          "i -> struct(__toks[i-1] AS w1, __toks[i] AS w2))")).as("__p"))
      .select(col("__p.w1").as("w1"), col("__p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    bi.crossJoin(broadcast(n1))
      .join(uni.withColumnsRenamed(Map("w" -> "w1", "__c" -> "__c1")),
        Seq("w1"))
      .join(uni.withColumnsRenamed(Map("w" -> "w2", "__c" -> "__c2")),
        Seq("w2"))
      .select(col("w1"), col("w2"), col("c12"),
        // + 0 normalizes IEEE -0.0 → 0.0 (ln of a ratio just under 1
        // rounds to negative zero, which hash-compares != 0.0)
        (dround(log(col("c12").cast("double") * col("__n") /
          (col("__c1") * col("__c2"))), 4) + lit(0)).as("pmi"))
  }

  /** Corpus-self-estimated trigram log-probability per document — the
    * LM-perplexity quality signal (CCNet-style filtering) without an
    * external model: score(doc) = mean over its trigrams of
    * ln(c3(w1 w2 w3) / c2(w1 w2)), counts taken over the whole corpus.
    * Boilerplate-heavy predictable text scores near 0; rare/garbled
    * text scores very negative.
    *
    * Scale shape: n-grams are formed WITHIN each row, and both count
    * tables and the two probability joins are keyed on
    * `xxhash64(w1, w2[, w3])` — an 8-byte digest shuffle, never n-gram
    * text (the [[topNgramShare]] convention; a colliding pair of
    * distinct n-grams would merge counts with probability ~2^-64 per
    * pair). Docs with fewer than 3 tokens produce no trigrams and are
    * absent from the output.
    */
  def lmTrigramScore(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toked = docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol),
        TextFunctions.tokens(lower(col(textCol))).as("__toks"))
    val tris = toked.filter(size(col("__toks")) >= 3)
      .select(col(idCol), explode(expr(
        "transform(sequence(2, size(__toks) - 1), " +
          "i -> struct(__toks[i-2] AS w1, __toks[i-1] AS w2, " +
          "__toks[i] AS w3))")).as("__t"))
      .select(col(idCol),
        xxhash64(col("__t.w1"), col("__t.w2"), col("__t.w3")).as("__h3"),
        xxhash64(col("__t.w1"), col("__t.w2")).as("__h2"))
    val bis = toked.filter(size(col("__toks")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(__toks) - 1), " +
          "i -> struct(__toks[i-1] AS w1, __toks[i] AS w2))")).as("__b"))
      .select(xxhash64(col("__b.w1"), col("__b.w2")).as("__h2"))
    val c3 = tris.groupBy(col("__h3")).agg(count(lit(1)).as("__c3"))
    val c2 = bis.groupBy(col("__h2")).agg(count(lit(1)).as("__c2"))
    tris.join(c3, Seq("__h3")).join(c2, Seq("__h2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        // + 0: an all-predictable doc averages to IEEE -0.0
        (dround(avg(log(col("__c3").cast("double") / col("__c2"))), 4)
          + lit(0)).as("avg_logprob"))
  }

  /** Per-group Shannon entropy of the unigram distribution (nats),
    * with token/type counts — a corpus-diversity signal (low entropy =
    * template/boilerplate-dominated source).
    *
    * Two map-side-combinable aggregations; the join keys the per-group
    * totals back onto vocabulary-sized counts, never raw tokens.
    */
  def tokenEntropy(docs: DataFrame, groupCol: String,
      textCol: String): DataFrame = {
    val cnt = docs
      .select(col(groupCol),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("__w"))
      .groupBy(col(groupCol), col("__w")).agg(count(lit(1)).as("__c"))
    val tot = cnt.groupBy(col(groupCol))
      .agg(sum(col("__c")).as("__n"), count(lit(1)).as("__types"))
    val p = col("__c").cast("double") / col("__n").cast("double")
    cnt.join(tot, Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_tokens"),
        max(col("__types")).as("n_types"),
        // + 0: a zero-entropy group would round to IEEE -0.0
        (dround(-sum(p * log(p)), 4) + lit(0)).as("entropy"))
  }
}
