package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround
import graft.functions.TextFunctions

/** Duplicated-span fraction: the exact-substring dedup *signal* — for
  * each document, the fraction of its distinct k-token windows that
  * occur in at least one other document. Pipelines threshold this to
  * drop documents that are mostly assembled from corpus-repeated spans
  * (boilerplate, mirrored passages), the scalable stand-in for
  * suffix-array exact-substring dedup (Lee et al., "Deduplicating
  * Training Data Makes Language Models Better", ACL 2022).
  *
  * Scale design:
  *  - windows are formed in-row by the native [[graft.functions.WordShingles]]
  *    expression and immediately reduced to 32-hex md5 digests, so the
  *    two wide exchanges carry (digest) and (doc_id, flag) pairs — the
  *    raw text never shuffles;
  *  - per-doc `array_distinct` happens before the explode, so a
  *    degenerate all-same-window document contributes one digest row,
  *    not O(tokens);
  *  - document frequency is a map-side-combinable count on the digest
  *    (each (doc, digest) pair is unique by construction, so
  *    `count(*)` IS the document frequency);
  *  - the df table joins back on the same digest key the aggregation
  *    just partitioned by, so Catalyst reuses the exchange rather than
  *    re-shuffling the aggregated side.
  *
  * The digest is md5 (engine-portable) rather than xxhash64 so the
  * DuckDB oracle replicates the grouping bit-for-bit.
  */
object SpanDedup {

  /** One row per document: (id, n_spans, n_dup, dup_fraction) where
    * n_spans counts the doc's distinct k-token windows, n_dup those
    * windows seen in ≥1 other document, and dup_fraction = n_dup /
    * n_spans rounded to 4 dp. Documents with fewer than k tokens
    * contribute their whole token stream as the single window
    * (matching [[WordShingles]] fallback semantics); an empty document
    * has one empty-string window.
    */
  def dupSpanStats(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    val toks = TextFunctions.tokens(lower(col(textCol)))
    val spans = array_distinct(
      graft.functions.WordShingles.column(toks, k))
    val perDoc = df.select(col(idCol), explode(spans).as("__s"))
      .select(col(idCol), md5(col("__s")).as("__d"))
    // (doc, digest) pairs are distinct, so count(*) = document freq
    val docFreq = perDoc.groupBy(col("__d"))
      .agg(count(lit(1)).as("__df"))
    perDoc.join(docFreq, "__d")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when(col("__df") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_fraction",
        dround(col("n_dup").cast("double") /
          col("n_spans").cast("double"), 4))
  }

  /** The Lee 2022 *remedy*, not just the signal: remove the
    * corpus-duplicated spans and keep the document. Every k-token
    * window seen in ≥2 documents (case-insensitive match, same
    * definition as [[dupSpanStats]]) marks its k token positions;
    * the cleaned text is the remaining tokens, original case,
    * re-joined with single spaces. Docs shorter than k tokens are one
    * whole-doc window — if that window is shared with another doc the
    * whole text is removed. Returns (id, cleaned_text, n_kept,
    * n_removed).
    *
    * Scale shape: window digests carry (id, start:int, 32-hex md5)
    * rows through the document-frequency agg and back — per-doc
    * duplicated-start lists are ints. The final left join re-attaches
    * those lists to the token arrays: ONE corpus-text exchange, which
    * is inherent here — the operator's output is rewritten text, so
    * text must flow once; everything corpus-wide (the df table) moved
    * digests only. Coverage expansion is in-row:
    * distinct-flatten of the ≤k·|starts| covered positions, then an
    * indexed filter over the token array — O(tokens·|covered|) per doc
    * worst case, corpus-size-independent.
    */
  def removeDupSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    val base = df.select(col(idCol),
        TextFunctions.tokens(col(textCol)).as("__toks"),
        TextFunctions.tokens(lower(col(textCol))).as("__lt"))
      .withColumn("__n", size(col("__lt")))
    val win = base
      .withColumn("__starts",
        when(col("__n") >= k, sequence(lit(0), col("__n") - k))
          .otherwise(typedLit(Seq(0))))
      .select(col(idCol), explode(col("__starts")).as("__s"),
        md5(array_join(slice(col("__lt"), col("__s") + 1, lit(k)),
          " ")).as("__d"))
    // document frequency over per-doc-distinct digests, as dupSpanStats
    val dupDigests = win.select(col(idCol), col("__d")).distinct()
      .groupBy(col("__d")).agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= 2).select(col("__d"))
    val dupStarts = win.join(dupDigests, "__d")
      .groupBy(col(idCol)).agg(collect_set(col("__s")).as("__ds"))
    base.join(dupStarts, Seq(idCol), "left")
      .withColumn("__cov",
        when(col("__ds").isNull || col("__n") === 0,
            typedLit(Seq.empty[Int]))
          .otherwise(array_distinct(flatten(transform(col("__ds"),
            st => sequence(st, least(st + (k - 1), col("__n") - 1)))))))
      .select(col(idCol),
        array_join(filter(col("__toks"),
          (_, i) => !array_contains(col("__cov"), i)), " ")
          .as("cleaned_text"),
        (col("__n") - size(col("__cov"))).cast("long").as("n_kept"),
        size(col("__cov")).cast("long").as("n_removed"))
  }
}
