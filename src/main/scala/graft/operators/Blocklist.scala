package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Blocklist phrase filtering: flag documents containing any of a
  * bounded list of banned substrings — the compliance/safety stage of
  * a curation pipeline. Substring semantics (matches across token
  * boundaries), deliberately distinct from [[Decontam]]'s token-n-gram
  * membership.
  *
  * Scale design: a bounded blocklist needs NO join at all — the
  * phrase list rides the plan inside the expression and each document
  * is scanned in-row by an Aho–Corasick automaton
  * ([[graft.functions.AhoContains]]): ONE pass over the text finds
  * all phrases, O(|text| + matches) per row regardless of phrase
  * count, where a per-phrase `contains` filter is
  * O(|phrases| × |text|) — at a production blocklist size (thousands
  * of phrases) that factor decides whether the compliance stage is a
  * scan or a thousand scans. Zero exchanges; the automaton rebuilds
  * once per executor from the shipped phrase list (the broadcast-
  * hash-table shape). 100 TB of corpus streams through as a narrow
  * map.
  */
object Blocklist {

  /** One row per document: hit count, the first matched phrase in
    * blocklist order (null if clean), and the blocked flag. */
  def flagPhrases(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "empty blocklist")
    val hits = graft.functions.AhoContains.column(
      col(textCol), phrases)
    df.select(col(idCol), hits.as("__hits"))
      .select(col(idCol),
        size(col("__hits")).cast("long").as("n_hits"),
        when(size(col("__hits")) > 0, element_at(col("__hits"), 1))
          .otherwise(lit(null).cast("string")).as("first_hit"),
        (size(col("__hits")) > 0).as("blocked"))
  }

  /** Table-driven [[flagPhrases]]: the phrase list comes from a
    * DataFrame column — the production shape (a compliance list is a
    * maintained TABLE, not a code literal). Phrases are deduplicated,
    * empty/null rows dropped, and ordered LEXICOGRAPHICALLY (a table
    * has no inherent order, and `first_hit` semantics need one — so
    * `first_hit` is the lexicographically smallest matched phrase).
    *
    * The list is collected to the driver and ships inside the
    * automaton expression, exactly like a broadcast join's build side
    * — automaton memory is O(total phrase chars), so a pre-collect
    * aggregate enforces `maxPhraseChars` (default 64 MB ≈ a
    * millions-of-short-phrases list) BEFORE anything is pulled to the
    * driver: an unexpectedly huge list fails with a clear error
    * instead of an OOM mid-collect. Beyond the cap, a phrase list is
    * no longer "bounded metadata" and wants the join-based formulation
    * (n-gram membership à la [[Decontam]]) instead. */
  def flagPhrasesFrom(df: DataFrame, idCol: String, textCol: String,
      phrases: DataFrame, phraseCol: String,
      maxPhraseChars: Long = 64L << 20): DataFrame = {
    val cleaned = phrases
      .select(col(phraseCol).cast("string").as("__p"))
      .filter(col("__p").isNotNull && length(col("__p")) > 0)
      .distinct()
    val Row(totalChars: Long, n: Long) = cleaned
      .agg(coalesce(sum(length(col("__p"))), lit(0L)).cast("long"),
        count(lit(1))).head()
    require(totalChars <= maxPhraseChars,
      s"blocklist table holds $totalChars phrase chars across $n " +
        s"phrases — over the $maxPhraseChars automaton cap; use the " +
        "join-based n-gram membership gate for lists this large")
    val list = cleaned.orderBy(col("__p")).collect()
      .map(_.getString(0)).toSeq
    flagPhrases(df, idCol, textCol, list)
  }
}
