package graft.operators

import org.apache.spark.sql.DataFrame
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
}
