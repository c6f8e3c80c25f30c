package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocklist phrase filtering: flag documents containing any of a
  * bounded list of banned substrings — the compliance/safety stage of
  * a curation pipeline. Substring semantics (matches across token
  * boundaries), deliberately distinct from [[Decontam]]'s token-n-gram
  * membership.
  *
  * Scale design: a bounded blocklist needs NO join at all — the phrase
  * list rides the plan as one constant array literal and each document
  * is checked in-row (`filter` + `contains`, codegen'd). Zero
  * exchanges, zero broadcast memory beyond the list itself; 100 TB of
  * corpus streams through as a narrow map. (A blocklist too large for
  * a literal would switch to the [[Decontam]]-style broadcast-hash
  * n-gram prefilter + verify shape.)
  */
object Blocklist {

  /** One row per document: hit count, the first matched phrase in
    * blocklist order (null if clean), and the blocked flag. */
  def flagPhrases(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    require(phrases.nonEmpty, "empty blocklist")
    val hits = filter(typedLit(phrases),
      p => contains(col(textCol), p))
    df.select(col(idCol), hits.as("__hits"))
      .select(col(idCol),
        size(col("__hits")).cast("long").as("n_hits"),
        when(size(col("__hits")) > 0, element_at(col("__hits"), 1))
          .otherwise(lit(null).cast("string")).as("first_hit"),
        (size(col("__hits")) > 0).as("blocked"))
  }
}
