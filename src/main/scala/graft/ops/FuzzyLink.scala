package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked fuzzy record linkage (entity resolution) over a string
  * attribute: find value pairs within edit distance `maxDist` without
  * ever forming the all-pairs frame. Classic ER blocking (Fellegi &
  * Sunter 1969 lineage; blocking surveys e.g. Christen 2012): compare
  * only candidates sharing a cheap BLOCKING KEY. Not in the reference —
  * part of the LLM-pipeline extension surface (linking near-identical
  * entity strings across sources is the string-attribute twin of
  * document near-dup).
  *
  * Shape at scale:
  *  1. DEDUPE FIRST: the attribute is aggregated to its distinct
  *     values (+ support counts) before any pairing — linkage cost
  *     depends on vocabulary size, not corpus size. One
  *     map-side-combined shuffle.
  *  2. Multi-pass blocking: each value enters under its first AND last
  *     whitespace token; the candidate join is an equi-join on the
  *     block key. A pair is compared only if it shares ≥1 key — the
  *     quadratic frame never forms (recall bound: pairs differing in
  *     BOTH the first and last token are not candidates, the
  *     documented blocking tradeoff).
  *  3. `levenshtein` runs on the deduplicated candidate pairs only,
  *     after a distinct() that collapses pairs found under both keys.
  *
  * Skew note: a block key shared by B values yields B² candidates; for
  * heavy-tailed keys, cap or salt blocks the same way SemDeDup caps
  * cells (`SimilarityOps.semDedup(cap)`).
  */
object FuzzyLink {

  /** Self-linkage. Output: (value_a, value_b, dist, n_a, n_b) with
    * value_a < value_b, dist ≤ maxDist; n_* are source-row support
    * counts. Ordered (value_a, value_b). */
  def selfLink(df: DataFrame, valueCol: String, maxDist: Int)
      : DataFrame =
    candidates(df, valueCol)
      .withColumn("dist", levenshtein(col("value_a"), col("value_b")))
      .filter(col("dist") <= maxDist)
      .select(col("value_a"), col("value_b"), col("dist"),
        col("n_a"), col("n_b"))
      .orderBy(col("value_a"), col("value_b"))

  /** Self-linkage scored by Jaro–Winkler instead of edit distance —
    * the better-behaved scorer on short identity-ish strings, where
    * transpositions are cheap typos and shared prefixes carry signal
    * (Winkler 1990). Same blocking/dedup frame as [[selfLink]]; the
    * scorer ([[graft.functions.JaroWinkler]]) implements the exact
    * textbook semantics DuckDB's `jaro_winkler_similarity` does
    * (fuzz-verified at 1e-12), so the q164 oracle filters on the same
    * raw doubles. Output: (value_a, value_b, jw_sim, n_a, n_b). */
  def selfLinkJaro(df: DataFrame, valueCol: String,
      minSim: Double = 0.9): DataFrame = {
    import graft.functions.Rounding.dround
    candidates(df, valueCol)
      .withColumn("__jw", graft.functions.JaroWinkler.column(
        col("value_a"), col("value_b")))
      .filter(col("__jw") >= minSim)
      .select(col("value_a"), col("value_b"),
        (dround(col("__jw"), 4) + lit(0)).as("jw_sim"),
        col("n_a"), col("n_b"))
      .orderBy(col("value_a"), col("value_b"))
  }

  /** End-to-end entity canonicalization: [[selfLinkJaro]] pairs →
    * connected components ([[graft.operators.DedupClusters
    * .components]], which is node-type-generic — string values label
    * by lexicographic component minimum) → one canonical surface form
    * per entity (highest support, ties to the smaller string). The
    * full ER loop: block → score → cluster → canonicalize; downstream
    * pipelines rewrite the attribute to `canonical` and re-aggregate.
    *
    * Output: (value, entity, canonical, n_rows) — one row per
    * DISTINCT value; singletons are their own entity. Everything
    * after the candidate frame is vocabulary-sized: the window that
    * elects canonicals partitions by entity over distinct values,
    * never corpus rows. */
  def resolveEntities(df: DataFrame, valueCol: String,
      minSim: Double = 0.9): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vals = df.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("n_rows"))
    val pairs = selfLinkJaro(df, valueCol, minSim)
      .select(col("value_a"), col("value_b"))
    val comp = graft.operators.DedupClusters
      .components(pairs, "value_a", "value_b")
      .withColumnRenamed("node", "value")
    val labeled = vals
      .join(comp, Seq("value"), "left")
      .withColumn("entity", coalesce(col("component"), col("value")))
      .drop("component")
    val w = Window.partitionBy(col("entity"))
      .orderBy(col("n_rows").desc, col("value"))
    val canon = labeled
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("entity"), col("value").as("canonical"))
    labeled.join(canon, Seq("entity"))
      .select(col("value"), col("entity"), col("canonical"),
        col("n_rows"))
      .orderBy(col("entity"), col("value"))
  }

  /** The shared blocked candidate frame: distinct values + support
    * counts, first/last-token blocking, deduplicated ordered pairs. */
  private def candidates(df: DataFrame, valueCol: String): DataFrame = {
    val vals = df.groupBy(col(valueCol).as("value"))
      .agg(count(lit(1)).as("n_rows"))
    val toks = split(col("value"), "\\s+")
    def keyed(key: org.apache.spark.sql.Column) =
      vals.select(key.as("block"), col("value"), col("n_rows"))
    // UNION-dedup: a single-token value has first == last token and
    // must not self-collide into duplicate candidates
    val k = keyed(element_at(toks, 1))
      .union(keyed(element_at(toks, -1))).distinct()

    val a = k.select(col("block"), col("value").as("value_a"),
      col("n_rows").as("n_a"))
    val b = k.select(col("block"), col("value").as("value_b"),
      col("n_rows").as("n_b"))
    a.join(b, "block")
      .filter(col("value_a") < col("value_b"))
      .select(col("value_a"), col("value_b"), col("n_a"), col("n_b"))
      .distinct()
  }
}
