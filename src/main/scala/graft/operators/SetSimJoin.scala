package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join with prefix filtering — ALL pairs of
  * documents whose set-Jaccard is >= a threshold, with NO false
  * negatives (unlike the MinHash-LSH path, [[DedupOps]] banding, which
  * trades recall for candidate count).
  *
  * Algorithm: the prefix-filter family (AllPairs — Bayardo, Ma &
  * Srikant, WWW 2007; PPJoin — Xiao, Wang, Lin & Yu, WWW 2008). Under
  * one GLOBAL token order, a pair with Jaccard >= t must overlap in at
  * least ceil(t*|x|) tokens, so the first `|x| - ceil(t*|x|) + 1`
  * tokens of each side (its PREFIX under that order) must share at
  * least one token — everything else cannot reach the threshold and is
  * never generated as a candidate. The global order is ascending
  * document frequency ("rarest first"), which puts the most selective
  * tokens in the prefixes: candidate lists per token stay near the df
  * of a RARE token, and the corpus hot tokens (the skew risk of any
  * token-inverted join) sort to the suffixes, where they are never
  * probed.
  *
  * Shape at scale (100 TB): keyed shuffles only, no n² anywhere —
  * (1) the distinct-set frame is materialized ONCE per session per
  * (plan, file snapshot) as a scratch artifact (the
  * [[DedupClusters.clusterMap]] pattern: three consumers — probe
  * generation and both verification sides — would otherwise each
  * replay the corpus scan + set construction); (2) token df is one
  * map-side-combined count per distinct token; (3) prefixes come from
  * a per-doc `row_number` over (df, token) — one shuffle keyed by doc;
  * (4) candidates explode only the prefixes (about `(1-t)·|set|`
  * tokens per doc) and equi-join on token with the length filter
  * `t·|x| <= |y| <= |x|/t` in the join condition, then aggregate to
  * one row per id pair (carrying the first-match positions) — only id
  * pairs + two ints shuffle; (5) the PPJoin POSITIONAL filter prunes
  * pairs whose first-match positions already bound the overlap below
  * `ceil(t/(1+t)·(|x|+|y|))`, before any set bytes move; (6)
  * verification joins the surviving ids back to the set artifact and
  * computes exact Jaccard with the codegen'd `array_intersect`.
  * Candidate count degrades toward all-pairs only as t -> 0; at dedup
  * thresholds (t >= 0.5) the prefixes are half the tokens and
  * near-orthogonal.
  *
  * Reference anchor: the smartpool repo's near-dup QA is
  * threshold-Jaccard over text n-grams (02_bronze_smartpool.ipynb §5
  * duplicate detection); this operator is the exact-at-scale form of
  * that check.
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with Jaccard(set_a, set_b) >= threshold,
    * exact. `setCol` is an `array<string>`; elements are de-duplicated
    * here (Jaccard is over SETS). Rows with EMPTY sets are excluded
    * (Jaccard with an empty side is 0 for any non-empty other, and
    * empty-empty is taken as "no content, not a duplicate"). Note
    * [[shingleJoin]] never produces an empty set: an empty document
    * shingles to the singleton {""} (WordShingles' whole-list
    * fallback), so all-empty documents DO pair at Jaccard 1 — the
    * whitespace-invariant-dedup convention of [[DedupOps]].
    *
    * Output: id_a, id_b, jaccard (double in [threshold, 1]).
    */
  def joinPairs(docs: DataFrame, idCol: String, setCol: String,
      threshold: Double): DataFrame =
    joinPairsImpl(docs, idCol, setCol, threshold, positionalFilter = true)

  /** Candidate id pairs only (no verification) — the spec uses this to
    * measure the positional filter's candidate reduction. */
  private[graft] def candidatePairs(docs: DataFrame, idCol: String,
      setCol: String, threshold: Double,
      positionalFilter: Boolean): DataFrame = {
    val (cand, _) = candidatesAndSets(docs, idCol, setCol, threshold,
      positionalFilter)
    cand
  }

  private[graft] def joinPairsImpl(docs: DataFrame, idCol: String,
      setCol: String, threshold: Double,
      positionalFilter: Boolean): DataFrame = {
    val (cand, sets) = candidatesAndSets(docs, idCol, setCol, threshold,
      positionalFilter)
    // verification: join the sets back by id and keep pairs whose
    // exact Jaccard clears the threshold
    val sa = sets.select(col("__id").as("id_a"),
      col("__set").as("__sa"), col("__len").as("__la"))
    val sb = sets.select(col("__id").as("id_b"),
      col("__set").as("__sb"), col("__len").as("__lb"))
    val inter = size(array_intersect(col("__sa"), col("__sb")))
      .cast("double")
    val union = (col("__la") + col("__lb")).cast("double") - inter
    cand.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard", inter / union)
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Shared front half: materialized distinct-set frame + pruned
    * candidate id pairs. */
  private def candidatesAndSets(docs: DataFrame, idCol: String,
      setCol: String, threshold: Double, positionalFilter: Boolean)
      : (DataFrame, DataFrame) = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    val spark = docs.sparkSession

    // the distinct-set frame, materialized once per session per
    // (plan, file snapshot) — threshold-independent, so every
    // threshold reuses it. The cache key carries a hash of the
    // ANALYZED PLAN: unlike clusterMap (keyed on raw table columns),
    // callers hand us arbitrary derived frames (e.g. shingleJoin's
    // n-gram column), and two different derivations over the same
    // files must not collide. The CANONICALIZED plan, not the raw
    // analyzed plan: the raw toString embeds fresh expression IDs
    // (name#N) on every re-derivation, so the raw hash never repeats
    // and the cache never hits
    val planHash = java.security.MessageDigest.getInstance("MD5")
      .digest(docs.queryExecution.analyzed.canonicalized.toString
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val setsPath = graft.core.ModelCache.cached(docs,
      s"setsim-sets:$idCol:$setCol:$planHash") {
      graft.core.Scratch.materializeWithPath(
        docs.select(col(idCol).as("__id"),
            array_distinct(col(setCol)).as("__set"))
          .withColumn("__len", size(col("__set")))
          .filter(col("__len") > 0),
        "setsim_sets")._2
    }
    val sets = spark.read.parquet(setsPath)

    // global order: ascending document frequency, ties by token text —
    // deterministic, and rare tokens (small candidate lists) come first
    val dfq = sets
      .select(explode(col("__set")).as("__tok"))
      .groupBy(col("__tok")).agg(count(lit(1)).as("__df"))

    // probe prefix per doc: the len - ceil(t*len) + 1 smallest tokens
    // under the global order (overlap lower bound is ceil(t*len));
    // __rn (the token's position in the doc's globally-ordered set) is
    // kept for the positional filter below
    val probes = sets
      .select(col("__id"), col("__len"), explode(col("__set")).as("__tok"))
      .join(dfq, "__tok")
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("__id"))
          .orderBy(col("__df"), col("__tok"))))
      .filter(col("__rn") <=
        (col("__len") - ceil(lit(threshold) * col("__len")) + 1))
      .select(col("__id"), col("__len"), col("__tok"), col("__rn"))

    // candidate generation: equi-join the prefixes on token with the
    // length filter in the join condition; only (id pair, positions)
    // shuffle through the pair aggregation. Fully renamed per side:
    // the two inputs share a lineage, and distinct names keep the
    // equi-key explicit
    val a = probes.select(col("__id").as("id_a"),
      col("__len").as("len_a"), col("__tok").as("__tok_a"),
      col("__rn").as("__rn_a"))
    val b = probes.select(col("__id").as("id_b"),
      col("__len").as("len_b"), col("__tok").as("__tok_b"),
      col("__rn").as("__rn_b"))
    val matched = a.join(b,
        col("__tok_a") === col("__tok_b") && col("id_a") < col("id_b") &&
          col("len_b") >= ceil(lit(threshold) * col("len_a")) &&
          col("len_a") >= ceil(lit(threshold) * col("len_b")),
        "inner")

    // PPJoin positional filter (Xiao 2008 §3.2). Both sides are sorted
    // by the SAME global order, so a pair's matching tokens appear in
    // the same relative order on both sides: the FIRST match (min
    // position) is the same tuple for min(__rn_a) and min(__rn_b), and
    // at that tuple no common token precedes it in either prefix
    // (an earlier common token would itself be an earlier match). The
    // overlap is therefore bounded by 1 + min(|x|-i, |y|-j), while
    // Jaccard >= t requires overlap >= ceil(t/(1+t) * (|x|+|y|)) —
    // pairs whose bound can't reach it are pruned BEFORE the
    // verification join ever fetches their sets. Pure pruning: the
    // bound is an upper bound on the true overlap, so no qualifying
    // pair is dropped (property-tested against brute force).
    val grouped = matched
      .groupBy(col("id_a"), col("id_b"), col("len_a"), col("len_b"))
      .agg(min(col("__rn_a")).as("__i"), min(col("__rn_b")).as("__j"))
    val cand = (if (positionalFilter) {
      // keep iff ubound >= t/(1+t)*(la+lb), tested as
      // ubound*(1+t) >= t*(la+lb) with a conservative epsilon: float
      // rounding must only ever ADMIT a borderline pair (verification
      // discards it exactly), never prune one. ceil() here is a trap:
      // ceil(0.4/1.4 * 14) = 5 in doubles, pruning a true Jaccard-0.4
      // pair (caught by the brute-force property test).
      val ubound = (lit(1) +
        least(col("len_a") - col("__i"), col("len_b") - col("__j")))
        .cast("double")
      val required = lit(threshold) * (col("len_a") + col("len_b"))
      grouped.filter(ubound * lit(1.0 + threshold) >=
        required * lit(1.0 - 1e-12) - lit(1e-9))
    } else grouped)
      .select(col("id_a"), col("id_b"))
    (cand, sets)
  }

  /** [[joinPairs]] over word n-gram shingles of a text column — the
    * text-dedup form. Shingling matches [[DedupOps.shingles]] (and the
    * q26 oracle): lowercase, whitespace tokens, n-grams joined by a
    * single space, a sub-n-token doc contributing its whole token list
    * as one shingle. */
  def shingleJoin(docs: DataFrame, idCol: String, textCol: String,
      n: Int, threshold: Double): DataFrame =
    joinPairs(
      docs.withColumn("__sh", DedupOps.shingles(col(textCol), n)),
      idCol, "__sh", threshold)
}
