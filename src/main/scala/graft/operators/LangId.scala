package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CharNgrams

/** Trained character-n-gram language identification — Cavnar &
  * Trenkle 1994 ("N-Gram-Based Text Categorization"), the method
  * behind classic langid tools: a language's PROFILE is its top-m
  * character n-grams ranked by frequency; a document is classified to
  * the profile minimizing the OUT-OF-PLACE distance (Σ over the doc's
  * top-k grams of |doc_rank − profile_rank|, missing grams costing
  * m). Complements the stopword heuristic in
  * [[graft.functions.TextFunctions.langId]]: this one is TRAINED from
  * labeled data, so it extends to any language present in the training
  * set. Everything is integer ranks and integer sums — bit-identical
  * on any engine, which is what the q140 DuckDB oracle checks.
  *
  * Shape at scale:
  *  - training aggregates (lang, gram) counts — one map-side-combined
  *    shuffle over exploded n-grams; the ranked profile is langs×m
  *    rows, kilobyte-scale driver-free metadata kept as a DataFrame;
  *  - classification explodes each doc's n-grams (narrow), ranks its
  *    top-k per doc (window bounded by the doc's own grams), then
  *    meets the BROADCAST profile table; the per-(doc, lang) distance
  *    sum is one shuffle on doc id;
  *  - the doc×langs expansion is k·|langs| rows per doc — linear in
  *    corpus size with a small constant, never corpus×corpus.
  */
object LangId {

  /** Ranked profiles from labeled text: (lang, gram, rank), rank
    * 1..m by (count desc, gram asc) — the tie-break both engines
    * agree on. */
  def trainProfiles(labeled: DataFrame, langCol: String,
      textCol: String, n: Int = 3, m: Int = 100): DataFrame = {
    // train-once session artifact: the ranked profile table is
    // langs×m rows derived from a full corpus scan — materialize per
    // (training snapshot, params) so repeated classification runs
    // don't re-train (invalidated by plan + file snapshot)
    val path = graft.core.ModelCache.cached(labeled,
      s"langid:$langCol:$textCol:$n:$m") {
      val grams = labeled.select(col(langCol).as("lang"),
        explode(CharNgrams.column(lower(col(textCol)), n)).as("gram"))
      val counts = grams.groupBy(col("lang"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("cnt").desc, col("gram"))
      graft.core.Scratch.materializeWithPath(
        counts.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= m)
          .select(col("lang"), col("gram"), col("rank")),
        "langid_profiles")._2
    }
    labeled.sparkSession.read.parquet(path)
  }

  /** Classify each document against every profile language; returns
    * (idCol, lang_pred, distance) with ties broken to the smaller
    * language code. `m` must match the profile's m (it is the
    * out-of-place penalty for grams absent from a profile). */
  def classify(docs: DataFrame, idCol: String, textCol: String,
      profiles: DataFrame, n: Int = 3, k: Int = 50, m: Int = 100)
      : DataFrame = {
    val grams = docs.select(col(idCol),
      explode(CharNgrams.column(lower(col(textCol)), n)).as("gram"))
    val counts = grams.groupBy(col(idCol), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cnt").desc, col("gram"))
    val docTop = counts.withColumn("doc_rank", row_number().over(w))
      .filter(col("doc_rank") <= k)
      .select(col(idCol), col("gram"), col("doc_rank"))

    val langs = profiles.select(col("lang")).distinct()
    // every doc gram scores against every candidate language; a gram
    // missing from that language's profile costs the max penalty m
    val scored = docTop.crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("lang", "gram"), "left")
      .select(col(idCol), col("lang"),
        coalesce(abs(col("doc_rank") - col("rank")), lit(m.toLong))
          .as("oop"))
    val dist = scored.groupBy(col(idCol), col("lang"))
      .agg(sum(col("oop")).as("distance"))
    dist.groupBy(col(idCol))
      .agg(min(struct(col("distance"), col("lang"))).as("best"))
      .select(col(idCol), col("best.lang").as("lang_pred"),
        col("best.distance").as("distance"))
  }
}
