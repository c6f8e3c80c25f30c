package graft.batch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.DedupOps

/** End-to-end training-data curation: the pipeline a 100 TB pretraining
  * corpus runs before tokenization. Stages compose the engine's text
  * and dedup operators:
  *
  *   1. annotate — token counts, quality score, language ID,
  *      fingerprint (one scan, all codegen'd expressions)
  *   2. exact dedup — keep the smallest doc_id per content hash
  *      (16-byte digests shuffle, never text)
  *   3. near-dup flag — MinHash-LSH pair detection; the higher doc_id
  *      of each confirmed pair is dropped
  *   4. filter — length / quality / language gates
  *
  * Everything is per-doc or digest-keyed: no stage shuffles document
  * bodies except the final projection's storage write.
  */
object CurationJob {

  def annotate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs
      .withColumn("n_tokens",
        TextFunctions.tokenCount(col(textCol)).cast("long"))
      .withColumn("n_units",
        TextFunctions.bpeishCount(col(textCol)).cast("long"))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextFunctions.langId(col(textCol)))
      .withColumn("fp", TextFunctions.fingerprint(col(textCol)))

  /** ids to DROP because a near-duplicate with a smaller id exists. */
  def nearDupDrops(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    DedupOps.minhashNearDups(docs, idCol, textCol,
      threshold = threshold)
      .select(col("id_b").as(idCol)).distinct()

  /** v2 pipeline: v1's stages plus the two gates a pretraining corpus
    * adds before tokenization — benchmark decontamination (drop docs
    * sharing more than `maxContamRatio` of their n-grams with the
    * quarantined eval set) and the Gopher-style repetition gate (drop
    * docs whose duplicate-trigram fraction exceeds `maxDupTrigram`).
    * Same scale contract as v1: the new stages add one broadcast of
    * bench n-gram hashes and one narrow expression — no new shuffle of
    * document text.
    */
  def curateV2(docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, minTokens: Long = 10,
      minQuality: Double = 0.05, nearDupThreshold: Double = 0.95,
      maxContamRatio: Double = 0.05, maxDupTrigram: Double = 0.2)
      : DataFrame = {
    val contamDrops = graft.operators.Decontam
      .contaminationReport(docs, bench, idCol, textCol, n = 3)
      .filter(col("contamination_ratio") > maxContamRatio)
      .select(col(idCol))
    curate(docs, idCol, textCol, minTokens, minQuality, Nil,
      nearDupThreshold)
      .join(contamDrops, Seq(idCol), "left_anti")
      .withColumn("dup_trigram_frac", graft.functions.Rounding.dround(
        TextFunctions.dupNgramFrac(col(textCol), 3), 4))
      .filter(col("dup_trigram_frac") <= maxDupTrigram)
      .select(col(idCol), col("n_tokens"), col("n_units"),
        col("quality"), col("dup_trigram_frac"))
  }

  def curate(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minTokens: Long = 10,
      minQuality: Double = 0.05, keepLangs: Seq[String] = Nil,
      nearDupThreshold: Double = 0.9): DataFrame = {
    val annotated = annotate(docs, idCol, textCol)
    val keepers = DedupOps.exactDedup(docs, idCol, textCol)
      .select(col(idCol))
    val dropIds = nearDupDrops(docs, idCol, textCol, nearDupThreshold)
    val langGate: Column =
      if (keepLangs.isEmpty) lit(true)
      else col("lang_pred").isin(keepLangs: _*)
    annotated
      .join(keepers, Seq(idCol), "left_semi")  // exact-dup keeper set
      .join(dropIds, Seq(idCol), "left_anti")  // near-dup losers out
      .filter(col("n_tokens") >= minTokens &&
        col("quality") >= minQuality && langGate)
  }
}
