package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Static corpus mixing: downsample each source so the surviving
  * corpus hits a target token-share distribution — the data-mixing
  * step between curation and training (cf. fixed mixture weights in
  * published pretraining recipes).
  *
  * Only downsampling is possible, so the realized corpus is the
  * largest T feasible under every target: `T = min_s tokens_s /
  * share_s`; source s then keeps `share_s · T / tokens_s` of its
  * tokens (the binding source keeps everything). Sampling is the
  * md5-keyed deterministic filter of [[DeterministicSample]] quantized
  * to 1/65536ths, so reruns, repartitions, and external SQL audits
  * all select the identical document set.
  *
  * Scale shape: token totals are a |sources|-row aggregate; the
  * feasible-T and per-source rates stay in-plan (single-row broadcast,
  * same pattern as TfIdf's corpus-size attach — no driver collect);
  * the corpus side is a broadcast join + narrow filter, never
  * shuffled. Sources absent from `targets` are dropped.
  */
object CorpusMix {

  def mixToTokenTargets(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0))
    val targetMap = map(targets.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val withTok = docs.select(col(idCol), col(sourceCol),
      TextFunctions.tokenCount(col(textCol)).cast("double").as("__ntok"))
    val stats = withTok.groupBy(col(sourceCol))
      .agg(sum(col("__ntok")).as("__toks"))
      .withColumn("__share", try_element_at(targetMap, col(sourceCol)))
      .filter(col("__share").isNotNull)
    val feasible = stats.agg(min(col("__toks") / col("__share")).as("__T"))
    val rates = stats.crossJoin(broadcast(feasible))
      .select(col(sourceCol),
        least(lit(1.0), col("__share") * col("__T") / col("__toks"))
          .as("__rate"))
      // 4 lowercase hex chars compare correctly against the md5 prefix;
      // rate 1.0 → "zzzz", which every hex prefix sorts below (the same
      // guard as DeterministicSample.thresholdHex)
      .withColumn("__thresh", when(col("__rate") >= 1.0, lit("zzzz"))
        .otherwise(lower(lpad(conv(
          floor(col("__rate") * 65536).cast("long").cast("string"),
          10, 16), 4, "0"))))
    withTok.join(broadcast(rates), Seq(sourceCol))
      .filter(substring(md5(col(idCol).cast("string")), 1, 4)
        < col("__thresh"))
      .select(col(idCol), col(sourceCol),
        col("__ntok").cast("long").as("n_tokens"))
  }

  /** Temperature UP-sampling — the other half of mixture building:
    * high-quality sources are repeated `factor > 1` times in the
    * training corpus (epochs-per-source in published pretraining
    * recipes). Whole copies are exact; the fractional remainder is a
    * deterministic per-doc coin — [[Splits.bucket256]] against
    * `round(frac·256)` — so the realized rate is reproducible from
    * (seed, ids) alone, with no run-to-run variance. Emits one row per
    * (doc, copy_idx). Narrow plan: a literal-map lookup and an
    * explode — no shuffle, no state; factors quantize to 1/256ths.
    */
  def upsample(docs: DataFrame, idCol: String, sourceCol: String,
      factors: Map[String, Double], seed: String = "upsample")
      : DataFrame = {
    require(factors.values.forall(_ >= 0))
    val f = factors.foldLeft(lit(1.0)) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    val whole = floor(f).cast("int")
    val fracGate = round((f - floor(f)) * 256, 0).cast("int")
    val extra =
      when(Splits.bucket256(col(idCol), seed) < fracGate, 1).otherwise(0)
    docs.withColumn("n_copies", whole + extra)
      .filter(col("n_copies") > 0)
      .select(col(idCol), col(sourceCol),
        explode(sequence(lit(1), col("n_copies"))).as("copy_idx"))
  }
}
