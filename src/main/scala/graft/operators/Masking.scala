package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Denoising-objective corruption for LLM pretraining (T5-style):
  * deterministically mask a fraction of each document's tokens and
  * emit (corrupted input, target tokens) pairs.
  *
  * The mask decision for token i of doc d is a pure function of
  * `md5(seed:d:i)` — reproducible across runs, partitionings, and
  * engines (the [[graft.ops.DeterministicSample]] convention), so the
  * corruption is auditable from SQL and a re-run regenerates byte-
  * identical training pairs. Everything is per-row `transform`/
  * `filter` higher-order expressions: zero shuffle, stays inside
  * WholeStageCodegen.
  */
object Masking {

  /** @param threshold256 mask rate in 256ths (e.g. 42 ≈ 16.4 %) */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
      seed: String, threshold256: Int, sentinel: String = "<X>")
      : DataFrame = {
    require(threshold256 >= 0 && threshold256 <= 256,
      "threshold256 in [0,256]")
    val thresholdHex = if (threshold256 >= 256) "zz"
      else f"$threshold256%02x"
    def masked(i: Column): Column =
      substring(md5(concat(lit(s"$seed:"), col(idCol).cast("string"),
        lit(":"), i.cast("string"))), 1, 2) < lit(thresholdHex)
    docs
      .withColumn("__toks", TextFunctions.tokens(col(textCol)))
      .filter(size(col("__toks")) > 0)
      // masked-token-or-null, in position order (basis for targets)
      .withColumn("__hits",
        transform(col("__toks"), (t, i) => when(masked(i), t)))
      .select(col(idCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(filter(col("__hits"), h => h.isNotNull)).cast("long")
          .as("n_masked"),
        array_join(transform(col("__toks"),
          (t, i) => when(masked(i), lit(sentinel)).otherwise(t)), " ")
          .as("masked_text"),
        array_join(filter(col("__hits"), h => h.isNotNull), " ")
          .as("targets"))
  }
}
