package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-domain document quota — curation's "no single domain dominates
  * the corpus" gate. Keeps at most `k` docs per domain, chosen by a
  * DETERMINISTIC hash order (not arrival order, which varies with
  * partitioning; not `rand()`, which varies run to run), so the capped
  * corpus is reproducible from (seed, ids) alone.
  *
  * Scale shape: the obvious `row_number().over(partitionBy(domain))`
  * shuffles and sorts the ENTIRE corpus — at 100 TB you'd sort
  * everything to keep 0.1%. This uses the bounded-heap
  * [[graft.functions.TopKByScore]] aggregate instead: O(k) state per
  * domain, map-side partials, so only domains×k rows cross the
  * exchange.
  */
object DomainCap {

  /** (domainCol, idCol, rn) for the kept docs — rn ∈ [1, k] in hash
    * order. Join back on idCol to materialize the capped corpus. */
  def cap(df: DataFrame, idCol: String, domainCol: String, k: Int,
      seed: String): DataFrame = {
    graft.functions.TopKByScore.requireIntegralId(df, idCol,
      "DomainCap.cap")
    graft.functions.TopKByScore.explodeTopK(
        df.withColumn("__score",
          -Splits.bucket256(col(idCol), seed).cast("double")),
        Seq(domainCol), col("__score"), col(idCol).cast("long"), k,
        outId = idCol, outScore = "__score")
      .select(col(domainCol), col(idCol), col("rn"))
  }
}
