package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the "small-but-not-broadcastable dim"
  * pattern. When the dim side of a join is too large to broadcast as a
  * hash relation but its KEY SET still fits a few-MB sketch, build a
  * bloom filter over the dim keys, broadcast the sketch, and filter the
  * fact side AT THE SCAN, before the join exchange. At 100 TB the win
  * is shuffle bytes: a selective dim prunes most fact rows pre-shuffle,
  * so the exchange carries only (candidate) matches plus the sketch's
  * false-positive rate. The real join afterwards keeps the result
  * exact.
  *
  * (Spark's AQE can inject runtime bloom filters for some shapes —
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` — but only when a
  * selective filter is visible in the dim subtree at planning time;
  * this operator is the explicit, always-available form.)
  */
object BloomJoin {

  /** `fact` rows whose `factKey` (bigint) probably appears in
    * `dim.dimKey` — exact up to bloom false positives. The dim key set
    * is aggregated into a sketch DISTRIBUTED-then-merged (Spark's
    * `stat.bloomFilter` runs as a tree aggregation, the driver only
    * holds the final few-MB sketch), then broadcast.
    */
  def prunedFact(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.01): DataFrame = {
    // both keys must ALREADY be integral: the sketch hashes the dim
    // key's native representation and the probe uses mightContainLong,
    // so a silent cast (e.g. a string dim key) would insert one
    // representation and probe another — every probe misses and the
    // "no false negatives" contract breaks without an error
    def requireIntegral(df: DataFrame, c: String): Unit = {
      val dt = df.schema(c).dataType
      require(Seq("bigint", "int", "smallint", "tinyint")
          .contains(dt.simpleString),
        s"bloom join keys must be integral; $c is ${dt.simpleString}")
    }
    requireIntegral(fact, factKey)
    requireIntegral(dim, dimKey)
    val keys = dim.select(col(dimKey).cast("long").as(dimKey)).na.drop()
    // expectedNumItems sizes the sketch; the dim is small by contract,
    // so the count is a cheap action (and exact sizing beats guessing:
    // an undersized sketch degrades to all-pass, silently unpruned)
    val n = math.max(keys.count(), 1L)
    val bf = keys.stat.bloomFilter(dimKey, n, fpp)
    val bcast = fact.sparkSession.sparkContext.broadcast(bf)
    fact.filter(graft.functions.BloomMightContain.column(
      col(factKey).cast("long"), bcast))
  }

  /** Inner equi-join with bloom pre-pruning of the fact side. Result is
    * IDENTICAL to the plain `factKey === dimKey` join — false positives
    * are removed by the join itself. Dataset-qualified columns, so
    * same-named keys on both sides resolve. */
  def join(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, fpp: Double = 0.01): DataFrame = {
    val pruned = prunedFact(fact, factKey, dim, dimKey, fpp)
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }

}
