package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture apply: compact an (op, seq) change log to its
  * final state per key and merge it onto a base snapshot — the Delta
  * change-data-feed / Debezium-sink pattern for a path-addressed
  * lakehouse.
  *
  * Log semantics: per key, the HIGHEST-`seq` entry wins (ties broken
  * by preferring delete, then by op for determinism); a winning 'D'
  * removes the key, a winning 'I'/'U' upserts the payload.
  *
  * Scale shape: ONE shuffle of the log on key for the latest-wins
  * window (same single-exchange profile as `DedupLatest`), then an
  * outer join against the base on the same key — co-partitioned, so
  * AQE plans no extra exchange on the log side. The base is never
  * window-sorted; at 100 TB the log is typically ≪ the base and only
  * the log pays the compaction.
  */
object Cdc {

  /** @param base     current snapshot, unique on `keyCol`
    * @param log      change rows: keyCol, opCol ('I'|'U'|'D'), seqCol,
    *                 plus the payload columns to apply
    * @param payload  payload column names (same names in base and log)
    */
  def apply(base: DataFrame, log: DataFrame, keyCol: String,
      opCol: String, seqCol: String, payload: Seq[String]): DataFrame = {
    // latest change per key; delete outranks same-seq upserts so a
    // full-row tie is never resolved by arrival order
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc,
        when(col(opCol) === "D", 0).otherwise(1), col(opCol))
    val latest = log
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val deletes = latest.filter(col(opCol) === "D")
      .select(col(keyCol))
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(col(keyCol) +: payload.map(col): _*)
    base
      .join(deletes, Seq(keyCol), "left_anti")
      // a non-null match marker distinguishes "no upsert for this key"
      // from "upsert carrying a NULL payload value" — coalescing the
      // payload itself would silently resurrect the base row's stale
      // value whenever an update legitimately clears a column
      .join(upserts.select(Seq(col(keyCol).as("__k"),
          lit(true).as("__matched")) ++
          payload.map(c => col(c).as(s"__u_$c")): _*),
        col(keyCol) === col("__k"), "left")
      .select(col(keyCol) +: payload.map(c =>
        when(col("__matched").isNotNull, col(s"__u_$c"))
          .otherwise(col(c)).as(c)): _*)
      .unionByName(
        // inserts: upserted keys absent from the base
        upserts.join(base.select(col(keyCol)), Seq(keyCol), "left_anti"))
  }
}
