package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding.dround

/** Batch gap-based sessionization: the classic lag → new-session flag →
  * running-sum session id, then one aggregate per session.
  *
  * This is the batch twin of the streaming `session_window` path
  * (Queries q36) and of the stateful sessionizer in
  * `streaming/SessionizeShard` — same session semantics, expressed as
  * two window passes over the SAME (user) partitioning: Spark plans ONE
  * Exchange on `userCol` and runs both lag and running-sum in a single
  * sort within each partition. The per-session aggregate then shuffles
  * (user, session) — already co-partitioned by user, so AQE keeps it
  * local-ish; at 100 TB nothing here is corpus-wide, all state is
  * per-user.
  */
object Sessionize {

  /** Sessions split when the gap to the previous event exceeds
    * `gapSec`. `tieCol` breaks equal-timestamp ordering so the
    * session ids are deterministic across engines.
    */
  def byGap(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, valueCol: String, gapSec: Long): DataFrame = {
    val order = Seq(col(tsCol), col(tieCol))
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull ||
      unix_micros(col(tsCol)) - unix_micros(prev) > gapSec * 1000000L, 1L)
      .otherwise(0L)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__new", newSession)
      .withColumn("session_id", sum(col("__new")).over(wRun))
      .groupBy(col(userCol), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        dround((unix_micros(max(col(tsCol))) -
          unix_micros(min(col(tsCol)))).cast("double") / 1e6, 3)
          .as("duration_sec"),
        dround(sum(col(valueCol)), 2).as("sum_value"))
  }
}
