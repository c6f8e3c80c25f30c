package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history built from an event log:
  * collapse each key's consecutive runs of an identical attribute value
  * into validity intervals `[valid_from, valid_to)`, the last run per
  * key open-ended (`is_current`).
  *
  * Scale shape: every stage — both windows and the run aggregation —
  * partitions by the key, so the plan pays ONE hash shuffle and reuses
  * that partitioning throughout; state per key is a single lag value.
  * This is the batch construction of the MERGE-maintained silver
  * dimension in the reference (03_silver_smartpool.py:29-43), derived
  * from full history instead of incrementally.
  */
object Scd2 {

  /** @param tieCol deterministic tie-break for equal timestamps
    *                (an event id); ordering must be total or run
    *                boundaries are ambiguous.
    */
  def fromEventLog(events: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, tieCol: String): DataFrame = {
    val byTs = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tieCol))
    val runs = events
      // null-safe change test: a NULL attribute value is a real state
      // (value → NULL → value is three runs, NULL → NULL is one run);
      // the plain =!= comparison evaluates to NULL against a NULL side
      // and silently merged those transitions into the preceding run.
      // The explicit first-row test replaces lag().isNull, which could
      // not distinguish "no previous row" from "previous attr is NULL"
      .withColumn("__chg",
        when(row_number().over(byTs) === 1
          || !(lag(col(attrCol), 1).over(byTs) <=> col(attrCol)), 1L)
          .otherwise(0L))
      .withColumn("__run", sum(col("__chg"))
        .over(byTs.rowsBetween(Window.unboundedPreceding, 0)))
    val collapsed = runs.groupBy(col(keyCol), col("__run"))
      .agg(min(col(attrCol)).as(attrCol), // constant within a run
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_events"))
    // __run in the ordering: adjacent runs can share a valid_from when
    // timestamps tie across a boundary, and run ids are already total
    val byFrom = Window.partitionBy(col(keyCol))
      .orderBy(col("valid_from"), col("__run"))
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byFrom))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__run")
  }
}
