package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (backward): attach to each left row the most recent right
  * row with `rightTime <= leftTime` for the same key (event-attribution /
  * point-in-time-correct feature lookup — absent from the reference and
  * from core Spark, SURVEY.md §2.4 note "No theta/range/as-of joins").
  *
  * Built the Spark-first way: NOT a range join (which would explode to a
  * pair per (left, candidate-right)) but a union + running `last(…,
  * ignoreNulls)` window — the classic distributed as-of formulation:
  *
  *   1. project both sides to a common shape, right rows carrying their
  *      payload in a struct, left rows carrying null;
  *   2. union and sort within each key by (time, side) — side orders
  *      right rows BEFORE left rows at equal timestamps, making the
  *      match inclusive (`>=`);
  *   3. running `last(payload, ignoreNulls = true)` hands every left row
  *      the latest preceding payload;
  *   4. keep left rows.
  *
  * Scale: exactly ONE hash shuffle on the key (the window), state is one
  * row per input row, no pair blowup regardless of how many right rows
  * precede a left row. At 100 TB this is shuffle-optimal; a skewed key
  * would need upstream salting (as anywhere).
  */
object AsofJoin {

  /** @param payload      right columns to attach (null when no match)
    * @param matchedTimeAs if set, also emit the matched right timestamp
    * @param tolerance    if set (e.g. "30 minutes"), matches older than
    *                     `leftTime - tolerance` are discarded (payload
    *                     nulled) — standard as-of tolerance semantics
    */
  def backward(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String],
      matchedTimeAs: Option[String] = None,
      tolerance: Option[String] = None): DataFrame =
    asof(left, right, leftKeys, rightKeys, leftTime, rightTime,
      payload, matchedTimeAs, tolerance, forward = false)

  /** Forward as-of: attach the EARLIEST right row with
    * `rightTime >= leftTime` — "next event after" attribution (time to
    * next purchase, next maintenance slot). The exact mirror of
    * [[backward]]: right rows sort AFTER left rows at equal timestamps
    * (inclusive `>=`) and a running `first(…, ignoreNulls)` over the
    * FOLLOWING frame hands each left row the nearest upcoming payload.
    * Same single-shuffle scale shape. */
  def forward(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String],
      matchedTimeAs: Option[String] = None,
      tolerance: Option[String] = None): DataFrame =
    asof(left, right, leftKeys, rightKeys, leftTime, rightTime,
      payload, matchedTimeAs, tolerance, forward = true)

  private def asof(
      left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String],
      matchedTimeAs: Option[String],
      tolerance: Option[String],
      forward: Boolean): DataFrame = {
    require(leftKeys.size == rightKeys.size, "key arity mismatch")

    // side ordering makes the match inclusive: backward wants right
    // rows BEFORE left at equal __t (so last() sees them), forward
    // wants them AFTER (so first() over the following frame does)
    val (rightSide, leftSide) = if (forward) (1, 0) else (0, 1)

    val r2 = right.select(
      rightKeys.zip(leftKeys).map { case (rk, lk) => col(rk).as(lk) } ++
        Seq(col(rightTime).as("__t"), lit(rightSide).as("__side"),
          struct(payload.map(col) :+ col(rightTime).as("__rt"): _*)
            .as("__match")): _*)
    val matchType = r2.schema("__match").dataType

    val l2 = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(leftSide))
      .withColumn("__match", lit(null).cast(matchType))

    // right rows lack the left's non-key columns: null-pad to union shape
    val padded = l2.columns.filterNot(r2.columns.contains)
      .foldLeft(r2)((df, c) =>
        df.withColumn(c, lit(null).cast(l2.schema(c).dataType)))
      .select(l2.columns.map(col).toIndexedSeq: _*)

    val base = Window.partitionBy(leftKeys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
    val (w, pick) =
      if (forward)
        (base.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("__match"), ignoreNulls = true))
      else
        (base.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("__match"), ignoreNulls = true))

    val attached = l2.unionByName(padded)
      .withColumn("__m", pick.over(w))
      .filter(col("__side") === leftSide)

    val bounded = tolerance match {
      case Some(tol) =>
        val ok =
          if (forward) col("__m.__rt") <= col("__t") + expr(s"INTERVAL $tol")
          else col("__m.__rt") >= col("__t") - expr(s"INTERVAL $tol")
        attached.withColumn("__m", when(ok, col("__m")))
      case None => attached
    }

    val withPayload = payload.foldLeft(bounded)(
      (df, p) => df.withColumn(p, col(s"__m.$p")))
    val withTs = matchedTimeAs match {
      case Some(name) => withPayload.withColumn(name, col("__m.__rt"))
      case None       => withPayload
    }
    withTs.drop("__t", "__side", "__match", "__m")
  }
}

/** Point-in-interval range join (events × validity windows; absent from
  * the reference and from core Spark's equi-join machinery).
  *
  * The naive plan for `point BETWEEN lo AND hi` is a
  * BroadcastNestedLoopJoin (or worse, CartesianProduct) — quadratic work
  * that dies at scale. This operator makes the join an EQUI join on a
  * time bucket: each interval is exploded to the buckets it covers, each
  * point maps to exactly one bucket, and the exact containment predicate
  * runs on the (small) bucket-matched set. With `bucketWidthSeconds` ≥
  * the typical interval width the explode factor is ~2, so the shuffle
  * volume is ~2·|intervals| + |points| — linear, hash-partitioned,
  * AQE-coalescible: the plan you want at 100 TB.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidthSeconds: Long): DataFrame = {
    val width = lit(bucketWidthSeconds)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(unix_timestamp(col(loCol)) / width).cast("long"),
        floor(unix_timestamp(col(hiCol)) / width).cast("long"))))
    val pts = points.withColumn("__bucket",
      floor(unix_timestamp(col(pointCol)) / width).cast("long"))
    pts.join(iv, Seq("__bucket"), "inner")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }
}
