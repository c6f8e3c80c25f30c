package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: match each left event with
  * right events for the same key arriving within `[left_ts, left_ts +
  * within]` — readings↔acknowledgements, orders↔payments, etc.
  *
  * Both sides carry a watermark and the join condition bounds event
  * time in BOTH directions, so Spark can size the join state exactly:
  * a left row is dropped from state once the right watermark passes
  * `left_ts + within`, a right row once the left watermark passes its
  * own timestamp. Without the time bound the state grows without limit
  * — the difference between a demo and something that survives a week
  * of 100 TB/day streams.
  */
object StreamStreamJoin {

  /** @param leftTs/rightTs  event-time columns (must be the watermark
    *                        columns of their streams)
    *  @param delayThreshold watermark lateness for BOTH sides
    *  @param within         max right_ts - left_ts to count as a match
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, delayThreshold: String,
      within: String): DataFrame = {
    val l = left.withWatermark(leftTs, delayThreshold).alias("l")
    val r = right.withWatermark(rightTs, delayThreshold).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"),
      "inner")
  }

  /** Left-outer variant of [[intervalJoin]]: a left event with no
    * matching right event inside the interval still emits — with the
    * right side NULL — once the right watermark passes `left_ts +
    * within` and Spark can prove no match can arrive. The monitoring
    * shape ("which readings were never acknowledged?"): the inner join
    * silently drops exactly the rows an alerting pipeline exists to
    * surface. Same two-sided time bound, so join state stays exactly
    * as bounded as the inner variant; the null-emission just waits for
    * the watermark proof.
    */
  def intervalJoinLeftOuter(left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      delayThreshold: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTs, delayThreshold).alias("l")
    val r = right.withWatermark(rightTs, delayThreshold).alias("r")
    l.join(r,
      col(s"l.$key") === col(s"r.$key") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $within"),
      "leftOuter")
  }
}
