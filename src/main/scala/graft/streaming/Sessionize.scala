package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked streaming sessionization: events within `gap` of each
  * other (per key) merge into one session window; a session closes —
  * and emits exactly once, in append mode — when the watermark passes
  * its end. The batch twin of this aggregation is catalog query
  * q36_session_window; this is the streaming form, whose per-key state
  * is only the currently-open session (bounded by construction).
  */
object Sessionize {

  def sessions(events: DataFrame, key: String, tsCol: String,
      gap: String, delayThreshold: String): DataFrame =
    events.withWatermark(tsCol, delayThreshold)
      .groupBy(col(key), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col(key),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))
}
