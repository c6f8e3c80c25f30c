package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.SensorReading

/** Custom streaming state via `flatMapGroupsWithState` — the engine's
  * answer for semantics windows can't express (the reference has none,
  * SURVEY §2.9; this is the `KeyValueGroupedDataset` extension point
  * the streaming bullet of the design brief calls for).
  *
  * Implemented operator: per-pool anomaly-RUN detection — emit an alert
  * when `minRun` consecutive readings fall outside the pH alert band,
  * and emit a recovery marker when the run ends. Pure event-time
  * state machine; state size is O(pools), not O(readings).
  */
object StatefulOps {

  case class RunState(runLength: Int, runStart: Timestamp,
      lastTs: Timestamp, alerted: Boolean)

  case class AnomalyEvent(pool_id: Int, kind: String, // alert | recovery
      run_length: Int, run_start: Timestamp, event_ts: Timestamp)

  def detectAnomalyRuns(readings: Dataset[SensorReading],
      phLo: Double = 7.1, phHi: Double = 7.8, minRun: Int = 3)
      : Dataset[AnomalyEvent] = {
    implicit val stateEnc = Encoders.product[RunState]
    implicit val outEnc = Encoders.product[AnomalyEvent]
    import readings.sparkSession.implicits._

    def isAnomalous(r: SensorReading): Boolean =
      r.ph.exists(p => p < phLo || p > phHi)

    readings
      .groupByKey(_.pool_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(
        (poolId: Int, rows: Iterator[SensorReading],
            state: GroupState[RunState]) => {
          val sorted = rows.toSeq.sortBy(_.sensor_ts.getTime)
          var st = state.getOption.getOrElse(
            RunState(0, null, null, alerted = false))
          val out = Seq.newBuilder[AnomalyEvent]
          for (r <- sorted) {
            if (isAnomalous(r)) {
              val start = if (st.runLength == 0) r.sensor_ts
                          else st.runStart
              st = RunState(st.runLength + 1, start, r.sensor_ts,
                st.alerted)
              if (st.runLength == minRun && !st.alerted) {
                out += AnomalyEvent(poolId, "alert", st.runLength,
                  st.runStart, r.sensor_ts)
                st = st.copy(alerted = true)
              }
            } else {
              if (st.alerted)
                out += AnomalyEvent(poolId, "recovery", st.runLength,
                  st.runStart, r.sensor_ts)
              st = RunState(0, null, r.sensor_ts, alerted = false)
            }
          }
          state.update(st)
          out.result().iterator
        })
  }
}
