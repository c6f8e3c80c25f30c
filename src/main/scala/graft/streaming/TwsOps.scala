package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful streaming on the Spark 4 `transformWithState`
  * API (the successor of `mapGroupsWithState`, RocksDB-backed with
  * per-state TTL). Complements `StatefulOps` (anomaly runs on the old
  * API): this one keeps a per-key running (count, sum) and emits the
  * updated totals every micro-batch — the running-profile shape a
  * feature store maintains per entity.
  *
  * State is O(keys) regardless of stream length; a TTL can bound even
  * that for churning key spaces (pass `ttl`, backed by RocksDB native
  * TTL eviction rather than a timer per key). A non-NONE TTL runs the
  * query in ProcessingTime mode, where the no-data trigger keeps
  * scheduling empty micro-batches to advance the TTL clock — always-on
  * behavior production wants, but tests driving the query with
  * `processAllAvailable` must set
  * `spark.sql.streaming.noDataMicroBatches.enabled=false`.
  */
object TwsOps {

  case class RunningTotal(userId: Long, nEvents: Long, sumValue: Double)

  class RunningTotalProcessor(ttl: TTLConfig)
    extends StatefulProcessor[Long, (Long, Double), RunningTotal] {

    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode)
        : Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble), ttl)

    override def handleInputRows(key: Long,
        rows: Iterator[(Long, Double)], timerValues: TimerValues)
        : Iterator[RunningTotal] = {
      var (n, sum) =
        if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { case (_, v) => n += 1; sum += v }
      totals.update((n, sum))
      Iterator.single(RunningTotal(key, n, sum))
    }
  }

  /** (userId, value) stream → updated per-user running totals each
    * micro-batch. Requires the RocksDB state store provider (the
    * transformWithState backend):
    * `spark.sql.streaming.stateStore.providerClass=
    *  org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`
    */
  def runningTotals(events: Dataset[(Long, Double)],
      ttl: TTLConfig = TTLConfig.NONE): Dataset[RunningTotal] = {
    implicit val enc = Encoders.product[RunningTotal]
    // a non-NONE TTLConfig is only legal under TimeMode.ProcessingTime
    // (the state store rejects it at query start otherwise), so the
    // time mode follows the ttl
    val timeMode =
      if (ttl == TTLConfig.NONE) TimeMode.None()
      else TimeMode.ProcessingTime()
    events.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new RunningTotalProcessor(ttl),
        timeMode, OutputMode.Update(), enc)
  }
}
