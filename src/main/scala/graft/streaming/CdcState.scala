package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming CDC materialized-view maintenance on `transformWithState` —
  * the live twin of the batch `q_cdc_apply` compaction: per-key
  * last-writer-wins state under the (tus, event_id) total order, plus the
  * per-key change count, held in a typed ValueState (RocksDB column
  * family) and updated as change-log micro-batches arrive. Tombstone
  * filtering stays OUTSIDE the processor (a tombstoned key must keep its
  * state — a later upsert resurrects it), exactly as the batch form
  * filters after aggregation.
  *
  * Input: (user_id, tus, event_id, event_type, value). Emission per batch
  * is the key's current (last_tus, last_eid, last_type, last_value,
  * n_changes) — Update-mode semantics; n_changes strictly increases, so
  * the latest emission per key is the final view.
  */
class CdcState extends StatefulProcessor[
    Long, (Long, Long, Long, String, Double), (Long, Long, Long, String, Double, Long)] {

  @transient private var st: ValueState[(Long, Long, String, Double, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, String, Double, Long)](
      "last",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.STRING,
        Encoders.scalaDouble, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long, String, Double)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, String, Double, Long)] = {
    var (bTus, bEid, bType, bVal, n) =
      if (st.exists()) st.get() else (Long.MinValue, Long.MinValue, "", 0.0, 0L)
    rows.foreach { case (_, tus, eid, tpe, v) =>
      n += 1
      if (tus > bTus || (tus == bTus && eid > bEid)) {
        bTus = tus; bEid = eid; bType = tpe; bVal = v
      }
    }
    st.update((bTus, bEid, bType, bVal, n))
    Iterator.single((key, bTus, bEid, bType, bVal, n))
  }
}
