package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4 `transformWithState` processor: running event count per key in
  * a `ValueState`. Emits the updated total each time the key sees rows, so
  * in Update output mode the latest row per key is the final count. Keyed
  * state lives in the state store (RocksDB provider), partitioned by the
  * shuffle — nothing driver-side, state size O(distinct keys).
  *
  * Top-level class: the processor is serialized to executors and must not
  * capture an enclosing instance.
  */
class RunningCount
  extends StatefulProcessor[Long, (java.sql.Timestamp, Long), (Long, Long)] {
  @transient private var countState: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    countState = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
      TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[(java.sql.Timestamp, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val c = (if (countState.exists()) countState.get() else 0L) + rows.size
    countState.update(c)
    Iterator((key, c))
  }
}
