package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Open session carried across micro-batches by [[Sessionize.byStateStreaming]]. */
case class OpenSession(startUs: Long, lastUs: Long, n: Long)

/** Sessionization: group a per-key event timeline into sessions separated
  * by a silence gap. Two equivalent implementations:
  *
  *  - [[byWindow]]: Spark's `session_window` aggregate — the declarative
  *    form, usable in batch and streaming alike;
  *  - [[byState]]: `flatMapGroupsWithState` — the arbitrary-state form, for
  *    session logic session_window can't express (custom close conditions,
  *    per-session payloads). BATCH execution only as written: the
  *    GroupState is deliberately unused because a batch group sees all its
  *    events at once; an incremental streaming variant must carry the open
  *    session in state and close it via timeout (the streaming-native
  *    session path is [[byWindow]], which works in both modes).
  *
  * Both emit (key, session_start, n_events).
  */
object Sessionize {

  def byWindow(df: DataFrame, key: Column, ts: Column,
      gap: String): DataFrame =
    df.groupBy(session_window(ts, gap), key.as("key"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("key"), col("session_window.start").as("session_start"),
        col("n_events"))

  def byState(spark: SparkSession, df: DataFrame, key: Column, ts: Column,
      gapMicros: Long): DataFrame = {
    import spark.implicits._
    val ev = df.select(key.cast("long").as("k"), unix_micros(ts).as("us"))
      .as[(Long, Long)]
    ev.groupByKey(_._1)
      .flatMapGroupsWithState[Int, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: Long, it: Iterator[(Long, Long)], _: GroupState[Int]) =>
          val sorted = it.map(_._2).toArray.sorted
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          var start = sorted.head
          var prev = sorted.head
          var n = 0L
          for (t <- sorted) {
            if (t - prev > gapMicros) {
              out += ((k, start, n)); start = t; n = 0L
            }
            n += 1
            prev = t
          }
          out += ((k, start, n))
          out.iterator
      }
      .toDF("key", "start_us", "n_events")
      .select(col("key"), timestamp_micros(col("start_us")).as("session_start"),
        col("n_events"))
  }

  /** The incremental STREAMING form of [[byState]]: the open session lives
    * in `GroupState` across micro-batches; a session is emitted when a
    * same-batch gap closes it, or when the event-time timeout fires (the
    * watermark passed last-event + gap — i.e. no event can extend it any
    * more). Input must be a streaming Dataset with a watermark already set
    * on `ts`. State per key is one [[OpenSession]] — bounded.
    */
  def byStateStreaming(spark: SparkSession, df: DataFrame, key: Column,
      ts: Column, gapMicros: Long): DataFrame = {
    import spark.implicits._
    val ev = df.select(key.cast("long").as("k"), ts.as("ts"))
      .as[(Long, java.sql.Timestamp)]
    val sessions = ev.groupByKey(_._1)
      .flatMapGroupsWithState[OpenSession, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (k: Long, it: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs + gap: nothing can extend this session
            val s = state.get
            state.remove()
            Iterator((k, s.startUs, s.n))
          } else {
            // full micros (getTime is millis; getNanos carries the rest) —
            // must agree with the batch twin's unix_micros
            val batch = it.map(e =>
              e._2.getTime * 1000L + (e._2.getNanos / 1000L) % 1000L)
              .toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
            var open = state.getOption
            for (t <- batch) {
              open = open match {
                case Some(s) if t - s.lastUs <= gapMicros =>
                  // an out-of-order (within-watermark) event may predate the
                  // open session's start — extend backwards, not just forwards
                  Some(OpenSession(math.min(s.startUs, t),
                    math.max(s.lastUs, t), s.n + 1))
                case Some(s) => // gap observed within the data → close
                  out += ((k, s.startUs, s.n))
                  Some(OpenSession(t, t, 1))
                case None => Some(OpenSession(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastUs / 1000 + gapMicros / 1000)
            }
            out.iterator
          }
      }
    sessions.toDF("key", "start_us", "n_events")
      .select(col("key"), timestamp_micros(col("start_us")).as("session_start"),
        col("n_events"))
  }
}
