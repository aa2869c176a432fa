package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream LEFT OUTER interval join
  * (`stream_interval_join_outer`): the NULL-click row for a
  * never-converted view is produced by state EVICTION — it must not
  * exist while the watermark sits inside the view's 30-minute window,
  * and must appear once the watermark passes the window end. The
  * MemoryStream drives the batch boundaries explicitly; the bounded
  * replay equality vs the batch left join is the second test.
  */
class IntervalOuterSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("the NULL row emits only AFTER the watermark passes the view's " +
    "window end — never while the window is still open") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val vm = MemoryStream[(Timestamp, Long)]
    val cm = MemoryStream[(Timestamp, Long)]
    val views = vm.toDF().toDF("v_ts", "v_user")
      .withWatermark("v_ts", "10 minutes")
    val clicks = cm.toDF().toDF("c_ts", "c_user")
      .withWatermark("c_ts", "10 minutes")
    val joined = views.join(clicks,
      col("v_user") === col("c_user") &&
        col("c_ts") >= col("v_ts") &&
        col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
      "left_outer")
    val q = joined.writeStream.format("memory").queryName("t_iv_outer")
      .outputMode("append").start()
    def out() = spark.table("t_iv_outer").collect()
      .map(r => (r.getLong(1), r.isNullAt(2)))
    try {
      // batch 1: user 1's view converts at 10:10; user 2's never does
      vm.addData((ts("2024-01-01 10:00:00"), 1L),
        (ts("2024-01-01 10:00:00"), 2L))
      cm.addData((ts("2024-01-01 10:10:00"), 1L))
      q.processAllAvailable()
      assert(!out().exists(_._2),
        "no NULL row may exist while the watermark is unset")
      // batch 2: both sides advance to 10:39 → watermark 10:29, still
      // INSIDE user 2's window (ends 10:30) — the NULL row must not
      // emit (the query watermark is the min across inputs, so both
      // sides advance)
      vm.addData((ts("2024-01-01 10:39:00"), 98L))
      cm.addData((ts("2024-01-01 10:39:00"), 99L))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(!out().exists(_._2),
        s"NULL row emitted with the watermark (10:29) still inside " +
          s"the window (ends 10:30): ${out().toSeq}")
      // batches 3+4: advance the watermark past 10:30 (to 11:20+) and
      // give the engine the follow-up batch that applies it — user 2's
      // NULL row must now exist, and user 1's match must stay a match
      vm.addData((ts("2024-01-01 11:30:00"), 97L))
      cm.addData((ts("2024-01-01 11:30:00"), 96L))
      q.processAllAvailable()
      vm.addData((ts("2024-01-01 11:31:00"), 95L))
      cm.addData((ts("2024-01-01 11:31:00"), 94L))
      q.processAllAvailable()
      val rows = out()
      assert(rows.contains((2L, true)),
        s"user 2's NULL row must emit once the watermark passed its " +
          s"window end: ${rows.toSeq}")
      assert(rows.contains((1L, false)) && !rows.contains((1L, true)),
        s"user 1 converted — match row only, no NULL row: ${rows.toSeq}")
    } finally q.stop()
  }

  test("bounded replay equals the full batch left join — the sentinel " +
    "closes every real view's window") {
    val got = q("stream_interval_join_outer").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val ev = Tables.events(spark, sf)
    def side(t: String, p: String) = ev.filter(col("event_type") === t)
      .select(col("event_id").as(s"${p}_id"),
        col("user_id").as(s"${p}_user"), col("ts").as(s"${p}_ts"))
    val batch = side("view", "v").join(side("click", "c"),
        col("v_user") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .groupBy(col("v_user").as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("c_id").isNull.cast("long")).as("n_orphans"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === batch)
    assert(batch.exists(_._3 > 0),
      "fixture must contain never-converted views or the outer " +
        "semantics are untested")
  }

  test("the FULL variant adds the click-orphan side and equals the " +
    "batch full join") {
    val got = q("stream_interval_join_full").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val ev = Tables.events(spark, sf)
    def side(t: String, p: String) = ev.filter(col("event_type") === t)
      .select(col("event_id").as(s"${p}_id"),
        col("user_id").as(s"${p}_user"), col("ts").as(s"${p}_ts"))
    val batch = side("view", "v").join(side("click", "c"),
        col("v_user") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 30 MINUTES"),
        "full_outer")
      .groupBy(coalesce(col("v_user"), col("c_user")).as("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("c_id").isNull.cast("long")).as("n_view_orphans"),
        sum(col("v_id").isNull.cast("long")).as("n_click_orphans"))
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === batch)
    assert(batch.exists(_._4 > 0),
      "fixture must contain clicks with no preceding view in-window " +
        "or the full-outer side is untested")
  }
}
