package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Multi-source union and throttled-backfill streaming queries: equality
  * to the batch ground truth, proof that both sources actually feed the
  * union, and proof that the rate limit really splits the replay into
  * multiple micro-batches without changing a single output row.
  */
class StreamingMoreSpec extends SparkSpec {

  private def batchHourly = Tables.events(spark, sf)
    .groupBy(date_trunc("hour", col("ts")).as("ws"), col("event_type"))
    .agg(count(lit(1)).as("cnt"))
    .orderBy("ws", "event_type")

  test("stream_union_sources: the two-source union reproduces the batch " +
    "hourly counts exactly, with every event type present") {
    val got = q("stream_union_sources").collect()
    assert(got.toSeq === batchHourly.collect().toSeq)
    val types = got.map(_.getString(1)).toSet
    // both slices contributed: clickstream types AND transaction types
    assert(Set("click", "view").subsetOf(types))
    assert(Set("purchase", "signup", "error").subsetOf(types))
  }

  test("stream_late_data_drop: the late file is REALLY in the source " +
    "(batch read inflates the first hour) but the stream drops it whole") {
    val got = q("stream_late_data_drop").collect()
    assert(got.toSeq === batchHourly.collect().toSeq)
    // negative control: reading the staged source as a BATCH (no
    // watermark semantics) double-counts the first hour — so equality
    // above proves the streaming aggregation actively dropped rows, not
    // that the fixture was trivial
    val src = graft.Staging.dir("graft_stream_late_src", sf)
    val raw = spark.read.parquet(src)
      .filter(col("event_type") =!= "__graft_wm__")
    val firstHour = Tables.events(spark, sf)
      .agg(date_trunc("hour", min(col("ts")))).collect()(0).getTimestamp(0)
    val batchFirstHour = raw
      .filter(date_trunc("hour", col("ts")) === firstHour).count()
    val streamFirstHour = got
      .filter(_.getTimestamp(0) === firstHour).map(_.getLong(2)).sum
    assert(batchFirstHour === 2 * streamFirstHour,
      s"late fixture should double the first hour: " +
        s"$batchFirstHour vs $streamFirstHour")
  }

  test("stream_rate_limited: maxFilesPerTrigger splits the AvailableNow " +
    "replay into multiple micro-batches, and the result is identical") {
    assert(q("stream_rate_limited").collect().toSeq ===
      batchHourly.collect().toSeq)
    // progress proof on a manually driven twin (queries() hides the
    // StreamingQuery handle), over the SAME wm8 source the shipped query
    // streams — staged above by the q() call at a forced 8-file layout:
    // 2 files per trigger → >= 3 batches with rows (plus possibly an
    // empty finalizing batch).
    val src = graft.streaming.StreamingOps.stage(spark, sf, "wm8")
    val stream = spark.readStream
      .schema(Tables.events(spark, sf).schema)
      .option("maxFilesPerTrigger", "2")
      .parquet(src)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val query = stream.writeStream.format("memory")
      .queryName("graft_stream_rate_probe").outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    query.awaitTermination()
    val nBatches = query.recentProgress.count(_.numInputRows > 0)
    assert(nBatches >= 3, s"expected a throttled multi-batch replay, " +
      s"got $nBatches batches with input")
  }
}
