package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode}

/** The RocksDB sizing notes on `stream_transform_with_state`
  * (StreamingOps.scala) as an executable contract instead of prose: an
  * INFLATED key count (50k — two orders over the sf key spaces) run under
  * the bounded-memory config must (a) hold exactly one state row per
  * distinct key, (b) not grow state on re-keyed batches (updates, not
  * inserts), and (c) keep state bytes/key inside the documented envelope
  * (8 B key + long value + ~50-100 B RocksDB per-entry overhead — we
  * allow a generous 1 KiB/key ceiling to stay robust to block/index
  * amortization at this small scale, which still catches a
  * key-duplication or full-copy-per-batch regression by an order of
  * magnitude).
  */
class StateStoreSpec extends SparkSpec {

  test("RocksDB state growth: 50k keys under bounded-memory config — one " +
    "row per key, re-keyed batch updates without growth, bytes/key in " +
    "envelope") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val keys = 50000
    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      // the fleet-wide residency bound the sizing notes prescribe: one
      // shared block-cache/memtable budget instead of per-store sizing
      "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage" -> "true",
      "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB" -> "256",
      "spark.sql.shuffle.partitions" -> "8")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val mem = MemoryStream[(Timestamp, Long)]
      val out = mem.toDS()
        .groupByKey(_._2)
        .transformWithState(new streaming.RunningCount, TimeMode.None(),
          OutputMode.Update())
        .toDF("user_id", "cnt")
      val q = out.writeStream.format("memory").queryName("t_state_growth")
        .outputMode("update").start()
      try {
        val t = Timestamp.valueOf("2024-01-01 10:00:00")
        mem.addData((0 until keys).map(i => (t, i.toLong)): _*)
        q.processAllAvailable()
        // second batch touches 20% of the keys AGAIN: state must update
        // in place, not grow
        mem.addData((0 until keys / 5).map(i => (t, i.toLong)): _*)
        q.processAllAvailable()
        val progress = q.recentProgress.filter(_.stateOperators.nonEmpty)
        assert(progress.nonEmpty, "no stateful progress reported")
        val last = progress.last.stateOperators(0)
        assert(spark.conf.get(
          "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage")
          === "true")
        // RocksDB provider really active (its custom metrics exist)
        val cm = last.customMetrics
        assert(!cm.isEmpty && cm.keySet().toArray.exists(
          _.toString.startsWith("rocksdb")),
          s"RocksDB metrics absent: ${cm.keySet()}")
        // one state row per distinct key, across both batches
        assert(last.numRowsTotal === keys.toLong,
          s"state rows ${last.numRowsTotal} != $keys keys")
        // the re-keyed batch was an update, not growth
        assert(last.numRowsUpdated === (keys / 5).toLong,
          s"batch-2 updates ${last.numRowsUpdated}")
        // bytes/key envelope: key(8) + long value + per-entry overhead.
        // memoryUsedBytes for RocksDB = SST + in-memory usage; assert
        // order-of-magnitude, not exact constants
        val bytes = math.max(last.memoryUsedBytes,
          Option(cm.get("rocksdbSstFileSize")).map(_.longValue).getOrElse(0L))
        assert(bytes > 0, "state store reports zero bytes")
        val perKey = bytes.toDouble / keys
        assert(perKey <= 1024.0,
          s"state bytes/key $perKey outside the documented envelope " +
            s"(total $bytes for $keys keys)")
      } finally q.stop()
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
