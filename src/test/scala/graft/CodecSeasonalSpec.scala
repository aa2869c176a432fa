package graft

import org.apache.spark.sql.functions._

/** Batch-17 additions: MI invariants, seasonal-index normalization, gzip
  * round-trip file layout, and the codec size direction the oracle
  * deliberately leaves out.
  */
class CodecSeasonalSpec extends SparkSpec {

  test("agg_mutual_info is non-negative and bounded by the smaller " +
    "marginal entropy") {
    val Array(row) = q("agg_mutual_info").collect()
    val mi = row.getDouble(0)
    assert(mi >= -1e-12, s"negative MI: $mi")
    val ev = Tables.events(spark, sf)
    def entropy(c: org.apache.spark.sql.Column): Double = {
      val counts = ev.groupBy(c.as("k")).count().collect()
        .map(_.getLong(1).toDouble)
      val n = counts.sum
      -counts.map(x => x / n * math.log(x / n)).sum
    }
    val hx = entropy(col("event_type"))
    val hy = entropy(dayofmonth(col("ts")) % 7)
    assert(mi <= math.min(hx, hy) + 1e-9, s"MI $mi exceeds min($hx, $hy)")
  }

  test("resample_seasonal_index: per-type indices average to 1 over the " +
    "buckets and bucket_avg recomputes") {
    val rows = q("resample_seasonal_index").collect()
    rows.groupBy(_.getString(0)).foreach { case (t, grp) =>
      val mean = grp.map(_.getDouble(3)).sum / grp.length
      assert(math.abs(mean - 1.0) < 0.01, s"$t indices mean $mean")
    }
  }

  test("scan_csv_gzip reads .gz part files (codec actually engaged) and " +
    "round-trips the table") {
    q("scan_csv_gzip").collect() // stages
    val dir = new java.io.File(
      graft.Staging.dir("graft_phys_events_csvgz", sf))
    val gz = dir.listFiles().filter(_.getName.endsWith(".csv.gz"))
    assert(gz.length === 4, s"expected 4 gz files, got ${gz.length}")
    val got = q("scan_csv_gzip").collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val expect = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === expect)
  }

  test("sink_compression_codecs: both codecs conserve rows and zstd " +
    "compresses at least as well as snappy here") {
    val rows = q("sink_compression_codecs").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("snappy", "zstd"))
    assert(rows.map(_.getLong(1)).distinct.length === 1)
    def bytes(codec: String): Long = {
      val d = new java.io.File(
        graft.Staging.dir("graft_phys_codecs", sf), codec)
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(_.length()).sum
    }
    assert(bytes("zstd") <= bytes("snappy"),
      s"zstd ${bytes("zstd")} > snappy ${bytes("snappy")}")
  }
}
