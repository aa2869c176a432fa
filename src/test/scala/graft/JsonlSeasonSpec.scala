package graft

import org.apache.spark.sql.functions._

/** Batch 13k: the JSONL sink roundtrip and seasonality strength. */
class JsonlSeasonSpec extends SparkSpec {

  test("sink_jsonl_roundtrip: the JSON files exist, integers survive " +
    "the roundtrip, and the aggregate reconciles with parquet") {
    val out = q("sink_jsonl_roundtrip").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val expect = Tables.documents(spark, sf)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("tc"),
        countDistinct(col("doc_id")).as("nd"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === expect.toSeq)
    // the sink really is line-delimited JSON on disk
    val dir = new java.io.File(graft.Staging.dir("graft_phys_jsonl", sf))
    val part = dir.listFiles.filter(_.getName.endsWith(".json"))
    assert(part.nonEmpty, s"no .json part files in $dir")
    val first = scala.io.Source.fromFile(part.maxBy(_.length), "UTF-8")
    val lines = try first.getLines().take(3).toList finally first.close()
    assert(lines.nonEmpty)
    lines.foreach { l =>
      assert(l.startsWith("{") && l.endsWith("}"), s"not JSONL: $l")
      assert(l.contains("\"doc_id\""), l)
    }
  }

  test("agg_seasonality_strength replays raw-moment eta-squared and " +
    "stays in [0, 1]") {
    val out = q("agg_seasonality_strength").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).as("hh"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    out.foreach { case (tpe, n, strength) =>
      val rows = ev.filter(_._1 == tpe)
      assert(n === rows.length.toLong, tpe)
      val grand = rows.map(_._3)
      val gm = grand.sum / grand.size
      val sst = grand.map(v => (v - gm) * (v - gm)).sum
      val ssw = rows.groupBy(_._2).values.map { cell =>
        val vs = cell.map(_._3)
        val m = vs.sum / vs.size
        vs.map(v => (v - m) * (v - m)).sum
      }.sum
      assert(math.abs(strength - (1.0 - ssw / sst)) <= 1.5e-3, tpe)
      assert(strength >= -1e-9 && strength <= 1.0 + 1e-9, tpe)
    }
  }
}
