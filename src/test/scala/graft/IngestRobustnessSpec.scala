package graft

import org.apache.spark.sql.functions._

/** Batch 22 replays: schema contract, CSV escaping round trip, and the
  * PERMISSIVE JSON corrupt-record path.
  */
class IngestRobustnessSpec extends SparkSpec {

  test("quality_schema_contract reports all ten tables in contract " +
    "order with engine-neutral types") {
    val rows = q("quality_schema_contract").collect()
    assert(rows.length === 51)
    val byTable = rows.groupBy(_.getString(0))
    assert(byTable.keySet === Set("region", "nation", "customer",
      "supplier", "part", "orders", "lineitem", "events", "documents",
      "embeddings"))
    // ordinals are dense from 1 within each table
    byTable.foreach { case (t, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === (1 to rs.length), t)
    }
    val m = rows.map(r => (r.getString(0), r.getString(2)) ->
      r.getString(3)).toMap
    assert(m(("embeddings", "embedding")) === "float[]")
    assert(m(("events", "ts")) === "timestamp")
    assert(m(("lineitem", "l_linenumber")) === "int")
    assert(m(("documents", "text")) === "varchar")
    assert(m(("orders", "o_totalprice")) === "double")
  }

  test("sink_csv_escaping_roundtrip preserves embedded quote/comma/" +
    "newline payloads byte-for-byte through the CSV sink") {
    val direct = Tables(spark, sf, "documents")
      .select(col("lang"),
        concat(lit("q\"c,n\nl:"), substring(col("text"), 1, 20))
          .as("payload"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col("payload"))).as("sum_payload_chars"),
        countDistinct(col("payload")).as("n_distinct_payloads"))
      .orderBy("lang").collect().map(_.toSeq).toSeq
    val got = q("sink_csv_escaping_roundtrip").collect().map(_.toSeq).toSeq
    assert(got === direct)
    // every payload the round trip produced still carries the gnarly
    // prefix — quotes, comma, and the NEWLINE survived quoting
    val path = graft.Staging.dir("graft_csv_escape", sf)
    val sample = spark.read.option("header", "true")
      .option("multiLine", "true").option("escape", "\"").csv(path)
      .select("payload").limit(50).collect().map(_.getString(0))
    assert(sample.nonEmpty)
    sample.foreach(p => assert(p.startsWith("q\"c,n\nl:"), p.take(12)))
  }

  test("scan_json_malformed conserves rows and nulls every typed field " +
    "on the corrupt side") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val rows = q("scan_json_malformed").collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum === docs.length.toLong)
    val corrupt = rows.filter(_.getBoolean(0))
    assert(corrupt.length === 1)
    assert(corrupt(0).isNullAt(1)) // lang is null on the corrupt side
    assert(corrupt(0).isNullAt(corrupt(0).fieldIndex("sum_chars")))
    assert(corrupt(0).getAs[Long]("n_rows") ===
      docs.count(_._1 % 7 == 0).toLong)
    val good = docs.filterNot(_._1 % 7 == 0)
      .groupBy(_._2).view
      .mapValues(v => (v.size.toLong, v.map(_._3).sum)).toMap
    rows.filterNot(_.getBoolean(0)).foreach { r =>
      val (n, sc) = good(r.getString(1))
      assert(r.getAs[Long]("n_rows") === n, r.getString(1))
      assert(r.getAs[Long]("sum_chars") === sc, r.getString(1))
    }
  }
}
