package graft

import org.apache.spark.sql.functions._

/** Batch-6 additions: Zipf fit, source-priority dedup, and the SQL
  * subquery family — ground-truth recomputes plus the decorrelation plan
  * claim.
  */
class ZipfPrioritySpec extends SparkSpec {

  test("text_zipf_fit: slopes are negative (frequency falls with rank), " +
    "fits carry 200 points per full language, and slope matches a " +
    "driver-side least-squares on one language") {
    val rows = q("text_zipf_fit").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) < 0, s"non-negative Zipf slope: $r")
      assert(r.getLong(1) <= 200)
    }
    // independent recompute for 'en': counts, rank, OLS slope
    val en = Tables.documents(spark, sf).filter(col("lang") === "en")
      .select(explode(split(lower(col("text")), " ")).as("t"))
      .filter(length(col("t")) >= 2)
      .groupBy("t").count().collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(t => (-t._2, t._1)).take(200)
    val pts = en.zipWithIndex.map { case ((_, f), i) =>
      (math.log(i + 1.0), math.log(f.toDouble))
    }
    val n = pts.length
    val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val slope = pts.map(p => (p._1 - mx) * (p._2 - my)).sum /
      pts.map(p => (p._1 - mx) * (p._1 - mx)).sum
    val got = rows.find(_.getString(0) == "en").get.getDouble(2)
    assert(math.abs(got - slope) < 1e-3, s"slope $got vs OLS $slope")
  }

  test("dedup_source_priority: every mirrored text survives as its " +
    "ORIGINAL copy — the mirror never wins, and drop counts equal the " +
    "mirror cardinality") {
    val rows = q("dedup_source_priority").collect()
    assert(!rows.exists(_.getString(0) == "mirror"),
      "a mirror copy won a dup group")
    val docs = Tables.documents(spark, sf)
    val nMirror = docs.filter(col("doc_id") % 3 === 0).count()
    val distinctTexts = docs.select("text").distinct().count()
    assert(rows.map(_.getLong(1)).sum === distinctTexts)
    assert(rows.map(_.getLong(2)).sum ===
      nMirror + (docs.count() - distinctTexts))
  }

  test("sql_subquery_family decorrelates: no per-row subquery execution " +
    "nodes survive in the optimized plan, and flags match a join-built " +
    "recompute") {
    val df = q("sql_subquery_family")
    val optimized = df.queryExecution.optimizedPlan.toString
    // decorrelation leaves joins, not correlated predicates
    assert(!optimized.contains("exists#") || optimized.contains("Join"),
      optimized.take(1000))
    assert(optimized.contains("Join"), "no join-based decorrelation")
    val rows = df.collect()
    val cust = Tables.customer(spark, sf)
    val urgentCust = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey")).distinct()
    val expectUrgent = cust.join(urgentCust,
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    rows.foreach { r =>
      assert(r.getLong(3) === expectUrgent.getOrElse(r.getString(0), 0L),
        s"n_with_urgent mismatch for ${r.getString(0)}")
    }
    // totals reconcile: every customer is counted exactly once
    assert(rows.map(_.getLong(1)).sum === cust.count())
  }
}
