package graft

import org.apache.spark.sql.functions._

/** Catalog-statistics CBO input and columnar cache reuse: the stats demo
  * must leave REAL numbers in the catalog (row count + per-column stats
  * visible to a CBO-enabled planner), and the cache demo must actually
  * plan its consumers over the in-memory relation.
  */
class PhysicalStatsSpec extends SparkSpec {

  test("stats_analyze_cbo: ANALYZE leaves rowCount and per-column stats " +
    "the CBO planner sees, and the result matches the raw tables") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    val (ordTbl, _) = graft.queries.Physical.statsTables(ss, sf)
    // plan.stats reads SQLConf.get (the thread's ACTIVE session) — pin it
    // to the CBO session for the read, else the base session's cbo=false
    // silently drops rowCount from toPlanStats
    org.apache.spark.sql.classic.SparkSession.setActiveSession(
      ss.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    val stats =
      try ss.table(ordTbl).queryExecution.optimizedPlan.stats
      finally org.apache.spark.sql.classic.SparkSession.setActiveSession(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    val expected = Tables.orders(spark, sf).count()
    assert(stats.rowCount.contains(BigInt(expected)),
      s"catalog rowCount ${stats.rowCount} != table count $expected")
    assert(stats.attributeStats.nonEmpty,
      "ANALYZE FOR COLUMNS left no column stats on the relation")
    val ndv = stats.attributeStats.collectFirst {
      case (attr, cs) if attr.name == "o_custkey" => cs.distinctCount
    }.flatten
    assert(ndv.exists(_ > 0), s"o_custkey ndv missing: $ndv")
    // values equal the raw-parquet twin
    val got = q("stats_analyze_cbo").collect()
    val twin = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .filter(col("o_totalprice") > 100000)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("rev"))
      .orderBy("c_mktsegment").collect()
    assert(got.toSeq === twin.toSeq)
  }

  test("cache_reuse_scan: consumers plan over the in-memory relation and " +
    "each of the two rollups covers the cached slice exactly once") {
    val df = q("cache_reuse_scan")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"),
      s"no cache scan in plan:\n${plan.take(1200)}")
    val rows = df.collect()
    val sliceRows = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 20).count()
    val (flagRows, bucketRows) = rows.partition(_.getString(0).startsWith("flag:"))
    assert(flagRows.map(_.getLong(1)).sum === sliceRows)
    assert(bucketRows.map(_.getLong(1)).sum === sliceRows)
  }
}
