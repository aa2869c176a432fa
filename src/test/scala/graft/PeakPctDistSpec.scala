package graft

import org.apache.spark.sql.functions._

/** Batch 24 replays: peak detection, percent-of-parent shares, and the
  * DISTRIBUTE BY surface.
  */
class PeakPctDistSpec extends SparkSpec {

  test("win_peak_detection flags exactly the strict interior maxima " +
    "with taller-neighbour prominence") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (tpe, ds) =>
      val s = ds.sortBy(_._2)
      s.sliding(3).collect {
        case Array(a, b, c) if b._3 > a._3 && b._3 > c._3 =>
          (tpe, b._2, b._3, b._3 - math.max(a._3, c._3))
      }
    }.toSet
    val got = q("win_peak_detection").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getAs[Long]("prominence"))).toSet
    assert(got === expect)
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, p) => assert(p >= 1L) }
  }

  test("agg_pct_of_parent shares sum to one per brand and globally") {
    val rows = q("agg_pct_of_parent").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (b, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("pct_of_brand")).sum - 1.0)
        <= 1e-2, b)
    }
    assert(math.abs(rows.map(_.getAs[Double]("pct_of_total")).sum - 1.0)
      <= 2e-2)
    // cell revenue replays from a direct recompute
    val direct = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(math.abs(r.getAs[Double]("revenue") - direct(k)) <= 0.5, k)
    }
  }

  test("sql_distribute_cluster_by is value-transparent and plans the " +
    "hash repartition") {
    val df = q("sql_distribute_cluster_by")
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("RepartitionByExpression"),
      "DISTRIBUTE BY must plan a hash repartition")
    val twin = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        round(sum("l_quantity"), 2).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")
      .collect().map(_.toSeq).toSeq
    assert(df.collect().map(_.toSeq).toSeq === twin)
  }
}
