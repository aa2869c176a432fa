package graft

import org.apache.spark.sql.functions._

/** Batch 27 replays: Mann–Kendall trend and reorder intervals. */
class TrendReorderSpec extends SparkSpec {

  test("win_mann_kendall_trend replays S, the continuity-corrected z, " +
    "and Sen's slope") {
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).orderBy("day").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1)))
    val pairs = for {
      i <- daily.indices; j <- daily.indices if i < j
    } yield (daily(i), daily(j))
    val s = pairs.map { case ((_, a), (_, b)) =>
      if (b > a) 1L else if (b < a) -1L else 0L
    }.sum
    val slopes = pairs.map { case ((d1, a), (d2, b)) =>
      (b - a).toDouble / (d2 - d1)
    }.sorted
    def q50(xs: Seq[Double]) = {
      val h = 0.5 * (xs.size - 1)
      val lo = xs(h.toInt)
      lo + (h - h.toInt) * (xs(math.min(h.toInt + 1, xs.size - 1)) - lo)
    }
    val nd = daily.length.toDouble
    val sigma = math.sqrt(nd * (nd - 1) * (2 * nd + 5) / 18.0)
    val z = if (s > 0) (s - 1) / sigma
      else if (s < 0) (s + 1) / sigma else 0.0
    val r = q("win_mann_kendall_trend").collect()(0)
    assert(r.getAs[Long]("n_days") === daily.length.toLong)
    assert(r.getAs[Long]("n_pairs") === pairs.length.toLong)
    assert(r.getAs[Long]("s_stat") === s)
    assert(math.abs(r.getAs[Double]("z_stat") - z) <= 1.5e-3)
    assert(math.abs(r.getAs[Double]("sen_slope") - q50(slopes)) <= 1.5e-3)
    val zr = r.getAs[Double]("z_stat")
    assert(r.getAs[String]("trend") ===
      (if (zr >= 1.959963985) "increasing"
       else if (zr <= -1.959963985) "decreasing" else "none"))
  }

  test("mine_reorder_interval replays the per-customer gaps and exact " +
    "percentiles per segment") {
    val ords = Tables(spark, sf, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        col("o_orderkey")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate.toEpochDay,
        r.getLong(2)))
    val seg = Tables(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val gaps = ords.groupBy(_._1).toSeq.flatMap { case (c, os) =>
      os.sortBy(o => (o._2, o._3)).toSeq.sliding(2).collect {
        case Seq(a, b) => (seg(c), (b._2 - a._2).toDouble)
      }
    }
    def interp(xs: Seq[Double], p: Double) = {
      val s = xs.sorted
      val h = p * (s.size - 1)
      val lo = s(h.toInt)
      lo + (h - h.toInt) * (s(math.min(h.toInt + 1, s.size - 1)) - lo)
    }
    val bySeg = gaps.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val rows = q("mine_reorder_interval").collect()
    assert(rows.map(_.getString(0)).toSeq === bySeg.keys.toSeq.sorted)
    rows.foreach { r =>
      val xs = bySeg(r.getString(0))
      assert(r.getAs[Long]("n_gaps") === xs.size.toLong)
      assert(math.abs(r.getAs[Double]("mean_days") - xs.sum / xs.size)
        <= 5e-2)
      assert(math.abs(r.getAs[Double]("median_days") - interp(xs, 0.5))
        <= 5e-2)
      assert(math.abs(r.getAs[Double]("p90_days") - interp(xs, 0.9))
        <= 5e-2)
    }
  }
}
