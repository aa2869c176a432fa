package graft

import org.apache.spark.sql.functions._

/** Batch 16 replays: price indexes, Theil decomposition, and the spend
  * migration matrix.
  */
class IndexMigrationSpec extends SparkSpec {

  test("agg_price_index replays the matched-basket Laspeyres/Paasche " +
    "and Fisher lies between them") {
    val li = Tables(spark, sf, "lineitem")
      .select(year(col("l_shipdate")).as("yr"), col("l_partkey"),
        col("l_extendedprice"), col("l_quantity")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val py = li.groupBy(r => (r._1, r._2)).view.mapValues { rs =>
      (rs.map(_._3).sum / rs.map(_._4).sum, rs.map(_._4).sum)
    }.toMap
    val y0 = py.keys.map(_._1).min
    val base = py.collect { case ((y, pk), pq) if y == y0 => pk -> pq }.toMap
    val rows = q("agg_price_index").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val yr = r.getInt(0)
      val basket = py.collect {
        case ((y, pk), (p, qy)) if y == yr && base.contains(pk) =>
          val (p0, q0) = base(pk)
          (p, qy, p0, q0)
      }.toSeq
      assert(r.getAs[Long]("n_parts") === basket.size.toLong, yr)
      val l = basket.map(b => b._1 * b._4).sum /
        basket.map(b => b._3 * b._4).sum
      val p = basket.map(b => b._1 * b._2).sum /
        basket.map(b => b._3 * b._2).sum
      assert(math.abs(r.getAs[Double]("laspeyres") - l) <= 1.5e-3, yr)
      assert(math.abs(r.getAs[Double]("paasche") - p) <= 1.5e-3, yr)
      val f = r.getAs[Double]("fisher")
      assert(math.abs(f - math.sqrt(l * p)) <= 1.5e-3, yr)
      assert(f >= math.min(l, p) - 1.5e-3 && f <= math.max(l, p) + 1.5e-3)
    }
  }

  test("agg_theil_decomposition replays the moments and satisfies " +
    "T_total = T_between + sum(share * T_within)") {
    val spend = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "c_custkey")
      .agg(sum("o_totalprice").as("x")).collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    val bySeg = spend.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val (nn, ss) = (spend.length.toDouble, spend.map(_._2).sum)
    val tTotal = spend.map(_._2).map(x => x * math.log(x)).sum / ss -
      math.log(ss / nn)
    var tBetween = 0.0
    var withinMix = 0.0
    val rows = q("agg_theil_decomposition").collect()
    rows.foreach { r =>
      val seg = r.getString(0)
      val xs = bySeg(seg)
      val (n, sx) = (xs.size.toDouble, xs.sum)
      val tW = xs.map(x => x * math.log(x)).sum / sx - math.log(sx / n)
      assert(r.getAs[Long]("n_cust") === xs.size.toLong, seg)
      assert(math.abs(r.getAs[Double]("mean_spend") - sx / n) <= 0.5, seg)
      assert(math.abs(r.getAs[Double]("spend_share") - sx / ss) <= 1.5e-4)
      assert(math.abs(r.getAs[Double]("theil_within") - tW) <= 1.5e-5, seg)
      assert(math.abs(r.getAs[Double]("theil_total") - tTotal) <= 1.5e-5)
      tBetween += (sx / ss) * math.log((sx / n) / (ss / nn))
      withinMix += (sx / ss) * tW
    }
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("theil_between") - tBetween)
        <= 1.5e-5)
    }
    // the additive decomposition identity, from the raw replay values
    assert(math.abs(tTotal - (tBetween + withinMix)) <= 1e-9)
  }

  test("agg_spend_migration replays the bucket matrix and covers every " +
    "customer exactly once") {
    val y0 = Tables(spark, sf, "orders")
      .agg(min(year(col("o_orderdate")))).collect()(0).getInt(0)
    val spend = Tables(spark, sf, "orders")
      .filter(year(col("o_orderdate")) <= y0 + 1)
      .groupBy("o_custkey")
      .agg(
        sum(when(year(col("o_orderdate")) === y0, col("o_totalprice")))
          .as("s0"),
        sum(when(year(col("o_orderdate")) === y0 + 1, col("o_totalprice")))
          .as("s1")).collect()
      .map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Double]),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq
    val custs = Tables(spark, sf, "customer").select("c_custkey")
      .collect().map(_.getLong(0))
    def bucket(v: Option[Double]) = v match {
      case None => "none"
      case Some(x) if x < 400000.0 => "low"
      case _ => "high"
    }
    val byCust = spend.map(t => t._1 -> (t._2, t._3)).toMap
    val cells = custs.map { c =>
      val (s0, s1) = byCust.getOrElse(c, (None, None))
      (bucket(s0), bucket(s1))
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = q("agg_spend_migration").collect()
    assert(rows.map(_.getAs[Long]("n_customers")).sum === custs.length)
    assert(math.abs(rows.map(_.getAs[Double]("pct")).sum - 1.0) <= 1e-3)
    rows.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(cells(k) === r.getAs[Long]("n_customers"), k)
    }
    assert(rows.length === cells.size)
  }
}
