package graft

import org.apache.spark.sql.functions._

/** Assortativity replay + the GK approx-percentile rank-error bound. */
class AssortPercentileSpec extends SparkSpec {

  test("graph_assortativity equals a driver-side Pearson over the " +
    "bidirectional degree pairs and sits in [-1, 1]") {
    val Array(row) = q("graph_assortativity").collect()
    val r = row.getDouble(1)
    assert(r >= -1 && r <= 1)
    // independent recompute from the same co-purchase edge definition
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
    val pairs = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_orderkey").as("ok"), col("a.l_partkey").as("u"),
        col("b.l_partkey").as("v"))
      .distinct()
      .groupBy("u", "v").count().filter(col("count") >= 2)
      .select("u", "v").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val bi = pairs ++ pairs.map(p => (p._2, p._1))
    val deg = bi.groupBy(_._1).view.mapValues(_.length.toDouble).toMap
    val xs = bi.map(e => deg(e._1))
    val ys = bi.map(e => deg(e._2))
    val n = xs.length
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum)
    val sy = math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
    val expect = BigDecimal(cov / (sx * sy))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(0) === pairs.length.toLong)
    assert(math.abs(r - expect) < 1e-9, s"$r vs $expect")
  }

  test("agg_percentile_approx_builtin: the GK median's RANK error is " +
    "within the accuracy guarantee of the true median rank") {
    q("agg_percentile_approx_builtin").collect().foreach { r =>
      val prio = r.getString(0)
      val n = r.getLong(3)
      val vals = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === prio)
        .select(round(col("o_totalprice"), 2)).collect()
        .map(_.getDouble(0)).sorted
      // rank of the approx median among the sorted values
      val approx = r.getDouble(1)
      val rank = vals.count(_ <= approx)
      val tol = n / 1000.0 + 1 // accuracy=1000 → eps·n rank error
      assert(math.abs(rank - n / 2.0) <= tol + 1,
        s"$prio: approx median rank $rank vs ${n / 2.0} (tol $tol)")
    }
  }
}
