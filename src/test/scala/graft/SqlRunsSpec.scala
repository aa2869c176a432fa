package graft

import org.apache.spark.sql.functions._

/** Batch 20 replays: named WINDOW clause, SQL LATERAL subquery, and the
  * Wald–Wolfowitz runs test.
  */
class SqlRunsSpec extends SparkSpec {

  test("sql_named_window equals the repeated-OVER spelling") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val twin = Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        rank().over(w).as("rk"),
        round(sum("o_totalprice")
          .over(w.rangeBetween(Window.unboundedPreceding,
            Window.currentRow)), 2).as("run_total"))
      .filter(col("rk") <= 3)
      .orderBy("o_custkey", "rk")
      .collect().map(_.toSeq).toSeq
    val got = q("sql_named_window").collect().map(_.toSeq).toSeq
    assert(got === twin)
    assert(got.nonEmpty)
  }

  test("sql_lateral_subquery decorrelates: per-customer top-2 replay, " +
    "no CartesianProduct in the plan") {
    val df = q("sql_lateral_subquery")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), "lateral must decorrelate")
    val orders = Tables(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expect = orders.groupBy(_._1).view.mapValues { os =>
      os.sortBy(o => (-o._3, o._2)).take(2)
        .map(o => (o._2, BigDecimal(o._3).setScale(2,
          BigDecimal.RoundingMode.HALF_UP).toDouble)).toSeq
    }.toMap
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(_._1).toSeq).toMap
    assert(got.keySet === expect.keySet)
    got.foreach { case (c, os) =>
      assert(os.sorted === expect(c).sorted, c)
    }
  }

  test("agg_runs_test replays signs, run count, and the exact null " +
    "moments") {
    val daily = Tables.events(spark, sf)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).orderBy("day").collect()
      .map(r => r.getLong(1))
    val sgns = daily.sliding(2).collect {
      case Array(a, b) if b != a => if (b > a) 1 else -1
    }.toSeq
    val (nu, nd) = (sgns.count(_ == 1).toLong, sgns.count(_ == -1).toLong)
    val runs = 1L + sgns.sliding(2).count {
      case Seq(a, b) => a != b
      case _ => false
    }
    val (u, dn) = (nu.toDouble, nd.toDouble)
    val mu = 2.0 * u * dn / (u + dn) + 1
    val va = 2.0 * u * dn * (2.0 * u * dn - u - dn) /
      ((u + dn) * (u + dn) * (u + dn - 1))
    val z = (runs - mu) / math.sqrt(va)
    val r = q("agg_runs_test").collect()(0)
    assert(r.getAs[Long]("n_up") === nu)
    assert(r.getAs[Long]("n_down") === nd)
    assert(r.getAs[Long]("runs") === runs)
    assert(math.abs(r.getAs[Double]("z_stat") - z) <= 1.5e-3)
    assert(r.getAs[String]("verdict") ===
      (if (math.abs(r.getAs[Double]("z_stat")) < 1.959963985) "random"
       else "non_random"))
    assert(nu + nd > 0)
  }
}
