package graft

import org.apache.spark.sql.functions._

/** Batch-12b additions: brand-partition modularity, Hill tail index,
  * Theil inequality, Neyman allocation — driver replays + invariants.
  */
class InequalityGraphSpec extends SparkSpec {

  test("graph_modularity: degree masses sum to 2m, intra edges never " +
    "exceed m, and Q = sum of contributions stays in [-1, 1]") {
    val rows = q("graph_modularity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    // m from the same staged edge list + part dim the query used
    val edges = graft.queries.Pipeline.coEdges(spark, sf)
      .join(Tables.part(spark, sf).select(col("p_partkey").as("u")),
        Seq("u"))
      .join(Tables.part(spark, sf).select(col("p_partkey").as("v")),
        Seq("v"))
    val m = edges.count()
    assert(rows.map(_._2).sum === 2 * m) // handshake over communities
    assert(rows.map(_._3).sum <= m)      // intra edges partition a subset
    val qMod = rows.map(_._4).sum
    assert(qMod >= -1.0 - 1e-6 && qMod <= 1.0 + 1e-6)
  }

  test("agg_hill_tail_index: alpha matches a driver-side top-101 replay " +
    "per segment") {
    val rows = q("agg_hill_tail_index").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val orders = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("o_totalprice"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.foreach { case (seg, k, xthr, alpha) =>
      assert(k === 100L)
      val top = orders.filter(_._1 == seg)
        .sortBy(t => (-t._3, t._2)).take(101)
      assert(top.length === 101, s"segment $seg has < 101 orders")
      val x101 = top.last._3
      assert(math.abs(xthr - BigDecimal(x101)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      val meanLog = top.take(100).map(t => math.log(t._3)).sum / 100.0
      val a = 1.0 / (meanLog - math.log(x101))
      assert(math.abs(alpha - BigDecimal(a)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
      assert(alpha > 0)
    }
  }

  test("agg_theil_index: T is non-negative and matches the definitional " +
    "per-customer fold") {
    val rows = q("agg_theil_index").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val spend = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(sum("o_totalprice").as("x")).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { case (nat, n, _, theil) =>
      assert(theil >= 0.0)
      val xs = spend(nat).map(_._2)
      assert(xs.length === n)
      val mu = xs.sum / xs.length
      val t = xs.map(x => (x / mu) * math.log(x / mu)).sum / xs.length
      assert(math.abs(theil - t) < 1e-4, s"nation $nat: $theil vs $t")
    }
  }

  test("sample_neyman_allocation: weights sum to 1, allocations to " +
    "~1000, and one stratum replays exactly") {
    val rows = q("sample_neyman_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._5).sum - 1000L) <= rows.length.toLong)
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    val moments = vals.view.mapValues { vs =>
      val xs = vs.map(_._2)
      val mu = xs.sum / xs.length
      (xs.length.toLong,
        math.sqrt(xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)))
    }.toMap
    val denom = moments.values.map { case (n, s) => n * s }.sum
    rows.foreach { case (tpe, n, sigma, weight, _) =>
      val (nExp, sExp) = moments(tpe)
      assert(n === nExp)
      assert(math.abs(sigma - sExp) < 1e-3)
      assert(math.abs(weight - nExp * sExp / denom) < 1e-5)
    }
  }
}
