package graft

import org.apache.spark.sql.functions._

/** Batch-12d additions: Cramér's V, HHI concentration, local clustering
  * coefficient, MAD outlier screen — driver replays + range invariants.
  */
class RobustStatsSpec extends SparkSpec {

  test("quality_cramers_v: V matches a driver-side contingency recompute " +
    "and sits in [0, 1]") {
    val row = q("quality_cramers_v").collect().head
    val (chi2, r, c, n, v) = (row.getDouble(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getDouble(4))
    assert(v >= 0.0 && v <= 1.0)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).as("hb")).collect()
      .map(rr => (rr.getString(0), rr.getInt(1)))
    assert(n === ev.length.toLong)
    val cells = ev.groupBy(identity).view.mapValues(_.size.toDouble)
    val rowT = ev.groupBy(_._1).view.mapValues(_.size.toDouble)
    val colT = ev.groupBy(_._2).view.mapValues(_.size.toDouble)
    assert(r === rowT.size.toLong && c === colT.size.toLong)
    val nn = ev.length.toDouble
    val chi = cells.map { case ((t, h), o) =>
      val e = rowT(t) * colT(h) / nn
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(chi2 - BigDecimal(chi)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-6)
    val vExp = math.sqrt(chi / (nn * math.min(r - 1, c - 1)))
    assert(math.abs(v - vExp) < 1e-5)
  }

  test("agg_herfindahl: HHI in [1/n, 1] per nation and one nation " +
    "replays from per-supplier revenue") {
    val rows = q("agg_herfindahl").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nSup, _, hhi) =>
      assert(hhi >= 1.0 / nSup - 1e-9 && hhi <= 1.0 + 1e-9)
    }
    val rev = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey", "s_suppkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev")).collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getDouble(2)))
      .groupBy(_._1)
    val (nat, _, totalRev, hhi) = rows.head
    val xs = rev(nat).map(_._2)
    val tot = xs.sum
    assert(math.abs(totalRev - tot) < 1.0)
    val h = xs.map(x => (x / tot) * (x / tot)).sum
    assert(math.abs(hhi - h) < 1e-5)
  }

  test("graph_clustering_coeff equals a driver-side wedge-closure count " +
    "over the same staged edges") {
    val rows = q("graph_clustering_coeff").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val edges = graft.queries.Pipeline.coEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val edgeSet = edges.toSet
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]]
    edges.foreach { case (u, v) =>
      nbrs(u) = nbrs.getOrElse(u, Set.empty) + v
      nbrs(v) = nbrs.getOrElse(v, Set.empty) + u
    }
    val expected = nbrs.toSeq
      .filter(_._2.size >= 2)
      .map { case (u, neigh) =>
        val ps = neigh.toSeq.sorted
        var tri = 0L
        for (i <- ps.indices; j <- i + 1 until ps.length)
          if (edgeSet.contains((ps(i), ps(j)))) tri += 1
        val dg = neigh.size.toLong
        val cc = BigDecimal(tri.toDouble / (dg * (dg - 1) / 2.0))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (u, dg, tri, cc)
      }.sortBy(_._1)
    assert(rows.toSeq === expected)
  }

  test("quality_anomaly_mad: median/MAD/outlier counts replay the " +
    "interpolated-percentile definition") {
    val rows = q("quality_anomaly_mad").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    def q50(xs: Array[Double]): Double = {
      val s = xs.sorted
      val pos = (s.length - 1) * 0.5
      val lo = s(pos.toInt)
      val hi = s(math.min(pos.toInt + 1, s.length - 1))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    rows.foreach { case (tpe, med, mad, n, nOut) =>
      val xs = vals(tpe).map(_._2)
      assert(n === xs.length.toLong)
      val m = q50(xs)
      val md = q50(xs.map(x => math.abs(x - m)))
      assert(math.abs(med - m) < 1e-3)
      assert(math.abs(mad - md) < 1e-3)
      val out = xs.count(x => 0.6745 * math.abs(x - m) / md > 3.5)
      assert(nOut === out.toLong)
    }
  }
}
