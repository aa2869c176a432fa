package graft

import org.apache.spark.sql.functions._

/** Batch 13b replays: synchronous label propagation (exact sweep-by-sweep
  * equality with a driver-side reference), sequential containment mining,
  * and the haversine geo family.
  */
class LpaSpec extends SparkSpec {

  test("graph_label_propagation replays five synchronous min-tie-break " +
    "sweeps exactly and conserves the node mass") {
    val out = q("graph_label_propagation").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.nonEmpty)

    val edges = graft.queries.Pipeline.coEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    (1 to 5).foreach { _ =>
      lab = adj.map { case (n, nbrs) =>
        val hist = nbrs.groupBy(lab).view.mapValues(_.size).toSeq
        // most frequent neighbor label; ties -> smaller label
        n -> hist.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val expected = lab.values.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .map { case (l, n) => (l, n) }.sortBy(_._1)
    assert(out.toSeq === expected)
    assert(out.map(_._2).sum === adj.size.toLong)
    // on this graph LPA must actually coarsen: fewer communities than
    // nodes, and at least one non-singleton community
    assert(out.length < adj.size)
    assert(out.exists(_._2 > 1L))
  }

  test("mine_seq_containment replays first-occurrence precedence and " +
    "is antisymmetric-bounded per pair") {
    val out = q("mine_seq_containment").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    val firsts = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).getTime))
      .groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3).min).toMap
    val users = firsts.keys.map(_._1).toSet
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    for (u <- users) {
      val ft = firsts.collect { case ((`u`, tpe), t) => (tpe, t) }.toSeq
      for ((a, ta) <- ft; (b, tb) <- ft if a != b && ta < tb)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + 1L
    }
    assert(out.map(r => ((r._1, r._2), r._3)).toMap === counts.toMap)
    out.foreach { case (a, b, n, sup) =>
      assert(math.abs(sup - n.toDouble / users.size) <= 1.5e-4, s"$a->$b")
      // a-before-b and b-before-a are disjoint user sets
      val rev = out.find(r => r._1 == b && r._2 == a).map(_._3).getOrElse(0L)
      assert(n + rev <= users.size.toLong, s"$a<->$b overlaps")
    }
  }

  test("fn_geo_family: haversine stays on the sphere and replays a " +
    "driver-side recompute per nation") {
    val out = q("fn_geo_family").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    // half the Earth's circumference bounds every great-circle distance
    out.foreach { case (n, _, avgKm, maxKm) =>
      assert(avgKm >= 0 && avgKm <= maxKm, n)
      assert(maxKm <= math.Pi * 6371.0 + 0.01, n)
    }
    def h3(s: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      hex(0).toInt * 65536 + hex(1).toInt * 256 + hex(2).toInt
    }
    def latOf(p: String, k: Long) = (h3(p + k) % 18000) / 100.0 - 90.0
    def lonOf(p: String, k: Long) = (h3(p + k) % 36000) / 100.0 - 180.0
    val nat = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => (r.getInt(0).toLong, r.getString(1))).toMap
    val custs = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_nationkey")).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong))
    val byNation = custs.groupBy(c => nat(c._2))
    out.foreach { case (name, nCust, avgKm, maxKm) =>
      val cs = byNation(name)
      assert(nCust === cs.length.toLong, name)
      val ds = cs.map { case (ck, nk) =>
        val la1 = math.toRadians(latOf("lat:", ck))
        val lo1 = math.toRadians(lonOf("lon:", ck))
        val la2 = math.toRadians(latOf("nlat:", nk))
        val lo2 = math.toRadians(lonOf("nlon:", nk))
        val sa = math.sin((la2 - la1) / 2)
        val so = math.sin((lo2 - lo1) / 2)
        math.asin(math.min(1.0, math.sqrt(
          sa * sa + math.cos(la1) * math.cos(la2) * so * so))) * 12742.0
      }
      assert(math.abs(avgKm - ds.sum / ds.size) <= 1.5e-2, name)
      assert(math.abs(maxKm - ds.max) <= 1.5e-2, name)
    }
  }
}
