package graft

import org.apache.spark.sql.functions._

/** Batch-12f additions: basket triples, conditional entropy, seasonal
  * anomaly profile, winsorized/trimmed means.
  */
class MixedStatsSpec extends SparkSpec {

  test("mine_basket_triples: canonical ordering, support >= 2, and the " +
    "top triple replays from a driver-side basket fold") {
    val rows = q("mine_basket_triples").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (a, b, c, n) =>
      assert(a < b && b < c && n >= 2)
    }
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val (ta, tb, tc, tn) = rows.head
    val cnt = byOrder.count { case (_, ps) =>
      ps.contains(ta) && ps.contains(tb) && ps.contains(tc)
    }
    assert(tn === cnt.toLong)
    // no triple in the full enumeration beats the reported head
    val best = byOrder.values.toSeq
      .flatMap(ps => ps.toSeq.sorted.combinations(3))
      .groupBy(identity).view.mapValues(_.size).toMap
      .values.max
    assert(tn === best.toLong)
  }

  test("agg_entropy_conditional: H(hour|type) is within [0, ln 24] and " +
    "replays from a driver-side distribution fold") {
    val rows = q("agg_entropy_conditional").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).as("hb")).collect()
      .map(r => (r.getString(0), r.getInt(1))).groupBy(_._1)
    rows.foreach { case (tpe, n, seen, h) =>
      assert(h >= 0.0 && h <= math.log(24.0) + 1e-9)
      val hs = ev(tpe).map(_._2)
      assert(n === hs.length.toLong)
      val dist = hs.groupBy(identity).view.mapValues(_.size).toMap
      assert(seen === dist.size.toLong)
      val hExp = -dist.values.map { c =>
        val p = c.toDouble / hs.length; p * math.log(p)
      }.sum
      assert(math.abs(h - hExp) < 1e-5, s"$tpe: $h vs $hExp")
    }
  }

  test("quality_seasonal_anomaly: per-cell moments replay, anomaly " +
    "counts match the 3-sigma exceedance, totals conserve events") {
    val rows = q("quality_seasonal_anomaly").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getLong(5)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum ===
      Tables.events(spark, sf).count())
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), hour(col("ts")).cast("long").as("hod"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(t => (t._1, t._2))
    rows.foreach { case (tpe, hod, n, mu, sd, nAnom) =>
      val xs = ev((tpe, hod)).map(_._3)
      assert(n === xs.length.toLong)
      val m = xs.sum / xs.length
      assert(math.abs(mu - m) < 1e-3)
      if (xs.length > 1) {
        val s2 = xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)
        val s = math.sqrt(s2)
        assert(math.abs(sd - s) < 1e-3)
        val cnt = xs.count(x => s > 0 && math.abs(x - m) > 3.0 * s)
        assert(nAnom === cnt.toLong)
      }
    }
  }

  test("agg_winsorized_mean: clamped/trimmed means replay, and " +
    "winsorized sits between trimmed influence bounds") {
    val rows = q("agg_winsorized_mean").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    def qc(xs: Array[Double], p: Double): Double = {
      val s = xs.sorted
      val pos = (s.length - 1) * p
      val lo = s(pos.toInt)
      val hi = s(math.min(pos.toInt + 1, s.length - 1))
      lo + (pos - pos.toInt) * (hi - lo)
    }
    val vals = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    rows.foreach { case (tpe, n, p05, p95, raw, wins, trim) =>
      val xs = vals(tpe).map(_._2)
      assert(n === xs.length.toLong)
      val (lo, hi) = (qc(xs, 0.05), qc(xs, 0.95))
      assert(math.abs(p05 - lo) < 1e-3 && math.abs(p95 - hi) < 1e-3)
      assert(math.abs(raw - xs.sum / xs.length) < 1e-3)
      val w = xs.map(x => math.max(lo, math.min(hi, x)))
      assert(math.abs(wins - w.sum / w.length) < 1e-3)
      val t = xs.filter(x => x >= lo && x <= hi)
      assert(math.abs(trim - t.sum / t.length) < 1e-3)
    }
  }
}
