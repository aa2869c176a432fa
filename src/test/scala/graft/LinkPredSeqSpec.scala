package graft

import org.apache.spark.sql.functions._

/** Batch-12 additions: link prediction, session trigrams, KS drift,
  * Bollinger breach scan — each replayed driver-side from the raw tables.
  */
class LinkPredSeqSpec extends SparkSpec {

  test("graph_link_prediction: top-20 equals a driver-side two-hop " +
    "enumeration (non-edges only, canonical a < b, exact Jaccard)") {
    val rows = q("graph_link_prediction").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(rows.length === 20)
    rows.foreach { case (a, b, _, _, _, _) => assert(a < b) }

    // driver replay: rebuild the co-purchase graph from lineitem
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCnt = scala.collection.mutable.Map.empty[(Long, Long), Int]
    li.groupBy(_._1).foreach { case (_, rs) =>
      val ps = rs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairCnt((ps(i), ps(j))) = pairCnt.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val edges = pairCnt.filter(_._2 >= 2).keySet
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]]
    edges.foreach { case (u, v) =>
      nbrs(u) = nbrs.getOrElse(u, Set.empty) + v
      nbrs(v) = nbrs.getOrElse(v, Set.empty) + u
    }
    val cand = scala.collection.mutable.Map.empty[(Long, Long), Int]
    nbrs.foreach { case (_, neigh) =>
      val ps = neigh.toSeq.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        cand((ps(i), ps(j))) = cand.getOrElse((ps(i), ps(j)), 0) + 1
    }
    val expected = cand.toSeq
      .filterNot { case (p, _) => edges.contains(p) }
      .map { case ((a, b), common) =>
        val da = nbrs(a).size.toLong; val db = nbrs(b).size.toLong
        val j = BigDecimal(common.toDouble / (da + db - common))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (a, b, common.toLong, da, db, j)
      }
      .sortBy { case (a, b, _, _, _, j) => (-j, a, b) }
      .take(20)
    assert(rows.toSeq === expected)
  }

  test("mine_path_trigrams: counts equal a driver-side sessionize + " +
    "trigram fold, and the (n desc, trigram asc) order is pinned") {
    val rows = q("mine_path_trigrams").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.sliding(2).foreach {
      case Array((ta, ca), (tb, cb)) =>
        assert(ca > cb || (ca == cb && ta < tb))
      case _ =>
    }
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        unix_timestamp(col("ts")).as("sec"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2, t._4))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    // sessions break on >= 1800 s second-gaps (repo convention); a
    // trigram counts iff all three rows share user AND session — i.e.
    // neither consecutive gap reaches the break threshold
    var j = 0
    while (j + 2 < ev.length) {
      val (u0, _, s0, _, t0) = ev(j)
      val (u1, _, s1, _, t1) = ev(j + 1)
      val (u2, _, s2, _, t2) = ev(j + 2)
      if (u0 == u1 && u1 == u2 && s1 - s0 < 1800 && s2 - s1 < 1800) {
        val k = s"$t0>$t1>$t2"
        counts(k) = counts.getOrElse(k, 0L) + 1
      }
      j += 1
    }
    val expected = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    assert(rows.toSeq === expected)
  }

  test("quality_ks_test: D equals a driver-side two-ECDF sweep, splits " +
    "conserve the type counts, drift agrees with the fence") {
    val rows = q("quality_ks_test").collect()
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0))
      .toSeq.sorted)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    rows.foreach { r =>
      val tpe = r.getString(0)
      val (nRef, nCur) = (r.getLong(1), r.getLong(2))
      val vals = ev.filter(_._1 == tpe)
      assert(nRef === vals.count(_._3 % 2 == 0).toLong)
      assert(nCur === vals.count(_._3 % 2 != 0).toLong)
      // ECDF sweep over distinct values, ties grouped first
      val byV = vals.groupBy(_._2).toSeq.sortBy(_._1)
      var (cr, cc) = (0L, 0L)
      var d = 0.0
      byV.foreach { case (_, rs) =>
        cr += rs.count(_._3 % 2 == 0)
        cc += rs.count(_._3 % 2 != 0)
        d = math.max(d,
          math.abs(cr.toDouble / nRef - cc.toDouble / nCur))
      }
      assert(math.abs(r.getDouble(3) - BigDecimal(d)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      val fence = 1.358 *
        math.sqrt((nRef + nCur).toDouble / (nRef * nCur).toDouble)
      assert(r.getBoolean(5) === (d > fence))
    }
  }

  test("win_bollinger_bands: breach rows match a driver-side rolling " +
    "mean/sd replay over the hourly series (1e-6 boundary slack)") {
    val rows = q("win_bollinger_bands").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getString(5)))
    assert(rows.nonEmpty)
    // side is derivable from the emitted band state
    rows.foreach { case (_, _, v, ma, _, side) =>
      if (v != ma) assert(side === (if (v > ma) "up" else "down"))
    }
    // replay from the same hourly aggregate the query consumes
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hsec"))
      .agg(avg("value").as("v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val expected = scala.collection.mutable.Set.empty[(String, Long)]
    val boundary = scala.collection.mutable.Set.empty[(String, Long)]
    hourly.foreach { case (tpe, rs) =>
      val series = rs.sortBy(_._2)
      for (i <- 19 until series.length) {
        val win = series.slice(i - 19, i + 1).map(_._3)
        val ma = win.sum / 20.0
        val sd = math.sqrt(win.map(x => (x - ma) * (x - ma)).sum / 19.0)
        val margin = math.abs(series(i)._3 - ma) - 2.0 * sd
        if (sd > 0 && margin > 0) expected += ((tpe, series(i)._2))
        // fp-accumulation-order slack: rows this close to the band may
        // legitimately differ between the window engine and this replay
        if (math.abs(margin) < 1e-6) boundary += ((tpe, series(i)._2))
      }
    }
    val got = rows.map(r => (r._1, r._2)).toSet
    val diff = (got diff expected) union (expected diff got)
    assert(diff.subsetOf(boundary),
      s"non-boundary breach mismatch: ${diff -- boundary}")
  }
}
