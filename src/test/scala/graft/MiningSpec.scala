package graft

import org.apache.spark.sql.functions._

/** Basket lift + event transitions: driver replay of the top pair's
  * metrics, and the row-stochastic property of the transition matrix.
  */
class MiningSpec extends SparkSpec {

  test("mine_basket_lift: the top pair's support/confidence/lift match a " +
    "driver-side recount, pairs are canonical (a < b)") {
    val rows = q("mine_basket_lift").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    // counts are non-increasing (top-k by support)
    assert(rows.map(_.getLong(2)).toSeq ===
      rows.map(_.getLong(2)).sortBy(-_).toSeq)
    val top = rows.head
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = Tables.orders(spark, sf).count().toDouble
    val (pa, pb) = (top.getLong(0), top.getLong(1))
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val cntAb = byOrder.count(o => o._2.contains(pa) && o._2.contains(pb))
    val cntA = items.count(_._2 == pa)
    val cntB = items.count(_._2 == pb)
    assert(top.getLong(2) === cntAb.toLong)
    assert(math.abs(top.getDouble(4) - BigDecimal(cntAb.toDouble / cntA)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(top.getDouble(5) -
      BigDecimal(cntAb * nOrders / (cntA.toDouble * cntB))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("mine_session_paths: top-20 paths match a driver-side lag-gap " +
    "sessionizer + path fold, and the order is the pinned total order") {
    val rows = q("mine_session_paths").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty && rows.length <= 20)
    // pinned total order: count desc, path asc
    rows.sliding(2).foreach {
      case Array((pa, ca), (pb, cb)) =>
        assert(ca > cb || (ca == cb && pa < pb), s"order: $pa/$ca $pb/$cb")
      case _ =>
    }
    // driver replay: sessions on >= 30 min second-gaps (the repo's
    // end-exclusive session convention), first 5 types
    // order by the FULL-precision ts (micros) like the query's window;
    // gaps compare truncated seconds like the query's brk condition
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        unix_timestamp(col("ts")).as("sec"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2, t._4))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    var prevUser = -1L
    var prevSec = Long.MinValue
    var cur = List.empty[String]
    def flush(): Unit = if (cur.nonEmpty) {
      val p = cur.reverse.take(5).mkString(">")
      counts(p) = counts.getOrElse(p, 0L) + 1
      cur = Nil
    }
    ev.foreach { case (u, _, sec, _, t) =>
      if (u != prevUser || sec - prevSec >= 1800L) flush()
      cur = t :: cur
      prevUser = u; prevSec = sec
    }
    flush()
    val expectedTop = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    assert(rows.toSeq === expectedTop)
  }

  test("mine_event_transitions is row-stochastic and covers every " +
    "observed consecutive pair") {
    val rows = q("mine_event_transitions").collect()
    val types = Seq("click", "error", "purchase", "signup", "view")
    assert(rows.forall(r => types.contains(r.getString(0)) &&
      types.contains(r.getString(1))))
    rows.groupBy(_.getString(0)).foreach { case (from, grp) =>
      val psum = grp.map(_.getDouble(3)).sum
      assert(math.abs(psum - 1.0) < 0.01, s"$from rows sum to $psum")
    }
    // total transitions = events - one per user (the last has no next)
    val nEvents = Tables.events(spark, sf).count()
    val nUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum === nEvents - nUsers)
  }
}
