package graft

import org.apache.spark.sql.functions._

/** Kaplan–Meier conversion curve: driver-side estimator replay plus the
  * structural survival-curve properties.
  */
class SurvivalSpec extends SparkSpec {

  test("agg_survival_km equals a driver-side KM computation with " +
    "censoring, and the curve is non-increasing in (0, 1]") {
    val rows = q("agg_survival_km").collect()
    assert(rows.nonEmpty)
    val surv = rows.map(_.getDouble(3))
    assert(surv.forall(v => v > 0 - 1e-12 && v <= 1 + 1e-12))
    surv.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, s"curve rises: $a -> $b")
      case _ =>
    }
    // driver replay
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val hmax = ev.map(_._3).max.toDouble
    val s0 = ev.filter(_._2 == "signup").groupBy(_._1).view
      .mapValues(_.map(_._3).min).toMap
    val p0: Map[Long, Seq[Long]] = ev.filter(_._2 == "purchase")
      .groupBy(_._1).view.mapValues(_.map(_._3).toSeq).toMap
    val subjects = s0.toSeq.map { case (u, s) =>
      val fp = p0.getOrElse(u, Seq.empty[Long]).filter(_ >= s)
      if (fp.nonEmpty) (math.floor((fp.min - s) / 86400.0).toLong, 1)
      else (math.floor((hmax - s) / 86400.0).toLong, 0)
    }.toSeq
    val byDay = subjects.groupBy(_._1).view.mapValues(g =>
      (g.map(_._2).sum.toLong, g.size.toLong)).toMap
    val total = subjects.size.toLong
    var removed = 0L
    var s = 1.0
    val expect = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Double)]
    byDay.keys.toSeq.sorted.foreach { t =>
      val (d, n) = byDay(t)
      val risk = total - removed
      s *= 1.0 - d.toDouble / risk
      if (d > 0) expect += ((t, risk, d,
        BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble))
      removed += n
    }
    val got = rows.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got.map(x => (x._1, x._2, x._3)) ===
      expect.toSeq.map(x => (x._1, x._2, x._3)))
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-9, s"S at day ${g._1}: ${g._4} vs ${e._4}")
    }
  }
}
