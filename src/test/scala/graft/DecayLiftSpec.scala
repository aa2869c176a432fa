package graft

import org.apache.spark.sql.functions._

/** Batch 13e replays: decayed engagement scores and weekend lift. */
class DecayLiftSpec extends SparkSpec {

  test("agg_decay_score replays the e-folding weight fold and is " +
    "bounded by the raw sum") {
    val out = q("agg_decay_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("value"),
        unix_timestamp(col("ts")).as("es")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val tmax = ev.map(_._3).max
    val byUser = ev.groupBy(_._1)
    assert(out.map(_._1).toSet === byUser.keySet)
    out.foreach { case (u, n, score) =>
      val rows = byUser(u)
      assert(n === rows.length.toLong)
      val exp = rows.map(t =>
        t._2 * math.exp((t._3 - tmax).toDouble / 604800.0)).sum
      assert(math.abs(score - exp) <= 1.5e-3, s"user $u")
      // weights are in (0, 1], so the decayed score can never exceed
      // the undecayed positive-value sum
      assert(score <= rows.map(_._2).sum + 1e-6, s"user $u bound")
      assert(score > 0.0)
    }
  }

  test("agg_weekend_lift: day-of-week split tiles the corpus and lift " +
    "replays the ratio of the rounded means") {
    val out = q("agg_weekend_lift").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"), col("ts")).collect()
      .map { r =>
        // session tz is UTC — read the instant at UTC, not JVM-local
        val dow = r.getTimestamp(2).toInstant
          .atZone(java.time.ZoneOffset.UTC).getDayOfWeek
        val we = dow == java.time.DayOfWeek.SATURDAY ||
          dow == java.time.DayOfWeek.SUNDAY
        (r.getString(0), r.getDouble(1), we)
      }
    val byType = ev.groupBy(_._1)
    assert(out.map(_._1).toSet === byType.keySet)
    out.foreach { case (tpe, avgWe, avgWd, nWe, nWd, lift) =>
      val rows = byType(tpe)
      val we = rows.filter(_._3).map(_._2)
      val wd = rows.filterNot(_._3).map(_._2)
      assert(nWe === we.length.toLong && nWd === wd.length.toLong, tpe)
      assert(nWe + nWd === rows.length.toLong, tpe)
      assert(math.abs(avgWe - we.sum / we.size) <= 1.5e-4, tpe)
      assert(math.abs(avgWd - wd.sum / wd.size) <= 1.5e-4, tpe)
      assert(math.abs(lift - avgWe / avgWd) <= 1.5e-4, tpe)
    }
  }
}
