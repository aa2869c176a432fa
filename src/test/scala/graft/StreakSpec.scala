package graft

import org.apache.spark.sql.functions._

/** Longest-streak query vs a driver-side consecutive-run scan. */
class StreakSpec extends SparkSpec {

  test("win_streak_longest equals a driver-side run-length scan of each " +
    "user's active days") {
    val got = q("win_streak_longest").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val du = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val expect = du.groupBy(_._1).view.mapValues { rows =>
      val days = rows.map(_._2.toEpochDay).sorted
      var streaks = List.empty[Long]
      var run = 1L
      days.sliding(2).foreach {
        case Array(a, b) =>
          if (b == a + 1) run += 1
          else { streaks ::= run; run = 1 }
        case _ =>
      }
      streaks ::= run
      (streaks.max, streaks.length.toLong)
    }.toMap
    assert(got === expect)
  }
}
