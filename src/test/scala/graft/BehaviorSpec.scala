package graft

import org.apache.spark.sql.functions._

/** Behavioral-analytics trio: each query checked against an independent
  * ground-truth recompute (driver-side replay for attribution, per-day
  * set recount for rolling actives, balance/coverage invariants for the
  * equi-depth histogram), plus the one plan claim that matters at scale —
  * no single-partition global window anywhere in the three plans.
  */
class BehaviorSpec extends SparkSpec {

  test("win_attribution_last_touch credits each purchase to the truly " +
    "most recent preceding click of that user") {
    val got = q("win_attribution_last_touch").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // independent replay: sort each user's clicks+purchases by (ts, id)
    // and walk, carrying the last click id
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getString(3)))
    val expect = scala.collection.mutable.Map[Long, Option[Long]]()
    ev.groupBy(_._1).foreach { case (_, rows) =>
      var lastClick: Option[Long] = None
      rows.sortBy(r => (r._3, r._2)).foreach { case (_, id, _, typ) =>
        if (typ == "purchase") expect(id) = lastClick
        else lastClick = Some(id)
      }
    }
    assert(got === expect.toMap)
  }

  test("agg_rolling_distinct equals a per-day union of the trailing " +
    "7 day sets, and is monotone vs the single-day actives") {
    val rolled = q("agg_rolling_distinct").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1))).toMap
    val du = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0), r.getLong(1)))
    val perDay = du.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val days = perDay.keySet
    days.foreach { day =>
      val window = days.filter { d2 =>
        val diff = (day.getTime - d2.getTime) / 86400000L
        diff >= 0 && diff <= 6
      }
      val expected = window.flatMap(perDay).size.toLong
      assert(rolled(day.toString) === expected, s"day $day")
      assert(rolled(day.toString) >= perDay(day).size.toLong)
    }
    assert(rolled.keySet === days.map(_.toString))
  }

  test("agg_hist_equidepth: within every priority the quartiles are " +
    "depth-balanced (±1), cover all orders, and ranges are ordered") {
    val rows = q("agg_hist_equidepth").collect()
    val orders = Tables.orders(spark, sf)
    val total = orders.count()
    assert(rows.map(_.getLong(2)).sum === total)
    rows.groupBy(_.getString(0)).foreach { case (prio, qs) =>
      assert(qs.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3, 4))
      val counts = qs.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, s"$prio unbalanced: $counts")
      // ranges are non-overlapping and ordered by quartile
      qs.sortBy(_.getInt(1)).toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a.getDouble(4) <= b.getDouble(3) + 0.011,
            s"$prio quartile ranges overlap: $a / $b")
        case _ =>
      }
    }
  }

  test("no single-partition global window in any of the three plans") {
    Seq("win_attribution_last_touch", "agg_rolling_distinct",
      "agg_hist_equidepth").foreach { name =>
      val plan = q(name).queryExecution.executedPlan.toString
      // a Window with an empty partition spec prints "Window [..], [..]"
      // with no "partitionBy"; robust check: Spark warns via
      // WindowExec requiredChildDistribution AllTuples — detectable as
      // "SinglePartition" in the plan tree
      assert(!plan.contains("SinglePartition"),
        s"$name plans a single-partition stage:\n$plan")
    }
  }
}
