package graft

import org.apache.spark.sql.functions._

/** Batch 14c replays: multi-touch attribution, Wald's SPRT walk, and the
  * discount-elasticity ladder.
  */
class AttributionSprtSpec extends SparkSpec {

  test("mine_attribution_linear replays the epoch/path framing and both " +
    "credit models conserve one credit per converted path") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    // driver replay: per user in (ts, event_id) order, epoch = count of
    // strictly-preceding purchases
    case class Touch(tpe: String, ts: Long, id: Long)
    val paths = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var ep = 0L
      val converted = scala.collection.mutable.Set.empty[Long]
      val touches = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Touch)]
      sorted.foreach { case (_, ts, id, tpe) =>
        if (tpe == "purchase") { converted += ep; ep += 1 }
        else touches += ((ep, Touch(tpe, ts, id)))
      }
      touches.filter(t => converted(t._1))
        .groupBy(_._1).values.map(_.map(_._2).toSeq)
    }.toSeq
    val linear = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    val firstT = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    val nTouch = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    paths.foreach { p =>
      p.foreach { t =>
        linear(t.tpe) += 1.0 / p.size; nTouch(t.tpe) += 1
      }
      val ft = p.minBy(t => (t.ts, t.id))
      firstT(ft.tpe) += 1.0
    }
    val rows = q("mine_attribution_linear").collect()
    assert(rows.map(_.getString(0)).toSeq === linear.keys.toSeq.sorted)
    rows.foreach { r =>
      val tpe = r.getString(0)
      assert(r.getAs[Long]("n_touches") === nTouch(tpe), tpe)
      assert(math.abs(r.getAs[Double]("linear_credit") - linear(tpe))
        <= 1.5e-3, tpe)
      assert(math.abs(r.getAs[Double]("first_touch_credit") - firstT(tpe))
        <= 1.5e-3, tpe)
    }
    // both models distribute exactly one credit per converted path
    val n = paths.size.toDouble
    assert(math.abs(rows.map(_.getAs[Double]("linear_credit")).sum - n)
      <= 0.01 * n + 0.01)
    assert(math.abs(rows.map(_.getAs[Double]("first_touch_credit")).sum
      - n) <= 1e-6 * n + 1e-6)
    assert(paths.nonEmpty)
  }

  test("agg_sprt_sequential replays the LLR walk, the decision rule, " +
    "and the stop flag") {
    val rows = q("agg_sprt_sequential").collect()
    assert(rows.nonEmpty)
    val daily = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .groupBy(to_date(col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("x"), count(lit(1)).as("n"))
      .orderBy("day").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    val c1 = 0.08004270767353637
    val bnd = 2.9444389791664403
    var llr = 0.0
    var stop: Option[String] = None
    daily.zip(rows).foreach { case ((day, x, n), row) =>
      llr += c1 * (2 * x - n)
      val dec =
        if (llr >= bnd) "accept_h1"
        else if (llr <= -bnd) "accept_h0"
        else "continue"
      assert(row.getDate(0).toString === day)
      assert(row.getAs[Long]("x_purchases") === x)
      assert(row.getAs[Long]("n_obs") === n)
      assert(math.abs(row.getAs[Double]("llr") - llr) <= 1.5e-3, day)
      assert(row.getAs[String]("decision") === dec, day)
      assert(row.getAs[Boolean]("post_decision") ===
        stop.exists(_ < day), day)
      if (dec != "continue" && stop.isEmpty) stop = Some(day)
    }
  }

  test("agg_discount_elasticity replays the ladder aggregate, the " +
    "min-discount base, and the log-log OLS slope") {
    val rows = q("agg_discount_elasticity").collect()
    val g = Tables(spark, sf, "lineitem")
      .select("l_discount", "l_quantity").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
      .groupBy(_._1).view
      .mapValues(v => (v.size.toLong, v.map(_._2).sum / v.size))
      .toSeq.sortBy(_._1)
    assert(rows.length === g.length)
    val base = g.head._2._2
    val pts = g.map { case (dsc, (_, aq)) =>
      (math.log(1.0 - dsc), math.log(aq)) }
    val mx = pts.map(_._1).sum / pts.size
    val my = pts.map(_._2).sum / pts.size
    val slope = pts.map { case (x, y) => (x - mx) * (y - my) }.sum /
      pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
    rows.zip(g).foreach { case (row, (dsc, (nl, aq))) =>
      assert(row.getDouble(0) === dsc)
      assert(row.getAs[Long]("n_lines") === nl)
      assert(math.abs(row.getAs[Double]("avg_qty") - aq) <= 1.5e-4)
      assert(math.abs(row.getAs[Double]("lift_vs_min_discount") -
        aq / base) <= 1.5e-4)
      assert(math.abs(row.getAs[Double]("elasticity") - slope) <= 1.5e-3)
    }
  }
}
