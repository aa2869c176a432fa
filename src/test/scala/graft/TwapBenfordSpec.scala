package graft

import org.apache.spark.sql.functions._

/** TWAP, Benford audit, readability: driver-side replays and algebraic
  * invariants.
  */
class TwapBenfordSpec extends SparkSpec {

  test("win_twap equals a driver-side holding-interval replay") {
    val got = q("win_twap").collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString),
        (r.getDouble(2), r.getLong(3)))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("event_id"),
        col("value"), unix_timestamp(col("ts")).as("sec")).collect()
      .map(r => ((r.getLong(0), r.getDate(1).toString),
        (r.getLong(2), r.getDouble(3), r.getLong(4))))
    val expect = ev.groupBy(_._1).flatMap { case (key, rows) =>
      val ordered = rows.map(_._2).sortBy(r => (r._3, r._1))
      val weighted = ordered.zip(ordered.drop(1)).map {
        case ((_, v, s0), (_, _, s1)) => (v * (s1 - s0), (s1 - s0).toDouble)
      }
      val w = weighted.map(_._2).sum
      if (weighted.nonEmpty && w > 0)
        Some(key -> (BigDecimal(weighted.map(_._1).sum / w)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble,
          weighted.length.toLong))
      else None
    }
    assert(got.keySet === expect.keySet)
    got.foreach { case (k, (tw, n)) =>
      val (et, en) = expect(k)
      assert(n === en, s"interval count at $k")
      assert(math.abs(tw - et) < 1e-9, s"twap $tw vs $et at $k")
    }
  }

  test("quality_benford_digits: digits are 1..9, counts cover every " +
    "positive price, expected shares sum to 1, chi2 terms non-negative") {
    val rows = q("quality_benford_digits").collect()
    assert(rows.map(_.getInt(0)).toSet.subsetOf((1 to 9).toSet))
    val n = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 0).count()
    assert(rows.map(_.getLong(1)).sum === n)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
    assert(rows.forall(_.getDouble(3) >= 0))
  }

  test("text_readability: the grade is exactly the FK formula over the " +
    "row's own counts, and counts are positive") {
    q("text_readability").collect().foreach { r =>
      val (w, s, sy) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(w > 0 && s > 0 && sy >= 0)
      val fk = BigDecimal(0.39 * w / s + 11.8 * sy / w - 15.59)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(4) - fk) < 1e-9, s"row $r expected $fk")
    }
  }
}
