package graft

import org.apache.spark.sql.functions._

/** RSI(14) and per-segment Gini: driver-side replays of both closed
  * forms, plus the range invariants.
  */
class RsiGiniSpec extends SparkSpec {

  test("win_rsi equals a driver-side 14-delta replay and stays in " +
    "[0, 100]") {
    val got = q("win_rsi").collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    assert(got.values.forall(v => v >= 0 && v <= 100))
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getDouble(3)))
    val expect = scala.collection.mutable.Map[Long, Double]()
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2))
      val deltas = ordered.zip(ordered.drop(1))
        .map { case (a, b) => (b._2, b._4 - a._4) }
      deltas.indices.foreach { i =>
        val frame = deltas.slice(math.max(0, i - 13), i + 1).map(_._2)
        if (frame.length >= 14) {
          val ag = frame.map(d => math.max(d, 0.0)).sum / frame.length
          val al = frame.map(d => math.max(-d, 0.0)).sum / frame.length
          val rsi = if (al == 0.0) 100.0
            else 100.0 - 100.0 / (1.0 + ag / al)
          expect(deltas(i)._1) = BigDecimal(rsi)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        }
      }
    }
    assert(got.keySet === expect.keySet)
    got.foreach { case (id, v) =>
      assert(math.abs(v - expect(id)) < 1e-9, s"rsi at $id: $v vs ${expect(id)}")
    }
  }

  test("agg_gini_segment equals the mean-absolute-difference definition " +
    "and sits in [0, 1)") {
    val got = q("agg_gini_segment").collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val spend = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "c_custkey")
      .agg(sum("o_totalprice").as("x")).collect()
      .map(r => (r.getString(0), r.getDouble(2)))
    spend.groupBy(_._1).foreach { case (seg, rows) =>
      val xs = rows.map(_._2)
      val n = xs.length
      // independent definition: Σᵢⱼ|xᵢ−xⱼ| / (2·n²·mean)
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      val gini = mad / (2.0 * n * n * (xs.sum / n))
      val (gn, gg) = got(seg)
      assert(gn === n.toLong)
      // rank formula == MAD formula up to the 1/n discretization
      assert(math.abs(gg - gini) < 1.0 / n + 1e-6,
        s"$seg: rank-form $gg vs mad-form $gini")
      assert(gg >= 0 && gg < 1)
    }
  }
}
