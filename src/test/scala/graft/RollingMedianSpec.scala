package graft

import org.apache.spark.sql.functions._

/** Rolling exact median + keyed pseudonymization: driver-side frame
  * replay for the median, and the privacy contract (determinism,
  * distinct-preservation, irreversibility shape) for the pseudonymizer.
  */
class RollingMedianSpec extends SparkSpec {

  test("win_rolling_median equals a driver-side sorted-frame replay " +
    "(type-7 interpolation), cold-start rows suppressed") {
    val got = q("win_rolling_median").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getLong(3))).toList
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime, r.getDouble(3)))
    val expect = scala.collection.mutable.Map[Long, (Double, Long)]()
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._2)).map(r => (r._2, r._4))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 20), i + 1).map(_._2)
        if (frame.length >= 11) {
          val s = frame.sorted
          val pos = (s.length - 1) * 0.5
          val (lo, hi) = (s(pos.toInt), s(math.ceil(pos).toInt))
          val med = lo + (pos - pos.toInt) * (hi - lo)
          expect(ordered(i)._1) =
            (BigDecimal(med).setScale(4, BigDecimal.RoundingMode.HALF_UP)
              .toDouble, frame.length.toLong)
        }
      }
    }
    assert(got.map(_._1).toSet === expect.keySet)
    got.foreach { case (id, med, n) =>
      val (em, en) = expect(id)
      assert(n === en, s"frame size mismatch at $id")
      assert(math.abs(med - em) < 1e-9, s"median $med vs $em at $id")
    }
  }

  test("pii_pseudonymize preserves distinct cardinality exactly and the " +
    "mapping is deterministic and collision-free corpus-wide") {
    val rows = q("pii_pseudonymize").collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"pseudonymization changed cardinality: $r")
    }
    // corpus-wide: one pseudo token per user, never shared by two users
    val m = Tables.events(spark, sf)
      .select(col("user_id"),
        sha2(concat(lit("graft-salt-2026:"),
          col("user_id").cast("string")), 256).as("p"))
      .distinct()
    assert(m.count() === m.select("p").distinct().count())
    assert(m.count() === m.select("user_id").distinct().count())
  }
}
