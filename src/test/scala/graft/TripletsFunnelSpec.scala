package graft

import org.apache.spark.sql.functions._

/** Contrastive triplet mining + conversion-latency funnel: label
  * contracts, self-exclusion, determinism, and a driver-side latency
  * replay.
  */
class TripletsFunnelSpec extends SparkSpec {

  test("sample_contrastive_triplets: every anchor gets exactly one " +
    "triplet; positive shares the label, negative never does, and no " +
    "pick is the anchor itself") {
    val rows = q("sample_contrastive_triplets").collect()
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(rows.length === labels.size)
    assert(rows.map(_.getLong(0)).distinct.length === labels.size)
    rows.foreach { r =>
      val (a, lab, p, n) =
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))
      assert(p != a, s"positive is the anchor: $r")
      assert(labels(p) === lab, s"positive label mismatch: $r")
      assert(labels(n) !== lab, s"negative shares the label: $r")
    }
    // deterministic: a second run picks identical triplets
    val again = q("sample_contrastive_triplets").collect()
    assert(rows.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("funnel_time_to_convert matches a driver-side replay of " +
    "signup -> first qualifying purchase") {
    val Array(row) = q("funnel_time_to_convert").collect()
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("signup", "purchase"))
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val latencies = byUser.flatMap { case (_, rows) =>
      val signups = rows.filter(_._2 == "signup").map(_._3)
      if (signups.isEmpty) None
      else {
        val s0 = signups.min
        val after = rows.filter(r => r._2 == "purchase" && r._3 >= s0)
        if (after.isEmpty) None else Some(after.map(_._3).min - s0)
      }
    }.toSeq.sorted
    val nSignup = byUser.count(_._2.exists(_._2 == "signup"))
    assert(row.getLong(0) === nSignup)
    assert(row.getLong(1) === latencies.size)
    def q7(p: Double): Double = {
      val pos = (latencies.size - 1) * p
      val (lo, hi) = (latencies(pos.toInt), latencies(math.ceil(pos).toInt))
      BigDecimal(lo + (pos - pos.toInt) * (hi - lo))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(math.abs(row.getDouble(3) - q7(0.5)) < 1e-9)
    assert(math.abs(row.getDouble(4) - q7(0.9)) < 1e-9)
  }
}
