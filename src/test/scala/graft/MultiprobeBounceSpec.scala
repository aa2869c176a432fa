package graft

import org.apache.spark.sql.functions._

/** Multiprobe LSH recall dominance + sessionized bounce-rate accounting. */
class MultiprobeBounceSpec extends SparkSpec {

  test("simsearch_lsh_multiprobe: recall@5 dominates single-probe on the " +
    "same queries, and candidates never duplicate") {
    val exact = q("simsearch_cosine_topk").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val by = rows.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      val rs = exact.map { case (qid, ex) =>
        by.getOrElse(qid, Set.empty).intersect(ex).size.toDouble / ex.size
      }
      rs.sum / rs.size
    }
    val multi = q("simsearch_lsh_multiprobe").collect()
    val single = q("simsearch_lsh_bucketed").collect()
    // no duplicate (q, candidate) rows: each candidate has ONE bucket
    assert(multi.map(r => (r.getLong(0), r.getLong(1))).distinct.length
      === multi.length)
    val (rm, rs) = (recall(multi), recall(single))
    assert(rm >= rs, s"multiprobe recall $rm below single-probe $rs")
    assert(rm >= 0.4, s"multiprobe recall $rm too low")
  }

  test("quality_bounce_rate: sessions and bounces reconcile with the " +
    "session operator, rates in [0,1], days cover the corpus") {
    val rows = q("quality_bounce_rate").collect()
    val sessions = graft.operators.Sessionize.byWindow(
      Tables.events(spark, sf), col("user_id"), col("ts"), "30 minutes")
      .collect()
    assert(rows.map(_.getLong(1)).sum === sessions.length)
    val bounces = sessions.count(_.getLong(2) == 1L)
    assert(rows.map(_.getLong(2)).sum === bounces)
    rows.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0 && rate <= 1)
      assert(math.abs(rate -
        BigDecimal(r.getLong(2).toDouble / r.getLong(1))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    }
  }
}
