package graft

import org.apache.spark.sql.functions._

/** Batch 14a replays: the rank-statistics family — Spearman ρ, Kendall
  * tau-b, and the Mann–Whitney U test — each recomputed exactly on the
  * driver from the collected sf0.001 rows.
  */
class RankStatsSpec extends SparkSpec {

  /** Textbook fractional (average) ranks, 1-based. */
  private def midranks(xs: Seq[Double]): Seq[Double] = {
    val sorted = xs.sorted
    val firstIdx = scala.collection.mutable.Map.empty[Double, Int]
    sorted.zipWithIndex.foreach { case (v, i) =>
      if (!firstIdx.contains(v)) firstIdx(v) = i
    }
    val cnt = xs.groupBy(identity).view.mapValues(_.size).toMap
    xs.map(v => firstIdx(v) + 1 + (cnt(v) - 1) / 2.0)
  }

  private def pearson(a: Seq[Double], b: Seq[Double]): Double = {
    val n = a.size
    val (ma, mb) = (a.sum / n, b.sum / n)
    val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
    val (va, vb) = (a.map(x => (x - ma) * (x - ma)).sum,
      b.map(y => (y - mb) * (y - mb)).sum)
    cov / math.sqrt(va * vb)
  }

  test("agg_spearman_corr replays midrank Pearson over the per-customer " +
    "(frequency, monetary) aggregate") {
    val rows = q("agg_spearman_corr").collect()
    assert(rows.length === 1)
    val per = Tables(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).cast("double").as("f"), sum("o_totalprice").as("m"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val rho = pearson(midranks(per.map(_._1).toSeq),
      midranks(per.map(_._2).toSeq))
    assert(rows.head.getAs[Long]("n_customers") === per.length.toLong)
    val got = rows.head.getAs[Double]("spearman_rho")
    assert(math.abs(got - rho) <= 1.5e-4, s"got $got expected $rho")
    assert(got >= -1.0 && got <= 1.0)
    // frequency ties are real in this fixture — the midrank branch must
    // actually have fired (some customer order-count is shared)
    assert(per.map(_._1).distinct.length < per.length)
  }

  test("agg_kendall_tau replays the pairwise sign fold with both tie " +
    "margins") {
    val rows = q("agg_kendall_tau").collect()
    assert(rows.length === 1)
    val g = Tables(spark, sf, "customer")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).cast("double").as("x"), avg("c_acctbal").as("y"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1),
        r.getDouble(2)))
      .sortBy(_._1)
    val pairs = for {
      i <- g.indices; j <- g.indices if i < j
    } yield (g(i)._2 - g(j)._2, g(i)._3 - g(j)._3)
    val conc = pairs.count { case (dx, dy) => dx * dy > 0 }
    val disc = pairs.count { case (dx, dy) => dx * dy < 0 }
    val tx = pairs.count(_._1 == 0.0)
    val ty = pairs.count(_._2 == 0.0)
    val r = rows.head
    assert(r.getAs[Long]("n_pairs") === pairs.length.toLong)
    assert(r.getAs[Long]("concordant") === conc.toLong)
    assert(r.getAs[Long]("discordant") === disc.toLong)
    assert(r.getAs[Long]("ties_x") === tx.toLong)
    assert(r.getAs[Long]("ties_y") === ty.toLong)
    val tau = (conc - disc).toDouble /
      math.sqrt((pairs.length - tx).toDouble * (pairs.length - ty))
    assert(math.abs(r.getAs[Double]("tau_b") - tau) <= 1.5e-4)
    assert(math.abs(r.getAs[Double]("tau_b")) <= 1.0)
    // the bounded pre-aggregate is what makes O(n²) safe: 25 nations
    assert(pairs.length === g.length * (g.length - 1) / 2)
  }

  test("agg_mann_whitney replays the rank-sum U and the tie-corrected " +
    "z against a driver fold") {
    val rows = q("agg_mann_whitney").collect()
    assert(rows.length === 1)
    val ev = Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val rk = midranks(ev.map(_._2).toSeq)
    val n1 = ev.count(_._1 == "purchase")
    val n2 = ev.count(_._1 == "view")
    val r1 = ev.zip(rk).collect { case ((t, _), rnk) if t == "purchase" =>
      rnk }.sum
    val u = r1 - n1.toLong * (n1 + 1) / 2.0
    val tsum = ev.map(_._2).groupBy(identity).values
      .map(g => g.size.toDouble).map(t => t * t * t - t).sum
    val n = n1 + n2
    val z = (u - n1.toDouble * n2 / 2.0) /
      math.sqrt(n1.toDouble * n2 / 12.0 *
        ((n + 1) - tsum / (n.toDouble * (n - 1))))
    val row = rows.head
    assert(row.getAs[Long]("n_purchase") === n1.toLong)
    assert(row.getAs[Long]("n_view") === n2.toLong)
    assert(math.abs(row.getAs[Double]("u_stat") - u) <= 1.5e-2)
    assert(math.abs(row.getAs[Double]("z_stat") - z) <= 1.5e-3)
    // U is bounded by n1*n2 — a rank-sum arithmetic slip escapes [0, n1n2]
    assert(row.getAs[Double]("u_stat") >= 0.0 &&
      row.getAs[Double]("u_stat") <= n1.toDouble * n2)
  }
}
