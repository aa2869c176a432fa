package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** The quantile-fence twins of the three global-window keys
  * (`agg_rfm_segments`, `win_pareto_8020`, `win_rank_movers`): each twin
  * must (a) plan NO unpartitioned window — the whole point is removing
  * the single-task global sort — and (b) reconcile with its exact key on
  * testdata: row-identical where the construction is exact
  * (rank-by-counting, bucket-resolved crossing), tie-bounded where ntile
  * and value-banding legitimately differ (RFM).
  */
class FencesSpec extends SparkSpec {

  private def logicalWindows(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.optimizedPlan.collect { case w: LWindow => w }

  test("fence twins plan no unpartitioned window (the exact keys' " +
    "single-task global sort is gone)") {
    assert(logicalWindows(q("agg_rfm_segments_fences")).isEmpty,
      "rfm fences must not plan any window")
    assert(logicalWindows(q("win_rank_movers_fences")).isEmpty,
      "rank-movers fences must not plan any window")
    val pw = logicalWindows(q("win_pareto_8020_fences"))
    assert(pw.forall(_.partitionSpec.nonEmpty),
      "pareto fences may only use bucket-partitioned windows")
    // and the exact keys really do carry the global window the twins
    // remove — otherwise this spec pins nothing
    assert(logicalWindows(q("win_pareto_8020"))
      .exists(_.partitionSpec.isEmpty))
    assert(logicalWindows(q("agg_rfm_segments"))
      .exists(_.partitionSpec.isEmpty))
  }

  test("win_rank_movers_fences is row-identical to the exact key " +
    "(row_number == 1 + count-of-better under the same total order)") {
    def rows(k: String) = q(k).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2)),
        if (r.isNullAt(3)) None else Some(r.getInt(3)))
    }.toSeq
    val exact = rows("win_rank_movers")
    val twin = rows("win_rank_movers_fences")
    assert(exact.nonEmpty)
    assert(twin === exact,
      s"missed: ${exact.diff(twin)}; extra: ${twin.diff(exact)}")
  }

  test("win_pareto_8020_fences agrees with the exact key (±1 customer " +
    "at a float-boundary tie; same universe; consistent share)") {
    val e = q("win_pareto_8020").collect().head
    val f = q("win_pareto_8020_fences").collect().head
    assert(f.getLong(1) === e.getLong(1), "customer universe differs")
    assert(math.abs(f.getLong(0) - e.getLong(0)) <= 1L,
      s"n_top ${f.getLong(0)} vs exact ${e.getLong(0)}")
    val expShare = BigDecimal(f.getLong(0).toDouble / f.getLong(1))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(f.getDouble(2) - expShare) < 1e-9)
  }

  test("agg_rfm_segments_fences reconciles with the exact key: same " +
    "universe, marginal band sizes within the largest tie group of N/4") {
    val fen = q("agg_rfm_segments_fences").collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
        (r.getLong(3), r.getDouble(4))))
    assert(fen.length <= 64)
    assert(fen.forall { case ((r, f, m), _) =>
      Seq(r, f, m).forall(b => b >= 1 && b <= 4) })
    val cust = Tables(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(max("o_orderdate").as("last_order"),
        count(lit(1)).as("freq"),
        sum("o_totalprice").as("spend"))
      .select(datediff(col("last_order"), lit("1990-01-01").cast("date"))
          .as("rec_days"), col("freq"), col("spend"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val n = cust.length.toLong
    assert(fen.map(_._2._1).sum === n, "cells must conserve the universe")
    // value-banding vs ntile differ only where tied values straddle a
    // fence: each marginal band deviates from N/4 by at most the largest
    // tie group in that dimension (+2 slack for the fence row itself)
    def maxTie[A](vs: Seq[A]): Long =
      vs.groupBy(identity).values.map(_.size).max.toLong
    val tol = Map(
      0 -> (maxTie(cust.map(_._1).toSeq) + 2),
      1 -> (maxTie(cust.map(_._2).toSeq) + 2),
      2 -> (maxTie(cust.map(_._3).toSeq) + 2))
    for (dim <- 0 to 2; band <- 1 to 4) {
      val size = fen.filter { case ((r, f, m), _) =>
        Seq(r, f, m)(dim) == band }.map(_._2._1).sum
      assert(math.abs(size - n / 4.0) <= n / 4.0 * 0.05 + tol(dim),
        s"dim $dim band $band size $size vs ideal ${n / 4.0} " +
          s"(tie tolerance ${tol(dim)})")
    }
    // spend conservation through the cells (avg rounded to 2dp)
    val totSpend = cust.map(_._3).sum
    val cellSpend = fen.map { case (_, (c, a)) => c * a }.sum
    assert(math.abs(cellSpend - totSpend) <= 0.005 * n + 1.0,
      s"cell spend $cellSpend vs $totSpend")
  }
}
