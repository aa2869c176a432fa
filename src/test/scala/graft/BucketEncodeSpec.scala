package graft

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Batch 13h: the sorted-single-file bucketed join (Sort-free AND
  * Exchange-free merge join) and leave-one-out target encoding.
  */
class BucketEncodeSpec extends SparkSpec {

  test("join_bucketed_sorted: the merge join subtree has NO Sort and NO " +
    "Exchange — one file per bucket makes the sortBy order trusted") {
    val df = q("join_bucketed_sorted")
    df.collect() // finalize any adaptive plan before inspecting it
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p +: (p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          unwrap(q.plan)
        case other => other.children.flatMap(unwrap)
      })
    val all = unwrap(df.queryExecution.executedPlan)
    val smj = all.collectFirst { case j: SortMergeJoinExec => j }
    assert(smj.nonEmpty, "expected a SortMergeJoin in\n" +
      df.queryExecution.executedPlan.toString.take(1500))
    val below = unwrap(smj.get).tail
    assert(!below.exists(_.isInstanceOf[SortExec]),
      "Sort below the merge join — the bucket sort order was not " +
        s"trusted:\n${smj.get.toString.take(1500)}")
    assert(!below.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"Exchange below the merge join:\n${smj.get.toString.take(1500)}")
    // and the values are the plain join's values
    val expect = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(round(sum("l_extendedprice"), 2).as("sum_price"),
        count(lit(1)).as("cnt"))
      .orderBy("o_orderstatus").collect().toSeq
    assert(df.collect().toSeq === expect)
  }

  test("agg_target_encoding: LOO identity holds row-for-row and the " +
    "smoothed encoding shrinks toward the prior") {
    val out = q("agg_target_encoding").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    val ords = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val byCat = ords.groupBy(_._2)
    val mu = ords.map(_._3).sum / ords.length
    val y = ords.map(o => o._1 -> (o._2, o._3)).toMap
    out.foreach { case (ok, cat, loo, smoothed) =>
      val (c, yi) = y(ok)
      assert(c === cat)
      val rows = byCat(c)
      val sum = rows.map(_._3).sum
      val n = rows.length
      // LOO identity: loo * (n-1) + y_i == category sum
      assert(math.abs(loo - (sum - yi) / (n - 1)) <= 1.5e-3, s"$ok loo")
      val sm = (sum - yi + 10.0 * mu) / (n - 1 + 10.0)
      assert(math.abs(smoothed - sm) <= 1.5e-3, s"$ok smoothed")
      // shrinkage: smoothed sits between the LOO mean and the prior
      val lo = math.min(loo, mu) - 1e-6
      val hi = math.max(loo, mu) + 1e-6
      assert(smoothed >= lo && smoothed <= hi, s"$ok not between")
    }
    assert(out.length === ords.length)
  }
}
