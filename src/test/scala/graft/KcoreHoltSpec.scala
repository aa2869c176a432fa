package graft

import org.apache.spark.sql.functions._

/** The two spec-gated iterative additions of batch 12c: k-core via the
  * h-index fixpoint (vs an exact driver-side min-degree peel) and Holt's
  * linear smoothing (vs the identical driver-side recurrence).
  */
class KcoreHoltSpec extends SparkSpec {

  test("graph_kcore: the h-index fixpoint equals an exact min-degree " +
    "peel, and coreness masses cover every node") {
    val rows = q("graph_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq === rows.map(_._1).toSeq.sorted)

    val edges = graft.queries.Pipeline.coEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = scala.collection.mutable.Map.empty[Long,
      scala.collection.mutable.Set[Long]]
    edges.foreach { case (u, v) =>
      adj.getOrElseUpdate(u, scala.collection.mutable.Set.empty) += v
      adj.getOrElseUpdate(v, scala.collection.mutable.Set.empty) += u
    }
    // Matula–Beck: repeatedly remove a minimum-degree node; its coreness
    // is the running max of the degree at removal time
    val deg = scala.collection.mutable.Map.empty[Long, Int] ++
      adj.view.mapValues(_.size)
    val remaining = scala.collection.mutable.Set.empty[Long] ++ adj.keys
    val core = scala.collection.mutable.Map.empty[Long, Int]
    var k = 0
    while (remaining.nonEmpty) {
      val v = remaining.minBy(n => (deg(n), n))
      k = math.max(k, deg(v))
      core(v) = k
      remaining -= v
      adj(v).foreach { u =>
        if (remaining.contains(u)) deg(u) = deg(u) - 1
      }
    }
    val expected = core.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
      .map { case (c, n) => (c.toLong, n) }.toSeq.sortBy(_._1)
    assert(rows.toSeq === expected)
    assert(rows.map(_._2).sum === adj.size.toLong)
  }

  test("resample_holt_linear: level/trend/forecast/MAE replay the " +
    "identical recurrence over the same hourly series") {
    val rows = q("resample_holt_linear").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hsec"))
      .agg(count(lit(1)).cast("double").as("y")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    rows.foreach { case (tpe, n, level, trend, fc3, mae) =>
      val ys = hourly(tpe).sortBy(_._2).map(_._3)
      assert(n === ys.length.toLong)
      var l = ys(1); var b = ys(1) - ys(0)
      var sae = 0.0; var cnt = 0L
      ys.drop(2).foreach { y =>
        sae += math.abs(y - (l + b)); cnt += 1
        val l2 = 0.5 * y + 0.5 * (l + b)
        b = 0.3 * (l2 - l) + 0.7 * b
        l = l2
      }
      assert(math.abs(level - l) < 1e-3, s"$tpe level $level vs $l")
      assert(math.abs(trend - b) < 1e-3, s"$tpe trend $trend vs $b")
      assert(math.abs(fc3 - (l + 3 * b)) < 1e-2)
      assert(math.abs(mae - sae / cnt) < 1e-3)
    }
  }
}
