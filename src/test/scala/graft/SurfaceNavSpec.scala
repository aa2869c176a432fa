package graft

import org.apache.spark.sql.functions._

/** Batch-12g: IGNORE NULLS navigation, table-valued-function surface,
  * and the novelty key's no-shingle-join plan shape.
  */
class SurfaceNavSpec extends SparkSpec {

  test("win_ignore_nulls_family: LOCF/NOCB replay a driver-side sweep " +
    "and gaps never observe themselves") {
    val rows = q("win_ignore_nulls_family").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rows.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2, t._3))
    val expected = scala.collection.mutable.Map.empty[Long,
      (Option[Double], Option[Double], Option[Double])]
    ev.groupBy(_._1).foreach { case (_, es) =>
      val obs = es.map(e => if (e._4 == "purchase") Some(e._5) else None)
      val locf = obs.scanLeft(Option.empty[Double])(
        (acc, o) => o.orElse(acc)).drop(1)
      val nocb = obs.scanRight(Option.empty[Double])(
        (o, acc) => o.orElse(acc)).dropRight(1)
      es.indices.foreach { i =>
        expected(es(i)._3) = (obs(i), locf(i), nocb(i))
      }
    }
    def r4(o: Option[Double]) = o.map(v => BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    rows.foreach { case (eid, _, obs, locf, nocb) =>
      val (eo, el, en) = expected(eid)
      assert(obs === r4(eo) && locf === r4(el) && nocb === r4(en),
        s"event $eid")
    }
  }

  test("sql_tvf_family: the generated grid joins the real dim — rows " +
    "and the weighted sum replay from the nation table") {
    val rows = q("sql_tvf_family").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getLong(1),
        r.getInt(2), r.getInt(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val nations = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_regionkey")).collect()
      .map(r => (r.getAs[Number](0).longValue(),
        r.getAs[Number](1).longValue()))
    val elems = Seq((0, 10), (1, 20), (2, 30))
    val expected = (for {
      (nk, rk) <- nations
      (pos, cv) <- elems
    } yield ((rk, nk % 4, pos, cv), 1))
      .groupBy(_._1).view.mapValues(_.size.toLong).toSeq
      .map { case ((rk, gid, pos, cv), n) =>
        (rk, gid, pos, cv, n, gid * cv * n)
      }
      .sortBy(t => (t._1, t._2, t._3))
    assert(rows.toSeq === expected.map(t =>
      (t._1, t._2, t._3, t._4, t._5, t._6)))
  }

  test("text_ngram_novelty plans NO shingle-keyed join — the only join " +
    "in the plan is the doc-keyed count merge") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val plan = q("text_ngram_novelty").queryExecution.optimizedPlan
    val joins = plan.collect { case j: Join => j }
    assert(joins.length === 1, s"expected 1 join, got ${joins.length}")
    val cond = joins.head.condition.map(_.toString).getOrElse("")
    assert(cond.contains("doc_id"), s"join not doc-keyed: $cond")
    assert(!cond.contains("g#"), s"shingle-keyed join survived: $cond")
  }
}
