package graft

import org.apache.spark.sql.functions._

/** Batch 13f: the calendar-interval RANGE frame and the IDENTIFIER()
  * clause.
  */
class IntervalFrameSpec extends SparkSpec {

  test("win_range_interval_frame replays a per-row trailing-hour sweep " +
    "and the frame is tie-inclusive") {
    val out = q("win_range_interval_frame").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3)))
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"),
        col("ts").cast("double").as("sec")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3)))
    val byType = ev.groupBy(_._2)
    val byId = ev.map(e => e._1 -> e).toMap
    out.foreach { case (id, tpe, hrSum, hrN) =>
      val me = byId(id)
      val frame = byType(tpe).filter(e =>
        e._4 >= me._4 - 3600.0 && e._4 <= me._4)
      assert(hrN === frame.length.toLong, s"event $id frame size")
      assert(math.abs(hrSum - frame.map(_._3).sum) <= 1.5e-2,
        s"event $id sum")
      // the row itself is always in its own frame
      assert(hrN >= 1L)
    }
  }

  test("sql_identifier_clause resolves to exactly the hard-coded query " +
    "(same rows, and the parameter cannot smuggle SQL)") {
    val out = q("sql_identifier_clause").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val direct = Tables.supplier(spark, sf)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_supp"),
        round(sum("s_acctbal"), 2).as("total_bal"))
      .orderBy("s_nationkey").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === direct.toSeq)
    // IDENTIFIER is a name, not a splice point: an injection-shaped
    // parameter must fail to parse as an identifier, not execute
    Tables.supplier(spark, sf)
      .createOrReplaceTempView("graft_ident_supp")
    val boom = intercept[Exception] {
      spark.sql("SELECT count(*) AS n FROM IDENTIFIER(:tbl)",
        Map("tbl" -> "graft_ident_supp WHERE 1=0 --")).collect()
    }
    assert(boom.getMessage != null)
  }
}
