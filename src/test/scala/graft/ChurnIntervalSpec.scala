package graft

import java.time.LocalDate
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.functions._

/** Batch 13c replays: quarterly churn, DAU/WAU stickiness, per-source
  * duplicate rate and the date-interval arithmetic family.
  */
class ChurnIntervalSpec extends SparkSpec {

  test("agg_churn_rate replays the quarter self-join and carries the " +
    "honest 100%-churn trailing quarter") {
    val out = q("agg_churn_rate").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val act = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")) - 1)
          .as("q")).distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val byQ = act.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    out.foreach { case (qtr, nAct, nRet, churn) =>
      val cur = byQ(qtr)
      val nxt = byQ.getOrElse(qtr + 1, Set.empty[Long])
      assert(nAct === cur.size.toLong, s"q=$qtr")
      assert(nRet === (cur & nxt).size.toLong, s"q=$qtr")
      assert(nRet <= nAct)
      assert(math.abs(churn -
        100.0 * (1.0 - nRet.toDouble / nAct)) <= 1.5e-2, s"q=$qtr")
    }
    val last = out.maxBy(_._1)
    assert(last._3 === 0L && last._4 === 100.0,
      "trailing quarter must churn 100% by construction")
    assert(out.map(_._1).toSet === byQ.keySet)
  }

  test("agg_stickiness_ratio: dau <= wau, ratio in (0,1], and the WAU " +
    "band replays a per-day distinct sweep") {
    val out = q("agg_stickiness_ratio").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    val du = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = du.map(_._1).toSet
    assert(out.map(_._1).toSet === days)
    out.foreach { case (day, dau, wau, ratio) =>
      val dauR = du.filter(_._1 == day).map(_._2).toSet
      val wauR = du.filter(t => !t._1.isAfter(day) &&
        !t._1.isBefore(day.minusDays(6))).map(_._2).toSet
      assert(dau === dauR.size.toLong, s"$day dau")
      assert(wau === wauR.size.toLong, s"$day wau")
      assert(dau <= wau)
      assert(ratio > 0.0 && ratio <= 1.0)
      assert(math.abs(ratio - dau.toDouble / wau) <= 1.5e-4, s"$day")
    }
  }

  test("quality_dup_rate_by_source: sources tile the corpus and dups " +
    "replay the global-canonical rule") {
    val out = q("quality_dup_rate_by_source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map { r =>
        val norm = r.getString(2).toLowerCase
          .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim
        (r.getString(0), r.getLong(1), norm)
      }
    assert(out.map(_._2).sum === docs.length.toLong)
    val canonical = docs.groupBy(_._3).view
      .mapValues(_.map(_._2).min).toMap
    val expected = docs.groupBy(_._1).view.mapValues { ds =>
      (ds.length.toLong, ds.count(d => canonical(d._3) != d._2).toLong)
    }.toMap
    out.foreach { case (src, nDocs, nDups, pct) =>
      val (en, ed) = expected(src)
      assert(nDocs === en, src)
      assert(nDups === ed, src)
      assert(math.abs(pct - 100.0 * ed.toDouble / en) <= 1.5e-2, src)
    }
  }

  test("fn_interval_family replays java.time calendar arithmetic " +
    "(month-end clamp included) for every order") {
    val rows = q("fn_interval_family").collect()
    assert(rows.nonEmpty)
    // o_orderdate ships as parquet TIMESTAMP (read back NTZ →
    // LocalDateTime in Rows); the derived columns are DATEs
    def ld(v: Any): LocalDate = v match {
      case d: java.sql.Date            => d.toLocalDate
      case t: java.time.LocalDateTime  => t.toLocalDate
      case t: java.sql.Timestamp       => t.toLocalDateTime.toLocalDate
      case other => fail(s"unexpected date repr: ${other.getClass}")
    }
    val eoy = LocalDate.parse("1998-12-31")
    rows.foreach { r =>
      val d = ld(r.get(1))
      assert(ld(r.get(2)) === d.plusMonths(3), s"$d plus_3mo")
      assert(ld(r.get(3)) === d.plusDays(45), s"$d plus_45d")
      assert(ld(r.get(4)) ===
        d.withDayOfMonth(d.lengthOfMonth), s"$d month_end")
      val qs = d.withDayOfMonth(1)
        .withMonth(((d.getMonthValue - 1) / 3) * 3 + 1)
      assert(ld(r.get(5)) === qs, s"$d q_start")
      assert(r.getInt(6).toLong === ChronoUnit.DAYS.between(d, eoy),
        s"$d days_to_eoy98")
    }
    // the clamp case must actually occur in the data: some order on a
    // 31-day month-end maps to a shorter month
    assert(rows.exists { r =>
      val d = ld(r.get(1))
      d.getDayOfMonth == 31 && ld(r.get(2)).getDayOfMonth < 31
    }, "no month-end clamp case exercised — pick a different offset")
  }
}
