package graft

import org.apache.spark.sql.functions._

/** Batch 13j replays: audience-overlap Jaccard, power analysis, and the
  * A/B lift CI.
  */
class OverlapPowerSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf)
    .select(col("event_type"), col("user_id"), col("value")).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))

  test("mine_user_overlap_jaccard replays set Jaccard for every ordered " +
    "type pair") {
    val out = q("mine_user_overlap_jaccard").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.nonEmpty)
    val sets = events.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val types = sets.keys.toSeq.sorted
    val expectedPairs = for {
      a <- types; b <- types if a < b && (sets(a) & sets(b)).nonEmpty
    } yield (a, b)
    assert(out.map(r => (r._1, r._2)).toSeq.sorted ===
      expectedPairs.sorted)
    out.foreach { case (ta, tb, na, nb, nBoth, j) =>
      val (sa, sb) = (sets(ta), sets(tb))
      assert(na === sa.size.toLong && nb === sb.size.toLong, s"$ta/$tb")
      assert(nBoth === (sa & sb).size.toLong, s"$ta/$tb")
      assert(math.abs(j - nBoth.toDouble / (sa | sb).size) <= 1.5e-4)
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("agg_power_analysis: MDE replays the closed form and shrinks " +
    "with sample size") {
    val out = q("agg_power_analysis").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    val z = 1.959963985 + 0.8416212336
    out.foreach { case (tpe, n, meanV, mde, rel) =>
      val vs = events.filter(_._1 == tpe).map(_._3)
      assert(n === vs.length.toLong, tpe)
      val m = vs.sum / vs.size
      val v = vs.map(x => (x - m) * (x - m)).sum / (vs.size - 1)
      assert(math.abs(meanV - m) <= 1.5e-4, tpe)
      assert(math.abs(mde - z * math.sqrt(2.0 * v / vs.size)) <= 1.5e-3,
        tpe)
      assert(math.abs(rel - 100.0 * mde / meanV) <= 1.5e-2, tpe)
      assert(mde > 0.0)
    }
    // the closed form's 1/sqrt(n): doubling the sample must shrink the
    // detectable effect for a fixed variance — check via the formula
    val (_, n0, _, mde0, _) = out.head
    assert(z * math.sqrt(2.0 / (2 * n0)) < z * math.sqrt(2.0 / n0))
    assert(mde0 > 0)
  }

  test("agg_ab_lift_ci replays the conditional fold and the verdict is " +
    "exactly |lift| > halfwidth") {
    val rows = q("agg_ab_lift_ci").collect()
    assert(rows.length === 1)
    val r = rows.head
    def grp(u: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      if (d.map("%02x".format(_)).mkString.charAt(0).toInt % 2 == 0) "A"
      else "B"
    }
    val a = events.filter(e => grp(e._2) == "A").map(_._3)
    val b = events.filter(e => grp(e._2) == "B").map(_._3)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    def varS(xs: Seq[Double]) = {
      val m = mean(xs); xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    assert(r.getAs[Long]("n_a") === a.length.toLong)
    assert(r.getAs[Long]("n_b") === b.length.toLong)
    assert(math.abs(r.getAs[Double]("mean_a") - mean(a)) <= 1.5e-4)
    assert(math.abs(r.getAs[Double]("mean_b") - mean(b)) <= 1.5e-4)
    assert(math.abs(r.getAs[Double]("lift") - (mean(b) - mean(a)))
      <= 2.5e-4)
    val hw = 1.959963985 *
      math.sqrt(varS(a) / a.length + varS(b) / b.length)
    assert(math.abs(r.getAs[Double]("ci95_halfwidth") - hw) <= 1.5e-3)
    assert(r.getAs[Boolean]("significant") ===
      (math.abs(r.getAs[Double]("lift")) >
        r.getAs[Double]("ci95_halfwidth")))
  }
}
