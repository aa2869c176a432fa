package graft

import org.apache.spark.sql.functions._

/** Lorenz deciles + Jensen–Shannon divergence: curve geometry vs the Gini
  * companion, and the JS bounds/symmetry contract.
  */
class LorenzJsSpec extends SparkSpec {

  test("agg_lorenz_deciles: per segment the curve is increasing, ends at " +
    "1, sits below the diagonal, and deciles are depth-balanced") {
    val rows = q("agg_lorenz_deciles").collect()
    rows.groupBy(_.getString(0)).foreach { case (seg, grp) =>
      val curve = grp.sortBy(_.getInt(1))
      assert(curve.map(_.getInt(1)).toSeq === (1 to 10))
      val shares = curve.map(_.getDouble(3))
      shares.sliding(2).foreach {
        case Array(a, b) => assert(a < b + 1e-9, s"$seg not increasing")
        case _ =>
      }
      assert(math.abs(shares.last - 1.0) < 1e-9)
      // spend sorted ascending → decile d's cumulative share <= d/10
      shares.zipWithIndex.foreach { case (sh, i) =>
        assert(sh <= (i + 1) / 10.0 + 1e-6,
          s"$seg decile ${i + 1} share $sh above diagonal")
      }
      val counts = curve.map(_.getLong(2))
      assert(counts.max - counts.min <= 1, s"$seg deciles unbalanced")
    }
  }

  test("text_js_divergence is in [0, ln 2], and swapping the slices " +
    "gives the same value (symmetry)") {
    val Array(row) = q("text_js_divergence").collect()
    val js = row.getDouble(0)
    assert(js >= 0 && js <= math.log(2) + 1e-9, s"JS out of bounds: $js")
    assert(row.getLong(2) > 0, "no shared vocabulary — fixture broken?")
    assert(row.getLong(1) >= row.getLong(2))
    // symmetry via a driver-side recompute with roles swapped
    def dist(lang: String): Map[String, Double] = {
      val counts = Tables.documents(spark, sf)
        .filter(col("lang") === lang)
        .select(explode(split(lower(col("text")), " ")).as("t"))
        .filter(length(col("t")) >= 2)
        .groupBy("t").count().collect()
        .map(r => (r.getString(0), r.getLong(1).toDouble))
      val n = counts.map(_._2).sum
      counts.map { case (t, c) => (t, c / n) }.toMap
    }
    val (p, q2) = (dist("en"), dist("de"))
    def jsOf(a: Map[String, Double], b: Map[String, Double]): Double =
      (a.keySet ++ b.keySet).toSeq.map { t =>
        val (x, y) = (a.getOrElse(t, 0.0), b.getOrElse(t, 0.0))
        val m = (x + y) / 2
        (if (x > 0) x * math.log(x / m) else 0.0) / 2 +
          (if (y > 0) y * math.log(y / m) else 0.0) / 2
      }.sum
    val fwd = jsOf(p, q2)
    assert(math.abs(fwd - jsOf(q2, p)) < 1e-12)
    assert(math.abs(js - BigDecimal(fwd)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }
}
