package graft

import org.apache.spark.sql.functions._

/** Experimentation statistics: Welch t closed-form replay, chi-square
  * structural invariants, and the A/B assignment contract.
  */
class ExperimentStatsSpec extends SparkSpec {

  test("agg_ttest_welch equals a driver-side closed-form computation") {
    val Array(row) = q("agg_ttest_welch").collect()
    def stats(t: String) = {
      val xs = Tables.events(spark, sf)
        .filter(col("event_type") === t).select("value")
        .collect().map(_.getDouble(0))
      val n = xs.length.toDouble
      val m = xs.sum / n
      val v = xs.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, v)
    }
    val (n1, m1, v1) = stats("purchase")
    val (n2, m2, v2) = stats("view")
    val se2 = v1 / n1 + v2 / n2
    val t = (m1 - m2) / math.sqrt(se2)
    val dof = se2 * se2 /
      (math.pow(v1 / n1, 2) / (n1 - 1) + math.pow(v2 / n2, 2) / (n2 - 1))
    assert(row.getLong(0) === n1.toLong && row.getLong(1) === n2.toLong)
    assert(math.abs(row.getDouble(2) - BigDecimal(t)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(math.abs(row.getDouble(3) - BigDecimal(dof)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // Welch dof is bounded by the two-sample extremes
    assert(dof >= math.min(n1, n2) - 1 && dof <= n1 + n2 - 2)
  }

  test("agg_chi2_independence: chi2 >= 0, dof = (types-1)(buckets-1), " +
    "counts conserve") {
    val Array(row) = q("agg_chi2_independence").collect()
    assert(row.getDouble(0) >= 0)
    assert(row.getLong(1) === 4L * 6L)
    assert(row.getLong(2) === Tables.events(spark, sf).count())
  }

  test("sample_ab_assignment: groups cover every user exactly once, " +
    "assignment is deterministic, and the SRM stat matches its counts") {
    val Array(row) = q("sample_ab_assignment").collect()
    val nUsers = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val (na, nb) = (row.getLong(0), row.getLong(1))
    assert(na + nb === nUsers)
    val tot = (na + nb).toDouble
    val chi2 = math.pow(na - tot / 2, 2) / (tot / 2) +
      math.pow(nb - tot / 2, 2) / (tot / 2)
    assert(math.abs(row.getDouble(2) - BigDecimal(chi2)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(row.getBoolean(3) === (chi2 > 3.84))
    // rerun identical (hash assignment has no RNG state)
    assert(q("sample_ab_assignment").collect().head.toString ===
      row.toString)
  }
}
