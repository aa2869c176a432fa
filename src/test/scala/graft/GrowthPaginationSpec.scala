package graft

import org.apache.spark.sql.functions._

/** MoM growth arithmetic + LIMIT/OFFSET slice identity. */
class GrowthPaginationSpec extends SparkSpec {

  test("agg_mom_growth recomputes from its own revenue column and the " +
    "first month has no growth figure") {
    val rows = q("agg_mom_growth").collect()
    assert(rows.nonEmpty)
    assert(rows.head.isNullAt(3))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val expect = BigDecimal(
          (b.getDouble(1) - a.getDouble(1)) / a.getDouble(1) * 100)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(b.getDouble(3) - expect) < 1e-9, s"$a -> $b")
      case _ =>
    }
  }

  test("sort_limit_offset returns exactly rows 41..60 of the total " +
    "ordering") {
    val page = q("sort_limit_offset").collect()
    assert(page.length === 20)
    val full = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy(col("price").desc, col("o_orderkey").asc)
      .limit(60).collect()
    assert(page.map(_.toString).toSeq ===
      full.slice(40, 60).map(_.toString).toSeq)
  }
}
