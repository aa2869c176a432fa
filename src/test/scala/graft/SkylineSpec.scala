package graft

import org.apache.spark.sql.functions._

/** Skyline operator: brute-force dominance equality on the real table AND
  * on seeded random point sets (ties and duplicates included by the small
  * coordinate domain; many-partition layout exercised by the operator's
  * own repartition).
  */
class SkylineSpec extends SparkSpec {

  private def bruteForce(pts: Seq[(Long, Double, Double)])
      : Set[(Long, Double, Double)] =
    pts.filter { case (_, xa, ya) =>
      !pts.exists { case (_, xb, yb) =>
        xb <= xa && yb >= ya && (xb < xa || yb > ya)
      }
    }.toSet

  test("agg_skyline_pareto equals the brute-force dominance filter on " +
    "the part table, and the front is strictly monotone") {
    val got = q("agg_skyline_pareto").collect()
      .map(r => (r.getLong(0), r.getLong(1).toDouble, r.getDouble(2)))
    val pts = Tables.part(spark, sf)
      .select(col("p_partkey"), col("p_size").cast("double"),
        round(col("p_retailprice"), 2)).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(got.toSet === bruteForce(pts.toSeq))
    // distinct front points are strictly rising in price as size grows
    val distinctXY = got.map(p => (p._2, p._3)).distinct.sortBy(_._1).toSeq
    distinctXY.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._2 || a._1 == b._1,
        s"front not monotone: $a then $b")
      case _ =>
    }
  }

  test("Skyline.pareto matches brute force on seeded random point sets " +
    "with ties and duplicates") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 8).foreach { trial =>
      val pts = (0 until 60).map(i =>
        (i.toLong, rnd.nextInt(9).toDouble, rnd.nextInt(9).toDouble))
      val df = pts.toDF("k", "x", "y")
      val got = graft.operators.Skyline.pareto(spark, df, "k", "x", "y")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
        .toSet
      assert(got === bruteForce(pts), s"trial $trial")
    }
  }
}
