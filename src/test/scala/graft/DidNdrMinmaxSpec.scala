package graft

import org.apache.spark.sql.functions._

/** Batch 23 replays: difference-in-differences uplift, net dollar
  * retention, and min/max envelope downsampling.
  */
class DidNdrMinmaxSpec extends SparkSpec {

  private def md5Grp(u: Long): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(u.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (h.charAt(0).toInt % 2 == 0) "A" else "B"
  }

  test("agg_did_uplift replays the paired-delta DiD and its z fence") {
    val cut = java.time.Instant.parse("2024-01-16T00:00:00Z")
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant, r.getDouble(2)))
    val perUser = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      val pre = rows.filter(_._2.isBefore(cut)).map(_._3).sum
      val post = rows.filterNot(_._2.isBefore(cut)).map(_._3).sum
      (md5Grp(u), post - pre)
    }
    val byGrp = perUser.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    def varS(xs: Seq[Double]) = {
      val m = mean(xs)
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val did = mean(byGrp("B")) - mean(byGrp("A"))
    val se = math.sqrt(varS(byGrp("A")) / byGrp("A").size +
      varS(byGrp("B")) / byGrp("B").size)
    val rows = q("agg_did_uplift").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("A", "B"))
    rows.foreach { r =>
      val g = r.getString(0)
      assert(r.getAs[Long]("n_users") === byGrp(g).size.toLong, g)
      assert(math.abs(r.getAs[Double]("mean_delta") - mean(byGrp(g)))
        <= 1.5e-3, g)
      assert(math.abs(r.getAs[Double]("did") - did) <= 1.5e-3)
      assert(math.abs(r.getAs[Double]("se") - se) <= 1.5e-3)
      assert(math.abs(r.getAs[Double]("z_stat") - did / se) <= 1.5e-2)
      assert(r.getAs[String]("verdict") ===
        (if (math.abs(r.getAs[Double]("z_stat")) < 1.959963985)
          "no_effect" else "significant"))
    }
  }

  test("agg_cohort_ndr anchors every cohort at 1.0 and replays the " +
    "revenue grid") {
    val ords = Tables(spark, sf, "orders")
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")) - 1)
          .as("q"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val cq = ords.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val grid = ords.groupBy(o => (cq(o._1), o._2 - cq(o._1))).view
      .mapValues(_.map(_._3).sum).toMap
    val rows = q("agg_cohort_ndr").collect()
    assert(rows.length === grid.size)
    rows.foreach { r =>
      val c = r.getInt(0) * 4 + r.getInt(1) - 1
      val key = (c, r.getInt(2))
      assert(math.abs(r.getAs[Double]("revenue") - grid(key)) <= 0.5, key)
      val ndr = grid(key) / grid((c, 0))
      assert(math.abs(r.getAs[Double]("ndr") - ndr) <= 1.5e-4, key)
      if (r.getInt(2) == 0) assert(r.getAs[Double]("ndr") === 1.0, key)
    }
  }

  test("resample_downsample_minmax keeps exactly the extreme rows per " +
    "bucket with deterministic tie-breaks") {
    val ev = Tables.events(spark, sf)
      .select("event_type", "ts", "value", "event_id").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2),
        r.getLong(3)))
    val byBucket = ev.groupBy(e =>
      (e._1, e._2.getTime / 1000 / 14400 * 14400))
    val rows = q("resample_downsample_minmax").collect()
    assert(rows.length === 2 * byBucket.size)
    rows.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val es = byBucket(key)
      assert(r.getAs[Long]("n_in_bucket") === es.length.toLong, key)
      val pick =
        if (r.getString(2) == "min")
          es.minBy(e => (e._3, e._2.getTime, e._4))
        else es.maxBy(e => (e._3, e._2.getTime, e._4))
      assert(r.getAs[Long]("event_id") === pick._4, (key, r.getString(2)))
      assert(math.abs(r.getAs[Double]("value") - pick._3) <= 1.5e-4)
    }
    // envelope property: min value <= max value in every bucket
    rows.groupBy(r => (r.getString(0), r.getLong(1))).foreach {
      case (k, rs) =>
        val m = rs.map(r => r.getString(2) -> r.getAs[Double]("value"))
          .toMap
        assert(m("min") <= m("max"), k)
    }
  }
}
