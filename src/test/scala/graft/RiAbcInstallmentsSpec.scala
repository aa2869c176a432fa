package graft

import org.apache.spark.sql.functions._

/** Batch 18 replays: referential-integrity audit, ABC classification, and
  * installment-schedule generation.
  */
class RiAbcInstallmentsSpec extends SparkSpec {

  test("quality_referential_integrity reports a clean star schema on the " +
    "fixture and counts planted orphans exactly") {
    val rows = q("quality_referential_integrity").collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_child") > 0L, r.getString(0))
      assert(r.getAs[Long]("n_orphans") === 0L, r.getString(0))
      assert(r.getAs[Double]("orphan_rate") === 0.0, r.getString(0))
    }

    // plant orphans: drop every 10th order — its lineitems must show up
    // as orphans on the lineitem->orders edge, all other edges stay clean
    val dir = java.nio.file.Files.createTempDirectory("ri_spec").toFile
    dir.deleteOnExit()
    val d = dir.getAbsolutePath
    Seq("lineitem", "part", "supplier", "customer", "nation", "region")
      .foreach { n =>
        Tables(spark, sf, n).write.mode("overwrite")
          .parquet(s"$d/$n.parquet")
      }
    Tables(spark, sf, "orders").filter(col("o_orderkey") % 10 =!= 0)
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val expOrph = Tables(spark, sf, "lineitem")
      .filter(col("l_orderkey") % 10 === 0).count()
    val planted = SparkEntry
      .queries("quality_referential_integrity")(spark, d).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_orphans")).toMap
    assert(planted("lineitem.l_orderkey->orders") === expOrph)
    assert(planted.filterNot(_._1 == "lineitem.l_orderkey->orders")
      .values.forall(_ === 0L))
  }

  test("agg_abc_classification replays the per-brand cumulative cut and " +
    "its shares sum to one per brand") {
    val rev = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expect = rev.groupBy(_._1).view.mapValues { ps =>
      val sorted = ps.sortBy(p => (-p._3, p._2))
      val tot = sorted.map(_._3).sum
      var cum = 0.0
      sorted.map { p =>
        cum += p._3
        val cls = if (cum / tot <= 0.8) "A"
          else if (cum / tot <= 0.95) "B" else "C"
        (cls, p._3)
      }.groupBy(_._1).view
        .mapValues(v => (v.size.toLong, v.map(_._2).sum / tot)).toMap
    }.toMap
    val rows = q("agg_abc_classification").collect()
    rows.foreach { r =>
      val (b, c) = (r.getString(0), r.getString(1))
      val (n, share) = expect(b)(c)
      assert(r.getAs[Long]("n_parts") === n, (b, c))
      assert(math.abs(r.getAs[Double]("revenue_share") - share)
        <= 1.5e-4, (b, c))
    }
    rows.groupBy(_.getString(0)).foreach { case (b, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("revenue_share")).sum - 1.0)
        <= 1e-2, b)
      assert(rs.map(_.getString(1)).toSet.subsetOf(Set("A", "B", "C")), b)
    }
    assert(rows.map(r => (r.getString(0), r.getString(1))).toSet ===
      expect.toSeq.flatMap { case (b, m) => m.keys.map(b -> _) }.toSet)
  }

  test("fn_generate_installments conserves every order total to the " +
    "cent and schedules months forward") {
    val rows = q("fn_generate_installments").collect()
    val totals = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        to_date(col("o_orderdate")).as("od")).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1),
        r.getDate(2).toLocalDate)).toMap
    val byOrder = rows.groupBy(_.getLong(0))
    assert(byOrder.keySet === totals.keySet)
    byOrder.foreach { case (ok, rs) =>
      val k = (ok % 3 + 1).toInt
      assert(rs.length === k, ok)
      assert(rs.map(_.getAs[Int]("inst_no")).sorted.toSeq ===
        (1 to k).toSeq, ok)
      val (total, od) = totals(ok)
      // conservation to the cent, as BigDecimal cents
      val cents = rs.map(r =>
        BigDecimal(r.getAs[Double]("amount")).setScale(2,
          BigDecimal.RoundingMode.HALF_UP)).sum
      assert((cents - BigDecimal(total).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).abs <= BigDecimal("0.01"), ok)
      rs.foreach { r =>
        val due = r.getDate(rs.head.fieldIndex("due_month")).toLocalDate
        assert(due === od.plusMonths(r.getAs[Int]("inst_no").toLong), ok)
      }
    }
  }
}
