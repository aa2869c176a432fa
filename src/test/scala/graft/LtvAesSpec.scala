package graft

import org.apache.spark.sql.functions._

/** Cohort LTV monotonicity + replay, AES round-trip crypto contract,
  * freshness-lag arithmetic.
  */
class LtvAesSpec extends SparkSpec {

  test("agg_cohort_ltv: curves are non-decreasing in age and the final " +
    "point equals total purchase value per cohort user") {
    val rows = q("agg_cohort_ltv").collect()
    rows.groupBy(_.getDate(0).toString).foreach { case (c, grp) =>
      val curve = grp.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      curve.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b + 1e-9, s"$c LTV dips: $a -> $b")
        case _ =>
      }
    }
    val ev = Tables.events(spark, sf)
    val firstDay = ev.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort"))
    val expect = ev.filter(col("event_type") === "purchase")
      .join(firstDay, "user_id")
      .groupBy("cohort").agg(sum("value").as("rev"))
      .join(firstDay.groupBy("cohort").agg(count(lit(1)).as("n")), "cohort")
      .collect()
      .map(r => (r.getDate(0).toString,
        BigDecimal(r.getDouble(1) / r.getLong(2))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toMap
    val finals = rows.groupBy(_.getDate(0).toString).view
      .mapValues(g => g.maxBy(_.getInt(1)).getDouble(2)).toMap
    finals.foreach { case (c, v) =>
      assert(math.abs(v - expect(c)) < 1e-9, s"cohort $c: $v vs ${expect(c)}")
    }
  }

  test("fn_aes_roundtrip: decrypt∘encrypt is the identity everywhere, " +
    "ciphertexts are injective and never contain the plaintext") {
    val rows = q("fn_aes_roundtrip").collect()
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2), s"round-trip loss: $r")
    }
    // direct row-level check incl. ciphertext != plaintext bytes
    val probe = Tables.customer(spark, sf)
      .select(col("c_custkey").cast("string").as("p"))
      .withColumn("ct", expr("aes_encrypt(p, 'graft-0123456789', 'ECB')"))
      .withColumn("rt",
        expr("CAST(aes_decrypt(ct, 'graft-0123456789', 'ECB') AS STRING)"))
    assert(probe.filter(col("rt") =!= col("p")).count() === 0)
    assert(probe.filter(expr("CAST(ct AS STRING)") === col("p")).count() === 0)
    // deterministic ECB: re-encrypting yields identical ciphertext
    val twice = probe.withColumn("ct2",
      expr("aes_encrypt(p, 'graft-0123456789', 'ECB')"))
    assert(twice.filter(col("ct") =!= col("ct2")).count() === 0)
  }

  test("quality_freshness_lag: the freshest stream lags 0 and every lag " +
    "recomputes from the per-type max timestamps") {
    val rows = q("quality_freshness_lag").collect()
    assert(rows.map(_.getDouble(2)).min === 0.0)
    val maxes = Tables.events(spark, sf).groupBy("event_type")
      .agg(max(unix_timestamp(col("ts"))).as("m")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val global = maxes.values.max
    rows.foreach { r =>
      val expect = BigDecimal((global - maxes(r.getString(0))) / 60.0)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(2) - expect) < 1e-9)
    }
  }
}
