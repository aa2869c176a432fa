package graft

import org.apache.spark.sql.functions._

/** Batch r13-1 replays: Nelson–Aalen cumulative hazard, Brown–Forsythe
  * variance homogeneity, top-K OOV rate, and the stochastic oscillator.
  */
class HazardLeveneOovSpec extends SparkSpec {

  test("agg_nelson_aalen: hazard is the ordered cumsum of d/n, " +
    "fh_survival = exp(-H), and exp(-H) dominates the KM curve") {
    val na = q("agg_nelson_aalen").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(na.nonEmpty)
    var h = 0.0
    na.foreach { case (day, nRisk, dEv, cumH, fh) =>
      assert(dEv > 0 && nRisk >= dEv, day)
      h += dEv.toDouble / nRisk
      assert(math.abs(cumH - h) <= 1e-6 + 1e-9, s"day $day cumsum")
      assert(math.abs(fh - math.exp(-h)) <= 1e-6 + 1e-9, s"day $day fh")
    }
    // same subjects reduction as KM: (t_day, n_risk, d_events) agree,
    // and exp(-H(t)) >= S_KM(t) pointwise (standard estimator bound)
    val km = q("agg_survival_km").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(na.map(_._1).toSet === km.keySet)
    na.foreach { case (day, nRisk, dEv, _, fh) =>
      val (kn, kd, ks) = km(day)
      assert(kn === nRisk && kd === dEv, day)
      assert(fh >= ks - 1e-6, s"day $day: exp(-H) below KM")
    }
  }

  test("agg_levene_test replays the Brown–Forsythe W from raw events") {
    val vals = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def median(xs: Array[Double]): Double = {
      val n = xs.length
      if (n % 2 == 1) xs(n / 2) else (xs(n / 2 - 1) + xs(n / 2)) / 2.0
    }
    val zByGroup = vals.map { case (g, xs) =>
      val m = median(xs); g -> xs.map(x => math.abs(x - m))
    }
    val k = zByGroup.size.toDouble
    val nn = zByGroup.values.map(_.length).sum.toDouble
    val gm = zByGroup.values.flatten.sum / nn
    val ssb = zByGroup.values.map { zs =>
      val m = zs.sum / zs.length
      zs.length * (m - gm) * (m - gm)
    }.sum
    val ssw = zByGroup.values.map { zs =>
      val m = zs.sum / zs.length
      zs.map(z => (z - m) * (z - m)).sum
    }.sum
    val w = (ssb / (k - 1)) / (ssw / (nn - k))
    val row = q("agg_levene_test").collect().head
    assert(math.abs(row.getDouble(0) - w) <= 5e-4, s"${row.getDouble(0)} vs $w")
    assert(row.getLong(1) === (k - 1).toLong)
    assert(row.getLong(2) === (nn - k).toLong)
  }

  test("text_oov_rate replays the top-2000 vocabulary and per-lang " +
    "OOV counts exactly") {
    val toks = Tables(spark, sf, "documents")
      .select("lang", "text").collect()
      .flatMap { r =>
        r.getString(1).toLowerCase.split(" ")
          .filter(_.length >= 2).map(t => (r.getString(0), t))
      }
    val vocab = toks.groupBy(_._2).view.mapValues(_.length).toSeq
      .sortBy { case (t, c) => (-c, t) }.take(2000).map(_._1).toSet
    val expected = toks.groupBy(_._1).view.mapValues { ts =>
      val total = ts.length.toLong
      val oov = ts.count(t => !vocab(t._2)).toLong
      (total, oov)
    }.toMap
    q("text_oov_rate").collect().foreach { r =>
      val (total, oov) = expected(r.getString(0))
      assert(r.getLong(1) === total, r.getString(0))
      assert(r.getLong(2) === oov, r.getString(0))
      assert(math.abs(r.getDouble(3) - oov.toDouble / total) <= 5.001e-5)
    }
  }

  test("agg_cr_concentration replays top-k shares from per-supplier " +
    "revenue and CR is nondecreasing in k") {
    val revs = Tables.lineitem(spark, sf)
      .join(Tables(spark, sf, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (k, v) => (-v, k) }.map(_._2)
    val total = revs.sum
    val rows = q("agg_cr_concentration").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(3))).sortBy(_._1)
    val expectKs = Seq(4, 8, 20).filter(_ <= revs.length)
    assert(rows.map(_._1).toSeq === expectKs)
    rows.foreach { case (k, topK, cr) =>
      assert(math.abs(topK - revs.take(k).sum) <= 0.011, s"k=$k")
      assert(math.abs(cr - revs.take(k).sum / total) <= 5.001e-4, s"k=$k")
    }
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3 + 1e-9)
      case _ =>
    }
  }

  test("agg_price_volume_mix: the waterfall identity rev1 - rev0 = " +
    "price + volume + new + lost holds, and years derive from the data") {
    val r = q("agg_price_volume_mix").collect().head
    val minYear = Tables.lineitem(spark, sf)
      .agg(min(year(col("l_shipdate")))).collect()(0).getInt(0)
    assert(r.getInt(0) === minYear && r.getInt(1) === minYear + 1)
    val delta = r.getDouble(3) - r.getDouble(2)
    val parts = r.getDouble(4) + r.getDouble(5) + r.getDouble(6) +
      r.getDouble(7)
    assert(math.abs(delta - parts) <= 0.05,
      s"waterfall identity: $delta vs $parts")
    assert(r.getDouble(6) >= 0.0 && r.getDouble(7) <= 0.0)
  }

  test("agg_growth_accounting: flows replay from per-user day sets and " +
    "conserve actives (new+retained+resurrected = DAU)") {
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val maxDay = byUser.values.flatten.max
    val flows = scala.collection.mutable.Map
      .empty[java.time.LocalDate, Array[Long]] // new, ret, res, churn
    def acc(d: java.time.LocalDate, i: Int): Unit =
      flows.getOrElseUpdate(d, Array(0L, 0L, 0L, 0L))(i) += 1
    byUser.values.foreach { days =>
      days.zipWithIndex.foreach { case (d, i) =>
        if (i == 0) acc(d, 0)
        else if (java.time.temporal.ChronoUnit.DAYS
          .between(days(i - 1), d) == 1) acc(d, 1)
        else acc(d, 2)
        val isLast = i == days.length - 1
        val gapNext = !isLast && java.time.temporal.ChronoUnit.DAYS
          .between(d, days(i + 1)) > 1
        if ((isLast || gapNext) && d.isBefore(maxDay))
          acc(d.plusDays(1), 3)
      }
    }
    val dau = byUser.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val rows = q("agg_growth_accounting").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val f = flows.getOrElse(d, Array(0L, 0L, 0L, 0L))
      assert(r.getLong(1) === f(0), s"$d new")
      assert(r.getLong(2) === f(1), s"$d retained")
      assert(r.getLong(3) === f(2), s"$d resurrected")
      assert(r.getLong(4) === f(3), s"$d churned")
      // conservation: the three inflows partition that day's actives
      assert(f(0) + f(1) + f(2) === dau.getOrElse(d, 0L), s"$d dau")
    }
  }

  test("stat_crosstab cells replay the grouped counts and row-sums " +
    "cover every order") {
    val expected = Tables(spark, sf, "orders")
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .withDefaultValue(0L)
    val rows = q("stat_crosstab").collect()
    var total = 0L
    rows.foreach { r =>
      val p = r.getString(0)
      assert(r.getLong(1) === expected((p, "F")), p)
      assert(r.getLong(2) === expected((p, "O")), p)
      assert(r.getLong(3) === expected((p, "P")), p)
      total += r.getLong(1) + r.getLong(2) + r.getLong(3)
    }
    assert(total === Tables(spark, sf, "orders").count())
  }

  test("fn_na_family: fill/replace replay per-row, and na.drop equals " +
    "the SQL null filter") {
    val parts = Tables(spark, sf, "part")
      .select("p_partkey", "p_size", "p_brand").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2)))).toMap
    q("fn_na_family").collect().foreach { r =>
      val (sz, brand) = parts(r.getLong(0))
      assert(r.getInt(1) === (if (sz == 25) -1 else sz))
      val expBrand =
        if (r.getLong(0) % 7 == 0) "UNKNOWN"
        else if (brand == "Brand#11") "B11" else brand
      assert(r.getString(2) === expBrand, r.getLong(0))
    }
    // the na.drop face of the same API: row count equals the SQL filter
    val withNulls = Tables(spark, sf, "part").select(
      col("p_partkey"),
      expr("nullif(p_size, 25)").as("maybe_size"),
      expr("CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_brand END")
        .as("maybe_brand"))
    assert(withNulls.na.drop().count() ===
      withNulls.filter(col("maybe_size").isNotNull &&
        col("maybe_brand").isNotNull).count())
  }

  test("mine_attribution_shapley: 4 channels x 8 coalitions each, and " +
    "the efficiency identity sum(phi) = v(full) - v(empty) holds") {
    val rows = q("mine_attribution_shapley").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(rows.map(_._1).sorted.toSeq ===
      Seq("click", "error", "signup", "view"))
    rows.foreach { case (_, _, n) => assert(n === 8L) }
    // driver replay of the game: v(S) from the raw events, v=0 for
    // unobserved masks (the stated convention)
    val per = Tables.events(spark, sf)
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def maskOf(ts: Set[String]): Int =
      (if (ts("click")) 1 else 0) | (if (ts("view")) 2 else 0) |
        (if (ts("signup")) 4 else 0) | (if (ts("error")) 8 else 0)
    val byMask = per.values.groupBy(maskOf)
    val v = (0 until 16).map { m =>
      m -> byMask.get(m).map { users =>
        users.count(_("purchase")).toDouble / users.size
      }.getOrElse(0.0)
    }.toMap
    val phiSum = rows.map(_._2).sum
    assert(math.abs(phiSum - (v(15) - v(0))) <= 5e-6,
      s"efficiency: $phiSum vs ${v(15) - v(0)}")
    // spot-replay one channel exactly
    val wts = Map(0 -> 0.25, 1 -> 0.08333333333333333,
      2 -> 0.08333333333333333, 3 -> 0.25)
    val phiClick = (0 until 16).filter(m => (m & 1) == 0).map { m =>
      math.round((v(m | 1) - v(m)) * wts(Integer.bitCount(m)) * 1e12)
    }.sum / 1e12
    val got = rows.find(_._1 == "click").get._2
    assert(math.abs(got - phiClick) <= 5.001e-7)
  }

  test("quality_key_skew_audit replays the per-key count summary") {
    val cnts = Tables.events(spark, sf)
      .groupBy("user_id").count().collect().map(_.getLong(1)).sorted
    def pct(p: Double): Double = {
      val h = (cnts.length - 1) * p
      val lo = h.toInt
      if (lo + 1 < cnts.length)
        cnts(lo) + (h - lo) * (cnts(lo + 1) - cnts(lo))
      else cnts(lo).toDouble
    }
    val r = q("quality_key_skew_audit").collect().head
    assert(r.getLong(0) === cnts.length.toLong)
    assert(r.getLong(1) === cnts.sum)
    assert(r.getLong(2) === cnts.max)
    assert(math.abs(r.getDouble(3) - pct(0.5)) <= 5.001e-3)
    assert(math.abs(r.getDouble(4) - pct(0.99)) <= 5.001e-3)
    assert(math.abs(r.getDouble(6) - cnts.max.toDouble / cnts.sum)
      <= 5.001e-7)
  }

  test("text_vocab_coverage: coverage is nondecreasing in k and k=100 " +
    "replays from driver-side bigram counts") {
    val rows = q("text_vocab_coverage").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(100, 250, 500, 750))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 <= b._2 && a._4 <= b._4 + 1e-9)
      case _ =>
    }
    val bgs = Tables(spark, sf, "documents").select("text").collect()
      .flatMap { r =>
        val t = r.getString(0).toLowerCase.split(" ")
        t.sliding(2).filter(_.length == 2).map(_.mkString(" "))
      }
    val ranked = bgs.groupBy(identity).view.mapValues(_.length).toSeq
      .sortBy { case (b, c) => (-c, b) }
    val cum100 = ranked.take(100).map(_._2.toLong).sum
    val (_, cov, total, share) = rows.head
    assert(cov === cum100)
    assert(total === bgs.length.toLong)
    assert(math.abs(share - cum100.toDouble / bgs.length) <= 5.001e-5)
  }

  test("agg_multi_distinct_mixed: replays per-group distincts and plans " +
    "the Expand multi-distinct rewrite") {
    val plan = q("agg_multi_distinct_mixed")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"),
      "two DISTINCT columns + plain aggregates must plan via Expand")
    val expected = Tables(spark, sf, "orders")
      .select(col("o_orderpriority"), col("o_custkey"),
        year(col("o_orderdate")).as("yr")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1)
    q("agg_multi_distinct_mixed").collect().foreach { r =>
      val g = expected(r.getString(0))
      assert(r.getLong(1) === g.map(_._2).distinct.length.toLong)
      assert(r.getLong(2) === g.map(_._3).distinct.length.toLong)
      assert(r.getLong(3) === g.length.toLong)
    }
  }

  test("agg_hist_log_bins: decades tile the order count and every bin's " +
    "min/max stay inside its decade") {
    val rows = q("agg_hist_log_bins").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._2).sum === Tables(spark, sf, "orders").count())
    rows.foreach { case (dec, _, mn, mx) =>
      assert(mn >= math.pow(10, dec) - 0.01, s"decade $dec min")
      assert(mx < math.pow(10, dec + 1) + 0.01, s"decade $dec max")
      assert(mn <= mx)
    }
  }

  test("agg_ratio_delta_ci replays the delta-method SE from the " +
    "customer-grain pre-aggregate") {
    val per = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "c_custkey")
      .agg(sum("o_totalprice").as("x"), count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getLong(3).toDouble))
      .groupBy(_._1)
    q("agg_ratio_delta_ci").collect().foreach { row =>
      val g = per(row.getString(0))
      val k = g.length.toDouble
      val xs = g.map(_._2); val ns = g.map(_._3)
      val mx = xs.sum / k; val mn = ns.sum / k
      val r = mx / mn
      def varS(v: Array[Double], m: Double) =
        v.map(a => (a - m) * (a - m)).sum / (k - 1)
      val cov = xs.zip(ns).map { case (a, b) => (a - mx) * (b - mn) }
        .sum / (k - 1)
      val se = math.sqrt(math.max(0.0,
        (varS(xs, mx) - 2 * r * cov + r * r * varS(ns, mn)) /
          (k * mn * mn)))
      assert(row.getLong(1) === g.length.toLong)
      assert(math.abs(row.getDouble(2) - r) <= 5.001e-4)
      assert(math.abs(row.getDouble(3) - se) <= 5.001e-4)
      assert(row.getDouble(4) < row.getDouble(2) &&
        row.getDouble(2) < row.getDouble(5))
    }
  }

  test("quality_ts_monotonic replays the per-user inversion census") {
    val seqs = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    var pairs = 0L; var invs = 0L; var affected = 0L
    seqs.values.foreach { ts =>
      val inv = ts.sliding(2).count(p => p.length == 2 && p(0) > p(1))
      pairs += math.max(0, ts.length - 1)
      invs += inv
      if (inv > 0) affected += 1
    }
    val r = q("quality_ts_monotonic").collect().head
    assert(r.getLong(0) === pairs)
    assert(r.getLong(1) === invs)
    assert(r.getLong(2) === affected)
  }

  test("embedding_dim_audit: 64 dims, every dim sees every vector, and " +
    "dim 0 replays from the raw vectors") {
    val rows = q("embedding_dim_audit").collect()
    assert(rows.length === 64)
    val nVecs = Tables(spark, sf, "embeddings").count()
    rows.foreach(r => assert(r.getLong(1) === nVecs))
    val d0 = Tables(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).head.toDouble)
    val mean = d0.sum / d0.length
    val sd = math.sqrt(d0.map(v => (v - mean) * (v - mean)).sum /
      (d0.length - 1))
    val r0 = rows.find(_.getInt(0) == 0).get
    assert(math.abs(r0.getDouble(2) - mean) <= 5.001e-5)
    assert(math.abs(r0.getDouble(3) - sd) <= 5.001e-5)
    assert(r0.getLong(4) === d0.count(_ == 0.0).toLong)
    assert(math.abs(r0.getDouble(5) - d0.map(math.abs).max) <= 5.001e-5)
  }

  test("fn_trig_family replays per-row from java.lang.Math") {
    val parts = Tables(spark, sf, "part")
      .select("p_partkey", "p_size").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    q("fn_trig_family").collect().take(50).foreach { r =>
      val k = r.getLong(0); val sz = parts(k).toDouble
      def ok(got: Double, exp: Double, scale: Double = 5.001e-7) =
        assert(math.abs(got - exp) <= scale, s"key $k")
      ok(r.getDouble(1), math.sin(sz / 10.0))
      ok(r.getDouble(2), math.cos(sz / 10.0))
      ok(r.getDouble(3), math.tan(sz / 50.0))
      ok(r.getDouble(4), math.asin(sz / 50.0 - 0.5))
      ok(r.getDouble(5), math.atan2(sz, k.toDouble))
      ok(r.getDouble(6), math.toDegrees(math.atan(sz / 10.0)), 5.001e-5)
      ok(r.getDouble(7), math.toRadians(sz))
    }
  }

  test("dedup_intradoc replays the per-doc passage multiset exactly") {
    val expected = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map { r =>
        val t = r.getString(1).toLowerCase.split(" ")
        val passages = t.indices.by(8)
          .map(i => t.slice(i, i + 8).mkString(" "))
        val total = passages.length.toLong
        val distinct = passages.distinct.length.toLong
        r.getLong(0) -> ((total, distinct))
      }.toMap
    val rows = q("dedup_intradoc").collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (total, distinct) = expected(r.getLong(0))
      assert(r.getLong(1) === total, r.getLong(0))
      assert(r.getLong(2) === distinct, r.getLong(0))
      assert(r.getLong(3) === total - distinct, r.getLong(0))
    }
  }

  test("sample_systematic: exact ceil(n/100) rows per stratum, rerun-" +
    "stable, and every pick is the 1st of its 100-block in hash order") {
    val perType = Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = q("sample_systematic").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val got = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    perType.foreach { case (et, n) =>
      assert(got.getOrElse(et, 0L) === (n + 99) / 100, et)
    }
    // deterministic: a second run returns the identical sample
    assert(q("sample_systematic").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq === rows.toSeq)
  }

  test("win_stochastic_osc: %K in [0,100], %D is the 3-period mean of " +
    "%K, and a full-window row replays from the hourly series") {
    val rows = q("win_stochastic_osc").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, h, _, k, dd) =>
      assert(k >= -1e-9 && k <= 100.0 + 1e-9, s"$et/$h pct_k")
      assert(dd >= -1e-9 && dd <= 100.0 + 1e-9, s"$et/$h pct_d")
    }
    // replay one type's series driver-side (hourly means, 20-period
    // range position, 3-period signal)
    val et = rows.head._1
    val hourly = Tables.events(spark, sf)
      .filter(col("event_type") === et)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hsec"))
      .agg(avg("value").as("v")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val ks = hourly.indices.map { i =>
      val win = hourly.slice(math.max(0, i - 19), i + 1).map(_._2)
      val (lo, hi) = (win.min, win.max)
      if (hi > lo) 100.0 * (hourly(i)._2 - lo) / (hi - lo) else 50.0
    }
    val expect = hourly.indices.collect {
      case i if i >= 19 =>
        hourly(i)._1 -> ((ks(i), ks.slice(i - 2, i + 1).sum / 3.0))
    }.toMap
    rows.filter(_._1 == et).foreach { case (_, h, _, k, dd) =>
      assert(math.abs(k - expect(h)._1) <= 5.001e-5, s"$h pct_k")
      assert(math.abs(dd - expect(h)._2) <= 5.001e-5, s"$h pct_d")
    }
  }
}
