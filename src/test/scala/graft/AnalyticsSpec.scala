package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property checks for the analytics additions (gaps-islands, rolling
  * z-score, histogram, weighted median, data-quality expectations,
  * incremental merge, triangle count, fuzzy blocking) — each verified
  * against an independently computed ground truth or an algebraic
  * invariant, complementing the DuckDB value oracle.
  */
class AnalyticsSpec extends SparkSpec {

  test("win_gaps_islands: islands partition the active hours exactly — " +
    "hour counts add up and consecutive islands have a real gap") {
    val islands = q("win_gaps_islands").collect()
    val activeHours = Tables.events(spark, sf)
      .select(col("user_id"),
        floor(unix_timestamp(date_trunc("hour", col("ts"))) / 3600.0)
          .cast("long").as("hidx"))
      .distinct().count()
    // every island spans exactly its hour count (consecutive by def)
    islands.foreach { r =>
      val (s0, e0, n) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(e0 - s0 === (n - 1) * 3600L,
        s"island not consecutive: $r")
    }
    assert(islands.map(_.getLong(3)).sum === activeHours)
    // within a user, islands are separated by at least one silent hour
    islands.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      rows.sortBy(_.getLong(1)).toSeq.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b.getLong(1) - a.getLong(2) >= 7200L,
            s"adjacent islands touch: $a / $b")
        case _ =>
      }
    }
  }

  test("win_anomaly_zscore: every flagged row really deviates >3 sd from " +
    "its own trailing baseline, and cold-start rows are never flagged") {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val rn = Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w))
      .select("event_id", "rn")
    val flagged = q("win_anomaly_zscore")
    // a row needs >= 12 prior events to have a baseline: rn must be >= 13
    val coldStart = flagged.join(rn, "event_id").filter(col("rn") < 13)
    assert(coldStart.count() === 0)
    flagged.collect().foreach { r =>
      assert(math.abs(r.getDouble(3)) >= 3.0, s"flagged |z| < 3: $r")
    }
  }

  test("agg_hist_fixed: buckets stay in [0,19] and per-group counts sum " +
    "to the group's row count") {
    val hist = q("agg_hist_fixed").collect()
    assert(hist.forall(r => r.getLong(1) >= 0 && r.getLong(1) <= 19))
    val sums = hist.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val truth = Tables(spark, sf, "orders")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums === truth)
  }

  test("agg_weighted_median: half the weight sits on each side — " +
    "2*W(p < m) < total <= 2*W(p <= m)") {
    val med = q("agg_weighted_median").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_returnflag").as("f"), col("l_extendedprice").as("p"),
        col("l_quantity").cast("long").as("wt"))
    med.foreach { case (f, m) =>
      val tw = li.filter(col("f") === f).agg(sum("wt")).head.getLong(0)
      val below = li.filter(col("f") === f && col("p") < m)
        .agg(coalesce(sum("wt"), lit(0L))).head.getLong(0)
      val upTo = li.filter(col("f") === f && col("p") <= m)
        .agg(sum("wt")).head.getLong(0)
      assert(2 * below < tw, s"$f: too much weight below median")
      assert(2 * upTo >= tw, s"$f: median reached too early")
    }
  }

  test("quality_expectations: four declared rules, rates in [0,1], and " +
    "the FK rule is clean on consistent fixtures") {
    val rep = q("quality_expectations").collect()
    assert(rep.length === 4)
    rep.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    val fk = rep.find(_.getString(0) == "orders_custkey_in_customer").get
    assert(fk.getLong(1) === 0L, "synthetic orders reference real customers")
  }

  test("agg_incremental_merge: merged day-1 state + day-2 delta equals " +
    "the direct whole-table aggregate") {
    val merged = q("agg_incremental_merge").collect()
    val direct = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("sum_value"),
        min("value").as("min_value"),
        max("value").as("max_value"),
        round(sum("value") / count(lit(1)), 4).as("avg_value"))
      .orderBy("event_type").collect()
    assert(merged.length === direct.length)
    merged.zip(direct).foreach { case (m, e) =>
      assert(m.getString(0) === e.getString(0))
      assert(m.getLong(1) === e.getLong(1))
      // sums/avgs merged from partials vs one pass: equal after the
      // query's own rounding (integer-exact for count/min/max)
      assert(math.abs(m.getDouble(2) - e.getDouble(2)) <= 0.011)
      assert(m.getDouble(3) === e.getDouble(3))
      assert(m.getDouble(4) === e.getDouble(4))
      assert(math.abs(m.getDouble(5) - e.getDouble(5)) <= 0.00011)
    }
  }

  test("graph_triangle_count: degree-oriented enumeration matches the " +
    "naive id-ordered count") {
    val r = q("graph_triangle_count").head
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    val pairs = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_orderkey").as("ok"),
        col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct() // a part repeated within ONE order is one co-occurrence
    val edges = pairs.groupBy("u", "v").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2).select("u", "v").cache()
    val naive = edges.as("e1")
      .join(edges.as("e2"), col("e1.v") === col("e2.u"))
      .join(edges.as("e3"), col("e1.u") === col("e3.u") &&
        col("e2.v") === col("e3.v"))
      .count()
    assert(r.getLong(0) === edges.count())
    assert(r.getLong(1) === naive)
    edges.unpersist()
  }

  test("text_tfidf_topk: ranks are contiguous from 1 and tfidf is " +
    "non-increasing within every doc") {
    val rows = q("text_tfidf_topk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to sorted.length),
        s"doc $doc ranks not contiguous")
      sorted.toSeq.sliding(2).foreach {
        case Seq(hi, lo) => assert(hi._3 >= lo._3,
          s"doc $doc tfidf not sorted: $hi then $lo")
        case _ =>
      }
    }
  }

  test("graph_pagerank: probability mass is conserved (sum = 1) and " +
    "every vertex keeps a positive rank") {
    val pr = q("graph_pagerank").collect().map(_.getDouble(1))
    assert(pr.forall(_ > 0))
    // teleport 0.15 + spread 0.85 of a unit vector stays a unit vector
    // when no vertex dangles (undirected graph) — up to the 1e-6 rounding
    assert(math.abs(pr.sum - 1.0) < 1e-3, s"mass drifted: ${pr.sum}")
  }

  test("quality_drift_psi: psi is non-negative (every PSI term is) and " +
    "the two halves partition each type's events") {
    val rep = q("quality_drift_psi").collect()
    val totals = Tables.events(spark, sf)
      .groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rep.foreach { r =>
      assert(r.getDouble(3) >= 0.0, s"negative psi: $r")
      assert(r.getLong(1) + r.getLong(2) === totals(r.getString(0)))
    }
  }

  test("join_nearest_time: the matched view really is the temporally " +
    "closest view of that user") {
    val events = Tables.events(spark, sf)
      .withColumn("sec", unix_timestamp(col("ts")))
      .select("event_id", "user_id", "event_type", "sec").collect()
    val viewsByUser = events.filter(_.getString(2) == "view")
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(3))).toMap
    q("join_nearest_time").collect().foreach { r =>
      val (user, sec) = (r.getLong(1), r.getLong(2))
      val views = viewsByUser.getOrElse(user, Array.empty[Long])
      if (views.isEmpty) assert(r.isNullAt(3))
      else {
        val best = views.map(v => math.abs(v - sec)).min
        assert(math.abs(r.getLong(3) - sec) === best,
          s"purchase ${r.getLong(0)}: nearest |dt| $best, got " +
            s"${math.abs(r.getLong(3) - sec)}")
      }
    }
  }

  test("win_forecast_naive_backtest: MAE/MAPE replay from a driver " +
    "lag-24 fold, and scored-hour counts reconcile with the series") {
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).cast("double").as("cnt")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    val got = q("win_forecast_naive_backtest").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    hourly.groupBy(_._1).foreach { case (t, rows) =>
      val series = rows.sortBy(_._2).map(_._3)
      if (series.length > 24) {
        val pairs = series.drop(24).zip(series.dropRight(24))
        val mae = pairs.map { case (c, p) => math.abs(c - p) }.sum /
          pairs.length
        val mapeTerms = pairs.collect {
          case (c, p) if c > 0 => math.abs(c - p) / c
        }
        val (n, gm, gp) = got(t)
        assert(n === pairs.length.toLong)
        assert(math.abs(gm - BigDecimal(mae)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-4)
        assert(math.abs(gp - BigDecimal(mapeTerms.sum / mapeTerms.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-4)
      }
    }
  }

  test("agg_basket_size_distribution: histogram covers every order " +
    "exactly once and reconciles with the lineitem row count") {
    val rows = q("agg_basket_size_distribution").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nOrders = Tables.lineitem(spark, sf)
      .select("l_orderkey").distinct().count()
    val nLines = Tables.lineitem(spark, sf).count()
    assert(rows.map(_._2).sum === nOrders)
    assert(rows.map { case (sz, n, _) => sz * n }.sum === nLines)
    rows.foreach { case (sz, n, v) => assert(sz > 0 && n > 0 && v > 0) }
  }

  test("graph_degree_distribution reconciles with the assortativity " +
    "key's edge count by the handshake lemma") {
    val hist = q("graph_degree_distribution").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nEdges = q("graph_assortativity").collect().head.getLong(0)
    assert(hist.map { case (d, n) => d * n }.sum === 2 * nEdges)
    assert(hist.map(_._1).distinct.length === hist.length)
  }

  test("agg_autocorr_hourly: ACF matches a driver recompute over the " +
    "observed hourly series, bounded to [-1, 1]") {
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
      .agg(count(lit(1)).cast("double").as("cnt")).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getDouble(2)))
    def corrOf(xs: Array[Double], ys: Array[Double]): Double = {
      val n = xs.length
      val mx = xs.sum / n; val my = ys.sum / n
      val cov = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum
      val sx = math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum)
      val sy = math.sqrt(ys.map(b => (b - my) * (b - my)).sum)
      cov / (sx * sy)
    }
    val got = q("agg_autocorr_hourly").collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4)))
      .toMap
    hourly.groupBy(_._1).foreach { case (t, rows) =>
      val series = rows.sortBy(_._2.getTime).map(_._3)
      val (a1, a2, a3, nh) = got(t)
      assert(nh === series.length.toLong)
      Seq((a1, 1), (a2, 2), (a3, 3)).foreach { case (acf, k) =>
        val exp = BigDecimal(
          corrOf(series.drop(k), series.dropRight(k)))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        assert(math.abs(acf - exp) < 2e-4, s"$t lag$k: $acf vs $exp")
        assert(acf >= -1.0 && acf <= 1.0)
      }
    }
  }

  test("win_rank_movers: era ranks replay from a driver sort and every " +
    "reported customer is in an era's top-10") {
    // o_orderdate ships as TIMESTAMP_NTZ — compare on the ISO date prefix
    val orders = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        col("o_orderdate").cast("string").as("d"), col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1).take(10), r.getDouble(2)))
    def ranks(p: String => Boolean): Map[Long, Int] =
      orders.filter(o => p(o._2)).groupBy(_._1)
        .map { case (c, os) => (c, os.map(_._3).sum) }.toSeq
        .sortBy { case (c, rev) => (-rev, c) }
        .zipWithIndex.map { case ((c, _), i) => c -> (i + 1) }.toMap
    val r1 = ranks(_ < "1998-01-01")
    val r2 = ranks(_ >= "1998-01-01")
    val rows = q("win_rank_movers").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)),
        if (r.isNullAt(2)) None else Some(r.getInt(2))))
    val expected = (r1.filter(_._2 <= 10).keySet ++
      r2.filter(_._2 <= 10).keySet)
    assert(rows.map(_._1).toSet === expected)
    rows.foreach { case (c, g1, g2) =>
      assert(g1 === r1.get(c) && g2 === r2.get(c), s"cust $c ranks")
    }
  }

  test("agg_anova_oneway: F equals a driver-side SSB/SSW decomposition " +
    "and is positive with the right degrees of freedom") {
    val vals = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val groups = vals.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = groups.size
    val n = vals.length
    val gm = vals.map(_._2).sum / n
    val ssb = groups.values.map { g =>
      val m = g.sum / g.length
      g.length * (m - gm) * (m - gm)
    }.sum
    val ssw = groups.values.map { g =>
      val m = g.sum / g.length
      g.map(x => (x - m) * (x - m)).sum
    }.sum
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    val r = q("agg_anova_oneway").collect().head
    assert(math.abs(r.getDouble(0) - f) < 1e-3, s"${r.getDouble(0)} vs $f")
    assert(r.getLong(1) === (k - 1).toLong)
    assert(r.getLong(2) === (n - k).toLong)
    assert(r.getDouble(0) > 0)
  }

  test("win_pareto_8020 equals a driver-side sorted-cumulative fold") {
    val spend = Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(sum("o_totalprice").as("s")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy(t => (-t._2, t._1))
    val tot = spend.map(_._2).sum
    var cum = 0.0; var below = 0L
    spend.foreach { case (_, v) =>
      cum += v
      if (cum < tot * 0.8) below += 1
    }
    val r = q("win_pareto_8020").collect().head
    assert(r.getLong(0) === below + 1)
    assert(r.getLong(1) === spend.length.toLong)
    assert(r.getDouble(2) > 0 && r.getDouble(2) <= 1)
  }

  test("win_inter_event_gaps: gap percentiles match a driver recompute " +
    "for every event type") {
    def q7(xs: Array[Long], p: Double): Double = {
      val s = xs.sorted
      val pos = (s.length - 1) * p
      val lo = pos.toInt
      if (lo + 1 >= s.length) s(lo).toDouble
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo)).toDouble
    }
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        unix_timestamp(col("ts")).as("sec"), col("event_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val gaps = ev.groupBy(_._1).map { case (t, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._4))
      t -> sorted.sliding(2).collect {
        case Array(a, b) => b._3 - a._3
      }.toArray
    }
    val got = q("win_inter_event_gaps").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got.keySet === gaps.filter(_._2.nonEmpty).keySet)
    gaps.filter(_._2.nonEmpty).foreach { case (t, g) =>
      val (n, p50, p90, mx) = got(t)
      assert(n === g.length.toLong, s"$t n_gaps")
      assert(math.abs(p50 - BigDecimal(q7(g, 0.5))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(math.abs(p90 - BigDecimal(q7(g, 0.9))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      assert(mx === g.max)
    }
  }

  test("agg_rfm_segments: cells conserve the customer universe and " +
    "each dimension's quartile marginals are balanced") {
    val rows = q("agg_rfm_segments").collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
        r.getLong(3), r.getDouble(4)))
    val nCust = Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(rows.map(_._2).sum === nCust)
    rows.foreach { case ((ri, fi, mi), n, avg) =>
      assert(ri >= 1 && ri <= 4 && fi >= 1 && fi <= 4 && mi >= 1 && mi <= 4)
      assert(n > 0 && avg > 0)
    }
    Seq[((Int, Int, Int)) => Int](_._1, _._2, _._3).foreach { dim =>
      val marginal = rows.groupBy(t => dim(t._1))
        .map { case (_, cells) => cells.map(_._2).sum }
      assert(marginal.max - marginal.min <= 1,
        s"unbalanced quartile marginal: $marginal")
    }
  }

  test("simsearch_range_query: hits equal a driver-side cosine sweep at " +
    "tau=0.4 and are symmetric-consistent with the top-k twin") {
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val expected = (for {
      (qid, qv) <- vecs.iterator if qid < 8
      (cid, cv) <- vecs.iterator if cid != qid
      dot = qv.zip(cv).map { case (a, b) => a * b }.sum
      cos = dot / (math.sqrt(qv.map(x => x * x).sum) *
        math.sqrt(cv.map(x => x * x).sum))
      if cos >= 0.4
    } yield (qid, cid)).toSet
    val got = q("simsearch_range_query").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("embedding_norm_audit: median/MAD match a driver-side type-7 " +
    "recompute per label and the outlier count obeys the 3-MAD fence") {
    def q7median(xs: Array[Double]): Double = {
      val s = xs.sorted
      val pos = (s.length - 1) * 0.5
      val lo = pos.toInt
      if (lo + 1 >= s.length) s(lo)
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val vecs = Tables(spark, sf, "embeddings")
      .select("label", "embedding").collect()
      .map { r =>
        val e = r.getSeq[Float](1)
        var acc = 0.0
        e.foreach(x => acc += x.toDouble * x.toDouble)
        (r.getInt(0), math.sqrt(acc))
      }
    val rows = q("embedding_norm_audit").collect()
      .map(r => (r.getInt(0),
        (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    val byLabel = vecs.groupBy(_._1)
    assert(rows.keySet === byLabel.keySet)
    byLabel.foreach { case (label, vs) =>
      val l2s = vs.map(_._2)
      val med = q7median(l2s)
      val mad = q7median(l2s.map(x => math.abs(x - med)))
      val out = l2s.count(x => math.abs(x - med) > 3 * mad)
      val (gm, gmad, gn, gout) = rows(label)
      assert(math.abs(gm - med) < 1e-3, s"label $label med")
      assert(math.abs(gmad - mad) < 1e-3, s"label $label mad")
      assert(gn === l2s.length.toLong)
      assert(gout === out.toLong, s"label $label outliers")
      assert(gout <= gn)
    }
  }

  test("scan_binary_packed: the packed-shard scan decodes exactly what " +
    "the file-per-image binaryFile scan decodes") {
    val perFile = q("scan_binaryfile").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    val packed = q("scan_binary_packed").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSeq
    assert(perFile.nonEmpty)
    assert(packed === perFile)
  }

  test("scan_binary_packed: blob-file count tracks PackShards, not the " +
    "image count (the whole point of the packed layout)") {
    val dir = new java.io.File(
      graft.queries.Multimodal.ensurePackedStaged(spark, sf))
    val blobs = dir.listFiles.count(_.getName.startsWith("shard_"))
    val images = Tables(spark, sf, "documents").count()
    assert(blobs == graft.queries.Multimodal.PackShards)
    assert(blobs < images)
  }

  test("multimodal_audio_features: every feature matches an independent " +
    "recompute from the raw payload bytes (codec roundtrip + math)") {
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    q("multimodal_audio_features").collect().foreach { r =>
      val id = r.getLong(0)
      val bytes = docs(id).getBytes("UTF-8")
      val rate = 8000 + (id % 4).toInt * 4000
      var peak = 0; var zc = 0; var sum = 0L; var prev = 0
      bytes.indices.foreach { i =>
        val v = (bytes(i) & 0xff) - 128
        if (math.abs(v) > peak) peak = math.abs(v)
        sum += v
        if (i > 0 && ((v > 0 && prev <= 0) || (v < 0 && prev >= 0))) zc += 1
        prev = v
      }
      assert(r.getInt(1) === rate)
      assert(r.getLong(2) === bytes.length.toLong)
      assert(r.getInt(4) === peak)
      assert(r.getInt(5) === zc)
      // the query rounds to 4 decimals; compare against the unrounded
      // truth within half an ulp of that grid (no rounding-mode replay)
      if (bytes.nonEmpty)
        assert(math.abs(r.getDouble(6) - sum.toDouble / bytes.length)
          <= 5.001e-5)
    }
  }

  test("dedup_semantic_cluster: precision 1.0 (every intra-cluster edge " +
    "is a real near-dup), recall vs the exact pair baseline, and cluster " +
    "assignment is consistent") {
    val clusters = q("dedup_semantic_cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = q("dedup_embedding_cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // recall: exact near-dup pairs that landed in the same cluster
    val found = exact.count { case (a, b) => clusters(a) == clusters(b) }
    assert(exact.isEmpty || found.toDouble / exact.size >= 0.8,
      s"recall ${found.toDouble / exact.size} < 0.8 (${exact.size} pairs)")
    // precision: docs sharing a cluster must be connected through real
    // pairs — the verify step is exact, so any multi-doc cluster must
    // contain at least one exact pair per member (path through the rep)
    val byCluster = clusters.groupBy(_._2).filter(_._2.size > 1)
    byCluster.foreach { case (rep, members) =>
      members.keys.foreach { m =>
        val linked = exact.exists { case (a, b) =>
          (a == m || b == m) &&
            clusters(a) == rep && clusters(b) == rep
        }
        assert(linked, s"doc $m in cluster $rep has no verified edge")
      }
    }
  }

  test("dedup_incremental_index: merging the new slice into the staged " +
    "base reproduces the from-scratch clustering EXACTLY (same planes, " +
    "same verify threshold => same components)") {
    val incr = q("dedup_incremental_index").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = q("dedup_semantic_cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(incr.keySet === full.keySet)
    val diff = full.collect {
      case (v, rep) if incr(v) != rep => (v, rep, incr(v))
    }
    assert(diff.isEmpty,
      s"incremental/full assignment diverges on ${diff.size} ids " +
        s"(first: ${diff.headOption})")
    // and the new slice really is flagged
    q("dedup_incremental_index").collect().foreach { r =>
      assert(r.getBoolean(2) === (r.getLong(0) % 10 == 0))
    }
  }

  test("dedup_keep_best: one survivor per cluster (longest text, lowest " +
    "id on ties) and the drop accounting covers the whole corpus") {
    val clusters = q("dedup_semantic_cluster").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val chars = Tables(spark, sf, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = q("dedup_keep_best").collect()
    // rows = clusters, and kept + dropped tiles the corpus exactly
    assert(kept.length === clusters.map(_._2).distinct.length)
    assert(kept.map(r => 1 + r.getLong(3)).sum === clusters.length)
    val byCluster = clusters.groupBy(_._2)
    kept.foreach { r =>
      val members = byCluster(r.getLong(0)).map(_._1)
      val best = members.maxBy(m => (chars(m), -m))
      assert(r.getLong(1) === best,
        s"cluster ${r.getLong(0)}: kept ${r.getLong(1)}, policy says $best")
      assert(r.getLong(2) === chars(best))
    }
  }

  test("scan_schema_evolution: the merged scan exposes all three columns " +
    "and loses no rows to the schema split") {
    val r = q("scan_schema_evolution").head
    val total = Tables(spark, sf, "orders").count()
    assert(r.getLong(0) === total)
    assert(r.getLong(1) + r.getLong(2) === total,
      "every row carries exactly one of the evolved columns")
  }

  test("sink_partition_overwrite: only the revised partition changed — " +
    "every other partition keeps its full original rows") {
    val rows = q("sink_partition_overwrite").collect()
    val truth = Tables(spark, sf, "orders")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === truth(r.getString(0)),
        s"partition ${r.getString(0)} lost rows in the overwrite")
      assert((r.getInt(2) == 1) === (r.getString(0) == "1-URGENT"),
        s"revised flag wrong for ${r.getString(0)}")
    }
  }

  test("agg_first_last_by: the arg-max row really carries the group's " +
    "extreme price") {
    val orders = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    q("agg_first_last_by").collect().foreach { r =>
      assert(math.abs(orders(r.getLong(1)) - r.getDouble(3)) < 0.005,
        s"${r.getString(0)}: top order price mismatch")
      assert(math.abs(orders(r.getLong(2)) - r.getDouble(4)) < 0.005,
        s"${r.getString(0)}: bottom order price mismatch")
    }
  }

  test("agg_ewma_ordered: matches an independent sequential fold per " +
    "user, and the affine segmented-scan escape composes to the same " +
    "result") {
    val byUser = Tables.events(spark, sf)
      .select("user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.sortBy(r => (r._2, r._3)).map(_._3).toSeq
      }
    def fold(xs: Seq[Double]): Double =
      xs.tail.foldLeft(xs.head)((acc, x) => 0.1 * x + 0.9 * acc)
    val got = q("agg_ewma_ordered").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.nonEmpty)
    got.foreach { case (u, ewma, n) =>
      assert(n === byUser(u).size.toLong)
      assert(math.abs(ewma - fold(byUser(u))) < 1e-6, s"user $u")
    }
    // the hot-key escape hatch is algebraically sound: folding a series
    // as composed per-segment affine maps (a, b) = (0.9^n, partial fold
    // from 0) equals the direct fold — so a whale key CAN be chunked
    val whale = byUser.maxBy(_._2.size)._2
    val segs = whale.grouped(7).toSeq
    val (aT, bT) = segs.map { seg =>
      seg.foldLeft((1.0, 0.0)) { case ((a, b), x) =>
        (0.9 * a, 0.1 * x + 0.9 * b)
      }
    }.reduce[(Double, Double)] { case ((a1, b1), (a2, b2)) =>
      (a2 * a1, a2 * b1 + b2) // apply segment 2 after segment 1
    }
    // seeding with acc0 = x0 while x0 is also folded as an element is
    // exactly compensated: direct = aT·x0 + bT (check: n=1 gives
    // 0.9·x0 + 0.1·x0 = x0)
    val viaSegments = aT * whale.head + bT
    val direct = fold(whale)
    assert(math.abs(viaSegments - direct) < 1e-6,
      s"affine composition drifted: $viaSegments vs $direct")
  }

  test("join_lateral_topk: the correlated subquery decorrelates (no " +
    "per-row re-scan) and matches the window-rank formulation") {
    val lateral = q("join_lateral_topk")
    assert(!lateral.queryExecution.executedPlan.toString
      .contains("CartesianProduct"))
    val viaWindow = graft.operators.TopKPerGroup(
      Tables(spark, sf, "customer"), 2,
      groupBy = Seq(col("c_nationkey")),
      orderBy = Seq(col("c_acctbal").desc, col("c_custkey").asc))
      .join(Tables(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select("n_name", "c_custkey", "c_acctbal")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = lateral.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === viaWindow)
  }

  test("plan shapes: the new window/agg operators reuse one keyed " +
    "exchange and the tfidf top-k stays a group-limit, not a global sort") {
    def hashExchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    // weighted median: running + total windows and the final agg all key
    // on l_returnflag — one hash exchange feeds everything
    assert(hashExchanges(q("agg_weighted_median")) === 1)
    // nearest-time: both direction windows ride the same user_id exchange
    // (the desc pass is a re-sort, not a re-shuffle)
    assert(hashExchanges(q("join_nearest_time")) === 1)
    // gaps-islands: the (user, hidx) distinct plus the user-keyed
    // window/agg — two keyed exchanges, nothing quadratic
    assert(hashExchanges(q("win_gaps_islands")) <= 2)
    val tfidf = q("text_tfidf_topk").queryExecution.executedPlan.toString
    assert(tfidf.contains("WindowGroupLimit"),
      "per-doc top-3 must push a group limit below the rank window")
    assert(!tfidf.contains("CartesianProduct"),
      "the 1-row corpus count must broadcast, not cartesian")
  }

  test("dedup_fuzzy_blocking: exactly the within-block pairs at distance " +
    "1..3, each emitted once in canonical order") {
    val got = q("dedup_fuzzy_blocking").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(got.forall { case (a, b, dt) => a < b && dt >= 1 && dt <= 3 })
    // independent ground truth: all distinct-name pairs, filtered the
    // same way a human would — same second token, edit distance <= 3
    val names = Tables(spark, sf, "part")
      .select("p_name").distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val truth = (for {
      a <- names; b <- names
      if a < b && a.split(" ")(1) == b.split(" ")(1)
      dt = lev(a, b) if dt <= 3
    } yield (a, b, dt)).toSet
    assert(got.toSet === truth)
  }

  test("join_star_schema: dimension chain broadcasts, and the nation " +
    "rollup totals match an independent semi-join count") {
    val df = q("join_star_schema")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "constant-size dims (nation/region) must broadcast")
    assert(plan.matches("(?s).*PushedFilters: \\[[^\\]]*o_orderdate[^\\]]*\\].*"),
      "the date predicate must reach the orders parquet scan:\n" +
        plan.take(1200))
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(_.getDouble(1) > 0))
    // independent path: count fact rows through a semi-join chain
    // instead of the dimension-carrying inner joins
    val asiaCust = Tables.customer(spark, sf)
      .join(Tables.nation(spark, sf)
          .join(Tables.region(spark, sf),
            col("n_regionkey") === col("r_regionkey"))
          .filter(col("r_name") === "ASIA").select("n_nationkey"),
        col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val asiaOrders = Tables.orders(spark, sf)
      .filter(col("o_orderdate") < lit("1997-01-01").cast("date"))
      .join(asiaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey")
    val expected = Tables.lineitem(spark, sf)
      .join(asiaOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .count()
    assert(rows.map(_.getLong(2)).sum === expected)
  }

  test("resample_ohlc: bars match a window-computed first/last twin and " +
    "partition the event stream exactly") {
    val got = q("resample_ohlc").collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
          r.getLong(6))).toMap
    val ev = Tables.events(spark, sf)
    assert(got.values.map(_._5).sum === ev.count())
    got.values.foreach { case (open, high, low, close, _) =>
      assert(low <= high && low <= open && open <= high &&
        low <= close && close <= high)
    }
    // independent implementation: window first/last over the same
    // chronological order instead of min_by/max_by aggregation
    val w = Window
      .partitionBy(col("event_type"), date_trunc("hour", col("ts")))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val twin = ev
      .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
        first("value").over(w).as("open"),
        last("value").over(w).as("close"))
      .distinct().collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    assert(twin.keySet === got.keySet)
    twin.foreach { case (k, (open, close)) =>
      assert(got(k)._1 === open && got(k)._4 === close, s"bar $k")
    }
  }

  test("pii_kanonymity: every released quasi-identifier group has >= 5 " +
    "members, suppressed rows really are rarer than k, no row lost") {
    val rows = q("pii_kanonymity").collect()
    val cust = Tables.customer(spark, sf)
    assert(rows.length === cust.count())
    // the k-anonymity property, checked on the OUTPUT alone: released
    // QI combinations appear >= 5 times among released rows
    val released = rows.filter(_.getBoolean(3))
      .groupBy(r => (r.getString(1), r.getString(2)))
    released.foreach { case (qi, grp) =>
      assert(grp.length >= 5, s"released group $qi smaller than k")
      assert(qi._1 != "*" && qi._2 != "*")
    }
    // suppressed rows' TRUE groups (recomputed from the source) are < k
    val truth = cust.groupBy("c_nationkey", "c_mktsegment").count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val suppressedIds = rows.filterNot(_.getBoolean(3))
      .map(_.getLong(0)).toSet
    cust.select("c_custkey", "c_nationkey", "c_mktsegment").collect()
      .foreach { r =>
        val n = truth((r.getInt(1), r.getString(2)))
        assert(suppressedIds.contains(r.getLong(0)) === (n < 5))
      }
  }

  test("text_diversity_entropy: matches a Scala recomputation and sits " +
    "inside [0, log2(n_sources)]") {
    val got = q("text_diversity_entropy").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val counts = Tables.documents(spark, sf)
      .groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
    assert(got.values.map(_._1).sum ===
      Tables.documents(spark, sf).count())
    counts.groupBy(_._1._1).foreach { case (lang, cs) =>
      val ns = cs.map(_._2.toDouble)
      val tot = ns.sum
      val h = ns.map(n => -(n / tot) * (math.log(n / tot) / math.log(2))).sum
      val (nDocs, nSources, entropy) = got(lang)
      assert(nDocs === tot.toLong && nSources === cs.length)
      assert(math.abs(entropy - h) < 1e-3, s"$lang: $entropy vs $h")
      assert(entropy >= 0 &&
        entropy <= math.log(nSources.toDouble) / math.log(2) + 1e-9)
    }
  }

  test("agg_rollup_time: every hierarchy level tiles the event stream — " +
    "leaves, days, months and the grand total all count every event once") {
    val rows = q("agg_rollup_time").collect()
    val total = Tables.events(spark, sf).count()
    def at(r: org.apache.spark.sql.Row, i: Int) = r.getString(i) != "ALL"
    val grand = rows.filterNot(at(_, 0))
    assert(grand.length === 1 && grand.head.getLong(3) === total)
    def level(p: org.apache.spark.sql.Row => Boolean) =
      rows.filter(p).map(_.getLong(3)).sum
    assert(level(r => at(r, 2)) === total)                 // hours
    assert(level(r => at(r, 1) && !at(r, 2)) === total)    // days
    assert(level(r => at(r, 0) && !at(r, 1)) === total)    // months
  }

  test("dedup_exact_normalized: groups match a driver-side renormalization " +
    "and the canonical pick is the group minimum") {
    val got = q("dedup_exact_normalized").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    def norm(t: String) = t.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim
    val groups = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), norm(r.getString(1))))
      .groupBy(_._2)
    assert(got.size === groups.valuesIterator.map(_.length).sum)
    groups.values.foreach { members =>
      val ids = members.map(_._1)
      val canonical = ids.min
      ids.foreach { id =>
        val (c, n, isC) = got(id)
        assert(c === canonical && n === ids.length &&
          isC === (id == canonical))
      }
    }
  }

  test("quality_outlier_iqr: quartiles and fence counts match an exact " +
    "driver-side recomputation per series") {
    val rows = q("quality_outlier_iqr").collect()
    val byType = Tables.events(spark, sf).select("event_type", "value")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    def pct(s: Array[Double], p: Double) = {
      val r = p * (s.length - 1)
      val (lo, hi) = (s(r.floor.toInt), s(r.ceil.toInt))
      lo + (hi - lo) * (r - r.floor)
    }
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val vs = byType(r.getString(0))
      val (q1, q3) = (pct(vs, 0.25), pct(vs, 0.75))
      assert(math.abs(r.getDouble(1) - q1) < 1e-3, s"q1 ${r}")
      assert(math.abs(r.getDouble(2) - q3) < 1e-3, s"q3 ${r}")
      val (lo, hi) = (q1 - (q3 - q1) * 1.5, q3 + (q3 - q1) * 1.5)
      assert(r.getLong(3) === vs.count(_ < lo).toLong)
      assert(r.getLong(4) === vs.count(_ > hi).toLong)
      assert(r.getLong(5) === vs.length.toLong)
    }
  }

  test("win_ntile_decile: deciles cover each group in near-equal, " +
    "order-respecting buckets") {
    val rows = q("win_ntile_decile").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(rows.length ===
      Tables.orders(spark, sf).count())
    rows.groupBy(_._2).foreach { case (_, grp) =>
      val sizes = grp.groupBy(_._4).view.mapValues(_.length).toMap
      assert(sizes.keySet.subsetOf((1 to 10).toSet))
      assert(sizes.values.max - sizes.values.min <= 1,
        s"uneven deciles: $sizes")
      // decile is monotone in the (price, key) sort order
      grp.sortBy(t => (t._3, t._1)).map(_._4).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b)
        case _ =>
      }
    }
  }

  test("fn_datetime_extract: every calendar field matches java.time at UTC " +
    "(including the Sunday=1 weekday convention)") {
    import java.time.{Instant, ZoneOffset}
    import java.time.temporal.{IsoFields, WeekFields}
    q("fn_datetime_extract").collect().foreach { r =>
      val dt = Instant.ofEpochSecond(r.getLong(7)).atZone(ZoneOffset.UTC)
      assert(r.getInt(1) === dt.getYear)
      assert(r.getInt(2) === dt.get(IsoFields.QUARTER_OF_YEAR))
      assert(r.getInt(3) === dt.get(WeekFields.ISO.weekOfWeekBasedYear()))
      assert(r.getInt(4) === dt.getDayOfYear)
      assert(r.getInt(5) === dt.getDayOfWeek.getValue % 7 + 1)
      assert(r.getInt(6) === dt.getHour)
    }
  }

  test("win_rolling_corr matches an independent per-user recompute of the " +
    "trailing-20-row lag-1 correlation, and sub-10-pair rows are suppressed") {
    val got = q("win_rolling_corr").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toMap
    val events = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
        r.getDouble(3)))
    var expected = 0
    events.groupBy(_._2).foreach { case (user, rows) =>
      val ord = rows.sortBy(t => (t._3, t._1))
      val vals = ord.map(_._4)
      for (i <- ord.indices) {
        // frame = rows [i-19, i]; a lag pair (v_j, v_{j-1}) needs j >= 1
        val pairs = (math.max(1, i - 19) to i).map(j => (vals(j), vals(j - 1)))
        if (pairs.length >= 10) {
          expected += 1
          val n = pairs.length.toDouble
          val mx = pairs.map(_._1).sum / n
          val my = pairs.map(_._2).sum / n
          val cov = pairs.map { case (x, y) => (x - mx) * (y - my) }.sum
          val sx = math.sqrt(pairs.map(t => math.pow(t._1 - mx, 2)).sum)
          val sy = math.sqrt(pairs.map(t => math.pow(t._2 - my, 2)).sum)
          val id = ord(i)._1
          assert(got.contains(id), s"row for event $id missing")
          val (gu, gc, gn) = got(id)
          assert(gu === user)
          assert(gn === pairs.length)
          if (sx > 0 && sy > 0)
            assert(math.abs(gc - cov / (sx * sy)) <= 5.1e-5,
              s"event $id: got $gc want ${cov / (sx * sy)}")
        }
      }
    }
    assert(got.size === expected,
      "exactly the rows with >= 10 lag pairs in frame survive")
  }

  test("fn_collation: the collated distinct equals a distinct-of-lower " +
    "recompute and is strictly below the case-sensitive count where both " +
    "case variants of a type occur") {
    val got = q("fn_collation").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val mixed = Tables(spark, sf, "part").select(
      col("p_brand"),
      when(col("p_partkey") % 2 === 0, lower(col("p_type")))
        .otherwise(col("p_type")).as("typ"))
    val ref = mixed.groupBy("p_brand").agg(
      countDistinct(lower(col("typ"))).as("ci"),
      countDistinct(col("typ")).as("cs"),
      count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === ref)
    assert(got.values.forall { case (ci, cs, _) => ci <= cs && cs <= 2 * ci },
      "each case-insensitive class holds at most its upper + lower variant")
    assert(got.values.exists { case (ci, cs, _) => ci < cs },
      "the synthesized case variance must actually collide under UTF8_LCASE")
  }

  test("quality_ccnet_buckets: per-language terciles are balanced (max-min " +
    "<= 1), ordered by score (head <= middle <= tail), and cover every doc") {
    val rows = q("quality_ccnet_buckets").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    val nDocs = Tables(spark, sf, "documents")
      .filter(length(col("text")) >= 1).count()
    assert(rows.length.toLong === nDocs)
    assert(rows.map(_._4).toSet.subsetOf(Set("head", "middle", "tail")))
    rows.groupBy(_._2).foreach { case (lang, grp) =>
      val sizes = Seq("head", "middle", "tail")
        .map(b => grp.count(_._4 == b)).filter(_ > 0)
      assert(sizes.max - sizes.min <= 1, s"$lang terciles uneven: $sizes")
      def scores(b: String) = grp.filter(_._4 == b).map(_._3)
      for (Seq(a, b) <- Seq("head", "middle", "tail").sliding(2)
           if scores(a).nonEmpty && scores(b).nonEmpty)
        assert(scores(a).max <= scores(b).min + 1e-9,
          s"$lang: bucket $a must score no worse than $b")
    }
  }

  test("sql_recursive_cte: WITH RECURSIVE depth equals the closed form " +
    "floor(log2(k+1)) of the binary-tree parent rule, every nation is " +
    "reached, and each path threads through its parent's path") {
    val rows = q("sql_recursive_cte").collect()
      .map(r => (r.getAs[Number](0).longValue, r.getLong(1), r.getString(2)))
    val nations = Tables(spark, sf, "nation").collect()
      .map(r => r.getAs[Number]("n_nationkey").longValue ->
        r.getAs[String]("n_name"))
      .toMap
    assert(rows.map(_._1).toSet === nations.keySet,
      "the recursion must reach every nation")
    val byKey = rows.map(t => t._1 -> t).toMap
    rows.foreach { case (k, depth, path) =>
      assert(depth === (63 - java.lang.Long.numberOfLeadingZeros(k + 1)),
        s"depth($k) breaks the closed form")
      assert(path.endsWith(nations(k)))
      if (k > 0) {
        val parent = (k - 1) / 2
        assert(path === byKey(parent)._3 + "/" + nations(k),
          s"path($k) must extend path($parent)")
      }
    }
  }

  test("shuffle_epoch_deterministic: each epoch is a full permutation, " +
    "epochs decorrelate, and a rerun reproduces the order bit-for-bit") {
    def run() = q("shuffle_epoch_deterministic").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    val rows = run()
    val n = Tables(spark, sf, "documents").count().toInt
    val byEpoch = rows.groupBy(_._1)
    assert(byEpoch.keySet === Set(0, 1))
    byEpoch.values.foreach { grp =>
      assert(grp.map(_._3).sorted.toSeq === (1 to n),
        "ranks must be a permutation of 1..n")
    }
    val rank0 = byEpoch(0).map(t => t._2 -> t._3).toMap
    val samePos = byEpoch(1).count(t => rank0(t._2) === t._3)
    assert(samePos < n / 5,
      s"epoch orders should decorrelate: $samePos/$n docs kept their rank")
    assert(run().toSeq === rows.toSeq,
      "rerun must reproduce the epoch order exactly (no RNG state)")
  }

  test("win_centered_smooth: the centered 5-row frame shrinks exactly at " +
    "partition edges (n_win = min(i,2) + 1 + min(n-1-i,2))") {
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime))
    val nWin = q("win_centered_smooth").collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    ev.groupBy(_._2).values.foreach { rows =>
      val ord = rows.sortBy(t => (t._3, t._1))
      val n = ord.length
      ord.zipWithIndex.foreach { case ((id, _, _), i) =>
        assert(nWin(id) === math.min(i, 2) + 1 + math.min(n - 1 - i, 2),
          s"event $id frame size")
      }
    }
  }

  test("typed_dataset_agg really runs the typed path (MapGroups over the " +
    "case-class Encoder) and pivot_multi_agg spreads both measures per " +
    "pivot value") {
    val typedPlan = q("typed_dataset_agg")
      .queryExecution.optimizedPlan.toString
    assert(typedPlan.contains("MapGroups"),
      "mapGroups must survive as an object operator in the plan")
    assert(typedPlan.contains("DeserializeToObject") ||
      typedPlan.contains("SerializeFromObject"),
      "the Encoder boundary must appear in the plan")
    assert(q("pivot_multi_agg").columns.toSeq ===
      Seq("l_returnflag", "F_qty", "F_cnt", "O_qty", "O_cnt"))
  }
}
