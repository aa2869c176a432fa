package graft

import org.apache.spark.sql.functions._

/** Hand-computed + algebraic checks for the relational core, windows and
  * function families (complementing the driver's DuckDB oracle, which
  * covers value-level equivalence at sf0.01).
  */
class OperatorsSpec extends SparkSpec {

  test("driver contract: every oracle has a query twin, and the no-oracle " +
    "set is exactly the documented sketch/approximate keys") {
    val qs = SparkEntry.queries.keySet
    val os = SparkEntry.oracleSql.keySet
    assert((os -- qs).isEmpty, s"orphan oracles (typo'd key?): ${os -- qs}")
    val expectedNoOracle = Set(
      "agg_approx_distinct", "dedup_minhash_lsh", "dedup_minhash_native",
      "dedup_simhash", "ingest_fetch_xml", "simsearch_ivf_topk",
      "simsearch_lsh_bucketed", "text_doc_stats",
      "sketch_count_min", "sketch_bloom_filter",
      "sketch_hll_mergeable", "dedup_cluster_scale",
      "simsearch_ivf_persisted", "simsearch_pq_topk",
      "sketch_tdigest_quantile", "multimodal_phash_neardup",
      "multimodal_audio_features", "dedup_semantic_cluster",
      "dedup_keep_best", "dedup_incremental_index", "sketch_heavy_hitters",
      "sketch_heavy_hitters_grouped", "dedup_minhash_incremental",
      "dedup_bloom_incremental",
      // streaming twin of dedup_minhash_incremental (inherits the
      // minhash banding — no SQL oracle); StreamingSpec pins exact
      // partition equality with the one-shot batch refresh
      "stream_dedup_incremental",
      // iterative argmax loop — not SQL-expressible; exact-equality
      // reference-trainer spec in TextOpsSpec
      "bpe_train_merges",
      // double summation order varies the low bits of the Gram matrix →
      // no bit-exact oracle; PcaSpec pins Jacobi ground truth +
      // proj_var ≈ eigenvalue
      "embedding_pca_project",
      // iterative histogram fold — not SQL-expressible; independent
      // per-doc reference fold + conservation spec in PipelineSpec
      "pack_spfhp",
      // ANN family (approximate recall); IvfIncrementalSpec pins
      // no-retrain, append==rebuild equality, and a recall floor
      "simsearch_ivf_incremental",
      // predicate-scoped IVF probe (approximate recall); FilteredAnnSpec
      // pins recall vs the exact filtered referee + both pushdowns
      "simsearch_ivf_filtered",
      // multiprobe twin of simsearch_lsh_bucketed (approximate recall);
      // MultiprobeBounceSpec pins recall dominance over single-probe
      "simsearch_lsh_multiprobe",
      // GK sketch output is engine-specific (like the sketches above);
      // AssortPercentileSpec bounds the rank error vs the guarantee
      "agg_percentile_approx_builtin",
      // HLL inclusion-exclusion estimate is engine-specific (like the
      // other sketches); PipelineSpec bounds rel_err + sub-additivity
      "sketch_hll_intersection",
      // quantile-fence scale twins of the three global-window keys
      // (fences come from approx sketches; FencesSpec pins no-global-
      // window plans + equality/tie-bounded reconciliation with the
      // exact oracle-gated keys)
      "agg_rfm_segments_fences", "win_pareto_8020_fences",
      "win_rank_movers_fences",
      // BPE application — same not-SQL-expressible iterative merges as
      // the trainer; TextOpsSpec pins equality with an independent
      // positional encoder per document
      "tokenize_bpe_encode",
      // iterative h-index fixpoint — not SQL-expressible; KcoreHoltSpec
      // pins exact equality with a driver-side min-degree peel
      "graph_kcore",
      // order-sensitive level/trend recurrence — not SQL-expressible;
      // KcoreHoltSpec replays the identical fold
      "resample_holt_linear",
      // iterative farthest-point argmax — not SQL-expressible;
      // KcenterNoveltySpec replays the greedy selection exactly
      "sample_kcenter_diverse",
      // synchronous BSP sweeps with a per-iteration GROUP BY argmax —
      // recursive CTEs forbid aggregation in the recursive term, so no
      // SQL twin; LpaSpec replays the five sweeps exactly
      "graph_label_propagation",
      // zlib deflate has no deterministic SQL twin; ChurnIntervalSpec's
      // sibling (CompressionSpec) replays the identical Deflater per doc
      "text_compression_ratio",
      // the sweep is over the seeded graft_minhash signature (engine-
      // specific like the other sketches); MinhashTradeoffSpec pins
      // recall/cost monotonicity and (6,2)-equality with the native key
      "dedup_minhash_tradeoff",
      // absorbing-chain solve is a fixed-point iteration over the
      // bounded channel matrix — not SQL-expressible; MarkovWeightsSpec
      // replays the chain build + solve exactly
      "mine_attribution_markov",
      // PNG decode + Laplacian convolution — DuckDB can't decode PNG
      // (same class as the other codec keys); DsirBlurSpec replays the
      // decode + integer-moment variance bit-exactly
      "multimodal_blur_detect",
      // order-sensitive seasonal recurrence, same class as
      // resample_holt_linear; HoltWintersEncodingSpec replays the fold
      "resample_holt_winters",
      // IVF×PQ composition (approximate recall, like its two parents);
      // TextOpsSpec pins recall@5 >= 0.9 vs brute force AND that the
      // ADC pass scores only ~nprobe/#cells of the PQ-only set
      "simsearch_ivfpq_topk",
      // residual-encoded IVFPQ (same approximate class);
      // IvfPqResidualSpec measures both corpus regimes vs the raw
      // composition and pins probe-set equality
      "simsearch_ivfpq_residual_topk",
      // frozen-codebook IVFPQ refresh (ANN family);
      // IvfPqIncrementalSpec pins code-level equality with a
      // from-scratch encode plus post-append recall
      "simsearch_ivfpq_incremental",
      // phonetic third blocking pass — DuckDB has no soundex, so no
      // SQL twin exists by design; PhoneticBlockSpec pins the planted
      // typo co-blocking and the scheme-over-scheme recall gain
      "er_fs_classify_phonetic")
    assert((qs -- os) === expectedNoOracle,
      s"undocumented no-oracle keys: ${(qs -- os) -- expectedNoOracle}; " +
        s"stale entries: ${expectedNoOracle -- (qs -- os)}")
  }

  test("physical join strategy is semantics-free: broadcast, sort-merge " +
    "and shuffled-hash return identical rows for the same join") {
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_orderstatus")
    def run(hint: String) =
      li.hint(hint).join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(round(sum("l_quantity"), 2).as("q"), count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
        .toSeq
    val merge = run("merge")
    assert(merge === run("shuffle_hash"))
    assert(merge === run("broadcast"))
  }

  test("funnel twins: the skew-proof aggregation spelling returns row-" +
    "identical results to the window state machine") {
    val win = q("win_funnel_match").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4))).toSeq
    val agg = q("win_funnel_skewproof").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4))).toSeq
    assert(win.nonEmpty)
    assert(agg === win)
  }

  test("pivot/unpivot duality: pivot_wide cells equal the grouped sums " +
    "they were spread from") {
    val wide = q("pivot_wide").collect()
      .map(r => r.getString(0) -> (r.get(1), r.get(2))).toMap
    val long = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(round(sum("l_quantity"), 2).as("q"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    wide.foreach { case (flag, (f, o)) =>
      assert(Option(f).map(_.asInstanceOf[Double]) === long.get((flag, "F")))
      assert(Option(o).map(_.asInstanceOf[Double]) === long.get((flag, "O")))
    }
  }

  test("join_broadcast keeps all 25 nations and plans a broadcast join") {
    val df = q("join_broadcast")
    assert(df.count() === 25)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("join strategies are pinned: sort-merge and shuffled-hash") {
    assert(q("join_sortmerge").queryExecution.executedPlan.toString
      .contains("SortMergeJoin"))
    assert(q("join_shuffled_hash").queryExecution.executedPlan.toString
      .contains("ShuffledHashJoin"))
  }

  test("scan_parquet pushes the filter down to the parquet reader and " +
    "prunes the read schema to the projected columns") {
    val plan = q("scan_parquet").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), " +
      "GreaterThan(l_quantity,30.0)]"), plan.take(800))
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_linenumber:int,l_quantity:double>"), plan.take(800))
  }

  test("registerAll exposes the corpus to plain SQL (incl. nanos-safe events)") {
    Tables.registerAll(spark, sf)
    val n = spark.sql(
      "SELECT count(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey")
      .collect()(0).getLong(0)
    assert(n === 6000L)
    val ev = spark.sql("SELECT count(*) FROM events WHERE ts IS NOT NULL")
      .collect()(0).getLong(0)
    assert(ev === 1000L)
  }

  test("sort_limit_topk plans TakeOrderedAndProject, not a full sort") {
    val plan = q("sort_limit_topk").queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("set algebra: |A ∪ B| = |A ∩ B| + |A △ B| partitions distinct keys") {
    val union = q("set_union_distinct").count()
    val inter = q("set_intersect").count()
    val cust = Tables.customer(spark, sf)
      .select(col("c_nationkey")).distinct().count()
    val supp = Tables.supplier(spark, sf)
      .select(col("s_nationkey")).distinct().count()
    assert(union === cust + supp - inter)
  }

  test("rollup row count = groups + partial totals + grand total") {
    val groups = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_linestatus").distinct().count()
    val flags = Tables.lineitem(spark, sf)
      .select("l_returnflag").distinct().count()
    assert(q("agg_rollup").count() === groups + flags + 1)
  }

  test("win_running_rows: the max running total per customer equals the " +
    "customer's full total (frame reaches every row exactly once)") {
    // note: output is ordered by o_orderkey but the frame by o_orderdate,
    // so the sequence isn't monotone in output order — only the max is
    // the complete sum.
    val rows = q("win_running_rows").collect()
    val byCust = rows.groupBy(_.getLong(0))
    val totals = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(round(sum("o_totalprice"), 2).as("t")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    byCust.foreach { case (cust, rs) =>
      val running = rs.map(_.getDouble(2))
      assert(math.abs(running.max - totals(cust)) < 0.02,
        s"cust $cust: ${running.max} vs ${totals(cust)}")
    }
  }

  test("approx_count_distinct within the 2% rsd bound (B15)") {
    val approx = q("agg_approx_distinct").collect()(0)
    val exact = Tables.lineitem(spark, sf)
      .agg(countDistinct(col("l_partkey")), countDistinct(col("l_suppkey")))
      .collect()(0)
    for (i <- 0 to 1) {
      val a = approx.getLong(i).toDouble
      val e = exact.getLong(i).toDouble
      assert(math.abs(a - e) / e < 0.1, s"col $i: approx $a vs exact $e")
    }
  }

  test("udaf geometric mean equals exp(avg(ln(x)))") {
    val got = q("udaf_aggregator").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = Tables.lineitem(spark, sf).groupBy("l_returnflag")
      .agg(round(exp(avg(log(col("l_extendedprice")))), 2).as("g")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === want)
  }

  test("win_funnel_match: stage timestamps are ordered and stage counts " +
    "match a per-user replay") {
    val rows = q("win_funnel_match").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = if (r.isNullAt(1)) None else Some(r.getLong(1))
      val c = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val p = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val stage = r.getLong(4)
      // a later stage implies the earlier one, in time order
      c.foreach(cs => assert(v.exists(_ <= cs)))
      p.foreach(ps => assert(c.exists(_ <= ps)))
      assert(stage === Seq(v, c, p).count(_.isDefined).toLong)
    }
    // independent replay for one user: sequential scan of their timeline
    val uid = rows.head.getLong(0)
    val timeline = Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .withColumn("sec", unix_timestamp(col("ts")))
      .select("sec", "event_type", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3))
    var v, c, p = Option.empty[Long]
    timeline.foreach { case (sec, et, _) =>
      if (et == "view" && v.isEmpty) v = Some(sec)
      else if (et == "click" && c.isEmpty && v.exists(_ <= sec)) c = Some(sec)
      else if (et == "purchase" && p.isEmpty && c.exists(_ <= sec))
        p = Some(sec)
    }
    val got = rows.find(_.getLong(0) == uid).get
    def opt(i: Int) = if (got.isNullAt(i)) None else Some(got.getLong(i))
    assert((opt(1), opt(2), opt(3)) === ((v, c, p)))
  }

  test("agg_retention_cohort: offset-0 actives across cohorts cover every " +
    "user exactly once") {
    val rows = q("agg_retention_cohort").collect()
    assert(rows.forall(_.getLong(1) >= 0L))
    val offset0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    val users = Tables.events(spark, sf)
      .select(countDistinct("user_id")).collect()(0).getLong(0)
    // every user is active in their own cohort week (offset 0, by defn)
    assert(offset0 === users)
  }

  test("text_html_strip removes every injected tag and decodes entities") {
    val rows = q("text_html_strip").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vis = r.getString(1)
      assert(!vis.matches(".*</?(html|body|h1|p|a|br)[ >/].*"), vis)
      assert(vis.contains("link & more <here>"), vis)
      assert(!vis.contains("&amp;") && !vis.contains("&nbsp;"), vis)
      assert(r.getLong(2) === vis.length.toLong)
    }
  }

  test("cdc_scd2: per-key intervals tile the timeline — each valid_to is " +
    "the next valid_from minus one, and exactly one version is current") {
    val byUser = q("cdc_scd2").collect()
      .map(r => (r.getLong(0), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(5)))
      .groupBy(_._1)
    byUser.foreach { case (_, vs) =>
      assert(vs.count(_._4) === 1) // one open (current) version
      vs.sortBy(_._2).toSeq.sliding(2).foreach {
        case Seq((_, _, to, _), (_, from2, _, _)) =>
          assert(to.contains(from2 - 1))
        case _ => ()
      }
      val newest = vs.sortBy(_._2).last
      assert(newest._3.isEmpty && newest._4) // ...and it's the newest one
    }
  }

  test("join_interval_overlap: every 1h event interval overlaps exactly " +
    "two grid hours (one when aligned), so the totals reconcile") {
    val total = q("join_interval_overlap").collect().map(_.getLong(1)).sum
    val ev = Tables.events(spark, sf)
      .select(unix_timestamp(col("ts")).as("sec")).collect()
      .map(_.getLong(0))
    val expected = ev.map(s => if (s % 3600 == 0) 1L else 2L).sum
    assert(total === expected)
  }

  test("scan_csv_malformed quarantines exactly the corrupted lines, " +
    "keeping their parseable fields") {
    val rows = q("scan_csv_malformed").collect()
      .map(r => (r.getBoolean(0), r.getString(1), r.getLong(2)))
    val corrupt = rows.filter(_._1).map(_._3).sum
    val good = rows.filterNot(_._1).map(_._3).sum
    val docs = Tables.documents(spark, sf)
    val wantCorrupt = docs.filter(col("doc_id") % 7 === 0).count()
    assert(corrupt === wantCorrupt)
    assert(good === docs.count() - wantCorrupt)
    // partial results: the corrupt rows keep their parsed lang field
    assert(rows.filter(_._1).forall(_._2 != null))
  }

  test("resample_interpolate: known hours pass through; gap hours stay " +
    "inside the neighbor envelope") {
    val known = Tables.events(spark, sf)
      .groupBy(col("user_id"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hsec"))
      .agg(min("value").as("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val out = q("resample_interpolate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.length > known.size) // the grid really fills gaps
    val byUser = out.groupBy(_._1)
    byUser.foreach { case (u, vs) =>
      val sorted = vs.sortBy(_._2)
      sorted.foreach { case (_, h, v) =>
        known.get((u, h)) match {
          case Some(kv) => assert(v === kv) // pass-through
          case None => // interpolated: within the known-value envelope
            val kvs = known.collect { case ((`u`, _), x) => x }
            assert(v >= kvs.min - 1e-9 && v <= kvs.max + 1e-9)
        }
      }
    }
  }

  test("bpe_pair_counts matches a driver-side recount of the top pair") {
    val rows = q("bpe_pair_counts").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(rows.length === 20)
    assert(rows.map(_._2).toSeq === rows.map(_._2).toSeq.sorted.reverse)
    val tokens = Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), " ")).as("t")).collect()
      .map(_.getString(0)).filter(_.length >= 2)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    tokens.foreach { t =>
      (0 until t.length - 1).foreach { i =>
        val p = t.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + 1L
      }
    }
    val (topPair, topCnt) = rows.head
    assert(counts(topPair) === topCnt)
    assert(counts.values.max === topCnt)
  }

  test("fn_url_parse canonicalizes host case and strips the www prefix") {
    val rows = q("fn_url_parse").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val host = r.getString(2)
      val domain = r.getString(6)
      assert(host === host.toLowerCase)
      assert(!domain.startsWith("www."))
      if (id % 3 == 0) assert(host === s"www.$domain")
      else assert(host === domain)
      val query = r.getString(4)
      assert(query === s"lang=${r.getString(5)}&ref=r${id % 7}")
      assert(r.getString(3) === s"/docs/$id/view")
    }
  }
}
