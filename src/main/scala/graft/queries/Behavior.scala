package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** User-behavior analytics over the events/orders tables: marketing
  * attribution, rolling distinct-actives, and per-group equi-depth
  * histograms — the product-analytics trio (who converted, how many are
  * alive, how is spend distributed) a warehouse team runs daily.
  *
  * All three are one-keyed-exchange shapes: attribution is a per-user
  * ordered window with an O(1) running accumulator, rolling actives is a
  * map-side ×7 explode + one hash aggregate (no self-join over the
  * corpus), and the histogram's ntile windows are PARTITIONED (per
  * priority class) so no global single-partition sort ever appears —
  * each is the shape that survives a 1000-executor 100 TB run.
  */
object Behavior {
  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DAU growth accounting — the canonical product-health decomposition
    // (every day's active users split into new / retained / resurrected,
    // with yesterday's actives who vanished counted as that day's churn,
    // and the quick ratio (new+resurrected)/churned on top). One
    // distinct (user, day) projection → one user-keyed window (lag AND
    // lead ride the same sort) → day-keyed folds over the bounded
    // 30-day axis. Churn is attributed to the day AFTER the last active
    // day and the final calendar day is excluded (a user active on the
    // last day cannot be assessed — stated convention, both engines).
    "agg_growth_accounting" -> ((s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy("user_id").orderBy("day")
      // NOT checkpointed: this frame is (user, day)-grain — corpus-
      // proportional, unlike the bounded 16-row frames eager
      // localCheckpoint is reserved for. Both downstream folds share
      // the same distinct+window subtree, so ReuseExchange serves them
      // from one shuffle; recomputing the cheap window beats pinning
      // corpus-scale blocks in executor storage (non-recomputable on
      // executor loss at 100 TB).
      val flagged = ud
        .withColumn("prev_day", lag("day", 1).over(w))
        .withColumn("next_day", lead("day", 1).over(w))
      val inflow = flagged.groupBy("day")
        .agg(sum(when(col("prev_day").isNull, 1L).otherwise(0L))
          .as("n_new"),
          sum(when(datediff(col("day"), col("prev_day")) === 1, 1L)
            .otherwise(0L)).as("n_retained"),
          sum(when(datediff(col("day"), col("prev_day")) > 1, 1L)
            .otherwise(0L)).as("n_resurrected"))
      val maxDay = ud.agg(max("day").as("max_day"))
      val churn = flagged
        .crossJoin(broadcast(maxDay))
        .filter((col("next_day").isNull ||
          datediff(col("next_day"), col("day")) > 1) &&
          col("day") < col("max_day"))
        .select(date_add(col("day"), 1).as("day"))
        .groupBy("day").agg(count(lit(1)).as("n_churned"))
      inflow.join(churn, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_new"), lit(0L)).as("n_new"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"),
          coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
          coalesce(col("n_churned"), lit(0L)).as("n_churned"))
        .withColumn("quick_ratio",
          when(col("n_churned") > 0,
            round((col("n_new") + col("n_resurrected")).cast("double") /
              col("n_churned"), 4)))
        .orderBy("day")
    }),

    // SHAPLEY attribution — the coalition-game member of the attribution
    // family (last/linear/first/Markov-removal/time-decay all live
    // here): each channel's credit is its average marginal contribution
    // to conversion across every exposure coalition. The game is exact,
    // not sampled: the channel alphabet is the BOUNDED 4-bit exposure
    // mask (click/view/signup/error), so v(S) = conversion rate of
    // users whose exposure set is exactly S is a ≤16-row table (one
    // user-keyed bit_or fold — the only corpus-sized exchange), and
    // φ_c = Σ_{S∌c} w(|S|)·(v(S∪c) − v(S)) is a 4×8-row broadcast
    // join. Unobserved masks take v = 0 (stated convention) so the
    // efficiency identity Σφ = v(full) − v(∅) holds exactly — the spec
    // checks it. DETERMINISM: each term is quantized to integer
    // 1e-12ths before the 8-term unordered fold (v's are exact-integer
    // ratios, weights are shared literals), so both engines sum the
    // same integers. w(0)=w(3)=3!/4!=0.25, w(1)=w(2)=1/12 — ONE
    // literal spelling on both engines.
    "mine_attribution_shapley" -> ((s, d) => {
      import s.implicits._
      val bitOf = when(col("event_type") === "click", 1)
        .when(col("event_type") === "view", 2)
        .when(col("event_type") === "signup", 4)
        .when(col("event_type") === "error", 8).otherwise(0)
      val vtab = t(s, d, "events")
        .select(col("user_id"), bitOf.as("b"),
          when(col("event_type") === "purchase", 1).otherwise(0)
            .as("p"))
        .groupBy("user_id")
        .agg(expr("bit_or(b)").as("mask"), max("p").as("conv"))
        .groupBy("mask")
        .agg(sum("conv").cast("double").as("n_conv"),
          count(lit(1)).as("n_users"))
        .withColumn("v", col("n_conv") / col("n_users"))
        .select("mask", "v")
      val masks = s.range(16).select(col("id").cast("int").as("mask"))
        .join(vtab, Seq("mask"), "left")
        .select(col("mask"), coalesce(col("v"), lit(0.0)).as("v"))
        .localCheckpoint(true) // 16 rows, read on both join sides
      val chans = Seq((1, "click"), (2, "view"), (4, "signup"),
        (8, "error")).toDF("bit", "channel")
      chans.crossJoin(
          masks.select(col("mask").as("s_mask"), col("v").as("v_s")))
        .filter(col("s_mask").bitwiseAND(col("bit")) === 0)
        .join(masks.select(col("mask").as("su_mask"), col("v").as("v_su")),
          col("su_mask") === col("s_mask") + col("bit"))
        .withColumn("wt",
          when(bit_count(col("s_mask")).isin(0, 3), lit(0.25))
            .otherwise(lit(0.08333333333333333)))
        .withColumn("term12",
          round((col("v_su") - col("v_s")) * col("wt") * lit(1e12))
            .cast("long"))
        .groupBy("channel")
        .agg((sum("term12") / lit(1e12)).as("phi_raw"),
          count(lit(1)).as("n_terms"))
        .select(col("channel"),
          round(col("phi_raw"), 6).as("shapley"), col("n_terms"))
        .orderBy("channel")
    }),

    // Last-touch attribution: every purchase is credited to the user's
    // most recent PRECEDING click (or unattributed if none yet). One
    // window over (user, ts-ordered events): `last(click_id) IGNORE
    // NULLS` over ROWS UNBOUNDED PRECEDING..1 PRECEDING is a running
    // last-seen register — O(1) per row, one hash exchange on user_id,
    // no events⨝events self-join (the naive formulation is a range
    // self-join that explodes on active users). Ties at the same
    // timestamp break on event_id, making the credit deterministic.
    "win_attribution_last_touch" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("click", "purchase"))
      ev.withColumn("click_id",
          last(when(col("event_type") === "click", col("event_id")),
            ignoreNulls = true).over(w))
        .withColumn("click_ts",
          last(when(col("event_type") === "click", col("ts")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("click_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(col("click_ts")))
            .as("lag_sec"))
        .orderBy("purchase_id")
    }),

    // Multi-touch attribution (linear + first-touch), the whole-path
    // complement of the last-touch register above. The conversion-path
    // framing is ONE window column: ep = COUNT of the user's purchases
    // STRICTLY BEFORE each row — a purchase's own ep is its 0-based
    // conversion index, and every non-purchase row with the same
    // (user, ep) is a touch on exactly that conversion's path (touches
    // after the last purchase have an ep no purchase carries and drop
    // out in the semi-join). Linear splits 1 credit over the path's
    // touches; first-touch gives the whole credit to the earliest
    // (ts, event_id) touch. Two user-keyed exchanges (the window and
    // the path-group aggregate); the naive form is an events⨝events
    // range self-join that explodes on active users.
    "mine_attribution_linear" -> ((s, d) => {
      val wEp = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val ev = t(s, d, "events")
        .withColumn("is_p",
          when(col("event_type") === "purchase", 1L).otherwise(0L))
        .withColumn("ep", coalesce(sum("is_p").over(wEp), lit(0L)))
      val conv = ev.filter(col("is_p") === 1)
        .select(col("user_id"), col("ep")).distinct()
      val wPath = Window.partitionBy("user_id", "ep")
      ev.filter(col("is_p") === 0)
        .join(conv, Seq("user_id", "ep"), "left_semi")
        .withColumn("path_len", count(lit(1)).over(wPath))
        .withColumn("first_touch",
          min(struct(col("ts"), col("event_id"))).over(wPath) ===
            struct(col("ts"), col("event_id")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_touches"),
          round(sum(lit(1.0) / col("path_len")), 4).as("linear_credit"),
          round(sum(when(col("first_touch"), 1.0).otherwise(0.0)), 4)
            .as("first_touch_credit"))
        .orderBy("event_type")
    }),

    // Day-of-week × hour activity heatmap — the first dashboard tile of
    // any events product: when is the audience alive. One map-side
    // projection (Monday-based weekday so both engines agree: Spark
    // weekday() == DuckDB isodow()-1) into ONE hash aggregate over the
    // bounded 7×24 grid; the share windows run over those ≤168 rows.
    "agg_activity_heatmap" -> ((s, d) => {
      val wAll = Window.partitionBy() // bounded: ≤8 × 24 grid rows
      val wDow = Window.partitionBy("dow")
      Tables.events(s, d)
        .select(expr("weekday(ts)").cast("int").as("dow"),
          hour(col("ts")).as("hr"))
        .groupBy("dow", "hr")
        .agg(count(lit(1)).as("n_events"))
        .withColumn("pct_total",
          round(col("n_events") / sum("n_events").over(wAll), 4))
        .withColumn("pct_within_dow",
          round(col("n_events") / sum("n_events").over(wDow), 4))
        .orderBy("dow", "hr")
    }),

    // Markov removal-effect attribution — the model-based counterpart
    // of the positional credit rules (last-touch register, linear
    // split): build the first-order Markov chain over conversion paths
    // (start → touches → conv/null absorbing), then credit each channel
    // by its REMOVAL EFFECT — how much the start→conv absorption
    // probability drops when that channel's traffic is redirected to
    // null. The distributed work is exactly the linear-attribution
    // shape: the strictly-before purchase-count window frames epochs,
    // per-epoch lag windows emit (src → dst) transition rows, and ONE
    // hash aggregate reduces the corpus to a (channels+2)² count matrix.
    // Only that bounded matrix (≤ ~50 rows here; channels are a product
    // alphabet, not a corpus axis) reaches the driver, where the
    // absorbing-chain solve is a fixed 200-step contraction per channel.
    // No SQL twin — the solve is iterative — so the key is spec-gated
    // by a full driver replay (OperatorsSpec pins it as no-oracle).
    "mine_attribution_markov" -> ((s, d) => {
      import s.implicits._
      val wEp = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val ev = t(s, d, "events")
        .withColumn("is_p",
          when(col("event_type") === "purchase", 1L).otherwise(0L))
        .withColumn("ep", coalesce(sum("is_p").over(wEp), lit(0L)))
      val convEp = ev.filter(col("is_p") === 1)
        .select(col("user_id"), col("ep")).distinct()
      val touches = ev.filter(col("is_p") === 0)
      val wPath = Window.partitionBy("user_id", "ep")
        .orderBy(col("ts").asc, col("event_id").asc)
      // start→first and touch→touch edges
      val steps = touches
        .withColumn("src",
          coalesce(lag(col("event_type"), 1).over(wPath), lit("start")))
        .select(col("src"), col("event_type").as("dst"))
      // last touch → conv / null terminal edges
      val terminals = touches
        .withColumn("rn",
          row_number().over(Window.partitionBy("user_id", "ep")
            .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .join(convEp.withColumn("cv", lit(true)), Seq("user_id", "ep"),
          "left")
        .select(col("event_type").as("src"),
          when(col("cv"), "conv").otherwise("null").as("dst"))
      // converted epochs with no touches: start → conv
      val direct = convEp
        .join(touches.select("user_id", "ep").distinct(),
          Seq("user_id", "ep"), "left_anti")
        .select(lit("start").as("src"), lit("conv").as("dst"))
      val counts = steps.unionAll(terminals).unionAll(direct)
        .groupBy("src", "dst").agg(count(lit(1)).as("n"))
        // bounded collect: (channels + start) × (channels + conv + null)
        .collect().map(r => (r.getString(0), r.getString(1),
          r.getLong(2)))
      val states = counts.map(_._1).toSet - "start"
      val prob: Map[(String, String), Double] = {
        val tot = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum)
        counts.map(c => (c._1, c._2) -> c._3.toDouble / tot(c._1)).toMap
      }.withDefaultValue(0.0)
      // absorption probability into conv from start, with `removed`
      // channels redirecting their inbound mass to null
      def absorb(removed: Set[String]): Double = {
        val trans = ("start" +: states.toSeq.filterNot(removed)).distinct
        var p = trans.map(_ -> 0.0).toMap
        for (_ <- 1 to 200)
          p = trans.map { st =>
            st -> trans.map(t2 => prob((st, t2)) * p(t2))
              .sum.+(prob((st, "conv")))
          }.toMap
        p("start")
      }
      val p0 = absorb(Set.empty)
      val re = states.toSeq.sorted.map { ch =>
        (ch, math.max(0.0, 1.0 - absorb(Set(ch)) / p0))
      }
      val sumRe = re.map(_._2).sum
      val totalConv = counts.filter(_._2 == "conv").map(_._3).sum
      re.map { case (ch, r) =>
        (ch, BigDecimal(r).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble,
          BigDecimal(r / sumRe).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(totalConv * r / sumRe).setScale(2,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.toDF("channel", "removal_effect", "attribution_share",
        "attributed_conversions")
        .orderBy("channel")
    }),

    // Inter-order (reorder) intervals by market segment — the
    // replenishment-cycle readout merchandising planning runs: per
    // customer, days between consecutive orders (one customer-keyed lag
    // window), folded per segment to mean / exact median / exact p90
    // via the repo's percentile↔quantile_cont pairing. The window input
    // is order-cardinality keyed by customer; the percentile fold is
    // segment-keyed.
    "mine_reorder_interval" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("prev", lag("o_orderdate", 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("gap_days",
          datediff(col("o_orderdate"), col("prev")).cast("long"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_gaps"),
          round(avg("gap_days"), 2).as("mean_days"),
          round(expr("percentile(gap_days, 0.5)"), 2).as("median_days"),
          round(expr("percentile(gap_days, 0.9)"), 2).as("p90_days"))
        .orderBy("c_mktsegment")
    }),

    // Time-decay attribution — the recency-weighted member of the
    // credit family (last-touch, linear, first-touch, Markov): each
    // touch on a converted path earns exp(−ln2·Δ/86400) of a credit
    // (half-life one day to the conversion), normalized so every path
    // still pays out exactly 1. Same epoch framing as the linear key
    // plus ONE extra join carrying the conversion timestamp; the decay
    // constant is spelled as the same literal division on both engines,
    // and Δ is floor-seconds on both so the exponent is bit-identical.
    "mine_attribution_decay" -> ((s, d) => {
      val wEp = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val ev = t(s, d, "events")
        .withColumn("is_p",
          when(col("event_type") === "purchase", 1L).otherwise(0L))
        .withColumn("ep", coalesce(sum("is_p").over(wEp), lit(0L)))
      val conv = ev.filter(col("is_p") === 1)
        .select(col("user_id"), col("ep"),
          unix_timestamp(col("ts")).as("conv_sec"))
      val wPath = Window.partitionBy("user_id", "ep")
      ev.filter(col("is_p") === 0)
        .join(conv, Seq("user_id", "ep"))
        .withColumn("w",
          exp(lit(-8.022536812036404e-6) *
            (col("conv_sec") - unix_timestamp(col("ts"))).cast("double")))
        .withColumn("sw", sum("w").over(wPath))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_touches"),
          round(sum(col("w") / col("sw")), 4).as("decay_credit"))
        .orderBy("event_type")
    }),

    // Customer spend-bucket migration between the corpus's first two
    // years — the mobility matrix behind "are low spenders upgrading or
    // churning" (retention answers alive/dead; this answers WHERE they
    // moved). Buckets: none (no orders that year), low (< 400k), high.
    // One orders pass restricted to the two years → per-customer
    // conditional sums (customer-keyed exchange), a left join from the
    // customer base so never-ordered customers land in none→none, and
    // the matrix fold is ≤9 cells — the pct window runs over those
    // cells only. The base year is derived (1-row broadcast), not
    // hardcoded, like agg_price_index.
    "agg_spend_migration" -> ((s, d) => {
      val ords = t(s, d, "orders")
      val y0 = ords.agg(min(year(col("o_orderdate"))).as("y0"))
      val spend = ords.join(broadcast(y0),
          year(col("o_orderdate")) - col("y0") <= 1)
        .groupBy(col("o_custkey"))
        .agg(
          sum(when(year(col("o_orderdate")) === col("y0"),
            col("o_totalprice"))).as("s0"),
          sum(when(year(col("o_orderdate")) === col("y0") + 1,
            col("o_totalprice"))).as("s1"))
      def bucket(c: Column) = when(c.isNull, "none")
        .when(c < 400000.0, "low").otherwise("high")
      val wAll = Window.partitionBy() // bounded: ≤9 (3×3 bucket grid)
      t(s, d, "customer")
        .join(spend, col("c_custkey") === col("o_custkey"), "left")
        .select(bucket(col("s0")).as("from_bucket"),
          bucket(col("s1")).as("to_bucket"))
        .groupBy("from_bucket", "to_bucket")
        .agg(count(lit(1)).as("n_customers"))
        .withColumn("pct",
          round(col("n_customers") / sum("n_customers").over(wAll), 4))
        .orderBy("from_bucket", "to_bucket")
    }),

    // Trailing 7-day distinct active users per day (the WAU curve).
    // The scale-correct shape: dedupe to (day, user) FIRST (bounded by
    // days × users, orders of magnitude below raw events), then each
    // (day, user) row contributes to the 7 window-end days d..d+6 via a
    // map-side sequence explode — turning "distinct over a sliding
    // range" into one plain hash aggregate. No events self-join, no
    // per-day re-scan; the calendar dimension (distinct days) is
    // broadcast to drop phantom window-ends past the corpus edge. At
    // 100 TB the exchange carries ≤ 7×|days×users| deduped rows; the
    // documented approximate escape is one HLL sketch per day merged
    // over the window.
    "agg_rolling_distinct" -> ((s, d) => {
      val du = t(s, d, "events")
        .select(to_date(col("ts")).as("d"), col("user_id"))
        .distinct()
      val days = du.select(col("d").as("day")).distinct()
      du.select(explode(sequence(col("d"), date_add(col("d"), 6)))
            .as("day"), col("user_id"))
        .join(broadcast(days), "day")
        .groupBy("day")
        .agg(countDistinct(col("user_id")).as("active_7d"))
        .orderBy("day")
    }),

    // Per-class equi-depth histogram: quartiles of order value WITHIN
    // each order priority — ntile(4) over a PARTITIONED window (keyed
    // exchange on o_orderpriority, never the global single-partition
    // sort a whole-table ntile would plan), with o_orderkey as the
    // deterministic tiebreak so both engines tile identically. Depth
    // balance is ntile's contract: bucket sizes differ by at most one.
    "agg_hist_equidepth" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("quartile", ntile(4).over(w))
        .groupBy("o_orderpriority", "quartile")
        .agg(count(lit(1)).as("n_orders"),
          round(min("o_totalprice"), 2).as("lo"),
          round(max("o_totalprice"), 2).as("hi"))
        .orderBy("o_orderpriority", "quartile")
    }),

    // RFM segmentation — the classic customer triage: each customer's
    // Recency (last order date), Frequency (order count) and Monetary
    // (spend) land in deterministic quartiles (ntile(4) with the
    // customer key as tie-break — bare ntile over ties is
    // engine-arbitrary), and the report counts customers per (r,f,m)
    // cell with the cell's average spend. Shape: one orders fold to
    // customer grain (the only corpus-sized exchange), three rank
    // windows over CUSTOMER-cardinality rows, then a ≤64-cell
    // aggregate. The global ntile windows are single-partition over the
    // customer aggregate — at extreme customer counts the same bands
    // come from approx quantile fences instead (quartile membership by
    // comparison, no global sort).
    "agg_rfm_segments" -> ((s, d) => {
      val cust = t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(max("o_orderdate").as("last_order"),
          count(lit(1)).as("freq"),
          sum("o_totalprice").as("spend"))
      val wR = Window.orderBy(col("last_order").desc, col("o_custkey").asc) // corpus-axis: customers (see fallback above)
      val wF = Window.orderBy(col("freq").desc, col("o_custkey").asc) // corpus-axis: customers
      val wM = Window.orderBy(col("spend").desc, col("o_custkey").asc) // corpus-axis: customers
      cust
        .withColumn("r", ntile(4).over(wR))
        .withColumn("f", ntile(4).over(wF))
        .withColumn("m", ntile(4).over(wM))
        .groupBy("r", "f", "m")
        .agg(count(lit(1)).as("n_customers"),
          round(avg("spend"), 2).as("avg_spend"))
        .orderBy("r", "f", "m")
    }),

    // The SCALE twin of agg_rfm_segments: quartile membership by
    // comparison against approx-quantile FENCES instead of a global
    // ntile window — the plan has NO window at all (FencesSpec pins
    // it), so nothing serializes onto one task at billions of
    // customers. One percentile_approx aggregate (accuracy 10000)
    // yields the three 25/50/75 fences per dimension as a 1-row
    // broadcast; each customer's (r,f,m) band is then a map-side
    // comparison. Semantics differ from ntile ONLY at ties/boundaries:
    // ntile forces equal bucket sizes (splitting tied values across
    // buckets arbitrarily-but-deterministically), fences give every
    // tied value the same band — the honest behavior at scale, where a
    // global tie-ordered window is not an option. FencesSpec bounds the
    // marginal band-size deviation by the largest tie group.
    "agg_rfm_segments_fences" -> ((s, d) => {
      val cust = t(s, d, "orders")
        .groupBy("o_custkey")
        .agg(max("o_orderdate").as("last_order"),
          count(lit(1)).as("freq"),
          sum("o_totalprice").as("spend"))
        .withColumn("rec_days",
          datediff(col("last_order"), lit("1990-01-01").cast("date")))
      val probs = array(lit(0.25), lit(0.5), lit(0.75))
      val fences = cust.agg(
        percentile_approx(col("rec_days"), probs, lit(10000)).as("qr"),
        percentile_approx(col("freq"), probs, lit(10000)).as("qf"),
        percentile_approx(col("spend"), probs, lit(10000)).as("qm"))
      // band 1 = above all three fences (the DESC-ordered top quartile,
      // matching the exact key's ntile(4) OVER (ORDER BY x DESC))
      def band(v: org.apache.spark.sql.Column,
          q: org.apache.spark.sql.Column) =
        (lit(4) - aggregate(q, lit(0),
          (acc, x) => acc + when(v > x, 1).otherwise(0))).cast("int")
      cust.crossJoin(broadcast(fences))
        .select(band(col("rec_days"), col("qr")).as("r"),
          band(col("freq"), col("qf")).as("f"),
          band(col("spend"), col("qm")).as("m"),
          col("spend"))
        .groupBy("r", "f", "m")
        .agg(count(lit(1)).as("n_customers"),
          round(avg("spend"), 2).as("avg_spend"))
        .orderBy("r", "f", "m")
    }),

    // Top-customer MOVERS between two eras: revenue rank in the early
    // half (orders before 1998) vs the late half, reported for every
    // customer in either era's top-10 — the "who's rising, who's
    // churning" period-over-period report. Ranks are row_number with
    // the customer key tie-break (deterministic on both engines), a
    // customer absent from an era carries a NULL rank and a NULL delta
    // (both engines agree on NULL arithmetic here). Same
    // customer-cardinality window discipline as the RFM key.
    "win_rank_movers" -> ((s, d) => {
      def half(p: org.apache.spark.sql.Column) =
        t(s, d, "orders").filter(p)
          .groupBy("o_custkey")
          .agg(sum("o_totalprice").as("rev"))
      val w = Window.orderBy(col("rev").desc, col("o_custkey").asc) // corpus-axis: customers (exact rank)
      val cut = lit("1998-01-01").cast("date")
      val h1 = half(col("o_orderdate") < cut)
        .select(col("o_custkey"),
          row_number().over(w).as("r1"))
      val h2 = half(col("o_orderdate") >= cut)
        .select(col("o_custkey"),
          row_number().over(w).as("r2"))
      h1.join(h2, Seq("o_custkey"), "full_outer")
        .filter(col("r1") <= 10 || col("r2") <= 10)
        .select(col("o_custkey"), col("r1"), col("r2"),
          (col("r1") - col("r2")).as("rank_delta"))
        .orderBy("o_custkey")
    }),

    // The SCALE twin of win_rank_movers — OUTPUT-IDENTICAL (FencesSpec
    // pins row-for-row equality) with no global window anywhere:
    // each era's top-10 comes from orderBy().limit(10) (planned as a
    // distributed TakeOrdered — per-partition top-k merged on the
    // driver, never a full sort exchange), and the exact rank of each
    // of the ≤20 report customers is 1 + the count of rows beating it
    // under the same (rev DESC, custkey ASC) total order — a broadcast
    // of the 20-row report side against the customer aggregate, folded
    // by a partial-then-final count. row_number ≡ 1 + |better rows| for
    // a total order, so equality is by construction, not approximation.
    "win_rank_movers_fences" -> ((s, d) => {
      def half(p: org.apache.spark.sql.Column) =
        t(s, d, "orders").filter(p)
          .groupBy("o_custkey")
          .agg(sum("o_totalprice").as("rev"))
      val cut = lit("1998-01-01").cast("date")
      val h1 = half(col("o_orderdate") < cut).localCheckpoint(true)
      val h2 = half(col("o_orderdate") >= cut).localCheckpoint(true)
      def top10(h: DataFrame) = h
        .orderBy(col("rev").desc, col("o_custkey").asc).limit(10)
        .select("o_custkey")
      val report = top10(h1).unionByName(top10(h2)).distinct()
        .localCheckpoint(true) // ≤20 rows, reused as 4 join sides
      def ranks(h: DataFrame, as: String) = {
        val tr = report.join(h, Seq("o_custkey"))
          .select(col("o_custkey").as("tc"), col("rev").as("trev"))
        val beats = h.join(broadcast(tr),
            col("rev") > col("trev") ||
              (col("rev") === col("trev") && col("o_custkey") < col("tc")))
          .groupBy("tc").agg(count(lit(1)).as("nb"))
        tr.select("tc").join(beats, Seq("tc"), "left")
          .select(col("tc").as("o_custkey"),
            (coalesce(col("nb"), lit(0L)) + 1L).cast("int").as(as))
      }
      report.join(ranks(h1, "r1"), Seq("o_custkey"), "left")
        .join(ranks(h2, "r2"), Seq("o_custkey"), "left")
        .filter(col("r1") <= 10 || col("r2") <= 10)
        .select(col("o_custkey"), col("r1"), col("r2"),
          (col("r1") - col("r2")).as("rank_delta"))
        .orderBy("o_custkey")
    }),

    // Quarter-over-quarter churn: of the customers active in quarter q,
    // how many place an order in q+1 — the canonical retention/churn
    // report. One distinct fold to (customer, quarter) grain, then a
    // customer-keyed self-join against q+1 (per-key work bounded by a
    // customer's ACTIVE-quarter count, never the corpus) and a
    // quarter-cardinality aggregate. The trailing quarter's 100% churn
    // is the honest edge (there is no q+1 to retain into), kept in the
    // report rather than silently dropped.
    "agg_churn_rate" -> ((s, d) => {
      val act = t(s, d, "orders")
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 4 + quarter(col("o_orderdate")) - 1)
            .as("q"))
        .distinct()
      act.as("a").join(act.as("b"),
          col("a.o_custkey") === col("b.o_custkey") &&
            col("b.q") === col("a.q") + 1, "left")
        .groupBy(col("a.q").as("q"))
        .agg(count(lit(1)).as("n_active"),
          count(col("b.q")).as("n_retained"))
        .withColumn("churn_pct",
          round(lit(100.0) * (lit(1.0) -
            col("n_retained") / col("n_active")), 2))
        .orderBy("q")
    }),

    // DAU/WAU stickiness — "what share of the weekly audience shows up
    // on a given day". Reuses agg_rolling_distinct's scale-correct
    // shape: dedupe to (day, user) FIRST, then DAU is one hash
    // aggregate and WAU comes from the map-side ×7 contribution explode
    // — no self-join, no per-day rescans; the two day-keyed aggregates
    // join on the bounded calendar dimension.
    "agg_stickiness_ratio" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("d"), col("user_id"))
        .distinct()
      val days = du.select(col("d").as("day")).distinct()
      val dau = du.groupBy(col("d").as("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val wau = du.select(explode(sequence(col("d"), date_add(col("d"), 6)))
            .as("day"), col("user_id"))
        .join(broadcast(days), "day")
        .groupBy("day")
        .agg(countDistinct(col("user_id")).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau") / col("wau"), 4).as("stickiness"))
        .orderBy("day")
    }),

    // New-vs-returning split per day — the growth accounting identity
    // (actives = new + returning) every DAU chart is asked to decompose.
    // A user's first-ever day comes from one user-keyed min-fold; the
    // day report is then a single aggregate over the deduped (day, user)
    // stream. Two keyed exchanges total, both on natural keys.
    "agg_new_vs_returning" -> ((s, d) => {
      val du = Tables.events(s, d)
        .select(to_date(col("ts")).as("day"), col("user_id"))
        .distinct()
      val first = du.groupBy("user_id").agg(min("day").as("first_day"))
      du.join(first, "user_id")
        .groupBy("day")
        .agg(count(when(col("day") === col("first_day"), 1)).as("n_new"),
          count(when(col("day") > col("first_day"), 1))
            .as("n_returning"))
        .withColumn("new_pct",
          round(lit(100.0) * col("n_new") /
            (col("n_new") + col("n_returning")), 2))
        .orderBy("day")
    }),

    // Exponentially time-decayed engagement score (7-day half-life-ish
    // e-folding): sum(value · e^((t−t_max)/7d)) per user — the
    // recency-weighted feature every ranking/feature store keeps
    // instead of a raw sum. The corpus "now" is the 1-row max-timestamp
    // aggregate broadcast back; the score is then one map-side weight
    // and one user-keyed fold. Unlike a window-based decay, the weights
    // are order-free (each row's weight depends only on its own
    // timestamp), so partial aggregation stays map-side at any scale.
    "agg_decay_score" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("value"),
          unix_timestamp(col("ts")).as("es"))
      val tmax = ev.agg(max("es").as("tmax"))
      ev.crossJoin(broadcast(tmax))
        .select(col("user_id"), (col("value") *
          exp((col("es") - col("tmax")).cast("double") / lit(604800.0)))
          .as("w"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          round(sum("w"), 4).as("decay_score"))
        .orderBy("user_id")
    }),

    // Weekend lift per event type — the calendar-mix staple: average
    // event value on Sat/Sun vs weekdays and their ratio. One bounded
    // aggregate over the scan; the only cross-engine trap is the
    // day-of-week origin (Spark Sunday=1, DuckDB Sunday=0), pinned on
    // both sides.
    "agg_weekend_lift" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"), col("value"),
          dayofweek(col("ts")).isin(1, 7).as("we"))
        .groupBy("event_type")
        .agg(round(avg(when(col("we"), col("value"))), 4).as("avg_we"),
          round(avg(when(!col("we"), col("value"))), 4).as("avg_wd"),
          count(when(col("we"), 1)).as("n_we"),
          count(when(!col("we"), 1)).as("n_wd"))
        .withColumn("lift", round(col("avg_we") / col("avg_wd"), 4))
        .orderBy("event_type"))
  )

  val oracleSql: Map[String, String] = Map(
    // same (user, day) grain, same churn-on-day-after convention;
    // DuckDB date arithmetic (DATE - DATE = days, DATE + 1 = next day)
    // mirrors datediff/date_add
    "agg_growth_accounting" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), f AS (
        |  SELECT user_id, day,
        |         lag(day) OVER (PARTITION BY user_id ORDER BY day)
        |           AS prev_day,
        |         lead(day) OVER (PARTITION BY user_id ORDER BY day)
        |           AS next_day
        |  FROM ud
        |), inflow AS (
        |  SELECT day,
        |         CAST(sum(CASE WHEN prev_day IS NULL
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        |         CAST(sum(CASE WHEN day - prev_day = 1
        |                       THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_retained,
        |         CAST(sum(CASE WHEN day - prev_day > 1
        |                       THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_resurrected
        |  FROM f GROUP BY day
        |), mx AS (SELECT max(day) AS max_day FROM ud),
        |churn AS (
        |  SELECT day + 1 AS day, count(*) AS n_churned
        |  FROM f, mx
        |  WHERE (next_day IS NULL OR next_day - day > 1)
        |    AND day < max_day
        |  GROUP BY day + 1
        |)
        |SELECT day,
        |       CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
        |       CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
        |       CAST(coalesce(n_resurrected, 0) AS BIGINT)
        |         AS n_resurrected,
        |       CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned,
        |       CASE WHEN coalesce(n_churned, 0) > 0
        |            THEN round(CAST(coalesce(n_new, 0) +
        |                            coalesce(n_resurrected, 0) AS DOUBLE)
        |                       / n_churned, 4) END AS quick_ratio
        |FROM inflow FULL OUTER JOIN churn USING (day)
        |ORDER BY day""".stripMargin,
    // same 4-bit exposure game: exact-integer v ratios, shared weight
    // literals, integer-quantized terms — both engines sum the same ints
    "mine_attribution_shapley" ->
      """WITH per AS (
        |  SELECT user_id,
        |         bit_or(CASE event_type WHEN 'click' THEN 1
        |                WHEN 'view' THEN 2 WHEN 'signup' THEN 4
        |                WHEN 'error' THEN 8 ELSE 0 END) AS mask,
        |         max(CASE WHEN event_type = 'purchase'
        |                  THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY user_id
        |), vt AS (
        |  SELECT mask, CAST(sum(conv) AS DOUBLE) / count(*) AS v
        |  FROM per GROUP BY mask
        |), m AS (
        |  SELECT CAST(i.i AS INT) AS mask, coalesce(v, 0.0) AS v
        |  FROM range(0, 16) i(i)
        |  LEFT JOIN vt ON vt.mask = CAST(i.i AS INT)
        |), ch(bit, channel) AS (
        |  VALUES (1, 'click'), (2, 'view'), (4, 'signup'), (8, 'error')
        |), t AS (
        |  SELECT ch.channel,
        |         CAST(round((su.v - s.v) *
        |           (CASE WHEN bit_count(s.mask) IN (0, 3) THEN 0.25
        |                 ELSE 0.08333333333333333 END) * 1e12)
        |           AS BIGINT) AS term12
        |  FROM ch
        |  JOIN m s ON (s.mask & ch.bit) = 0
        |  JOIN m su ON su.mask = s.mask + ch.bit
        |)
        |SELECT channel,
        |       round(CAST(sum(term12) AS BIGINT) / 1e12, 6) AS shapley,
        |       count(*) AS n_terms
        |FROM t GROUP BY channel ORDER BY channel""".stripMargin,
    // same running last-seen register; floor(epoch()) matches Spark's
    // unix_timestamp second truncation
    "win_attribution_last_touch" ->
      """WITH ev AS (
        |  SELECT * FROM events WHERE event_type IN ('click', 'purchase')
        |), attr AS (
        |  SELECT event_id, user_id, ts, event_type,
        |         last_value(CASE WHEN event_type = 'click'
        |                         THEN event_id END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND 1 PRECEDING) AS click_id,
        |         last_value(CASE WHEN event_type = 'click'
        |                         THEN ts END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND 1 PRECEDING) AS click_ts
        |  FROM ev
        |)
        |SELECT event_id AS purchase_id, user_id, click_id,
        |       CAST(floor(epoch(ts)) - floor(epoch(click_ts))
        |            AS BIGINT) AS lag_sec
        |FROM attr WHERE event_type = 'purchase'
        |ORDER BY purchase_id""".stripMargin,
    // same strictly-before purchase-count epoch, path group, and
    // credit splits
    "mine_attribution_linear" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |           AS is_p,
        |         coalesce(CAST(sum(CASE WHEN event_type = 'purchase'
        |                           THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND 1 PRECEDING) AS BIGINT), 0) AS ep
        |  FROM events
        |), conv AS (
        |  SELECT DISTINCT user_id, ep FROM ev WHERE is_p = 1
        |), touches AS (
        |  SELECT ev.event_type, ev.user_id, ev.ep, ev.ts, ev.event_id,
        |         count(*) OVER (PARTITION BY ev.user_id, ev.ep)
        |           AS path_len,
        |         (row_number() OVER (PARTITION BY ev.user_id, ev.ep
        |                             ORDER BY ev.ts, ev.event_id) = 1)
        |           AS first_touch
        |  FROM ev JOIN conv ON ev.user_id = conv.user_id
        |                   AND ev.ep = conv.ep
        |  WHERE ev.is_p = 0
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
        |       round(sum(CAST(1.0 AS DOUBLE) / path_len), 4)
        |         AS linear_credit,
        |       round(sum(CASE WHEN first_touch THEN CAST(1.0 AS DOUBLE)
        |                      ELSE CAST(0.0 AS DOUBLE) END), 4)
        |         AS first_touch_credit
        |FROM touches GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // same lag gaps and quantile_cont percentile pairing
    "mine_reorder_interval" ->
      """WITH g AS (
        |  SELECT o_custkey,
        |         CAST(date_diff('day',
        |           lag(o_orderdate) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey),
        |           o_orderdate) AS BIGINT) AS gap_days
        |  FROM orders
        |)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_gaps,
        |       round(avg(gap_days), 2) AS mean_days,
        |       round(quantile_cont(gap_days, 0.5), 2) AS median_days,
        |       round(quantile_cont(gap_days, 0.9), 2) AS p90_days
        |FROM g JOIN customer ON o_custkey = c_custkey
        |WHERE gap_days IS NOT NULL
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // same epoch framing, conversion-second join, literal decay
    // division, and floor-seconds delta
    "mine_attribution_decay" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, ts, event_type,
        |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
        |           AS is_p,
        |         coalesce(CAST(sum(CASE WHEN event_type = 'purchase'
        |                           THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING
        |                          AND 1 PRECEDING) AS BIGINT), 0) AS ep
        |  FROM events
        |), conv AS (
        |  SELECT user_id, ep, epoch_ms(ts) // 1000 AS conv_sec
        |  FROM ev WHERE is_p = 1
        |), touches AS (
        |  SELECT ev.event_type, ev.user_id, ev.ep,
        |         exp(CAST(-8.022536812036404e-6 AS DOUBLE) *
        |           CAST(conv.conv_sec - epoch_ms(ev.ts) // 1000
        |             AS DOUBLE)) AS w
        |  FROM ev JOIN conv ON ev.user_id = conv.user_id
        |                   AND ev.ep = conv.ep
        |  WHERE ev.is_p = 0
        |), norm AS (
        |  SELECT event_type, w,
        |         sum(w) OVER (PARTITION BY user_id, ep) AS sw
        |  FROM touches
        |)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_touches,
        |       round(sum(w / sw), 4) AS decay_credit
        |FROM norm GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // Monday-based weekday via isodow()-1 matches Spark weekday()
    "agg_activity_heatmap" ->
      """WITH g AS (
        |  SELECT CAST(isodow(ts) - 1 AS INT) AS dow,
        |         CAST(hour(ts) AS INT) AS hr,
        |         CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT dow, hr, n_events,
        |       round(CAST(n_events AS DOUBLE) / sum(n_events) OVER (), 4)
        |         AS pct_total,
        |       round(CAST(n_events AS DOUBLE) /
        |         sum(n_events) OVER (PARTITION BY dow), 4)
        |         AS pct_within_dow
        |FROM g ORDER BY dow, hr""".stripMargin,
    // same derived base year, 400k bucket fence, and customer-base left
    // join
    "agg_spend_migration" ->
      """WITH y AS (
        |  SELECT min(year(o_orderdate)) AS y0 FROM orders
        |), s AS (
        |  SELECT o_custkey,
        |         sum(CASE WHEN year(o_orderdate) = y0
        |                  THEN o_totalprice END) AS s0,
        |         sum(CASE WHEN year(o_orderdate) = y0 + 1
        |                  THEN o_totalprice END) AS s1
        |  FROM orders, y
        |  WHERE year(o_orderdate) - y0 <= 1
        |  GROUP BY o_custkey
        |), b AS (
        |  SELECT CASE WHEN s0 IS NULL THEN 'none'
        |              WHEN s0 < 400000.0 THEN 'low'
        |              ELSE 'high' END AS from_bucket,
        |         CASE WHEN s1 IS NULL THEN 'none'
        |              WHEN s1 < 400000.0 THEN 'low'
        |              ELSE 'high' END AS to_bucket
        |  FROM customer LEFT JOIN s ON c_custkey = o_custkey
        |), g AS (
        |  SELECT from_bucket, to_bucket,
        |         CAST(count(*) AS BIGINT) AS n_customers
        |  FROM b GROUP BY 1, 2
        |)
        |SELECT from_bucket, to_bucket, n_customers,
        |       round(CAST(n_customers AS DOUBLE) /
        |             sum(n_customers) OVER (), 4) AS pct
        |FROM g ORDER BY from_bucket, to_bucket""".stripMargin,
    // band-join formulation: day D counts users active in D-6..D —
    // identical to the contribution-explode by construction
    "agg_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
        |), days AS (SELECT DISTINCT d AS day FROM du)
        |SELECT days.day,
        |       CAST(count(DISTINCT du.user_id) AS BIGINT) AS active_7d
        |FROM days JOIN du
        |  ON du.d BETWEEN days.day - 6 AND days.day
        |GROUP BY days.day
        |ORDER BY days.day""".stripMargin,
    "agg_hist_equidepth" ->
      """WITH q AS (
        |  SELECT o_orderpriority, o_totalprice,
        |         ntile(4) OVER (PARTITION BY o_orderpriority
        |                        ORDER BY o_totalprice, o_orderkey)
        |           AS quartile
        |  FROM orders
        |)
        |SELECT o_orderpriority, quartile, count(*) AS n_orders,
        |       round(min(o_totalprice), 2) AS lo,
        |       round(max(o_totalprice), 2) AS hi
        |FROM q
        |GROUP BY o_orderpriority, quartile
        |ORDER BY o_orderpriority, quartile""".stripMargin,
    // identical fold, same ntile tie-breaks, same ≤64-cell report
    "agg_rfm_segments" ->
      """WITH c AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order,
        |         count(*) AS freq, sum(o_totalprice) AS spend
        |  FROM orders GROUP BY o_custkey
        |), q AS (
        |  SELECT spend,
        |         CAST(ntile(4) OVER (ORDER BY last_order DESC,
        |           o_custkey ASC) AS INT) AS r,
        |         CAST(ntile(4) OVER (ORDER BY freq DESC,
        |           o_custkey ASC) AS INT) AS f,
        |         CAST(ntile(4) OVER (ORDER BY spend DESC,
        |           o_custkey ASC) AS INT) AS m
        |  FROM c
        |)
        |SELECT r, f, m, count(*) AS n_customers,
        |       round(avg(spend), 2) AS avg_spend
        |FROM q GROUP BY r, f, m ORDER BY r, f, m""".stripMargin,
    // identical era split, row_number tie-breaks and NULL-delta carry
    "win_rank_movers" ->
      """WITH h1 AS (
        |  SELECT o_custkey,
        |         CAST(row_number() OVER (ORDER BY sum(o_totalprice) DESC,
        |           o_custkey ASC) AS INT) AS r1
        |  FROM orders WHERE o_orderdate < DATE '1998-01-01'
        |  GROUP BY o_custkey
        |), h2 AS (
        |  SELECT o_custkey,
        |         CAST(row_number() OVER (ORDER BY sum(o_totalprice) DESC,
        |           o_custkey ASC) AS INT) AS r2
        |  FROM orders WHERE o_orderdate >= DATE '1998-01-01'
        |  GROUP BY o_custkey
        |)
        |SELECT coalesce(h1.o_custkey, h2.o_custkey) AS o_custkey,
        |       r1, r2, r1 - r2 AS rank_delta
        |FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
        |WHERE r1 <= 10 OR r2 <= 10
        |ORDER BY o_custkey""".stripMargin,
    // identical quarter index, self-join retention and rounded ratio
    "agg_churn_rate" ->
      """WITH act AS (
        |  SELECT DISTINCT o_custkey,
        |         CAST(year(o_orderdate) * 4 + quarter(o_orderdate) - 1
        |           AS INT) AS q
        |  FROM orders
        |)
        |SELECT a.q AS q, CAST(count(*) AS BIGINT) AS n_active,
        |       CAST(count(b.q) AS BIGINT) AS n_retained,
        |       round(100.0 * (1.0 -
        |         CAST(count(b.q) AS DOUBLE) / count(*)), 2) AS churn_pct
        |FROM act a LEFT JOIN act b
        |  ON a.o_custkey = b.o_custkey AND b.q = a.q + 1
        |GROUP BY a.q ORDER BY a.q""".stripMargin,
    // same dedupe-first DAU and band-join WAU as agg_rolling_distinct
    "agg_stickiness_ratio" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
        |), days AS (SELECT DISTINCT d AS day FROM du),
        |dau AS (
        |  SELECT d AS day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM du GROUP BY d
        |), wau AS (
        |  SELECT days.day,
        |         CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
        |  FROM days JOIN du ON du.d BETWEEN days.day - 6 AND days.day
        |  GROUP BY days.day
        |)
        |SELECT day, dau, wau, round(dau / CAST(wau AS DOUBLE), 4)
        |         AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,
    // identical first-day fold and day split
    "agg_new_vs_returning" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        |), f AS (
        |  SELECT user_id, min(day) AS first_day FROM du GROUP BY user_id
        |)
        |SELECT day,
        |       CAST(count(CASE WHEN day = first_day THEN 1 END)
        |         AS BIGINT) AS n_new,
        |       CAST(count(CASE WHEN day > first_day THEN 1 END)
        |         AS BIGINT) AS n_returning,
        |       round(100.0 *
        |         CAST(count(CASE WHEN day = first_day THEN 1 END)
        |           AS DOUBLE) / count(*), 2) AS new_pct
        |FROM du JOIN f USING (user_id)
        |GROUP BY day ORDER BY day""".stripMargin,
    // same corpus-now broadcast and per-row e-folding weight
    "agg_decay_score" ->
      """WITH ev AS (
        |  SELECT user_id, value,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS es
        |  FROM events
        |), t AS (SELECT max(es) AS tmax FROM ev)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |       round(sum(value *
        |         exp(CAST(es - tmax AS DOUBLE) / 604800.0)), 4)
        |         AS decay_score
        |FROM ev, t GROUP BY user_id ORDER BY user_id""".stripMargin,
    // DuckDB dayofweek is Sunday=0; Spark is Sunday=1 — both pinned
    "agg_weekend_lift" ->
      """WITH e AS (
        |  SELECT event_type, value, dayofweek(ts) IN (0, 6) AS we
        |  FROM events
        |)
        |SELECT event_type,
        |       round(avg(CASE WHEN we THEN value END), 4) AS avg_we,
        |       round(avg(CASE WHEN NOT we THEN value END), 4) AS avg_wd,
        |       CAST(count(CASE WHEN we THEN 1 END) AS BIGINT) AS n_we,
        |       CAST(count(CASE WHEN NOT we THEN 1 END) AS BIGINT) AS n_wd,
        |       round(round(avg(CASE WHEN we THEN value END), 4) /
        |             round(avg(CASE WHEN NOT we THEN value END), 4), 4)
        |         AS lift
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
