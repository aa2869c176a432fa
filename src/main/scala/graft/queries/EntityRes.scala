package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Probabilistic record linkage (Fellegi–Sunter): the statistical layer
  * above `dedup_fuzzy_blocking`'s raw edit-distance pairs. Given blocked
  * candidate pairs and per-field agreement flags, estimate each field's
  * m-probability (P(agree | same entity)) and u-probability
  * (P(agree | different entities)), turn them into log2 match weights,
  * and classify pairs by total weight — the splink/record-linkage core,
  * run entirely as keyed joins and aggregates.
  *
  * The dirty corpus is DERIVED deterministically from `customer`: every
  * 5th row is cloned under an offset id with field perturbations (every
  * 2nd clone's name case-folded, every 3rd's segment replaced, every
  * 4th's balance band shifted), so ground truth is known exactly and the
  * oracle can rebuild the identical corpus in SQL. Scale shape: blocking
  * on nationkey bounds the candidate join to per-block fan-out (the
  * all-pairs guard every linkage run needs); the weight table is three
  * rows; scoring is one broadcast of those scalars over the pair stream.
  * At 100 TB the block key sharpens (zip+name-initial, multi-pass
  * redundant blocking for recall) but the algebra — pair join, two
  * Laplace-smoothed conditional rates, a broadcast scalar fold — is
  * unchanged.
  */
object EntityRes {
  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  /** Clone ids live above any real custkey at every SUPPORTED scale
    * factor: c_custkey = 150000×SF, so 1e12 holds to SF ≈ 6.6M — far
    * past the ~100k SF of a 100 TB corpus (the old 1e8 broke at SF 667,
    * silently: the oracle rebuilds the same corpus, so a collision
    * would corrupt ground truth on both engines identically).
    */
  private[graft] val CloneOffset = 1000000000000L

  /** Originals ∪ perturbed clones, with `link` = the clone's source id
    * (NULL on originals). band = floor(acctbal/1000) — 11 natural values,
    * so band agreement has a real u-probability (~0.09 by chance) instead
    * of a degenerate one.
    */
  private[graft] def dirty(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "customer").select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
      floor(col("c_acctbal") / 1000).cast("long").as("band"))
    val clones = base.filter(col("id") % 5 === 0).select(
      (col("id") + CloneOffset).as("id"),
      when(col("id") % 10 === 0, lower(col("name")))
        .otherwise(col("name")).as("name"),
      col("nat"),
      when(col("id") % 15 === 0, lit("PERTURBED"))
        .otherwise(col("seg")).as("seg"),
      when(col("id") % 20 === 0, col("band") + 1)
        .otherwise(col("band")).as("band"),
      col("id").as("link"))
    base.withColumn("link", lit(null).cast("long")).unionByName(clones)
  }

  /** The dirty corpus with BLOCK-KEY noise: identical clone rules to
    * [[dirty]] PLUS every 25-divisible clone's nationkey shifted by one
    * ((nat+1) mod 25) — the production failure mode the multipass keys
    * exist for: a typo in the BLOCK key (not a compared field) makes
    * the true pair invisible to any single-key blocking scheme, however
    * good the scorer is. nat stays out of the comparison vector (it is
    * a blocking key, not an agreement field), so the scoring algebra is
    * unchanged; only candidate GENERATION sees the noise. Separate
    * builder so every pre-existing er_* key keeps its exact fixture.
    */
  private[graft] def dirtyB(s: SparkSession, d: String): DataFrame = {
    val base = t(s, d, "customer").select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
      floor(col("c_acctbal") / 1000).cast("long").as("band"))
    val clones = base.filter(col("id") % 5 === 0).select(
      (col("id") + CloneOffset).as("id"),
      when(col("id") % 10 === 0, lower(col("name")))
        .otherwise(col("name")).as("name"),
      when(col("id") % 25 === 0, pmod(col("nat") + 1, lit(25)))
        .otherwise(col("nat")).as("nat"),
      when(col("id") % 15 === 0, lit("PERTURBED"))
        .otherwise(col("seg")).as("seg"),
      when(col("id") % 20 === 0, col("band") + 1)
        .otherwise(col("band")).as("band"),
      col("id").as("link"))
    base.withColumn("link", lit(null).cast("long")).unionByName(clones)
  }

  /** Surname lexicon for the PHONETIC-blocking fixture — 40 distinct
    * names, every one carrying a vowel at position ≥ 3 so the planted
    * typo below applies, and 40 distinct soundex codes so the phonetic
    * key has real blocking power (~N/40 rows per block).
    */
  private[graft] val PhoneticLexicon: Seq[String] = Seq(
    "ANDERSON", "JOHNSON", "WILLIAMS", "BROWN", "JONES", "MILLER",
    "DAVIS", "WILSON", "TAYLOR", "THOMAS", "MOORE", "MARTIN", "JACKSON",
    "THOMPSON", "WHITE", "HARRIS", "CLARK", "LEWIS", "ROBINSON",
    "WALKER", "YOUNG", "ALLEN", "KENNEDY", "WRIGHT", "SCOTT", "GREEN",
    "BAKER", "ADAMS", "NELSON", "CARTER", "MITCHELL", "PEREZ",
    "ROBERTS", "TURNER", "PHILLIPS", "CAMPBELL", "PARKER", "EVANS",
    "EDWARDS", "COLLINS")

  /** A SOUNDEX-PRESERVING name typo: substitute the first vowel at
    * position ≥ 3 (A→E, anything else→A). Soundex ignores non-leading
    * vowels, so the code never changes; equality always breaks; edit
    * distance is exactly 1 — the misspelling class phonetic blocking
    * exists to survive. Anchored regex, so exactly one substitution.
    */
  private[graft] def vowelTypo(name: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val v = regexp_extract(name, "^..[^AEIOU]*([AEIOU])", 1)
    when(v === "A",
      regexp_replace(name, "^(..[^AEIOU]*)A", "$1E"))
      .otherwise(regexp_replace(name, "^(..[^AEIOU]*)[AEIOU]", "$1A"))
  }

  /** The PHONETIC-blocking fixture: the [[dirtyB]] skeleton with the
    * unique TPC-H name replaced by a 40-surname lexicon draw (soundex
    * of `Customer#000…` is one degenerate block — a phonetic key needs
    * phonetic structure) and ONE new perturbation: every 10-divisible
    * clone's surname takes the soundex-preserving vowel typo. The
    * planted hard classes this creates:
    *  - id ≡ 0 (mod 25), seg or band also perturbed, name intact —
    *    invisible to the nat pass (typo'd block key) AND the
    *    (seg, band) pass, recovered by the soundex pass WITH a strong
    *    name-agreement score (recall improves end to end);
    *  - id ≡ 0 (mod 100): nat typo + name typo + band perturbed —
    *    co-blocked ONLY by soundex (exact-name blocking misses the
    *    misspelling), the pair-completeness demonstration.
    */
  private[graft] def dirtyP(s: SparkSession, d: String): DataFrame = {
    val lex = typedlit(PhoneticLexicon)
    val base = t(s, d, "customer").select(
      col("c_custkey").as("id"),
      element_at(lex,
        pmod(col("c_custkey"), lit(40)).cast("int") + 1).as("name"),
      col("c_nationkey").as("nat"), col("c_mktsegment").as("seg"),
      floor(col("c_acctbal") / 1000).cast("long").as("band"))
    val clones = base.filter(col("id") % 5 === 0).select(
      (col("id") + CloneOffset).as("id"),
      when(col("id") % 10 === 0, vowelTypo(col("name")))
        .otherwise(col("name")).as("name"),
      when(col("id") % 25 === 0, pmod(col("nat") + 1, lit(25)))
        .otherwise(col("nat")).as("nat"),
      when(col("id") % 15 === 0, lit("PERTURBED"))
        .otherwise(col("seg")).as("seg"),
      when(col("id") % 20 === 0, col("band") + 1)
        .otherwise(col("band")).as("band"),
      col("id").as("link"))
    base.withColumn("link", lit(null).cast("long")).unionByName(clones)
  }

  /** The TF family's labeled pair counts (np, nm, am, au over the
    * nat-blocked dirtyTf stream) staged as a 1-row artifact, the
    * [[countsStaged]] contract: the blocked pair join is the family's
    * dominant cost and the row is a pure function of the corpus —
    * er_tf_adjust and er_tf_classify both read it instead of each
    * paying the scan (measured: the live twin cost er_tf_classify a
    * second 2.5 s pair pass at sf0.1).
    */
  private[graft] def tfCountsStaged(s: SparkSession, d: String): String = {
    val path = graft.Staging.dir("graft_tf_counts", d)
    val stamp = graft.Staging.fingerprint(s, s"$d/customer.parquet")
    if (!graft.Staging.isCurrent(path, stamp)) {
      val dd = dirtyTf(s, d)
      dd.as("a").join(dd.as("b"),
          col("a.nat") === col("b.nat") && col("a.id") < col("b.id"))
        .select(
          (col("b.link") <=> col("a.id")).cast("long").as("is_match"),
          (col("a.sname") === col("b.sname")).cast("long").as("ag"))
        .agg(count(lit(1)).as("np"), sum("is_match").as("nm"),
          sum(when(col("is_match") === 1, col("ag"))).as("am"),
          sum(when(col("is_match") === 0, col("ag"))).as("au"))
        .coalesce(1).write.mode("overwrite").parquet(path)
      graft.Staging.commitStamp(path, stamp)
    }
    path
  }

  /** One blocking pass over the phonetic fixture, with BOTH scheme
    * flags riding (each a pure function of the pair, so the disjoint
    * union stays consistent): in_nat = the primary key agrees, in_p2 =
    * the (seg, band) composite agrees. Scheme cells then come off ONE
    * scanned stream as flag-conditioned sums — the multipass rule.
    */
  private def passP(dd: DataFrame,
      cond: org.apache.spark.sql.Column): DataFrame =
    dd.as("a").join(dd.as("b"), cond && col("a.id") < col("b.id"))
      .select(
        (col("a.nat") === col("b.nat")).cast("long").as("in_nat"),
        (col("a.seg") === col("b.seg") &&
          col("a.band") === col("b.band")).cast("long").as("in_p2"),
        (col("b.link") <=> col("a.id")).cast("long").as("is_match"),
        (col("a.name") === col("b.name")).cast("long").as("ag_name"),
        (col("a.seg") === col("b.seg")).cast("long").as("ag_seg"),
        (col("a.band") === col("b.band")).cast("long").as("ag_band"))

  /** The three DISJOINT passes (each suppresses its predecessors in its
    * own join condition — splink's blocking-rule suppression, so the
    * union needs no distinct): nat; (seg, band) minus nat; soundex
    * minus both. Factored so the spec can interrogate single passes.
    */
  private[graft] def passesP(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val dd = dirtyP(s, d)
    val segBand = col("a.seg") === col("b.seg") &&
      col("a.band") === col("b.band")
    (passP(dd, col("a.nat") === col("b.nat")),
      passP(dd, segBand && col("a.nat") =!= col("b.nat")),
      passP(dd, soundex(col("a.name")) === soundex(col("b.name")) &&
        col("a.nat") =!= col("b.nat") && !segBand))
  }

  /** The estimation stream's pattern histogram over the phonetic
    * fixture — nat-blocked (primary pass) only, per the
    * estimation-vs-prediction split [[histBStaged]] documents. ≤ 8 rows.
    */
  private[graft] def histPStaged(s: SparkSession, d: String): String = {
    val path = graft.Staging.dir("graft_fs_hist_p_nat", d)
    val stamp = graft.Staging.fingerprint(s, s"$d/customer.parquet")
    if (!graft.Staging.isCurrent(path, stamp)) {
      val dd = dirtyP(s, d)
      passP(dd, col("a.nat") === col("b.nat"))
        .groupBy("ag_name", "ag_seg", "ag_band")
        .agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(path)
      graft.Staging.commitStamp(path, stamp)
    }
    path
  }

  private def histRowsP(s: SparkSession, d: String)
      : Seq[(Long, Long, Long, Long)] =
    s.read.parquet(histPStaged(s, d)).collect().toSeq
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("ag_name"),
        r.getAs[Long]("ag_seg"), r.getAs[Long]("ag_band")))

  /** The TERM-FREQUENCY fixture: [[dirty]]'s id/nat/link skeleton with
    * a SKEWED surname-class field replacing the unique TPC-H name —
    * ~60% of records share one modal value, ~30% spread over 8 mid
    * values, ~10% are per-record singletons (the clone copy doubles a
    * cloned singleton). The unique-name corpus cannot demonstrate TF
    * adjustments (every value is a singleton, so the adjustment is a
    * constant); real name fields are Zipfian, which is why production
    * linkage (splink's term-frequency adjustments) scales the agreement
    * evidence by the shared VALUE's corpus frequency. Clones copy the
    * surname unperturbed — the TF question is about evidence STRENGTH
    * per value, not comparator error.
    */
  private[graft] def dirtyTf(s: SparkSession, d: String): DataFrame = {
    val sname = when(col("c_custkey") % 100 < 60, lit("MODAL"))
      .when(col("c_custkey") % 100 < 90,
        concat(lit("MID_"), (col("c_custkey") % 8).cast("string")))
      .otherwise(concat(lit("RARE_"), col("c_custkey").cast("string")))
    val base = t(s, d, "customer").select(
      col("c_custkey").as("id"), sname.as("sname"),
      col("c_nationkey").as("nat"))
    val clones = base.filter(col("id") % 5 === 0).select(
      (col("id") + CloneOffset).as("id"), col("sname"), col("nat"),
      col("id").as("link"))
    base.withColumn("link", lit(null).cast("long")).unionByName(clones)
  }

  /** LIVE multipass candidate generation over the noisy-block-key corpus
    * — the composition `er_blocking_multipass` prices but (until now)
    * nothing consumed. Candidates are the UNION of independent blocking
    * passes, deduped by pair id (union-distinct on (src, dst) — never
    * inclusion–exclusion, which is for counts):
    *   pass 1: nat          — the primary key, loses every nat-typo pair
    *   pass 2: (seg, band)  — the redundant pass that recovers them
    * The redundant pass is the COMPOSITE key, not single-key seg/band:
    * a live generator must bound per-block fan-out (single-key seg has
    * ~n/6-row blocks → quadratic candidates at 100×; the composite's
    * blocks are ~n/70), and the composite still co-blocks every clone
    * whose seg AND band survived perturbation — capturing ~half of the
    * nat-typo'd true pairs for ~1/10 the candidate bill of seg∪band.
    * Each pass is a keyed equi-join (never an OR-join, which Spark can
    * only nested-loop); the dedup is one distinct on the union — at
    * 100 TB each pass shuffles on its own key and the distinct shuffles
    * the candidate set, all hash-partitioned work.
    */
  // in_nat (did this pair co-block under the PRIMARY key?) rides every
  // pass: it is a pure function of the pair, so the union-distinct
  // keeps it consistent, and the comparison key can derive the
  // nat-only scheme's cells from the SAME scanned stream instead of
  // re-running the nat join for a second sweep
  private def passB(dd: DataFrame,
      cond: org.apache.spark.sql.Column): DataFrame =
    dd.as("a").join(dd.as("b"), cond && col("a.id") < col("b.id"))
      .select(
        col("a.id").as("src"), col("b.id").as("dst"),
        (col("a.nat") === col("b.nat")).cast("long").as("in_nat"),
        (col("b.link") <=> col("a.id")).cast("long").as("is_match"),
        (col("a.name") === col("b.name")).cast("long").as("ag_name"),
        (col("a.seg") === col("b.seg")).cast("long").as("ag_seg"),
        (col("a.band") === col("b.band")).cast("long").as("ag_band"))

  private def natCond = col("a.nat") === col("b.nat")
  // pass 2 SUPPRESSES pass 1's pairs in its own join condition
  // (splink's blocking-rule suppression): the passes are disjoint by
  // construction, so the union needs NO distinct — at sf0.1 that
  // removes a 9M-row dedup shuffle from every consumer. The flags
  // stay pure functions of the pair, so the union equals the
  // OR-predicate set the DuckDB twin evaluates directly.
  private def segBandCond =
    col("a.seg") === col("b.seg") && col("a.band") === col("b.band") &&
      col("a.nat") =!= col("b.nat")

  private[graft] def pairsB(s: SparkSession, d: String,
      multipass: Boolean): DataFrame = {
    val dd = dirtyB(s, d)
    val nat = passB(dd, natCond)
    val stream =
      if (!multipass) nat
      else nat.unionByName(passB(dd, segBandCond))
    stream.drop("src", "dst", "in_nat")
  }

  /** The ESTIMATION stream's pattern histogram over the noisy corpus —
    * the nat-blocked (primary-pass) stream only, staged like
    * [[histStaged]]. Deliberately NOT the multipass union: estimating
    * the mixture on a union whose redundant pass selects pairs FOR
    * agreement feeds the latent match class a huge agreeing-non-match
    * cluster and the EM degenerates (measured on this fixture at
    * sf0.01: weights off the union gave a flat sweep at precision
    * 0.0057 with recall 0.50 — BELOW the single-pass stream's 0.60).
    * This is splink's estimation-vs-prediction blocking split: EM
    * parameters come from a stream whose non-match patterns look like
    * the population's, scoring runs on whatever candidate generation
    * recall requires. ≤ 8 rows at any scale.
    */
  private[graft] def histBStaged(s: SparkSession, d: String): String = {
    val path = graft.Staging.dir("graft_fs_hist_b_nat", d)
    val stamp = graft.Staging.fingerprint(s, s"$d/customer.parquet")
    if (!graft.Staging.isCurrent(path, stamp)) {
      pairsB(s, d, multipass = false)
        .groupBy("ag_name", "ag_seg", "ag_band")
        .agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(path)
      graft.Staging.commitStamp(path, stamp)
    }
    path
  }

  private def histRowsB(s: SparkSession, d: String)
      : Seq[(Long, Long, Long, Long)] =
    s.read.parquet(histBStaged(s, d)).collect().toSeq
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("ag_name"),
        r.getAs[Long]("ag_seg"), r.getAs[Long]("ag_band")))

  /** GRADED agreement pairs (Winkler's 3-level comparator): name is
    * scored exact (γ=2) / close (γ=1: levenshtein ≤ 1 but not equal) /
    * disagree (γ=0) instead of the binary equality the base family
    * uses. The case-folded clones land EXACTLY in the close band
    * (TPC-H names carry one uppercase letter, so the fold is distance
    * 1), and strangers whose zero-padded ids differ in ONE digit land
    * there by chance — u_close is a real rate, not a fixture artifact.
    * The band is ≤ 1, not the textbook ≤ 2, by MEASUREMENT: on
    * zero-padded sequential names most same-block strangers differ in
    * ≤ 2 digit positions, so the ≤ 2 band is chance-dominated
    * (u ≈ m → the EM priced "close" at w = −0.98, a PENALTY) — a
    * comparator level only carries evidence where u ≪ m, and the band
    * must be tuned to the name distribution like any other comparator
    * parameter. seg/band stay binary. Same nat blocking as [[pairs]];
    * the levenshtein runs only on blocked candidates, never all pairs.
    */
  private[graft] def pairsGraded(s: SparkSession, d: String): DataFrame = {
    val dd = dirty(s, d)
    dd.as("a").join(dd.as("b"),
        col("a.nat") === col("b.nat") && col("a.id") < col("b.id"))
      .select(
        (col("b.link") <=> col("a.id")).cast("long").as("is_match"),
        // the 3-arg THRESHOLDED levenshtein: banded DP, O(len·k)
        // instead of O(len²) per pair — at k=1 that is ~6× less work
        // on every one of the blocked candidates (measured: the
        // unbounded variant put this key at 13.3 s at sf0.1; a
        // bounded comparator should always be spelled bounded).
        // Returns -1 when the distance exceeds the threshold, so
        // "close" is exactly a non-negative result on unequal names.
        when(col("a.name") === col("b.name"), 2L)
          .when(levenshtein(col("a.name"), col("b.name"), 1) >= 0, 1L)
          .otherwise(0L).as("ag_name"),
        (col("a.seg") === col("b.seg")).cast("long").as("ag_seg"),
        (col("a.band") === col("b.band")).cast("long").as("ag_band"))
  }

  /** The graded pattern histogram WITH the truth label, staged like
    * [[histStaged]] — ≤ 3·2²·2 = 24 rows at any corpus scale. One
    * artifact serves two consumers: the categorical EM reads the
    * UNLABELED projection (is_match summed away driver-side —
    * production-true, no label touches the estimation), and the graded
    * sweep reads the labeled rows directly, because every confusion
    * cell is a pattern-count sum (w is a pure function of the pattern)
    * — the er_review_queue rule. The per-pair levenshtein is paid
    * exactly once, here at staging time (measured: leaving it in the
    * sweep's timed window cost 7.5 s/run at sf0.1 — ~5× the binary
    * sweep — all of it re-deriving counts this reduction already
    * holds; the bounded-DP threshold variant had already halved the
    * 13.3 s unbounded spelling).
    */
  private[graft] def histGradedStaged(s: SparkSession, d: String): String = {
    val path = graft.Staging.dir("graft_fs_hist_graded3", d)
    val stamp = graft.Staging.fingerprint(s, s"$d/customer.parquet")
    if (!graft.Staging.isCurrent(path, stamp)) {
      pairsGraded(s, d)
        .groupBy("ag_name", "ag_seg", "ag_band", "is_match")
        .agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(path)
      graft.Staging.commitStamp(path, stamp)
    }
    path
  }

  /** The unlabeled (pattern, count) projection for the EM — the ≤24-row
    * labeled histogram folded over is_match in a deterministic order.
    */
  private def histRowsGraded(s: SparkSession, d: String)
      : Seq[(Long, Long, Long, Long)] =
    s.read.parquet(histGradedStaged(s, d)).collect().toSeq
      .map(r => ((r.getAs[Long]("ag_name"), r.getAs[Long]("ag_seg"),
        r.getAs[Long]("ag_band")), r.getAs[Long]("n")))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case ((gn, gs, gb), rows) =>
        (rows.map(_._2).sum, gn, gs, gb)
      }

  /** Categorical-name EM: the [[emTrace]] mixture generalized from
    * Bernoulli to a 3-level categorical on name (seg/band stay
    * Bernoulli). Per M-step the three name probabilities are clamped
    * like every other parameter and then RENORMALIZED to sum to 1
    * (clamp order: 0, 1, 2 — the SQL twin divides in the identical
    * literal order, so both engines produce bit-identical parameters
    * up to the shared summation caveat). Seeds: u⁰ = the observed
    * per-level rates; m⁰ halves the close/disagree mass and pushes the
    * exact level up ((1+r₂)/2, r₁/2, r₀/2 — sums to 1 exactly), the
    * categorical analogue of the Bernoulli (1+marginal)/2 seed.
    * Returns (λ, m_name[level], u_name[level], m_seg, u_seg, m_band,
    * u_band); driver-side scalar arithmetic over ≤ 12 histogram rows.
    */
  private[graft] def emFitGraded(h: Seq[(Long, Long, Long, Long)])
      : (Double, Array[Double], Array[Double],
         Double, Double, Double, Double) = {
    val rows = h.sortBy(r => (r._2, r._3, r._4))
    val nTot = rows.map(_._1.toDouble).sum
    def lvlRate(l: Long) =
      rows.filter(_._2 == l).map(_._1.toDouble).sum / nTot
    val r = Array(lvlRate(0), lvlRate(1), lvlRate(2))
    val rs = rows.map(x => x._1.toDouble * x._3).sum / nTot
    val rb = rows.map(x => x._1.toDouble * x._4).sum / nTot
    var lam = 0.01
    var mN = Array(r(0) / 2, r(1) / 2, (1 + r(2)) / 2)
    var uN = r.clone()
    var mS = (1 + rs) / 2; var uS = rs
    var mB = (1 + rb) / 2; var uB = rb
    for (_ <- 1 to EmIters) {
      var sn = 0.0; var sw = 0.0; var swu = 0.0
      val smN = Array(0.0, 0.0, 0.0); val suN = Array(0.0, 0.0, 0.0)
      var smS = 0.0; var suS = 0.0; var smB = 0.0; var suB = 0.0
      rows.foreach { case (cnt, gn, gs, gb) =>
        val gsd = gs.toDouble; val gbd = gb.toDouble
        val pm = lam * mN(gn.toInt) *
          (gsd * mS + (1 - gsd) * (1 - mS)) *
          (gbd * mB + (1 - gbd) * (1 - mB))
        val pu = (1 - lam) * uN(gn.toInt) *
          (gsd * uS + (1 - gsd) * (1 - uS)) *
          (gbd * uB + (1 - gbd) * (1 - uB))
        val w = pm / (pm + pu)
        val c = cnt.toDouble
        sn += c; sw += c * w; swu += c * (1 - w)
        smN(gn.toInt) += c * w; suN(gn.toInt) += c * (1 - w)
        smS += c * w * gsd; suS += c * (1 - w) * gsd
        smB += c * w * gbd; suB += c * (1 - w) * gbd
      }
      lam = clamp(sw / sn)
      val cm = Array(clamp(smN(0) / sw), clamp(smN(1) / sw),
        clamp(smN(2) / sw))
      val cmSum = cm(0) + cm(1) + cm(2)
      mN = Array(cm(0) / cmSum, cm(1) / cmSum, cm(2) / cmSum)
      val cu = Array(clamp(suN(0) / swu), clamp(suN(1) / swu),
        clamp(suN(2) / swu))
      val cuSum = cu(0) + cu(1) + cu(2)
      uN = Array(cu(0) / cuSum, cu(1) / cuSum, cu(2) / cuSum)
      mS = clamp(smS / sw); uS = clamp(suS / swu)
      mB = clamp(smB / sw); uB = clamp(suB / swu)
    }
    (lam, mN, uN, mS, uS, mB, uB)
  }

  /** Blocked candidate pairs with per-field agreement flags and the
    * ground-truth match label. a.id < b.id puts the clone on the b side
    * of every true pair (clone ids are offset high), so the label is one
    * null-safe compare; blocking on nat has 100% pair-completeness here
    * by construction (clones never perturb the block key) — the recall
    * the classifier is scored on is therefore end-to-end, not
    * blocking-truncated.
    */
  private def pairs(s: SparkSession, d: String): DataFrame = {
    val dd = dirty(s, d)
    dd.as("a").join(dd.as("b"),
        col("a.nat") === col("b.nat") && col("a.id") < col("b.id"))
      .select(
        (col("b.link") <=> col("a.id")).cast("long").as("is_match"),
        (col("a.name") === col("b.name")).cast("long").as("ag_name"),
        (col("a.seg") === col("b.seg")).cast("long").as("ag_seg"),
        (col("a.band") === col("b.band")).cast("long").as("ag_band"))
  }

  /** The merge-grade weight frame (rounded 6dp, the er_golden_record
    * scalars) and the λ=6 edge cut over a (src, dst, ag_*) pair frame —
    * factored out so the INCREMENTAL linkage applies the identical
    * model to its batch×all pairs that the full relink applies to
    * everything (incremental == full only holds if the scorer is shared
    * to the bit).
    */
  private def mergeWeightFrame(s: SparkSession, d: String): DataFrame = {
    val c = counts(s, d) // staged 1-row artifact
    val (_, _, waN, wdN) = mu(col("name_m"), col("name_u"))
    val (_, _, waS, wdS) = mu(col("seg_m"), col("seg_u"))
    val (_, _, waB, wdB) = mu(col("band_m"), col("band_u"))
    c.select(round(waN, 6).as("wa_name"), round(wdN, 6).as("wd_name"),
      round(waS, 6).as("wa_seg"), round(wdS, 6).as("wd_seg"),
      round(waB, 6).as("wa_band"), round(wdB, 6).as("wd_band"))
  }

  private[graft] def mergeEdges(s: SparkSession, d: String,
      pid: DataFrame): DataFrame =
    pid.crossJoin(broadcast(mergeWeightFrame(s, d)))
      .withColumn("wt",
        when(col("ag_name") === 1, col("wa_name")).otherwise(col("wd_name")) +
          when(col("ag_seg") === 1, col("wa_seg")).otherwise(col("wd_seg")) +
          when(col("ag_band") === 1, col("wa_band")).otherwise(col("wd_band")))
      .filter(col("wt") > 6.0)
      .select("src", "dst")

  private[graft] def flaggedPairs(a: DataFrame, b: DataFrame): DataFrame =
    a.as("a").join(b.as("b"),
        col("a.nat") === col("b.nat") && col("a.id") < col("b.id"))
      .select(col("a.id").as("src"), col("b.id").as("dst"),
        (col("a.name") === col("b.name")).cast("long").as("ag_name"),
        (col("a.seg") === col("b.seg")).cast("long").as("ag_seg"),
        (col("a.band") === col("b.band")).cast("long").as("ag_band"))

  /** The "arriving batch" of the incremental-linkage fixture: clones
    * whose source id ≡ 5 (mod 20) — a quarter of the clones, all
    * name-unperturbed (5 mod 10 ≠ 0), orthogonal to the seg/band
    * perturbation rules, so the batch contains records that MUST merge
    * into existing entities. Everything else (all originals + the other
    * clones, including more mergeable ones) is the resolved base.
    */
  private def isBatchRec: org.apache.spark.sql.Column =
    col("link").isNotNull && pmod(col("link"), lit(20)) === 5

  /** The BASE entity assignment (id → entity) staged once: the λ=6
    * merge pipeline run over the corpus WITHOUT the arriving batch —
    * in production this is yesterday's linkage state, and the daily
    * run must never re-score base×base pairs. Entity ids are the
    * component-min ids, identical to what a full relink assigns to the
    * same components.
    */
  private[graft] def baseAssignStaged(s: SparkSession, d: String): String = {
    val path = graft.Staging.dir("graft_er_incr_base", d)
    val stamp = graft.Staging.fingerprint(s, s"$d/customer.parquet")
    if (!graft.Staging.isCurrent(path, stamp)) {
      val base = dirty(s, d).filter(!isBatchRec)
      val cc = graft.operators.ConnectedComponents(
        mergeEdges(s, d, flaggedPairs(base, base)))
      base.select(col("id"))
        .join(cc, base("id") === cc("v"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("entity"))
        .write.mode("overwrite").parquet(path)
      graft.Staging.commitStamp(path, stamp)
    }
    path
  }

  /** One-row aggregate carrying every count the weight table needs. */
  private def countsNow(s: SparkSession, d: String): DataFrame =
    pairs(s, d).agg(
      count(lit(1)).as("np"), sum("is_match").as("nm"),
      sum(when(col("is_match") === 1, col("ag_name"))).as("name_m"),
      sum(when(col("is_match") === 0, col("ag_name"))).as("name_u"),
      sum(when(col("is_match") === 1, col("ag_seg"))).as("seg_m"),
      sum(when(col("is_match") === 0, col("ag_seg"))).as("seg_u"),
      sum(when(col("is_match") === 1, col("ag_band"))).as("band_m"),
      sum(when(col("is_match") === 0, col("ag_band"))).as("band_u"))

  /** The count aggregate STAGED once per (corpus, scale) — all three
    * linkage keys need it, and the blocked pair join that produces it is
    * the family's dominant cost; a pure function of the corpus belongs in
    * a stamped artifact, not in every query's timed window (the same
    * staged-derived-artifact rule as the minhash shingle projection).
    * The weights key then never touches the pair stream at all; classify
    * and calibration build it exactly once, for scoring.
    */
  private[graft] def countsStaged(s: SparkSession, d: String): String = {
    val path = graft.Staging.dir("graft_fs_counts", d)
    val stamp = graft.Staging.fingerprint(s, s"$d/customer.parquet")
    if (!graft.Staging.isCurrent(path, stamp)) {
      countsNow(s, d).write.mode("overwrite").parquet(path)
      graft.Staging.commitStamp(path, stamp)
    }
    path
  }

  private def counts(s: SparkSession, d: String): DataFrame =
    s.read.parquet(countsStaged(s, d))

  /** The UNLABELED agreement-pattern histogram — 2³ patterns × counts,
    * the sufficient statistic for EM estimation (`er_fs_em`): unlike the
    * label-conditioned [[countsStaged]] marginals, this is what a
    * production linkage actually has (no ground truth). Staged for the
    * same reason as the counts: it is a pure function of the corpus and
    * the blocked pair join that produces it is the family's dominant
    * cost. At any scale the artifact is ≤ 8 rows.
    */
  private[graft] def histStaged(s: SparkSession, d: String): String = {
    val path = graft.Staging.dir("graft_fs_hist", d)
    val stamp = graft.Staging.fingerprint(s, s"$d/customer.parquet")
    if (!graft.Staging.isCurrent(path, stamp)) {
      pairs(s, d).groupBy("ag_name", "ag_seg", "ag_band")
        .agg(count(lit(1)).as("n"))
        .write.mode("overwrite").parquet(path)
      graft.Staging.commitStamp(path, stamp)
    }
    path
  }

  def ensureStaged(s: SparkSession, d: String): Unit = {
    countsStaged(s, d)
    histStaged(s, d)
    histBStaged(s, d)
    histPStaged(s, d)
    histGradedStaged(s, d)
    tfCountsStaged(s, d)
    baseAssignStaged(s, d)
    ()
  }

  /** EM iteration count — fixed (not convergence-tested) so the DuckDB
    * twin can unroll the identical number of steps and the two engines
    * agree to hash precision.
    */
  private[graft] val EmIters = 30

  /** M-step clamp bounds — m/u (and λ) are pinned inside (0,1) after
    * every step, the standard EM guard (splink's probability bounds):
    * without it the near-unique field's u collapses to EXACTLY 0 within
    * a few iterations (w saturates to 1.0 in double precision, the
    * zero feeds back) and the log-weights blow up. Written as decimal
    * literals, NOT 1-1e-6 arithmetic, so Scala and SQL parse the
    * identical double.
    */
  private val ClampLo = 0.000001
  private val ClampHi = 0.999999

  private def clamp(x: Double): Double =
    math.max(math.min(x, ClampHi), ClampLo)

  /** Unsupervised Fellegi–Sunter parameter estimation: a 2-component
    * Bernoulli-mixture EM over the 8-row agreement-pattern histogram
    * (rows: (count, γ_name, γ_seg, γ_band)). Seeds from marginals —
    * u⁰ = the observed per-field agreement rate (non-matches dominate,
    * so the marginal ≈ u), m⁰ = (1 + marginal)/2 (pushed toward
    * agreement, which anchors the latent "match" class on the agreeing
    * side), λ⁰ = 0.01. Runs on the DRIVER: the histogram is ≤ 8 rows at
    * ANY corpus scale — the pair stream is reduced distributively, the
    * EM itself is O(8·iters) scalar arithmetic. γ∈{0,1} Bernoulli terms
    * are written as γ·m + (1−γ)·(1−m) — exact for 0/1, and the same
    * expression the SQL twin uses, so both engines do bit-identical
    * per-step arithmetic up to summation order.
    */
  private[graft] def emFit(h: Seq[(Long, Long, Long, Long)])
      : (Double, Array[Double], Array[Double]) = {
    val (_, lam, m, u) = emTrace(h).last
    (lam, m, u)
  }

  /** The full EM trajectory — (iteration, λ, m, u) from the marginal
    * seeds (iter 0) through the final step. The convergence curve is
    * itself a product a linkage engineer reads (has λ plateaued? is a
    * parameter still drifting at the iteration cap?), and
    * `er_fs_em_trace` surfaces it oracle-checked.
    */
  private[graft] def emTrace(h: Seq[(Long, Long, Long, Long)])
      : Seq[(Int, Double, Array[Double], Array[Double])] = {
    val rows = h.sortBy(r => (r._2, r._3, r._4)) // deterministic fold order
    val nTot = rows.map(_._1.toDouble).sum
    def marg(g: ((Long, Long, Long, Long)) => Long) =
      rows.map(r => r._1.toDouble * g(r)).sum / nTot
    val mg = Array(marg(_._2), marg(_._3), marg(_._4))
    var lam = 0.01
    var m = mg.map(a => (1 + a) / 2)
    var u = mg.clone()
    val trace = scala.collection.mutable.ArrayBuffer(
      (0, lam, m.clone(), u.clone()))
    for (k <- 1 to EmIters) {
      var sn = 0.0; var sw = 0.0; var swu = 0.0
      val sm = Array(0.0, 0.0, 0.0); val su = Array(0.0, 0.0, 0.0)
      rows.foreach { case (cnt, gn, gs, gb) =>
        val g = Array(gn.toDouble, gs.toDouble, gb.toDouble)
        var pm = lam; var pu = 1 - lam
        var i = 0
        while (i < 3) {
          pm *= g(i) * m(i) + (1 - g(i)) * (1 - m(i))
          pu *= g(i) * u(i) + (1 - g(i)) * (1 - u(i))
          i += 1
        }
        val w = pm / (pm + pu)
        val c = cnt.toDouble
        sn += c; sw += c * w; swu += c * (1 - w)
        i = 0
        while (i < 3) {
          sm(i) += c * w * g(i); su(i) += c * (1 - w) * g(i); i += 1
        }
      }
      lam = clamp(sw / sn)
      m = Array(clamp(sm(0) / sw), clamp(sm(1) / sw), clamp(sm(2) / sw))
      u = Array(clamp(su(0) / swu), clamp(su(1) / swu),
        clamp(su(2) / swu))
      trace += ((k, lam, m.clone(), u.clone()))
    }
    trace.toSeq
  }

  /** The 8-row unlabeled pattern histogram collected to the driver. */
  private def histRows(s: SparkSession, d: String)
      : Seq[(Long, Long, Long, Long)] =
    s.read.parquet(histStaged(s, d)).collect().toSeq
      .map(r => (r.getAs[Long]("n"), r.getAs[Long]("ag_name"),
        r.getAs[Long]("ag_seg"), r.getAs[Long]("ag_band")))

  /** m, u, and the two log2 weights from (agree-count, total) columns —
    * Laplace-smoothed (+0.5 / +1) so a field that never agrees across
    * non-matches (name, here) gets a large finite weight, not ±inf.
    */
  private def mu(am: org.apache.spark.sql.Column,
      au: org.apache.spark.sql.Column) = {
    val m = (am + lit(0.5)) / (col("nm") + lit(1.0))
    val u = (au + lit(0.5)) / (col("np") - col("nm") + lit(1.0))
    (m, u, log(2.0, m / u), log(2.0, (lit(1.0) - m) / (lit(1.0) - u)))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // BLOCKING-SCHEME EVALUATION — the step BEFORE any pair is scored:
    // for each candidate blocking key, pair completeness (share of true
    // duplicate pairs the scheme keeps co-blocked) vs reduction ratio
    // (share of the all-pairs space it prunes). Both are computed from
    // COUNTS ONLY — candidates = Σ C(block_size, 2) off one group-by,
    // captured truth = one clone⨝original join on the link key — so the
    // evaluation never materializes a candidate pair: at 100 TB you
    // grade a blocking scheme from block-cardinality statistics before
    // paying for the join it would generate. The fixture makes the
    // tension real: nat is never perturbed (PC = 1.0, weak pruning at 25
    // blocks), seg is perturbed on every third clone (PC ≈ 0.67, but
    // ~5× fewer candidates per block count) — the recall-vs-cost
    // tradeoff every linkage deployment prices.
    "er_blocking_quality" -> ((s, d) => {
      val dd = dirty(s, d)
      val nTruth = dd.filter(col("link").isNotNull).count()
      val nTotal = dd.count()
      val totalPairs = nTotal * (nTotal - 1) / 2
      val links = dd.filter(col("link").isNotNull).as("c")
        .join(dd.filter(col("link").isNull).as("o"),
          col("c.link") === col("o.id"))
      def scheme(name: String, key: String) = {
        // integer DIV, matching the oracle's `//`: Column `/` is double
        // division, exact only while c*(c-1) < 2^53 (~95M-row blocks) —
        // at extreme scale the two engines could disagree by 1
        val cand = dd.groupBy(col(key)).agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) DIV 2")).as("n_candidates"))
        val captured = links
          .agg(sum((col(s"c.$key") === col(s"o.$key")).cast("long"))
            .as("truth_captured"))
        cand.crossJoin(captured)
          .select(lit(name).as("scheme"), col("n_candidates"),
            col("truth_captured"),
            round(col("truth_captured").cast("double") / nTruth, 4)
              .as("pair_completeness"),
            round(lit(1.0) -
              col("n_candidates").cast("double") / totalPairs, 6)
              .as("reduction_ratio"))
      }
      scheme("nat", "nat").unionByName(scheme("seg", "seg"))
        .orderBy("scheme")
    }),

    // MULTIPASS (REDUNDANT) BLOCKING — the production recall fix
    // er_blocking_quality motivates: two weak keys run as separate
    // passes and a true pair survives if EITHER co-blocks it. Still
    // COUNTS-ONLY, extended by inclusion–exclusion: |A ∪ B| =
    // ΣC(n_seg,2) + ΣC(n_band,2) − ΣC(n_(seg,band),2) — three
    // group-bys, no pair ever materialized; captured truth is the one
    // link join with an OR predicate. The fixture prices the textbook
    // win: seg alone misses every 3rd clone, band alone every 4th,
    // the union misses only the id%60 overlap (PC ≈ 0.98) at roughly
    // the sum of the candidate bills — redundant blocking buys recall
    // with candidates, and this key shows the exchange rate.
    "er_blocking_multipass" -> ((s, d) => {
      val dd = dirty(s, d)
      val nTruth = dd.filter(col("link").isNotNull).count()
      val nTotal = dd.count()
      val totalPairs = nTotal * (nTotal - 1) / 2
      def candCount(keys: Seq[String]): Long =
        dd.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) DIV 2")).as("n")).head().getLong(0)
      val nSeg = candCount(Seq("seg"))
      val nBand = candCount(Seq("band"))
      val nBoth = candCount(Seq("seg", "band"))
      val links = dd.filter(col("link").isNotNull).as("c")
        .join(dd.filter(col("link").isNull).as("o"),
          col("c.link") === col("o.id"))
      val cap = links.agg(
        sum((col("c.seg") === col("o.seg")).cast("long")).as("cs"),
        sum((col("c.band") === col("o.band")).cast("long")).as("cb"),
        sum((col("c.seg") === col("o.seg") ||
          col("c.band") === col("o.band")).cast("long")).as("cu"))
        .head()
      import s.implicits._
      Seq(("band", nBand, cap.getLong(1)),
        ("seg", nSeg, cap.getLong(0)),
        ("seg+band", nSeg + nBand - nBoth, cap.getLong(2)))
        .toDF("scheme", "n_candidates", "truth_captured")
        .select(col("scheme"), col("n_candidates"),
          col("truth_captured"),
          round(col("truth_captured").cast("double") / nTruth, 4)
            .as("pair_completeness"),
          round(lit(1.0) -
            col("n_candidates").cast("double") / totalPairs, 6)
            .as("reduction_ratio"))
        .orderBy("scheme")
    }),

    // The estimated weight table itself: one row per comparison field.
    // name is the near-unique high-weight field (u ~ smoothing floor),
    // seg and band carry real chance-agreement rates — the spread of
    // w_agree across fields IS the output a linkage engineer reads.
    "er_fs_weights" -> ((s, d) => {
      val c = counts(s, d) // staged 1-row artifact
      def row(f: String, am: String, au: String) = {
        val (m, u, wa, wd) = mu(col(am), col(au))
        c.select(lit(f).as("field"), round(m, 6).as("m"),
          round(u, 6).as("u"), round(wa, 6).as("w_agree"),
          round(wd, 6).as("w_disagree"))
      }
      row("band", "band_m", "band_u")
        .unionByName(row("name", "name_m", "name_u"))
        .unionByName(row("seg", "seg_m", "seg_u"))
        .orderBy("field")
    }),

    // Calibration (reliability diagram) of the FS posterior, bucketed by
    // INTEGER TOTAL WEIGHT (the FS-native axis — p-deciles collapse to
    // {0, 9} here because the prior odds are tiny and the name weight is
    // huge): each bucket reports the model's predicted match probability
    // (prior-odds × 2^weight through the logistic, averaged) against the
    // observed match rate — the gap IS the cost of the naive-Bayes
    // independence assumption the weights make, quantified instead of
    // assumed away. Same broadcast-scalars-over-pair-stream shape as the
    // classify key; the bucket fold is a handful of counter rows.
    "er_fs_calibration" -> ((s, d) => {
      val c = counts(s, d) // staged 1-row artifact
      val (_, _, waN, wdN) = mu(col("name_m"), col("name_u"))
      val (_, _, waS, wdS) = mu(col("seg_m"), col("seg_u"))
      val (_, _, waB, wdB) = mu(col("band_m"), col("band_u"))
      val w = c.select(round(waN, 6).as("wa_name"), round(wdN, 6).as("wd_name"),
        round(waS, 6).as("wa_seg"), round(wdS, 6).as("wd_seg"),
        round(waB, 6).as("wa_band"), round(wdB, 6).as("wd_band"),
        (col("nm").cast("double") / (col("np") - col("nm")))
          .as("prior_odds"))
      // r19: histogram-first (see er_fs_em_classify) — wt/p/bin are
      // pattern-constant, so the calibration table folds from the pair
      // stream to ≤ 16 weighted rows; the per-bin averages become
      // count-weighted means of per-pattern constants (identical values:
      // avg over n copies of p is (n·p)/n, and frac_true is an exact
      // integer ratio either way).
      pairs(s, d)
        .groupBy("is_match", "ag_name", "ag_seg", "ag_band")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(w))
        .withColumn("wt",
          when(col("ag_name") === 1, col("wa_name")).otherwise(col("wd_name")) +
            when(col("ag_seg") === 1, col("wa_seg")).otherwise(col("wd_seg")) +
            when(col("ag_band") === 1, col("wa_band")).otherwise(col("wd_band")))
        .withColumn("odds", col("prior_odds") * pow(lit(2.0), col("wt")))
        .withColumn("p", col("odds") / (lit(1.0) + col("odds")))
        .withColumn("bin", floor(col("wt")).cast("long"))
        .groupBy("bin")
        .agg(sum(col("n")).as("n_pairs"),
          round(sum(col("p") * col("n")) / sum(col("n")), 4).as("avg_conf"),
          round(sum(when(col("is_match") === 1, col("n")).otherwise(0L))
            .cast("double") / sum(col("n")).cast("double"), 4)
            .as("frac_true"))
        .orderBy("bin")
    }),

    // UNSUPERVISED parameter estimation — the production-true version of
    // er_fs_weights: no real linkage has ground-truth labels, so m/u are
    // estimated by EM over the UNLABELED agreement-pattern histogram (a
    // 2-component Bernoulli mixture; Winkler's classic formulation). The
    // cluster-scale shape: the pair stream reduces to ≤ 2³ pattern-count
    // rows distributively (one staged group-by), and the EM itself is
    // driver-side scalar arithmetic over those 8 rows — at 100 TB the
    // histogram is STILL 8 rows. Output is the same weight-table shape
    // as er_fs_weights plus the estimated match prevalence λ; the spec
    // pins EM's estimates against the label-derived truth on the
    // fixture (they must agree without ever seeing a label).
    "er_fs_em" -> ((s, d) => {
      val (lam, m, u) = emFit(histRows(s, d))
      import s.implicits._
      Seq(("band", m(2), u(2)), ("name", m(0), u(0)), ("seg", m(1), u(1)))
        .toDF("field", "m_raw", "u_raw")
        .select(col("field"), round(col("m_raw"), 6).as("m"),
          round(col("u_raw"), 6).as("u"),
          round(log(2.0, col("m_raw") / col("u_raw")), 6).as("w_agree"),
          round(log(2.0,
            (lit(1.0) - col("m_raw")) / (lit(1.0) - col("u_raw"))), 6)
            .as("w_disagree"),
          round(lit(lam), 6).as("lam"))
        .orderBy("field")
    }),

    // EM CONVERGENCE TRACE — the curve behind er_fs_em's point
    // estimate: (λ, m, u) per iteration from the marginal seeds (iter
    // 0) to the cap. A linkage engineer reads this to set the
    // iteration budget (λ plateaus in ~5 steps here; m_band's drift to
    // the clamp is visible as a curve, not a surprise). Same
    // driver-side arithmetic, 31 output rows at any corpus scale.
    "er_fs_em_trace" -> ((s, d) => {
      import s.implicits._
      emTrace(histRows(s, d)).map { case (k, lam, m, u) =>
        (k.toLong, lam, m(0), m(1), m(2), u(0), u(1), u(2))
      }.toDF("iter", "lam_r", "mn", "ms", "mb", "un", "us", "ub")
        .select(col("iter"), round(col("lam_r"), 6).as("lam"),
          round(col("mn"), 6).as("m_name"),
          round(col("ms"), 6).as("m_seg"),
          round(col("mb"), 6).as("m_band"),
          round(col("un"), 6).as("u_name"),
          round(col("us"), 6).as("u_seg"),
          round(col("ub"), 6).as("u_band"))
        .orderBy("iter")
    }),

    // END-TO-END UNSUPERVISED CLASSIFICATION — the er_fs_classify sweep
    // scored with the EM-estimated weights instead of the
    // label-derived ones: the full production loop (no labels anywhere
    // in the scoring path) EVALUATED against the ground truth the
    // fixture happens to carry. Reading this row-for-row against
    // er_fs_classify prices the cost of unsupervision at each
    // operating point — the number a linkage deployment actually signs
    // off on. Same broadcast-scalars-over-pair-stream shape; weights
    // rounded to 6dp before scoring on both engines, as always.
    "er_fs_em_classify" -> ((s, d) => {
      val (_, m, u) = emFit(histRows(s, d))
      import s.implicits._
      def wcols(pre: String, mi: Double, ui: Double) = Seq(
        round(log(2.0, lit(mi) / lit(ui)), 6).as(s"wa_$pre"),
        round(log(2.0, (lit(1.0) - lit(mi)) / (lit(1.0) - lit(ui))), 6)
          .as(s"wd_$pre"))
      val w = s.range(1).select(
        (wcols("name", m(0), u(0)) ++ wcols("seg", m(1), u(1)) ++
          wcols("band", m(2), u(2))): _*)
      val thresholds = s.range(3)
        .select((col("id") * 2).cast("double").as("threshold"))
      // r19: collapse the pair stream to its (is_match, pattern)
      // HISTOGRAM before any scoring (guide §2.3 — every downstream
      // quantity is a function of the four flags, so ≤ 16 weighted rows
      // carry the whole sweep): the map side partial-aggregates the
      // millions of pair rows down to pattern counts, and the threshold
      // crossJoin + 4 conditional sums run over 16 rows instead of
      // 3 × the pair stream. Same integer cells, same output.
      val hist = pairs(s, d)
        .groupBy("is_match", "ag_name", "ag_seg", "ag_band")
        .agg(count(lit(1)).as("n"))
      val scored = hist.crossJoin(broadcast(w))
        .withColumn("w",
          when(col("ag_name") === 1, col("wa_name")).otherwise(col("wd_name")) +
            when(col("ag_seg") === 1, col("wa_seg")).otherwise(col("wd_seg")) +
            when(col("ag_band") === 1, col("wa_band")).otherwise(col("wd_band")))
      scored.crossJoin(broadcast(thresholds))
        .groupBy("threshold")
        .agg(
          sum(col("n")).as("n_pairs"),
          sum(when(col("is_match") === 1 && col("w") > col("threshold"),
            col("n")).otherwise(0L)).as("tp"),
          sum(when(col("is_match") === 0 && col("w") > col("threshold"),
            col("n")).otherwise(0L)).as("fp"),
          sum(when(col("is_match") === 1 && col("w") <= col("threshold"),
            col("n")).otherwise(0L)).as("fn"),
          sum(when(col("is_match") === 0 && col("w") <= col("threshold"),
            col("n")).otherwise(0L)).as("tn"))
        .select(col("threshold"), col("n_pairs"), col("tp"), col("fp"),
          col("fn"), col("tn"),
          round(col("tp").cast("double") / (col("tp") + col("fp")), 4)
            .as("precision"),
          round(col("tp").cast("double") / (col("tp") + col("fn")), 4)
            .as("recall"))
        .orderBy("threshold")
    }),

    // CLERICAL REVIEW QUEUE — the third Fellegi–Sunter verdict:
    // between the auto-link and auto-nonlink thresholds sits the band
    // a human reviews, and THIS table (one row per agreement pattern
    // inside the band, with the pattern's weight, the model's
    // confidence, and — fixture-only — the true match rate) is the
    // work product a linkage operation actually queues. Fully
    // unsupervised scoring path: EM weights AND the EM prevalence
    // drive the posterior; truth appears only as the evaluation
    // column. Aggregated per PATTERN, not per pair: at 100 TB the
    // queue summary is ≤ 2³ rows however large the band is, and the
    // per-pattern weight is exact (every pair with one pattern scores
    // identically — min() not avg(), so no cross-engine summation).
    "er_review_queue" -> ((s, d) => {
      val (lam, m, u) = emFit(histRows(s, d))
      import s.implicits._
      def wcols(pre: String, mi: Double, ui: Double) = Seq(
        round(log(2.0, lit(mi) / lit(ui)), 6).as(s"wa_$pre"),
        round(log(2.0, (lit(1.0) - lit(mi)) / (lit(1.0) - lit(ui))), 6)
          .as(s"wd_$pre"))
      val w = s.range(1).select(
        (wcols("name", m(0), u(0)) ++ wcols("seg", m(1), u(1)) ++
          wcols("band", m(2), u(2)) :+ lit(lam).as("lam")): _*)
      // r19: histogram-first (see er_fs_em_classify) — w/odds/conf are
      // constant per pattern, so fold the pair stream to ≤ 16 rows
      // first; avg(is_match) is reproduced exactly as the integer-count
      // ratio (Average over a long column is sumDouble/countDouble —
      // the same division).
      pairs(s, d)
        .groupBy("is_match", "ag_name", "ag_seg", "ag_band")
        .agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(w))
        .withColumn("w",
          when(col("ag_name") === 1, col("wa_name")).otherwise(col("wd_name")) +
            when(col("ag_seg") === 1, col("wa_seg")).otherwise(col("wd_seg")) +
            when(col("ag_band") === 1, col("wa_band")).otherwise(col("wd_band")))
        .filter(col("w") > 0.0 && col("w") <= 6.0)
        .withColumn("odds",
          col("lam") / (lit(1.0) - col("lam")) * pow(lit(2.0), col("w")))
        .withColumn("conf", col("odds") / (lit(1.0) + col("odds")))
        .groupBy("ag_name", "ag_seg", "ag_band")
        .agg(sum(col("n")).as("n_pairs"),
          round(min("w"), 6).as("w"),
          round(min("conf"), 4).as("conf"),
          round(sum(when(col("is_match") === 1, col("n")).otherwise(0L))
            .cast("double") / sum(col("n")).cast("double"), 4)
            .as("frac_true"))
        .orderBy("ag_name", "ag_seg", "ag_band")
    }),

    // ENTITY FORMATION — linkage must end at entities, not pairs:
    // above-threshold pairs become an edge list, distributed hash-min
    // connected components resolve transitive identity, and each entity
    // emits ONE golden record via a deterministic max_by survivorship
    // rule (longest name wins, lowest id breaks ties — "most complete
    // value", the standard MDM policy) plus a field-level conflict
    // surface (did the merged records disagree on seg / band?). Scale
    // shape: the edge list is tiny relative to the pair stream (only
    // high-confidence pairs survive the λ=6 cut), CC is the repo's O(log
    // diameter) pointer-jumping operator, and survivorship is one
    // max_by aggregate per entity — no per-entity driver work.
    "er_golden_record" -> ((s, d) => {
      val dd = dirty(s, d)
      // λ=6, ABOVE the classify sweep's λ=4 operating point: the merge
      // threshold must clear the stranger ceiling (wd_name + wa_seg +
      // wa_band — a non-match agreeing on both low-cardinality fields)
      // at EVERY scale, and that ceiling is scale-dependent (≈3.8 at
      // sf0.01 but ≈4.5 at sf0.001, where smaller blocks shrink the
      // chance-agreement u's). True pairs score ≥ 11 at both scales, so
      // 6 splits the bands with margin — merging is the one linkage
      // decision that must never ride the boundary, because CC makes a
      // false edge TRANSITIVE. Weights/edges via the shared
      // [[mergeEdges]] scorer the incremental path also uses.
      val cc = graft.operators.ConnectedComponents(
        mergeEdges(s, d, flaggedPairs(dd, dd)))
      // survivorship rank: unique per record (id is unique), so max_by
      // is deterministic; 1e13 > any id (CloneOffset bound note above)
      val rank = length(col("name")).cast("long") *
        lit(10000000000000L) - col("id")
      // LEFT join + coalesce: a record with no above-λ edge is a
      // SINGLETON entity (its own id) — "each entity emits ONE golden
      // record" must hold for unmerged records too, or a pair falling
      // just below λ silently drops BOTH records from the MDM output.
      dd.join(cc, dd("id") === cc("v"), "left")
        .groupBy(coalesce(col("comp"), dd("id")).as("entity_id"))
        .agg(count(lit(1)).as("n_records"),
          max_by(col("name"), rank).as("surv_name"),
          max_by(col("seg"), rank).as("surv_seg"),
          max_by(col("band"), rank).as("surv_band"),
          (countDistinct("seg") > 1).cast("long").as("seg_conflict"),
          (countDistinct("band") > 1).cast("long").as("band_conflict"))
        .orderBy("entity_id")
    }),

    // Classification sweep: every pair's total weight (sum of per-field
    // agree/disagree weights) scored against the truth labels at three
    // thresholds — the Fellegi–Sunter operating band in one output.
    // λ=0 is the textbook log-odds default (recall-heavy: any positive
    // evidence links), λ=4 demands ~16:1 odds (here: only the
    // name-agreeing clones clear it — precision 1.0, recall ~0.5), λ=2
    // sits between; reading precision/recall ACROSS the rows is how a
    // linkage engineer picks the clerical-review band. Weights are
    // ROUNDED to 6dp before scoring on both engines — the classification
    // boundary must not depend on which libm computed log2. All four
    // confusion cells are populated at λ=0: case-folded-name clones
    // clear it on seg+band, triple-perturbed clones fall below (fn),
    // same-band strangers rise above (fp) — the tension is real, not
    // staged.
    "er_fs_classify" -> ((s, d) => {
      val c = counts(s, d) // staged 1-row artifact
      val (_, _, waN, wdN) = mu(col("name_m"), col("name_u"))
      val (_, _, waS, wdS) = mu(col("seg_m"), col("seg_u"))
      val (_, _, waB, wdB) = mu(col("band_m"), col("band_u"))
      val w = c.select(round(waN, 6).as("wa_name"), round(wdN, 6).as("wd_name"),
        round(waS, 6).as("wa_seg"), round(wdS, 6).as("wd_seg"),
        round(waB, 6).as("wa_band"), round(wdB, 6).as("wd_band"))
      val thresholds = s.range(3)
        .select((col("id") * 2).cast("double").as("threshold"))
      // r19: histogram-first (see er_fs_em_classify) — the sweep is a
      // pure function of the (is_match, pattern) counts, so fold the
      // pair stream to ≤ 16 rows before weights and thresholds touch it.
      val hist = pairs(s, d)
        .groupBy("is_match", "ag_name", "ag_seg", "ag_band")
        .agg(count(lit(1)).as("n"))
      val scored = hist.crossJoin(broadcast(w))
        .withColumn("w",
          when(col("ag_name") === 1, col("wa_name")).otherwise(col("wd_name")) +
            when(col("ag_seg") === 1, col("wa_seg")).otherwise(col("wd_seg")) +
            when(col("ag_band") === 1, col("wa_band")).otherwise(col("wd_band")))
      scored.crossJoin(broadcast(thresholds))
        .groupBy("threshold")
        .agg(
          sum(col("n")).as("n_pairs"),
          sum(when(col("is_match") === 1 && col("w") > col("threshold"),
            col("n")).otherwise(0L)).as("tp"),
          sum(when(col("is_match") === 0 && col("w") > col("threshold"),
            col("n")).otherwise(0L)).as("fp"),
          sum(when(col("is_match") === 1 && col("w") <= col("threshold"),
            col("n")).otherwise(0L)).as("fn"),
          sum(when(col("is_match") === 0 && col("w") <= col("threshold"),
            col("n")).otherwise(0L)).as("tn"))
        .select(col("threshold"), col("n_pairs"), col("tp"), col("fp"),
          col("fn"), col("tn"),
          round(col("tp").cast("double") / (col("tp") + col("fp")), 4)
            .as("precision"),
          round(col("tp").cast("double") / (col("tp") + col("fn")), 4)
            .as("recall"))
        .orderBy("threshold")
    }),

    // MULTIPASS BLOCKING AS THE LIVE CANDIDATE GENERATOR — the priced
    // scheme (er_blocking_multipass) finally CONSUMED: over the corpus
    // with block-key noise (dirtyB: every 25th clone's nat typo'd), ONE
    // EM estimation (on the primary nat-blocked stream — see
    // histBStaged for the measured degeneracy that forbids estimating
    // on the union) scores BOTH candidate streams, so the sweep
    // isolates exactly what blocking changes: the candidates. The
    // decisive accounting change: fn counts ALL missed truth
    // (n_truth − tp), not just captured pairs below threshold — a true
    // pair the blocking never surfaced costs recall exactly like a
    // mis-scored one, which is the end-to-end number a linkage
    // deployment actually ships. tn stays captured-only (unsurfaced
    // non-pairs are the reduction ratio working, not errors). On the
    // fixture the nat-only scheme caps below full recall at EVERY
    // threshold (the typo'd pairs are structurally invisible to it);
    // the multipass union recovers those whose (seg, band) survived —
    // recall strictly higher at every λ, priced in n_pairs.
    "er_fs_classify_multipass" -> ((s, d) => {
      import s.implicits._
      def wcols(pre: String, mi: Double, ui: Double) = Seq(
        round(log(2.0, lit(mi) / lit(ui)), 6).as(s"wa_$pre"),
        round(log(2.0, (lit(1.0) - lit(mi)) / (lit(1.0) - lit(ui))), 6)
          .as(s"wd_$pre"))
      val nTruth = dirtyB(s, d)
        .agg(sum(col("link").isNotNull.cast("long")).as("n_truth"))
      val (_, m, u) = emFit(histRowsB(s, d))
      val w = s.range(1).select(
        (wcols("name", m(0), u(0)) ++ wcols("seg", m(1), u(1)) ++
          wcols("band", m(2), u(2))): _*)
      // ONE scan serves BOTH schemes: the nat stream is a subset of the
      // union (the in_nat flag marks it), so every nat cell is a
      // flag-conditioned sum over the SAME scored rows — no second nat
      // join, no second sweep. Two dead ends are on record: running
      // pairsB twice cost 9.7 s (the nat join built twice), and
      // localCheckpoint-sharing the nat stream cost 10.4 s (a 6.6M-row
      // pair stream is a ROW EXPANSION — the PERF.md staging rule
      // again: materializing it loses to recomputing it in codegen).
      // The flagged single scan is the shape that actually wins.
      val dd = dirtyB(s, d)
      // disjoint passes (suppression in segBandCond) → plain union
      val mp = passB(dd, natCond).unionByName(passB(dd, segBandCond))
        .drop("src", "dst")
      // {0, 4, 8}, not the classify keys' {0, 2, 4}: λ=8 sits above
      // the two-field (seg+band) stranger ceiling the redundant pass
      // floods the stream with, and below the true-pair floor (≥11) —
      // the row where multipass precision recovers WITH the recall
      val thresholds = s.range(3)
        .select((col("id") * 4).cast("double").as("threshold"))
      def cell(nat: Boolean, matchIs: Int, above: Boolean) = {
        val base = (col("is_match") === matchIs) &&
          (if (above) col("w") > col("threshold")
           else col("w") <= col("threshold"))
        sum(when(if (nat) base && col("in_nat") === 1 else base, col("n"))
          .otherwise(0L))
      }
      // r19: histogram-first (see er_fs_em_classify) — ≤ 32 weighted
      // pattern rows carry both schemes' cells; the flagged single-scan
      // shape is unchanged, it just folds to counts before the sweep.
      val hist = mp
        .groupBy("in_nat", "is_match", "ag_name", "ag_seg", "ag_band")
        .agg(count(lit(1)).as("n"))
      val cells = hist.crossJoin(broadcast(w))
        .withColumn("w",
          when(col("ag_name") === 1, col("wa_name"))
            .otherwise(col("wd_name")) +
            when(col("ag_seg") === 1, col("wa_seg"))
              .otherwise(col("wd_seg")) +
            when(col("ag_band") === 1, col("wa_band"))
              .otherwise(col("wd_band")))
        .crossJoin(broadcast(thresholds))
        .groupBy("threshold")
        .agg(sum(col("n")).as("np_mp"),
          sum(when(col("in_nat") === 1, col("n")).otherwise(0L))
            .as("np_nat"),
          cell(nat = false, 1, above = true).as("tp_mp"),
          cell(nat = false, 0, above = true).as("fp_mp"),
          cell(nat = false, 0, above = false).as("tn_mp"),
          cell(nat = true, 1, above = true).as("tp_nat"),
          cell(nat = true, 0, above = true).as("fp_nat"),
          cell(nat = true, 0, above = false).as("tn_nat"))
        .localCheckpoint(true) // 3 rows, consumed by two scheme selects
      // r19: nullif-guarded precision denominator — same ANSI
      // DIVIDE_BY_ZERO hazard as er_fs_classify_phonetic (an empty cell
      // at a high threshold on some scale); identical output wherever
      // the cell is non-empty.
      def shape(scheme: String, suf: String) = cells
        .crossJoin(broadcast(nTruth))
        .select(lit(scheme).as("scheme"), col("threshold"),
          col(s"np_$suf").as("n_pairs"),
          col(s"tp_$suf").as("tp"), col(s"fp_$suf").as("fp"),
          (col("n_truth") - col(s"tp_$suf")).as("fn"),
          col(s"tn_$suf").as("tn"),
          round(col(s"tp_$suf").cast("double") /
            nullif((col(s"tp_$suf") + col(s"fp_$suf")).cast("double"),
              lit(0.0)), 4).as("precision"),
          round(col(s"tp_$suf").cast("double") / col("n_truth"), 4)
            .as("recall"))
      shape("multipass", "mp").unionByName(shape("nat", "nat"))
        .orderBy("scheme", "threshold")
    }),

    // TERM-FREQUENCY-ADJUSTED MATCH WEIGHTS — splink's tf_adjustments
    // re-derived as count arithmetic: a name agreement on a RARE value
    // is far stronger evidence than the same agreement on the modal
    // value, because the chance-agreement probability GIVEN the shared
    // value is its frequency, not the field-average u. Per value v:
    // u'(v) = min(1, u · f(v)/f̄), where f̄ is the pair-weighted mean
    // frequency (Σc²/N² — the field's chance-agreement rate), so the
    // field-average adjustment is exactly 1 and the agreement weight
    // log2(m/u') gains log2(f̄/f(v)) — positive for rare values,
    // negative for common ones. Weights are recomputed per
    // log2-frequency BAND (the pair-weighted mean f within the band),
    // never per value: the output is ≤ log2(N) rows at any corpus
    // scale, and every input is a distributive count (Σc, Σc² per
    // band) — no per-value driver state. w_base rides along so the
    // table reads as "what TF awareness changes".
    "er_tf_adjust" -> ((s, d) => {
      val dd = dirtyTf(s, d)
      // base m/u: the er_fs_weights Laplace arithmetic over the staged
      // nat-blocked pair counts (labels exist on this fixture)
      val c = s.read.parquet(tfCountsStaged(s, d))
      val vf = dd.groupBy("sname").agg(count(lit(1)).as("cv"))
      val tot = vf.agg(sum("cv").as("n"),
        sum(col("cv") * col("cv")).as("s2"))
      val m = (col("am") + lit(0.5)) / (col("nm") + lit(1.0))
      val u = (col("au") + lit(0.5)) / (col("np") - col("nm") + lit(1.0))
      val fb = col("sc2").cast("double") /
        (col("n").cast("double") * col("n_rows").cast("double"))
      val fbar = col("s2").cast("double") /
        (col("n").cast("double") * col("n").cast("double"))
      val uAdj = least(lit(1.0), u * fb / fbar)
      // integer floor-log2 (bit length − 1): the FP log2 can round
      // across a band boundary differently per libm at exact powers
      // of two — string/integer arithmetic cannot
      vf.withColumn("fband", (length(bin(col("cv"))) - 1).cast("long"))
        .groupBy("fband")
        .agg(count(lit(1)).as("n_values"), sum("cv").as("n_rows"),
          sum(col("cv") * col("cv")).as("sc2"))
        .crossJoin(broadcast(c)).crossJoin(broadcast(tot))
        .select(col("fband"), col("n_values"), col("n_rows"),
          round(fb, 6).as("f_band"),
          round(uAdj, 6).as("u_adj"),
          round(log(2.0, m / uAdj), 6).as("w_tf"),
          round(log(2.0, m / u), 6).as("w_base"))
        .orderBy("fband")
    }),

    // PHONETIC THIRD BLOCKING PASS — the classic production pass the
    // multipass key stops short of: a derived phonetic key
    // (soundex(name)) catches the misspelled-name clones every literal
    // key misses. Over the surname fixture (dirtyP), the sweep scores
    // THREE schemes off ONE scanned disjoint-pass union (nat;
    // (seg,band) suppressing nat; soundex suppressing both — each a
    // keyed equi-join, flags riding so every scheme's cells are
    // flag-conditioned sums): nat-only, the 2-pass scheme, and the
    // 3-pass scheme. End-to-end fn accounting (n_truth − tp) like the
    // multipass key, so blocking misses cost recall. On the fixture the
    // soundex pass recovers the nat-typo'd clones whose (seg, band)
    // also perturbed — pairs structurally invisible to both earlier
    // passes — and recall strictly improves at the operating threshold
    // with precision intact (PhoneticBlockSpec pins both, plus that the
    // planted vowel-typo clones co-block under soundex but not under
    // (seg, band) or exact-name equality). Spec-gated: DuckDB has no
    // soundex, so no SQL twin exists by design.
    "er_fs_classify_phonetic" -> ((s, d) => {
      import s.implicits._
      def wcols(pre: String, mi: Double, ui: Double) = Seq(
        round(log(2.0, lit(mi) / lit(ui)), 6).as(s"wa_$pre"),
        round(log(2.0, (lit(1.0) - lit(mi)) / (lit(1.0) - lit(ui))), 6)
          .as(s"wd_$pre"))
      val nTruth = dirtyP(s, d)
        .agg(sum(col("link").isNotNull.cast("long")).as("n_truth"))
      // estimation on the primary stream only (histBStaged's split)
      val (_, m, u) = emFit(histRowsP(s, d))
      val w = s.range(1).select(
        (wcols("name", m(0), u(0)) ++ wcols("seg", m(1), u(1)) ++
          wcols("band", m(2), u(2))): _*)
      val (p1, p2, p3) = passesP(s, d)
      val mp = p1.unionByName(p2).unionByName(p3)
      val thresholds = s.range(3)
        .select((col("id") * 4).cast("double").as("threshold"))
      // scheme membership from the riding flags: nat = in_nat; the
      // 2-pass scheme = in_nat ∪ in_p2 (suppression makes these exactly
      // the pass-1∪2 pair set); the 3-pass scheme = every row
      def member(scheme: String) = scheme match {
        case "nat" => col("in_nat") === 1
        case "mp2" => col("in_nat") === 1 || col("in_p2") === 1
        case _ => lit(true)
      }
      def cell(scheme: String, matchIs: Int, above: Boolean) = {
        val base = (col("is_match") === matchIs) &&
          (if (above) col("w") > col("threshold")
           else col("w") <= col("threshold"))
        sum(when(base && member(scheme), col("n")).otherwise(0L))
      }
      // r19: histogram-first (see er_fs_em_classify) — the three-pass
      // union folds to ≤ 64 (membership × is_match × pattern) rows
      // before the weight/threshold sweep; the three blocked joins
      // stay the measured work.
      val hist = mp
        .groupBy("in_nat", "in_p2", "is_match",
          "ag_name", "ag_seg", "ag_band")
        .agg(count(lit(1)).as("n"))
      val cells = hist.crossJoin(broadcast(w))
        .withColumn("w",
          when(col("ag_name") === 1, col("wa_name"))
            .otherwise(col("wd_name")) +
            when(col("ag_seg") === 1, col("wa_seg"))
              .otherwise(col("wd_seg")) +
            when(col("ag_band") === 1, col("wa_band"))
              .otherwise(col("wd_band")))
        .crossJoin(broadcast(thresholds))
        .groupBy("threshold")
        .agg(sum(when(member("nat"), col("n")).otherwise(0L)).as("np_nat"),
          sum(when(member("mp2"), col("n")).otherwise(0L)).as("np_mp2"),
          sum(col("n")).as("np_mp3"),
          cell("nat", 1, above = true).as("tp_nat"),
          cell("nat", 0, above = true).as("fp_nat"),
          cell("nat", 0, above = false).as("tn_nat"),
          cell("mp2", 1, above = true).as("tp_mp2"),
          cell("mp2", 0, above = true).as("fp_mp2"),
          cell("mp2", 0, above = false).as("tn_mp2"),
          cell("mp3", 1, above = true).as("tp_mp3"),
          cell("mp3", 0, above = true).as("fp_mp3"),
          cell("mp3", 0, above = false).as("tn_mp3"))
        .localCheckpoint(true) // 3 rows, consumed by three scheme selects
      // r19 latent-bug fix: precision's denominator CAN be zero — at
      // sf0.1 the nat scheme's EM weights cap below the λ=8 threshold,
      // so tp+fp = 0 there and Spark 4's ANSI divide threw
      // DIVIDE_BY_ZERO; the bench's per-query catch had been swallowing
      // that since the key landed (sf0.1 is benched, only sf0.01 is
      // oracle-gated). nullif makes an empty cell's precision NULL and
      // leaves every previously-computable row bit-identical.
      def shape(scheme: String, suf: String) = cells
        .crossJoin(broadcast(nTruth))
        .select(lit(scheme).as("scheme"), col("threshold"),
          col(s"np_$suf").as("n_pairs"),
          col(s"tp_$suf").as("tp"), col(s"fp_$suf").as("fp"),
          (col("n_truth") - col(s"tp_$suf")).as("fn"),
          col(s"tn_$suf").as("tn"),
          round(col(s"tp_$suf").cast("double") /
            nullif((col(s"tp_$suf") + col(s"fp_$suf")).cast("double"),
              lit(0.0)), 4).as("precision"),
          round(col(s"tp_$suf").cast("double") / col("n_truth"), 4)
            .as("recall"))
      shape("nat", "nat").unionByName(shape("multipass2", "mp2"))
        .unionByName(shape("multipass3", "mp3"))
        .orderBy("scheme", "threshold")
    }),

    // TF-ADJUSTED CLASSIFICATION — er_tf_adjust's weight table applied
    // to the pair stream, priced scheme-against-scheme the way
    // er_fs_em_classify prices unsupervision. The fixture's surname
    // field is nearly WORTHLESS on field-average evidence (u ≈ the
    // chance-agreement rate f̄, so w_base ≈ 1 bit — one weight for
    // every agreement, however informative the shared value), but
    // carries real evidence exactly where TF says it does. The
    // operating threshold is DERIVED, not fixed: t = w_base − 0.01
    // (just under the field-average weight — absolute weights move
    // with the corpus mix across scales, the base-vs-modal gap
    // log2(f_modal/f̄) does not). There the base scheme still
    // classifies every agreement, while the TF scheme sheds exactly
    // the modal-value agreements (w_tf(modal) = w_base −
    // log2(f_modal/f̄) < t) and keeps mid/rare ones (4.5+ bits) —
    // precision jumps, recall restricted to pairs whose shared value
    // is informative. The t = 0 row anchors the two schemes equal.
    // One scanned stream serves both schemes' cells (the multipass
    // rule); the per-sname weight join is a keyed equi-join against
    // the corpus-distinct value table — never collected.
    "er_tf_classify" -> ((s, d) => {
      val dd = dirtyTf(s, d)
      val prs = dd.as("a").join(dd.as("b"),
          col("a.nat") === col("b.nat") && col("a.id") < col("b.id"))
        .select(
          (col("b.link") <=> col("a.id")).cast("long").as("is_match"),
          (col("a.sname") === col("b.sname")).cast("long").as("ag"),
          col("a.sname").as("sname"))
      val c = s.read.parquet(tfCountsStaged(s, d))
      val vf = dd.groupBy("sname").agg(count(lit(1)).as("cv"))
        .withColumn("fband", (length(bin(col("cv"))) - 1).cast("long"))
      val tot = vf.agg(sum("cv").as("n"),
        sum(col("cv") * col("cv")).as("s2"))
      val m = (col("am") + lit(0.5)) / (col("nm") + lit(1.0))
      val u = (col("au") + lit(0.5)) / (col("np") - col("nm") + lit(1.0))
      val fb = col("sc2").cast("double") /
        (col("n").cast("double") * col("n_rows").cast("double"))
      val fbar = col("s2").cast("double") /
        (col("n").cast("double") * col("n").cast("double"))
      val bw = vf.groupBy("fband")
        .agg(sum("cv").as("n_rows"), sum(col("cv") * col("cv")).as("sc2"))
        .crossJoin(broadcast(c)).crossJoin(broadcast(tot))
        .select(col("fband"),
          round(log(2.0, m / least(lit(1.0), u * fb / fbar)), 6)
            .as("w_tf"))
      val vw = vf.join(broadcast(bw), "fband").select("sname", "w_tf")
      val wbase = c.crossJoin(tot).select(
        round(log(2.0, m / u), 6).as("w_base"),
        round(log(2.0, (lit(1.0) - m) / (lit(1.0) - u)), 6).as("wd"))
      val thresholds = wbase.select(lit(0.0).as("threshold"))
        .unionByName(wbase.select((col("w_base") - 0.01).as("threshold")))
      // r19: fold the pair stream to (is_match, ag, sname) COUNTS before
      // any weight attaches (guide §2.3 / the histogram-first rewrite of
      // the classify family) — the hash aggregate partial-aggregates
      // map-side, so the modal surname's millions of pair rows collapse
      // locally and the old skew hazard (a shuffled equi-join on sname
      // put 60% of the stream on one reducer — measured 11 s vs 3.6 s)
      // disappears structurally: the sname join now runs over the
      // distinct-value histogram (≤ 2·2·|values| rows), and the weight
      // table still broadcasts. Cells become n-weighted sums — same
      // integer counts, same output.
      val scored = prs
        .groupBy("is_match", "ag", "sname")
        .agg(count(lit(1)).as("n"))
        .join(broadcast(vw), Seq("sname"))
        .crossJoin(broadcast(wbase))
        .select(col("is_match"), col("n"),
          when(col("ag") === 1, col("w_tf")).otherwise(col("wd"))
            .as("w_t"),
          when(col("ag") === 1, col("w_base")).otherwise(col("wd"))
            .as("w_b"))
      def cell(wc: String, matchIs: Int, above: Boolean) = {
        val base = (col("is_match") === matchIs) &&
          (if (above) col(wc) > col("threshold")
           else col(wc) <= col("threshold"))
        sum(when(base, col("n")).otherwise(0L))
      }
      val cells = scored.crossJoin(broadcast(thresholds))
        .groupBy("threshold")
        .agg(sum(col("n")).as("n_pairs"),
          cell("w_t", 1, above = true).as("tp_tf"),
          cell("w_t", 0, above = true).as("fp_tf"),
          cell("w_t", 1, above = false).as("fn_tf"),
          cell("w_t", 0, above = false).as("tn_tf"),
          cell("w_b", 1, above = true).as("tp_base"),
          cell("w_b", 0, above = true).as("fp_base"),
          cell("w_b", 1, above = false).as("fn_base"),
          cell("w_b", 0, above = false).as("tn_base"))
        .localCheckpoint(true) // 2 rows, consumed by two scheme selects
      def shape(scheme: String) = cells
        .select(lit(scheme).as("scheme"), col("threshold"),
          col("n_pairs"),
          col(s"tp_$scheme").as("tp"), col(s"fp_$scheme").as("fp"),
          col(s"fn_$scheme").as("fn"), col(s"tn_$scheme").as("tn"),
          round(col(s"tp_$scheme").cast("double") /
            (col(s"tp_$scheme") + col(s"fp_$scheme")), 4)
            .as("precision"),
          round(col(s"tp_$scheme").cast("double") /
            (col(s"tp_$scheme") + col(s"fn_$scheme")), 4).as("recall"))
      shape("base").unionByName(shape("tf"))
        .orderBy("scheme", "threshold")
    }),

    // GRADED COMPARATORS — Winkler's 3-level name agreement through the
    // unsupervised stack: the categorical EM's converged parameters as
    // a weight table, one row per (field, level). The single biggest
    // accuracy lever in the family: the binary comparator scores a
    // one-character typo exactly like a total mismatch, so half the
    // true clones (the case-folded ones) carry the full disagreement
    // penalty; the close level gives them their own m/u. The output a
    // linkage engineer reads: w(exact) > w(close) > w(disagree), with
    // the close level's weight sitting between — positive evidence,
    // weaker than exact.
    "er_fs_em_graded" -> ((s, d) => {
      val (lam, mN, uN, mS, uS, mB, uB) = emFitGraded(histRowsGraded(s, d))
      import s.implicits._
      Seq(
        ("band", "agree", mB, uB),
        ("band", "disagree", 1 - mB, 1 - uB),
        ("name", "close", mN(1), uN(1)),
        ("name", "disagree", mN(0), uN(0)),
        ("name", "exact", mN(2), uN(2)),
        ("seg", "agree", mS, uS),
        ("seg", "disagree", 1 - mS, 1 - uS))
        .toDF("field", "level", "m_raw", "u_raw")
        .select(col("field"), col("level"),
          round(col("m_raw"), 6).as("m"), round(col("u_raw"), 6).as("u"),
          round(log(2.0, col("m_raw") / col("u_raw")), 6).as("w"),
          round(lit(lam), 6).as("lam"))
        .orderBy("field", "level")
    }),

    // The graded sweep — er_fs_em_classify rerun with the 3-level name
    // weights. Reading it row-for-row against the binary sweep prices
    // the comparator upgrade: the case-folded clones move from the full
    // disagreement penalty to the close level's positive weight and
    // cross the loose thresholds, so recall rises at the SAME operating
    // point with no blocking change and no new candidates. Same
    // broadcast-scalars-over-pair-stream shape; the levenshtein is
    // in-codegen over blocked candidates only.
    "er_fs_classify_graded" -> ((s, d) => {
      val (_, mN, uN, mS, uS, mB, uB) = emFitGraded(histRowsGraded(s, d))
      import s.implicits._
      def wlit(m: Double, u: Double) = round(log(2.0, lit(m) / lit(u)), 6)
      val w = s.range(1).select(
        wlit(mN(2), uN(2)).as("wn_exact"),
        wlit(mN(1), uN(1)).as("wn_close"),
        wlit(mN(0), uN(0)).as("wn_disagree"),
        wlit(mS, uS).as("wa_seg"),
        wlit(1 - mS, 1 - uS).as("wd_seg"),
        wlit(mB, uB).as("wa_band"),
        wlit(1 - mB, 1 - uB).as("wd_band"))
      val thresholds = s.range(3)
        .select((col("id") * 2).cast("double").as("threshold"))
      // the sweep runs over the STAGED ≤24-row labeled histogram, not
      // the pair stream: w is a pure function of the pattern, so every
      // confusion cell is a count-weighted pattern sum — identical
      // output, and the per-pair levenshtein stays a one-off staging
      // cost instead of a per-run 7.5 s scan (see histGradedStaged)
      val scored = s.read.parquet(histGradedStaged(s, d))
        .crossJoin(broadcast(w))
        .withColumn("w",
          when(col("ag_name") === 2, col("wn_exact"))
            .when(col("ag_name") === 1, col("wn_close"))
            .otherwise(col("wn_disagree")) +
            when(col("ag_seg") === 1, col("wa_seg"))
              .otherwise(col("wd_seg")) +
            when(col("ag_band") === 1, col("wa_band"))
              .otherwise(col("wd_band")))
      scored.crossJoin(broadcast(thresholds))
        .groupBy("threshold")
        .agg(
          sum(col("n")).as("n_pairs"),
          sum(when(col("is_match") === 1 && col("w") > col("threshold"),
            col("n")).otherwise(0L)).as("tp"),
          sum(when(col("is_match") === 0 && col("w") > col("threshold"),
            col("n")).otherwise(0L)).as("fp"),
          sum(when(col("is_match") === 1 && col("w") <= col("threshold"),
            col("n")).otherwise(0L)).as("fn"),
          sum(when(col("is_match") === 0 && col("w") <= col("threshold"),
            col("n")).otherwise(0L)).as("tn"))
        .select(col("threshold"), col("n_pairs"), col("tp"), col("fp"),
          col("fn"), col("tn"),
          round(col("tp").cast("double") / (col("tp") + col("fp")), 4)
            .as("precision"),
          round(col("tp").cast("double") / (col("tp") + col("fn")), 4)
            .as("recall"))
        .orderBy("threshold")
    }),

    // INCREMENTAL LINKAGE — the daily run a 100 TB deployment actually
    // executes: yesterday's entity assignment is a staged artifact
    // ([[baseAssignStaged]]), today's arriving batch scores ONLY
    // batch×all candidate pairs (the dedup_incremental_index new×all
    // pattern — base×base is never re-paired), and the new edges fold
    // into the existing assignment by CONTRACTION: each old endpoint is
    // replaced by its entity rep, connected components run over that
    // super-node graph (tiny — O(batch edges)), and the result
    // overrides the old assignment only where a batch record bridged
    // it. Entity ids are component-min ids, so the incremental output
    // is BIT-IDENTICAL to a full relink — which is exactly what the
    // oracle checks: DuckDB recomputes the whole corpus's transitive
    // closure from scratch at λ=6 and the hashes must match. Scale
    // shape: candidates are |batch|×(per-block fan-out), the CC runs
    // over batch edges only, and the assignment update is one keyed
    // join against yesterday's table.
    "er_incremental" -> ((s, d) => {
      val dd = dirty(s, d).withColumn("is_batch", isBatchRec)
      val batch = dd.filter(col("is_batch"))
      val nonBatch = dd.filter(!col("is_batch"))
      // every pair with ≥1 batch endpoint, exactly once: A = pairs
      // whose HIGHER id is a batch record (lower side ranges over all),
      // B = batch-lower vs non-batch-higher; disjoint by construction
      val pid = flaggedPairs(dd, batch)
        .unionByName(flaggedPairs(batch, nonBatch))
      val newEdges = mergeEdges(s, d, pid)
      val asg = s.read.parquet(baseAssignStaged(s, d)) // id → entity
      def contract(side: String) = asg
        .select(col("id").as(side), col("entity").as(s"e_$side"))
      val contracted = newEdges
        .join(contract("src"), Seq("src"), "left")
        .join(contract("dst"), Seq("dst"), "left")
        .select(coalesce(col("e_src"), col("src")).as("src"),
          coalesce(col("e_dst"), col("dst")).as("dst"))
      val cc = graft.operators.ConnectedComponents(contracted)
      // old records: entity re-mapped only if its rep was bridged;
      // batch records: mapped if linked, else singletons
      val updatedOld = asg.join(cc, asg("entity") === cc("v"), "left")
        .select(col("id"),
          coalesce(col("comp"), col("entity")).as("entity"))
      val updatedBatch = batch.select(col("id"))
        .join(cc, batch("id") === cc("v"), "left")
        .select(col("id"), coalesce(col("comp"), col("id")).as("entity"))
      updatedOld.unionByName(updatedBatch)
        .join(dd.select(col("id"), col("is_batch")), Seq("id"))
        .groupBy(col("entity").as("entity_id"))
        .agg(count(lit(1)).as("n_records"),
          sum(col("is_batch").cast("long")).as("n_from_batch"))
        .orderBy("entity_id")
    })
  )

  /** Shared oracle CTE prefix: the deterministic dirty corpus, the
    * blocked pair stream with agreement flags, and the one-row count
    * aggregate — identical text across the three oracles so the fixture
    * cannot drift between them.
    */
  /** Shared derivation for the TF family oracles: the skewed-surname
    * corpus, the nat-blocked pair stream (with the left value for the
    * per-value weight join), the labeled counts, the value table with
    * integer-bit-length frequency bands, and the (m, u, f̄) parameters.
    */
  private def tfCte: String =
    s"""WITH base AS (
      |  SELECT c_custkey AS id,
      |         CASE WHEN c_custkey % 100 < 60 THEN 'MODAL'
      |              WHEN c_custkey % 100 < 90
      |                THEN 'MID_' || CAST(c_custkey % 8 AS VARCHAR)
      |              ELSE 'RARE_' || CAST(c_custkey AS VARCHAR)
      |         END AS sname,
      |         c_nationkey AS nat, NULL::BIGINT AS link
      |  FROM customer
      |), clones AS (
      |  SELECT base.id + $CloneOffset AS id, sname, nat,
      |         base.id AS link
      |  FROM base WHERE base.id % 5 = 0
      |), dirty AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM clones
      |), prs AS (
      |  SELECT CASE WHEN b.link = a.id THEN 1 ELSE 0 END AS is_match,
      |         CASE WHEN a.sname = b.sname THEN 1 ELSE 0 END AS ag,
      |         a.sname AS sname
      |  FROM dirty a JOIN dirty b ON a.nat = b.nat AND a.id < b.id
      |), c AS (
      |  SELECT CAST(count(*) AS BIGINT) AS np,
      |         CAST(sum(is_match) AS BIGINT) AS nm,
      |         CAST(sum(CASE WHEN is_match = 1 THEN ag END) AS BIGINT)
      |           AS am,
      |         CAST(sum(CASE WHEN is_match = 0 THEN ag END) AS BIGINT)
      |           AS au
      |  FROM prs
      |), vf AS (
      |  -- integer floor-log2 (bit length - 1): FP-log2-free banding
      |  SELECT sname, CAST(count(*) AS BIGINT) AS cv,
      |         CAST(length(bin(CAST(count(*) AS BIGINT))) - 1 AS BIGINT)
      |           AS fband
      |  FROM dirty GROUP BY sname
      |), tot AS (
      |  SELECT CAST(sum(cv) AS BIGINT) AS n,
      |         CAST(sum(cv * cv) AS BIGINT) AS s2
      |  FROM vf
      |), bands AS (
      |  SELECT fband,
      |         count(*) AS n_values,
      |         CAST(sum(cv) AS BIGINT) AS n_rows,
      |         CAST(sum(cv * cv) AS BIGINT) AS sc2
      |  FROM vf GROUP BY 1
      |), parms AS (
      |  SELECT (am + 0.5) / (nm + 1.0) AS m,
      |         (au + 0.5) / (np - nm + 1.0) AS u,
      |         CAST(s2 AS DOUBLE) /
      |           (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS fbar
      |  FROM c, tot
      |)""".stripMargin

  private def fsPairsCte: String =
    s"""WITH base AS (
      |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
      |         c_mktsegment AS seg,
      |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
      |         NULL::BIGINT AS link
      |  FROM customer
      |), clones AS (
      |  -- base.id qualified everywhere: DuckDB resolves a bare `id`
      |  -- here to the same-SELECT alias (id + offset), not the column
      |  SELECT base.id + $CloneOffset AS id,
      |         CASE WHEN base.id % 10 = 0 THEN lower(base.name)
      |              ELSE base.name END AS name,
      |         nat,
      |         CASE WHEN base.id % 15 = 0 THEN 'PERTURBED'
      |              ELSE base.seg END AS seg,
      |         CASE WHEN base.id % 20 = 0 THEN base.band + 1
      |              ELSE base.band END AS band,
      |         base.id AS link
      |  FROM base WHERE base.id % 5 = 0
      |), dirty AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM clones
      |), pairs AS (
      |  SELECT CASE WHEN b.link = a.id THEN 1 ELSE 0 END AS is_match,
      |         CASE WHEN a.name = b.name THEN 1 ELSE 0 END AS ag_name,
      |         CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS ag_seg,
      |         CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS ag_band
      |  FROM dirty a JOIN dirty b ON a.nat = b.nat AND a.id < b.id
      |), c AS (
      |  SELECT count(*) AS np, sum(is_match) AS nm,
      |         sum(CASE WHEN is_match = 1 THEN ag_name END) AS name_m,
      |         sum(CASE WHEN is_match = 0 THEN ag_name END) AS name_u,
      |         sum(CASE WHEN is_match = 1 THEN ag_seg END) AS seg_m,
      |         sum(CASE WHEN is_match = 0 THEN ag_seg END) AS seg_u,
      |         sum(CASE WHEN is_match = 1 THEN ag_band END) AS band_m,
      |         sum(CASE WHEN is_match = 0 THEN ag_band END) AS band_u
      |  FROM pairs
      |)""".stripMargin

  /** The rounded per-field weights (+ prior odds) as a 1-row CTE — the
    * same 6dp quantization the Spark side scores with.
    */
  private def fsWeightsCte: String =
    """, w AS (
      |  SELECT
      |    round(log2(((name_m + 0.5) / (nm + 1.0)) /
      |               ((name_u + 0.5) / (np - nm + 1.0))), 6) AS wa_name,
      |    round(log2((1 - (name_m + 0.5) / (nm + 1.0)) /
      |               (1 - (name_u + 0.5) / (np - nm + 1.0))), 6) AS wd_name,
      |    round(log2(((seg_m + 0.5) / (nm + 1.0)) /
      |               ((seg_u + 0.5) / (np - nm + 1.0))), 6) AS wa_seg,
      |    round(log2((1 - (seg_m + 0.5) / (nm + 1.0)) /
      |               (1 - (seg_u + 0.5) / (np - nm + 1.0))), 6) AS wd_seg,
      |    round(log2(((band_m + 0.5) / (nm + 1.0)) /
      |               ((band_u + 0.5) / (np - nm + 1.0))), 6) AS wa_band,
      |    round(log2((1 - (band_m + 0.5) / (nm + 1.0)) /
      |               (1 - (band_u + 0.5) / (np - nm + 1.0))), 6) AS wd_band,
      |    CAST(nm AS DOUBLE) / (np - nm) AS prior_odds
      |  FROM c
      |), scored AS (
      |  SELECT is_match,
      |         (CASE WHEN ag_name = 1 THEN wa_name ELSE wd_name END +
      |          CASE WHEN ag_seg  = 1 THEN wa_seg  ELSE wd_seg  END +
      |          CASE WHEN ag_band = 1 THEN wa_band ELSE wd_band END) AS w,
      |         prior_odds
      |  FROM pairs, w
      |)""".stripMargin

  /** The EM twin: the same histogram → seeds → EmIters E/M steps,
    * UNROLLED as one CTE pair per iteration (standard SQL cannot loop
    * with aggregation over the recursive member; at 2 CTEs × 8 rows per
    * step the unrolled plan is trivial). Arithmetic mirrors [[emFit]]
    * term-for-term — γ·m + (1−γ)·(1−m) products in the same
    * left-to-right order — so the engines agree to rounding precision.
    */
  private def emOracle: String = emParamsCte +
    s"""
       |SELECT f.field, round(f.m, 6) AS m, round(f.u, 6) AS u,
       |       round(log2(f.m / f.u), 6) AS w_agree,
       |       round(log2((1 - f.m) / (1 - f.u)), 6) AS w_disagree,
       |       round(p.lam, 6) AS lam
       |FROM p$EmIters p, LATERAL (VALUES ('band', p.mb, p.ub),
       |                                  ('name', p.mn, p.un),
       |                                  ('seg',  p.ms, p.us))
       |     f(field, m, u)
       |ORDER BY f.field""".stripMargin

  /** The shared EM derivation (pairs → histogram → seeds → EmIters
    * unrolled E/M steps, ending at `p$EmIters`) — every EM-family
    * oracle builds on this identical text.
    */
  private def emParamsCte: String = fsPairsCte + emChain("")

  /** One suffixed EM chain (histogram → seeds → EmIters unrolled steps)
    * reading `pairs$suffix` and ending at `p$EmIters$suffix` — extracted
    * so the multipass oracle can run TWO estimations (one per candidate
    * scheme) in a single query without CTE-name collisions. suffix = ""
    * reproduces the original chain text exactly.
    */
  private def emChain(suffix: String): String = {
    // every step CTE is MATERIALIZED: DuckDB inlines single-reference
    // CTEs, and inlining a 30-step chain (each step's 7 columns built
    // from several columns of the previous step) flattens the shared
    // DAG into an EXPONENTIAL expression tree — planning alone ran
    // minutes before this was forced
    val hist =
      s""", hist$suffix AS MATERIALIZED (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(ag_name AS DOUBLE) AS gn,
        |         CAST(ag_seg AS DOUBLE) AS gs,
        |         CAST(ag_band AS DOUBLE) AS gb
        |  FROM pairs$suffix GROUP BY ag_name, ag_seg, ag_band
        |), p0$suffix AS MATERIALIZED (
        |  SELECT 0.01 AS lam,
        |         (1 + sum(n * gn) / sum(n)) / 2 AS mn,
        |         (1 + sum(n * gs) / sum(n)) / 2 AS ms,
        |         (1 + sum(n * gb) / sum(n)) / 2 AS mb,
        |         sum(n * gn) / sum(n) AS un,
        |         sum(n * gs) / sum(n) AS us,
        |         sum(n * gb) / sum(n) AS ub
        |  FROM hist$suffix
        |)""".stripMargin
    val iters = (1 to EmIters).map { k =>
      s""", e$k$suffix AS MATERIALIZED (
         |  SELECT h.n, h.gn, h.gs, h.gb,
         |         p.lam * (h.gn * p.mn + (1 - h.gn) * (1 - p.mn))
         |               * (h.gs * p.ms + (1 - h.gs) * (1 - p.ms))
         |               * (h.gb * p.mb + (1 - h.gb) * (1 - p.mb)) AS pm,
         |         (1 - p.lam) * (h.gn * p.un + (1 - h.gn) * (1 - p.un))
         |                     * (h.gs * p.us + (1 - h.gs) * (1 - p.us))
         |                     * (h.gb * p.ub + (1 - h.gb) * (1 - p.ub)) AS pu
         |  FROM hist$suffix h, p${k - 1}$suffix p
         |), p$k$suffix AS MATERIALIZED (
         |  SELECT greatest(least(sum(n * w) / sum(n),
         |                        0.999999), 0.000001) AS lam,
         |         greatest(least(sum(n * w * gn) / sum(n * w),
         |                        0.999999), 0.000001) AS mn,
         |         greatest(least(sum(n * w * gs) / sum(n * w),
         |                        0.999999), 0.000001) AS ms,
         |         greatest(least(sum(n * w * gb) / sum(n * w),
         |                        0.999999), 0.000001) AS mb,
         |         greatest(least(sum(n * (1 - w) * gn) / sum(n * (1 - w)),
         |                        0.999999), 0.000001) AS un,
         |         greatest(least(sum(n * (1 - w) * gs) / sum(n * (1 - w)),
         |                        0.999999), 0.000001) AS us,
         |         greatest(least(sum(n * (1 - w) * gb) / sum(n * (1 - w)),
         |                        0.999999), 0.000001) AS ub
         |  FROM (SELECT n, gn, gs, gb, pm / (pm + pu) AS w FROM e$k$suffix)
         |)""".stripMargin
    }.mkString
    hist + iters
  }

  /** The noisy-block-key corpus ([[dirtyB]]) plus BOTH candidate
    * streams: `pairs_nat` (single-key blocking, loses the nat-typo'd
    * true pairs) and `pairs_mp` (nat ∪ (seg, band) multipass — the
    * OR-join spelling is the set DuckDB evaluates directly; the Spark
    * side reaches the identical set via union-distinct of equi-joins).
    * `tot` carries the FULL truth count, the denominator that makes
    * blocking loss show up in recall.
    */
  private def fsPairsBCte: String =
    s"""WITH base AS (
      |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
      |         c_mktsegment AS seg,
      |         CAST(floor(c_acctbal / 1000) AS BIGINT) AS band,
      |         NULL::BIGINT AS link
      |  FROM customer
      |), clones AS (
      |  SELECT base.id + $CloneOffset AS id,
      |         CASE WHEN base.id % 10 = 0 THEN lower(base.name)
      |              ELSE base.name END AS name,
      |         CASE WHEN base.id % 25 = 0 THEN (nat + 1) % 25
      |              ELSE nat END AS nat,
      |         CASE WHEN base.id % 15 = 0 THEN 'PERTURBED'
      |              ELSE base.seg END AS seg,
      |         CASE WHEN base.id % 20 = 0 THEN base.band + 1
      |              ELSE base.band END AS band,
      |         base.id AS link
      |  FROM base WHERE base.id % 5 = 0
      |), dirtyb AS (
      |  SELECT * FROM base UNION ALL SELECT * FROM clones
      |), pairs_nat AS MATERIALIZED (
      |  SELECT CASE WHEN b.link = a.id THEN 1 ELSE 0 END AS is_match,
      |         CASE WHEN a.name = b.name THEN 1 ELSE 0 END AS ag_name,
      |         CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS ag_seg,
      |         CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS ag_band
      |  FROM dirtyb a JOIN dirtyb b ON a.nat = b.nat AND a.id < b.id
      |), pairs_mp AS MATERIALIZED (
      |  SELECT CASE WHEN b.link = a.id THEN 1 ELSE 0 END AS is_match,
      |         CASE WHEN a.name = b.name THEN 1 ELSE 0 END AS ag_name,
      |         CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS ag_seg,
      |         CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS ag_band
      |  FROM dirtyb a JOIN dirtyb b
      |    ON (a.nat = b.nat OR (a.seg = b.seg AND a.band = b.band))
      |       AND a.id < b.id
      |), tot AS (
      |  SELECT CAST(sum(CASE WHEN link IS NOT NULL THEN 1 ELSE 0 END)
      |              AS BIGINT) AS n_truth
      |  FROM dirtyb
      |)""".stripMargin

  /** The shared weight table (EM converged on the PRIMARY stream) and
    * both schemes' scored streams — the scoring legs of the multipass
    * oracle. One estimation, two predictions: the splink
    * estimation-vs-prediction blocking split.
    */
  private def emScoredBCte: String =
    s""", w_b AS (
       |  SELECT round(log2(mn / un), 6) AS wa_name,
       |         round(log2((1 - mn) / (1 - un)), 6) AS wd_name,
       |         round(log2(ms / us), 6) AS wa_seg,
       |         round(log2((1 - ms) / (1 - us)), 6) AS wd_seg,
       |         round(log2(mb / ub), 6) AS wa_band,
       |         round(log2((1 - mb) / (1 - ub)), 6) AS wd_band
       |  FROM p${EmIters}_nat
       |), scored_nat AS MATERIALIZED (
       |  SELECT is_match,
       |         (CASE WHEN ag_name = 1 THEN wa_name ELSE wd_name END +
       |          CASE WHEN ag_seg  = 1 THEN wa_seg  ELSE wd_seg  END +
       |          CASE WHEN ag_band = 1 THEN wa_band ELSE wd_band END) AS w
       |  FROM pairs_nat, w_b
       |), scored_mp AS MATERIALIZED (
       |  SELECT is_match,
       |         (CASE WHEN ag_name = 1 THEN wa_name ELSE wd_name END +
       |          CASE WHEN ag_seg  = 1 THEN wa_seg  ELSE wd_seg  END +
       |          CASE WHEN ag_band = 1 THEN wa_band ELSE wd_band END) AS w
       |  FROM pairs_mp, w_b
       |)""".stripMargin

  /** The EM weight table (rounded log2 weights off the converged
    * parameters) as a 1-row CTE over `p$EmIters` — the EM twin of
    * [[fsWeightsCte]].
    */
  private def emWeightsCte: String =
    s""", w AS (
       |  SELECT round(log2(mn / un), 6) AS wa_name,
       |         round(log2((1 - mn) / (1 - un)), 6) AS wd_name,
       |         round(log2(ms / us), 6) AS wa_seg,
       |         round(log2((1 - ms) / (1 - us)), 6) AS wd_seg,
       |         round(log2(mb / ub), 6) AS wa_band,
       |         round(log2((1 - mb) / (1 - ub)), 6) AS wd_band
       |  FROM p$EmIters
       |), scored AS (
       |  SELECT is_match,
       |         (CASE WHEN ag_name = 1 THEN wa_name ELSE wd_name END +
       |          CASE WHEN ag_seg  = 1 THEN wa_seg  ELSE wd_seg  END +
       |          CASE WHEN ag_band = 1 THEN wa_band ELSE wd_band END) AS w
       |  FROM pairs, w
       |)""".stripMargin

  /** The threshold-sweep confusion/precision/recall select over a
    * `scored(is_match, w)` CTE — shared verbatim by the label-derived
    * and EM-derived classify oracles.
    */
  private val classifySweepSql: String =
    """SELECT threshold, count(*) AS n_pairs,
      |       CAST(sum(CASE WHEN is_match = 1 AND w > threshold
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS tp,
      |       CAST(sum(CASE WHEN is_match = 0 AND w > threshold
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS fp,
      |       CAST(sum(CASE WHEN is_match = 1 AND w <= threshold
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS fn,
      |       CAST(sum(CASE WHEN is_match = 0 AND w <= threshold
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS tn,
      |       round(CAST(sum(CASE WHEN is_match = 1 AND w > threshold
      |                      THEN 1 ELSE 0 END) AS DOUBLE) /
      |             CAST(sum(CASE WHEN w > threshold THEN 1 ELSE 0 END)
      |                  AS BIGINT), 4) AS precision,
      |       round(CAST(sum(CASE WHEN is_match = 1 AND w > threshold
      |                      THEN 1 ELSE 0 END) AS DOUBLE) /
      |             CAST(sum(CASE WHEN is_match = 1 THEN 1 ELSE 0 END)
      |                  AS BIGINT), 4) AS recall
      |FROM scored, (VALUES (0.0), (2.0), (4.0)) t(threshold)
      |GROUP BY threshold ORDER BY threshold""".stripMargin

  /** The graded (categorical-name) EM derivation: graded pairs over the
    * base dirty corpus → 12-row histogram → seeds → EmIters unrolled
    * steps ending at `q$EmIters`. Each step is THREE MATERIALIZED CTEs
    * (E-step f$k, clamped raw M-step g$k, renormalized q$k) because the
    * categorical M-step renormalizes after clamping — the division
    * order (cm0+cm1+cm2, left-assoc) mirrors the Scala fold exactly.
    */
  private def emChainGradedCte: String = {
    val head =
      """, pairsg AS MATERIALIZED (
        |  SELECT CASE WHEN b.link = a.id THEN 1 ELSE 0 END AS is_match,
        |         CASE WHEN a.name = b.name THEN 2
        |              WHEN levenshtein(a.name, b.name) <= 1 THEN 1
        |              ELSE 0 END AS ag_name,
        |         CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS ag_seg,
        |         CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS ag_band
        |  FROM dirty a JOIN dirty b ON a.nat = b.nat AND a.id < b.id
        |), histg AS MATERIALIZED (
        |  SELECT CAST(count(*) AS DOUBLE) AS n,
        |         CAST(ag_name AS DOUBLE) AS gn,
        |         CAST(ag_seg AS DOUBLE) AS gs,
        |         CAST(ag_band AS DOUBLE) AS gb
        |  FROM pairsg GROUP BY ag_name, ag_seg, ag_band
        |), q0 AS MATERIALIZED (
        |  SELECT 0.01 AS lam,
        |         sum(n * CASE WHEN gn = 0 THEN 1.0 ELSE 0.0 END)
        |           / sum(n) / 2 AS mn0,
        |         sum(n * CASE WHEN gn = 1 THEN 1.0 ELSE 0.0 END)
        |           / sum(n) / 2 AS mn1,
        |         (1 + sum(n * CASE WHEN gn = 2 THEN 1.0 ELSE 0.0 END)
        |           / sum(n)) / 2 AS mn2,
        |         sum(n * CASE WHEN gn = 0 THEN 1.0 ELSE 0.0 END)
        |           / sum(n) AS un0,
        |         sum(n * CASE WHEN gn = 1 THEN 1.0 ELSE 0.0 END)
        |           / sum(n) AS un1,
        |         sum(n * CASE WHEN gn = 2 THEN 1.0 ELSE 0.0 END)
        |           / sum(n) AS un2,
        |         (1 + sum(n * gs) / sum(n)) / 2 AS ms,
        |         sum(n * gs) / sum(n) AS us,
        |         (1 + sum(n * gb) / sum(n)) / 2 AS mb,
        |         sum(n * gb) / sum(n) AS ub
        |  FROM histg
        |)""".stripMargin
    def cl(x: String) = s"greatest(least($x, 0.999999), 0.000001)"
    val iters = (1 to EmIters).map { k =>
      s""", f$k AS MATERIALIZED (
         |  SELECT h.n, h.gn, h.gs, h.gb,
         |         p.lam * (CASE WHEN h.gn = 2 THEN p.mn2
         |                       WHEN h.gn = 1 THEN p.mn1
         |                       ELSE p.mn0 END)
         |               * (h.gs * p.ms + (1 - h.gs) * (1 - p.ms))
         |               * (h.gb * p.mb + (1 - h.gb) * (1 - p.mb)) AS pm,
         |         (1 - p.lam) * (CASE WHEN h.gn = 2 THEN p.un2
         |                             WHEN h.gn = 1 THEN p.un1
         |                             ELSE p.un0 END)
         |                     * (h.gs * p.us + (1 - h.gs) * (1 - p.us))
         |                     * (h.gb * p.ub + (1 - h.gb) * (1 - p.ub))
         |           AS pu
         |  FROM histg h, q${k - 1} p
         |), g$k AS MATERIALIZED (
         |  SELECT ${cl("sum(n * w) / sum(n)")} AS lam,
         |         ${cl("sum(n * w * (CASE WHEN gn = 0 THEN 1.0 ELSE 0.0 END))" +
             " / sum(n * w)")} AS cm0,
         |         ${cl("sum(n * w * (CASE WHEN gn = 1 THEN 1.0 ELSE 0.0 END))" +
             " / sum(n * w)")} AS cm1,
         |         ${cl("sum(n * w * (CASE WHEN gn = 2 THEN 1.0 ELSE 0.0 END))" +
             " / sum(n * w)")} AS cm2,
         |         ${cl("sum(n * (1 - w) * (CASE WHEN gn = 0 THEN 1.0 ELSE 0.0" +
             " END)) / sum(n * (1 - w))")} AS cu0,
         |         ${cl("sum(n * (1 - w) * (CASE WHEN gn = 1 THEN 1.0 ELSE 0.0" +
             " END)) / sum(n * (1 - w))")} AS cu1,
         |         ${cl("sum(n * (1 - w) * (CASE WHEN gn = 2 THEN 1.0 ELSE 0.0" +
             " END)) / sum(n * (1 - w))")} AS cu2,
         |         ${cl("sum(n * w * gs) / sum(n * w)")} AS ms,
         |         ${cl("sum(n * (1 - w) * gs) / sum(n * (1 - w))")} AS us,
         |         ${cl("sum(n * w * gb) / sum(n * w)")} AS mb,
         |         ${cl("sum(n * (1 - w) * gb) / sum(n * (1 - w))")} AS ub
         |  FROM (SELECT n, gn, gs, gb, pm / (pm + pu) AS w FROM f$k)
         |), q$k AS MATERIALIZED (
         |  SELECT lam,
         |         cm0 / (cm0 + cm1 + cm2) AS mn0,
         |         cm1 / (cm0 + cm1 + cm2) AS mn1,
         |         cm2 / (cm0 + cm1 + cm2) AS mn2,
         |         cu0 / (cu0 + cu1 + cu2) AS un0,
         |         cu1 / (cu0 + cu1 + cu2) AS un1,
         |         cu2 / (cu0 + cu1 + cu2) AS un2,
         |         ms, us, mb, ub
         |  FROM g$k
         |)""".stripMargin
    }.mkString
    fsPairsCte + head + iters
  }

  /** The λ=6 transitive closure over the full dirty corpus (weights →
    * edge cut → recursive reach → component-min map `comp`) — the
    * full-relink component map shared by the er_golden_record and
    * er_incremental oracles: the incremental fold's whole contract is
    * equality with this from-scratch closure.
    */
  private def mergeClosureCtes: String = fsPairsCte.replaceFirst(
    "WITH ", "WITH RECURSIVE ") + fsWeightsCte +
    """, pid AS (
      |  SELECT a.id AS src, b.id AS dst,
      |         CASE WHEN a.name = b.name THEN 1 ELSE 0 END AS ag_name,
      |         CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS ag_seg,
      |         CASE WHEN a.band = b.band THEN 1 ELSE 0 END AS ag_band
      |  FROM dirty a JOIN dirty b ON a.nat = b.nat AND a.id < b.id
      |), ed AS (
      |  SELECT src, dst FROM pid, w
      |  WHERE (CASE WHEN ag_name = 1 THEN wa_name ELSE wd_name END +
      |         CASE WHEN ag_seg  = 1 THEN wa_seg  ELSE wd_seg  END +
      |         CASE WHEN ag_band = 1 THEN wa_band ELSE wd_band END) > 6.0
      |), e AS (
      |  SELECT src AS a, dst AS b FROM ed
      |  UNION SELECT dst AS a, src AS b FROM ed
      |), reach(a, b) AS (
      |  SELECT a, b FROM e
      |  UNION
      |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a
      |), comp AS (
      |  SELECT a AS id, least(a, min(b)) AS entity_id
      |  FROM reach GROUP BY a
      |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "er_fs_em" -> emOracle,
    // incremental == full relink: the oracle IS the from-scratch
    // closure; n_from_batch marks the arriving records per entity
    "er_incremental" -> (mergeClosureCtes +
      """
        |SELECT coalesce(comp.entity_id, d.id) AS entity_id,
        |       count(*) AS n_records,
        |       CAST(sum(CASE WHEN d.link IS NOT NULL
        |                      AND d.link % 20 = 5
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_from_batch
        |FROM dirty d LEFT JOIN comp ON comp.id = d.id
        |GROUP BY coalesce(comp.entity_id, d.id)
        |ORDER BY entity_id""".stripMargin),
    // categorical EM chain → (field, level) weight table
    "er_fs_em_graded" -> (emChainGradedCte +
      s"""
         |SELECT f.field, f.level, round(f.m, 6) AS m,
         |       round(f.u, 6) AS u,
         |       round(log2(f.m / f.u), 6) AS w,
         |       round(p.lam, 6) AS lam
         |FROM q$EmIters p, LATERAL (VALUES
         |  ('band', 'agree', p.mb, p.ub),
         |  ('band', 'disagree', 1 - p.mb, 1 - p.ub),
         |  ('name', 'close', p.mn1, p.un1),
         |  ('name', 'disagree', p.mn0, p.un0),
         |  ('name', 'exact', p.mn2, p.un2),
         |  ('seg', 'agree', p.ms, p.us),
         |  ('seg', 'disagree', 1 - p.ms, 1 - p.us))
         |  f(field, level, m, u)
         |ORDER BY f.field, f.level""".stripMargin),
    // categorical EM chain → graded weights → the shared sweep select
    "er_fs_classify_graded" -> (emChainGradedCte +
      s""", wg AS (
         |  SELECT round(log2(mn2 / un2), 6) AS wn_exact,
         |         round(log2(mn1 / un1), 6) AS wn_close,
         |         round(log2(mn0 / un0), 6) AS wn_disagree,
         |         round(log2(ms / us), 6) AS wa_seg,
         |         round(log2((1 - ms) / (1 - us)), 6) AS wd_seg,
         |         round(log2(mb / ub), 6) AS wa_band,
         |         round(log2((1 - mb) / (1 - ub)), 6) AS wd_band
         |  FROM q$EmIters
         |), scored AS MATERIALIZED (
         |  SELECT is_match,
         |         (CASE WHEN ag_name = 2 THEN wn_exact
         |               WHEN ag_name = 1 THEN wn_close
         |               ELSE wn_disagree END +
         |          CASE WHEN ag_seg  = 1 THEN wa_seg  ELSE wd_seg  END +
         |          CASE WHEN ag_band = 1 THEN wa_band ELSE wd_band END)
         |           AS w
         |  FROM pairsg, wg
         |)
         |""".stripMargin + classifySweepSql),
    // one EM estimation (primary stream) scoring two candidate streams;
    // fn = n_truth − tp so blocking loss is priced into recall
    "er_fs_classify_multipass" -> (fsPairsBCte +
      emChain("_nat") + emScoredBCte +
      """, sw AS (
        |  SELECT 'nat' AS scheme, threshold,
        |         CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(CASE WHEN is_match = 1 AND w > threshold
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |         CAST(sum(CASE WHEN is_match = 0 AND w > threshold
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |         CAST(sum(CASE WHEN is_match = 0 AND w <= threshold
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM scored_nat, (VALUES (0.0), (4.0), (8.0)) t(threshold)
        |  GROUP BY threshold
        |  UNION ALL
        |  SELECT 'multipass', threshold,
        |         CAST(count(*) AS BIGINT),
        |         CAST(sum(CASE WHEN is_match = 1 AND w > threshold
        |                       THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(CASE WHEN is_match = 0 AND w > threshold
        |                       THEN 1 ELSE 0 END) AS BIGINT),
        |         CAST(sum(CASE WHEN is_match = 0 AND w <= threshold
        |                       THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM scored_mp, (VALUES (0.0), (4.0), (8.0)) t(threshold)
        |  GROUP BY threshold
        |)
        |SELECT scheme, threshold, n_pairs, tp, fp,
        |       n_truth - tp AS fn, tn,
        |       round(CAST(tp AS DOUBLE) / (tp + fp), 4) AS precision,
        |       round(CAST(tp AS DOUBLE) / n_truth, 4) AS recall
        |FROM sw CROSS JOIN tot
        |ORDER BY scheme, threshold""".stripMargin),
    // weights (rounded, as scored) → λ=6 edge list → transitive closure
    // (the dedup_cluster_cc recursive-CTE twin) → per-entity max_by
    // survivorship + conflict flags
    "er_golden_record" -> (mergeClosureCtes +
      """
        |SELECT coalesce(comp.entity_id, d.id) AS entity_id,
        |       count(*) AS n_records,
        |       arg_max(d.name,
        |               length(d.name) * 10000000000000 - d.id) AS surv_name,
        |       arg_max(d.seg,
        |               length(d.name) * 10000000000000 - d.id) AS surv_seg,
        |       arg_max(d.band,
        |               length(d.name) * 10000000000000 - d.id) AS surv_band,
        |       CAST(CASE WHEN count(DISTINCT d.seg) > 1
        |                 THEN 1 ELSE 0 END AS BIGINT) AS seg_conflict,
        |       CAST(CASE WHEN count(DISTINCT d.band) > 1
        |                 THEN 1 ELSE 0 END AS BIGINT) AS band_conflict
        |FROM dirty d LEFT JOIN comp ON comp.id = d.id
        |GROUP BY coalesce(comp.entity_id, d.id)
        |ORDER BY entity_id""".stripMargin),
    // counts-only evaluation: candidates from per-block cardinalities
    // (exact integer C(n,2) sums), captured truth from the link join
    "er_blocking_quality" -> (fsPairsCte +
      """, links AS (
        |  SELECT CASE WHEN c.nat = o.nat THEN 1 ELSE 0 END AS cap_nat,
        |         CASE WHEN c.seg = o.seg THEN 1 ELSE 0 END AS cap_seg
        |  FROM dirty c JOIN dirty o ON c.link = o.id
        |), tot AS (
        |  SELECT count(*) AS n_total,
        |         CAST(sum(CASE WHEN link IS NOT NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_truth
        |  FROM dirty
        |), cand AS (
        |  SELECT 'nat' AS scheme,
        |         CAST(sum(cc * (cc - 1) // 2) AS BIGINT) AS n_candidates
        |  FROM (SELECT count(*) AS cc FROM dirty GROUP BY nat)
        |  UNION ALL
        |  SELECT 'seg', CAST(sum(cc * (cc - 1) // 2) AS BIGINT)
        |  FROM (SELECT count(*) AS cc FROM dirty GROUP BY seg)
        |), cap AS (
        |  SELECT 'nat' AS scheme,
        |         CAST(sum(cap_nat) AS BIGINT) AS truth_captured FROM links
        |  UNION ALL
        |  SELECT 'seg', CAST(sum(cap_seg) AS BIGINT) FROM links
        |)
        |SELECT cand.scheme, n_candidates, truth_captured,
        |       round(CAST(truth_captured AS DOUBLE) / n_truth, 4)
        |         AS pair_completeness,
        |       round(1.0 - CAST(n_candidates AS DOUBLE) /
        |             (n_total * (n_total - 1) // 2), 6) AS reduction_ratio
        |FROM cand JOIN cap USING (scheme) CROSS JOIN tot
        |ORDER BY cand.scheme""".stripMargin),
    // inclusion–exclusion candidates off three group-bys; OR-capture
    // off the one link join
    "er_blocking_multipass" -> (fsPairsCte +
      """, links AS (
        |  SELECT CASE WHEN c.seg = o.seg THEN 1 ELSE 0 END AS cap_seg,
        |         CASE WHEN c.band = o.band THEN 1 ELSE 0 END AS cap_band,
        |         CASE WHEN c.seg = o.seg OR c.band = o.band
        |              THEN 1 ELSE 0 END AS cap_union
        |  FROM dirty c JOIN dirty o ON c.link = o.id
        |), tot AS (
        |  SELECT count(*) AS n_total,
        |         CAST(sum(CASE WHEN link IS NOT NULL THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_truth
        |  FROM dirty
        |), cs AS (
        |  SELECT CAST(sum(cc * (cc - 1) // 2) AS BIGINT) AS n
        |  FROM (SELECT count(*) AS cc FROM dirty GROUP BY seg)
        |), cb AS (
        |  SELECT CAST(sum(cc * (cc - 1) // 2) AS BIGINT) AS n
        |  FROM (SELECT count(*) AS cc FROM dirty GROUP BY band)
        |), cab AS (
        |  SELECT CAST(sum(cc * (cc - 1) // 2) AS BIGINT) AS n
        |  FROM (SELECT count(*) AS cc FROM dirty GROUP BY seg, band)
        |), cand AS (
        |  SELECT 'band' AS scheme, cb.n AS n_candidates FROM cb
        |  UNION ALL SELECT 'seg', cs.n FROM cs
        |  UNION ALL
        |  SELECT 'seg+band', cs.n + cb.n - cab.n FROM cs, cb, cab
        |), cap AS (
        |  SELECT 'band' AS scheme,
        |         CAST(sum(cap_band) AS BIGINT) AS truth_captured
        |  FROM links
        |  UNION ALL
        |  SELECT 'seg', CAST(sum(cap_seg) AS BIGINT) FROM links
        |  UNION ALL
        |  SELECT 'seg+band', CAST(sum(cap_union) AS BIGINT) FROM links
        |)
        |SELECT cand.scheme, n_candidates, truth_captured,
        |       round(CAST(truth_captured AS DOUBLE) / n_truth, 4)
        |         AS pair_completeness,
        |       round(1.0 - CAST(n_candidates AS DOUBLE) /
        |             (n_total * (n_total - 1) // 2), 6)
        |         AS reduction_ratio
        |FROM cand JOIN cap USING (scheme) CROSS JOIN tot
        |ORDER BY cand.scheme""".stripMargin),
    "er_fs_weights" -> (fsPairsCte +
      """, wtab AS (
        |  SELECT f.field,
        |         (f.am + 0.5) / (nm + 1.0) AS m,
        |         (f.au + 0.5) / (np - nm + 1.0) AS u
        |  FROM c, LATERAL (VALUES ('band', band_m, band_u),
        |                          ('name', name_m, name_u),
        |                          ('seg',  seg_m,  seg_u)) f(field, am, au)
        |)
        |SELECT field, round(m, 6) AS m, round(u, 6) AS u,
        |       round(log2(m / u), 6) AS w_agree,
        |       round(log2((1 - m) / (1 - u)), 6) AS w_disagree
        |FROM wtab ORDER BY field""".stripMargin),
    "er_fs_classify" -> (fsPairsCte + fsWeightsCte + classifySweepSql),
    // TF-adjusted weights: identical count arithmetic (Σc, Σc² per
    // log2-frequency band; u' = min(1, u·f_b/f̄)) with the same
    // left-to-right double op order as the Spark side
    "er_tf_adjust" -> (tfCte +
      """, shaped AS (
        |  SELECT fband, n_values, n_rows,
        |         m, u,
        |         CAST(sc2 AS DOUBLE) /
        |           (CAST(n AS DOUBLE) * CAST(n_rows AS DOUBLE)) AS fb,
        |         fbar
        |  FROM bands, parms, tot
        |)
        |SELECT fband, n_values, n_rows,
        |       round(fb, 6) AS f_band,
        |       round(least(1.0, u * fb / fbar), 6) AS u_adj,
        |       round(log2(m / least(1.0, u * fb / fbar)), 6) AS w_tf,
        |       round(log2(m / u), 6) AS w_base
        |FROM shaped ORDER BY fband""".stripMargin),
    // the TF table applied: same weight arithmetic, per-sname weight
    // resolved through the value table, both schemes' cells off one
    // scored stream
    "er_tf_classify" -> (tfCte +
      """, bw AS (
        |  SELECT fband,
        |         round(log2(m / least(1.0, u *
        |           (CAST(sc2 AS DOUBLE) /
        |            (CAST(n AS DOUBLE) * CAST(n_rows AS DOUBLE))) /
        |           fbar)), 6) AS w_tf
        |  FROM bands, parms, tot
        |), vw AS (
        |  SELECT vf.sname, bw.w_tf FROM vf JOIN bw USING (fband)
        |), wb AS (
        |  SELECT round(log2(m / u), 6) AS w_base,
        |         round(log2((1 - m) / (1 - u)), 6) AS wd
        |  FROM parms
        |), scored AS (
        |  SELECT p.is_match,
        |         CASE WHEN p.ag = 1 THEN vw.w_tf ELSE wb.wd END AS w_t,
        |         CASE WHEN p.ag = 1 THEN wb.w_base ELSE wb.wd END AS w_b
        |  FROM prs p JOIN vw ON p.sname = vw.sname, wb
        |), th AS (
        |  SELECT 0.0 AS threshold FROM parms
        |  UNION ALL
        |  SELECT round(log2(m / u), 6) - 0.01 FROM parms
        |), cells AS (
        |  SELECT threshold,
        |    CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN is_match = 1 AND w_t > threshold
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp_tf,
        |    CAST(sum(CASE WHEN is_match = 0 AND w_t > threshold
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp_tf,
        |    CAST(sum(CASE WHEN is_match = 1 AND w_t <= threshold
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn_tf,
        |    CAST(sum(CASE WHEN is_match = 0 AND w_t <= threshold
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn_tf,
        |    CAST(sum(CASE WHEN is_match = 1 AND w_b > threshold
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tp_base,
        |    CAST(sum(CASE WHEN is_match = 0 AND w_b > threshold
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fp_base,
        |    CAST(sum(CASE WHEN is_match = 1 AND w_b <= threshold
        |      THEN 1 ELSE 0 END) AS BIGINT) AS fn_base,
        |    CAST(sum(CASE WHEN is_match = 0 AND w_b <= threshold
        |      THEN 1 ELSE 0 END) AS BIGINT) AS tn_base
        |  FROM scored, th GROUP BY threshold
        |)
        |SELECT * FROM (
        |  SELECT 'base' AS scheme, threshold, n_pairs,
        |         tp_base AS tp, fp_base AS fp, fn_base AS fn,
        |         tn_base AS tn,
        |         round(CAST(tp_base AS DOUBLE) / (tp_base + fp_base), 4)
        |           AS precision,
        |         round(CAST(tp_base AS DOUBLE) / (tp_base + fn_base), 4)
        |           AS recall
        |  FROM cells
        |  UNION ALL
        |  SELECT 'tf' AS scheme, threshold, n_pairs,
        |         tp_tf AS tp, fp_tf AS fp, fn_tf AS fn, tn_tf AS tn,
        |         round(CAST(tp_tf AS DOUBLE) / (tp_tf + fp_tf), 4)
        |           AS precision,
        |         round(CAST(tp_tf AS DOUBLE) / (tp_tf + fn_tf), 4)
        |           AS recall
        |  FROM cells
        |) ORDER BY scheme, threshold""".stripMargin),
    // the same sweep scored with the EM-estimated weight table — the
    // fully unsupervised scoring path evaluated against ground truth
    "er_fs_em_classify" -> (emParamsCte + emWeightsCte +
      classifySweepSql),
    // the review band per pattern, scored with the EM weights and the
    // EM prevalence odds; min() (not avg()) for the degenerate
    // per-pattern constants, so no cross-engine summation is involved
    "er_review_queue" -> (emParamsCte +
      s""", wq AS (
         |  SELECT round(log2(mn / un), 6) AS wa_name,
         |         round(log2((1 - mn) / (1 - un)), 6) AS wd_name,
         |         round(log2(ms / us), 6) AS wa_seg,
         |         round(log2((1 - ms) / (1 - us)), 6) AS wd_seg,
         |         round(log2(mb / ub), 6) AS wa_band,
         |         round(log2((1 - mb) / (1 - ub)), 6) AS wd_band,
         |         lam
         |  FROM p$EmIters
         |), sq AS (
         |  SELECT ag_name, ag_seg, ag_band, is_match,
         |         (CASE WHEN ag_name = 1 THEN wa_name ELSE wd_name END +
         |          CASE WHEN ag_seg  = 1 THEN wa_seg  ELSE wd_seg  END +
         |          CASE WHEN ag_band = 1 THEN wa_band ELSE wd_band END)
         |           AS w,
         |         lam
         |  FROM pairs, wq
         |), band AS (
         |  SELECT *,
         |         lam / (1 - lam) * power(2.0, w) AS odds
         |  FROM sq WHERE w > 0 AND w <= 6
         |)
         |SELECT CAST(ag_name AS BIGINT) AS ag_name,
         |       CAST(ag_seg AS BIGINT) AS ag_seg,
         |       CAST(ag_band AS BIGINT) AS ag_band,
         |       count(*) AS n_pairs,
         |       round(min(w), 6) AS w,
         |       round(min(odds / (1 + odds)), 4) AS conf,
         |       round(avg(is_match), 4) AS frac_true
         |FROM band GROUP BY ag_name, ag_seg, ag_band
         |ORDER BY ag_name, ag_seg, ag_band""".stripMargin),
    // per-iteration parameters straight off the unrolled step CTEs
    "er_fs_em_trace" -> (emParamsCte +
      (0 to EmIters).map { k =>
        s"""
           |SELECT CAST($k AS BIGINT) AS iter, round(lam, 6) AS lam,
           |       round(mn, 6) AS m_name, round(ms, 6) AS m_seg,
           |       round(mb, 6) AS m_band, round(un, 6) AS u_name,
           |       round(us, 6) AS u_seg, round(ub, 6) AS u_band
           |FROM p$k""".stripMargin
      }.mkString("", "\nUNION ALL", "\nORDER BY iter")),
    "er_fs_calibration" -> (fsPairsCte + fsWeightsCte +
      """, binned AS (
        |  SELECT is_match, w,
        |         prior_odds * power(2.0, w) /
        |           (1.0 + prior_odds * power(2.0, w)) AS p
        |  FROM scored
        |)
        |SELECT CAST(floor(w) AS BIGINT) AS bin,
        |       count(*) AS n_pairs,
        |       round(avg(p), 4) AS avg_conf,
        |       round(avg(is_match), 4) AS frac_true
        |FROM binned GROUP BY bin ORDER BY bin""".stripMargin)
  )
}
