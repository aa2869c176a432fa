package graft

import org.apache.spark.sql.functions._

/** Unsupervised Fellegi–Sunter EM (`er_fs_em`) and entity formation
  * (`er_golden_record`) invariants the DuckDB oracle can't judge: EM's
  * estimates against the LABEL-DERIVED truth it never saw, and the
  * golden-record output against the known clone structure.
  *
  * One deviation is load-bearing and asserted POSITIVELY: band-shifted
  * clones also have case-folded names (id%20 ⊂ id%10), so the match
  * class's band disagreements co-occur with name disagreements — a
  * correlated-perturbation cluster the conditional-independence mixture
  * cannot keep inside the match class. EM reassigns it, which drives
  * m_band to the clamp (≈1) instead of the label-derived ≈0.75. That is
  * the textbook naive-Bayes failure `er_fs_calibration` quantifies on
  * the posterior side; hiding it with a decorrelated fixture would fake
  * a property real EM linkage does not have.
  */
class EmGoldenSpec extends SparkSpec {

  test("er_fs_em: λ recovers the true prevalence and the per-field " +
    "estimates match the label-derived truth where independence holds") {
    val em = q("er_fs_em").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val label = q("er_fs_weights").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val lam = q("er_fs_em").collect().head.getDouble(5)
    // true prevalence from the classify sweep's own accounting
    val c0 = q("er_fs_classify").collect().head
    val lamTrue =
      (c0.getLong(2) + c0.getLong(4)).toDouble / c0.getLong(1)
    assert(lam > 0.5 * lamTrue && lam < 1.5 * lamTrue,
      s"EM prevalence $lam must bracket the true rate $lamTrue")
    // structure: every field still separates, name still dominates
    em.foreach { case (f, (m, u, wa, wd)) =>
      assert(m > u, s"$f: EM must put agreement evidence on the match side")
      assert(wa > 0 && wd < 0, s"$f: weight signs must survive EM")
    }
    assert(em("name")._3 > em("seg")._3 && em("name")._3 > em("band")._3,
      "the near-unique field must carry the largest EM agreement weight")
    // seg's perturbation is NOT correlated with the name fold (id%15 hits
    // odd multiples of 5), so EM must recover its m and u to ±0.05
    assert(math.abs(em("seg")._1 - label("seg")._1) < 0.05,
      s"m_seg: EM ${em("seg")._1} vs label ${label("seg")._1}")
    assert(math.abs(em("seg")._2 - label("seg")._2) < 0.05,
      s"u_seg: EM ${em("seg")._2} vs label ${label("seg")._2}")
    // chance agreement rates (u) are estimated from the dominant
    // non-match mass — recoverable for every field
    assert(math.abs(em("band")._2 - label("band")._2) < 0.05,
      s"u_band: EM ${em("band")._2} vs label ${label("band")._2}")
    assert(em("name")._2 < 0.01, "u_name must stay near zero")
    // the documented independence failure: correlated band+name
    // perturbation pushes m_band ABOVE the label-derived rate (to the
    // clamp), never below it
    assert(em("band")._1 >= label("band")._1,
      s"m_band: EM ${em("band")._1} must sit above label " +
        s"${label("band")._1} (reassigned correlated cluster)")
  }

  test("er_fs_em_trace: the curve starts at the seeds, ends at the " +
    "point estimate, and λ has plateaued by the iteration cap") {
    val trace = q("er_fs_em_trace").collect()
    assert(trace.length === 31, "iter 0 (seeds) through 30")
    assert(trace.map(_.getLong(0)).toSeq === (0L to 30L))
    assert(trace.head.getDouble(1) === 0.01, "iter 0 carries the λ seed")
    // the final row IS er_fs_em's estimate (same arithmetic, same
    // rounding)
    val em = q("er_fs_em").collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val last = trace.last
    assert(last.getDouble(2) === em("name")._1 &&
      last.getDouble(3) === em("seg")._1 &&
      last.getDouble(4) === em("band")._1, "final m row must match")
    assert(last.getDouble(5) === em("name")._2 &&
      last.getDouble(6) === em("seg")._2 &&
      last.getDouble(7) === em("band")._2, "final u row must match")
    // convergence: λ's tail drift over the last 5 steps is under 1%
    // relative — the iteration budget is sufficient, not merely
    // assumed (absolute drift is scale-dependent: the tiny-corpus λ is
    // 6× the sf0.01 one)
    val lam25 = trace(25).getDouble(1)
    val lam30 = trace(30).getDouble(1)
    assert(math.abs(lam30 - lam25) / lam30 < 0.01,
      s"λ still drifting at the cap: $lam25 -> $lam30")
  }

  test("er_fs_em_classify: the unsupervised sweep keeps the classify " +
    "accounting (cells sum, truth count, λ-monotonicity) and stays " +
    "close to the supervised sweep at the loose threshold") {
    val em = q("er_fs_em_classify").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val sup = q("er_fs_classify").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val nClones = Tables(spark, sf, "customer")
      .filter(org.apache.spark.sql.functions.col("c_custkey") % 5 === 0)
      .count()
    em.foreach { case (th, np, tp, fp, fn, tn) =>
      assert(tp + fp + fn + tn === np, s"λ=$th: cells must sum")
      assert(tp + fn === nClones, s"λ=$th: truth count fixed")
    }
    em.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._3 <= lo._3 && hi._4 <= lo._4,
        "predicted positives shrink as λ rises")
    }
    // at λ=0 the unsupervised and supervised sweeps agree on recall to
    // within a few pairs — the cost of unsupervision is visible, not
    // catastrophic
    val emTp0 = em.head._3.toDouble
    val supTp0 = sup.head._3.toDouble
    assert(math.abs(emTp0 - supTp0) / supTp0 < 0.15,
      s"λ=0 tp: EM $emTp0 vs supervised $supTp0")
  }

  test("er_fs_classify_multipass: the multipass stream recovers " +
    "nat-typo'd pairs the single-key block loses — recall strictly " +
    "higher at every threshold, paid for in candidates") {
    val rows = q("er_fs_classify_multipass").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2),
        r.getLong(3), r.getLong(5), r.getDouble(8)))
    val mp = rows.filter(_._1 == "multipass").sortBy(_._2)
    val nat = rows.filter(_._1 == "nat").sortBy(_._2)
    assert(mp.length === 3 && nat.length === 3)
    mp.zip(nat).foreach { case ((_, th, mpPairs, mpTp, mpFn, mpRec),
        (_, _, natPairs, natTp, natFn, natRec)) =>
      assert(mpRec > natRec,
        s"λ=$th: multipass recall $mpRec must beat nat-only $natRec")
      assert(mpTp > natTp && mpFn < natFn,
        s"λ=$th: the recovered pairs must be true positives")
      assert(mpPairs > natPairs,
        s"λ=$th: the recall is PAID for in candidates")
    }
    // the blocking ceiling itself: nat-only recall can never reach 1.0
    // at ANY threshold on the noisy corpus (the typo'd pairs are
    // structurally invisible), while multipass recovers the half of
    // them whose (seg, band) survived
    assert(nat.head._6 < 1.0, "nat-only must be blocking-truncated")
  }

  test("er_fs_em_graded / er_fs_classify_graded: the close level sits " +
    "between exact and disagree, a one-typo name is positive evidence, " +
    "and the graded sweep's recall dominates the binary one") {
    val wt = q("er_fs_em_graded").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(wt(("name", "exact")) > wt(("name", "close")),
      "exact must outweigh close")
    assert(wt(("name", "close")) > wt(("name", "disagree")),
      "close must outweigh disagree")
    assert(wt(("name", "close")) > 0,
      "a one-typo name must be positive evidence, not a penalty")
    def recalls(key: String) = q(key).collect()
      .map(r => r.getDouble(0) -> r.getDouble(7)).toMap
    val g = recalls("er_fs_classify_graded")
    val b = recalls("er_fs_em_classify")
    Seq(0.0, 2.0, 4.0).foreach { th =>
      assert(g(th) >= b(th),
        s"λ=$th: graded recall ${g(th)} < binary ${b(th)}")
    }
    // the case-folded clones move from the full disagreement penalty to
    // the close level's positive weight — recall must rise strictly at
    // the tight threshold, where the binary comparator loses them
    assert(g(4.0) > b(4.0),
      s"the comparator upgrade must buy recall at λ=4: " +
        s"graded ${g(4.0)} vs binary ${b(4.0)}")
  }

  test("er_incremental: the batch-only fold equals a full relink " +
    "exactly, and the batch lands where it should") {
    val inc = q("er_incremental").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
    val full = q("er_golden_record").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // exact equality vs the full relink: same entities, same sizes —
    // scoring only batch×all pairs and contracting into yesterday's
    // assignment must lose and invent NOTHING
    assert(inc.map(_._1).toSeq.sorted === full.keys.toSeq.sorted,
      "incremental and full relink must form identical entities")
    inc.foreach { case (eid, (n, _)) =>
      assert(n === full(eid), s"entity $eid: size $n vs full ${full(eid)}")
    }
    // every batch record (clones of sources ≡ 5 mod 20, all
    // name-unperturbed) must have MERGED into its source's entity
    val custkeys = Tables(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val batchSources = custkeys.filter(k => k % 20 == 5).sorted
    val merged = inc.filter(_._2._2 > 0)
    assert(merged.map(_._1).toSeq.sorted === batchSources.toSeq,
      "each batch record merges into its source-original's entity")
    merged.foreach { case (eid, (n, nb)) =>
      assert(n === 2L && nb === 1L,
        s"entity $eid: expected a (source, batch-clone) pair, got " +
          s"n=$n from_batch=$nb")
    }
  }

  test("er_golden_record: entities are exactly the unperturbed-name " +
    "clone pairs, survivors are the originals, conflicts match id " +
    "arithmetic") {
    val all = q("er_golden_record").collect()
    val custkeys = Tables(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    // λ=6 keeps only name-agreeing pairs (it clears the stranger
    // ceiling at every scale), and a clone's name agrees iff it was
    // not case-folded
    val expected = custkeys.filter(k => k % 5 == 0 && k % 10 != 0).sorted
    val rows = all.filter(_.getLong(1) === 2L)
    assert(rows.map(_.getLong(0)).toSeq === expected.toSeq,
      "merged entities must be exactly the unperturbed-name clone sources")
    rows.foreach { r =>
      assert(r.getLong(6) === 0L,
        "band shifts imply folded names (id%20 ⊂ id%10), so no " +
          "band conflict can reach an entity")
    }
    // every record NOT in a merged pair emits a SINGLETON golden record
    // under its own id — the MDM "one golden record per entity"
    // contract must hold for unmerged records too
    val singles = all.filter(_.getLong(1) === 1L)
    assert(all.length === rows.length + singles.length,
      "every entity is a clone pair or a singleton")
    val mergedMembers = expected.flatMap(k =>
      Seq(k, k + graft.queries.EntityRes.CloneOffset)).toSet
    val expectedSingles = (custkeys.filterNot(mergedMembers) ++
      custkeys.filter(k => k % 10 == 0)
        .map(_ + graft.queries.EntityRes.CloneOffset)).sorted
    assert(singles.map(_.getLong(0)).sorted.toSeq === expectedSingles.toSeq,
      "singleton entity ids are every record outside a merged pair")
    singles.foreach { r =>
      assert(r.getLong(5) === 0L && r.getLong(6) === 0L,
        "a singleton cannot conflict with itself")
    }
    // seg conflicts: the clone perturbed seg iff 15 | id
    val segConf = rows.filter(_.getLong(5) === 1L).map(_.getLong(0)).toSet
    assert(segConf === expected.filter(_ % 15 == 0).toSet,
      "seg conflicts must be exactly the 15-divisible entities")
    // survivorship: equal-length names tie, lowest id wins → the
    // original record's fields become the golden record
    val orig = Tables(spark, sf, "customer")
      .select(col("c_custkey").as("entity_id"), col("c_name"),
        col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("band"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3))).toMap
    rows.foreach { r =>
      val (n, s, b) = orig(r.getLong(0))
      assert(r.getString(2) === n && r.getString(3) === s &&
        r.getLong(4) === b,
        s"entity ${r.getLong(0)}: survivor must be the original record")
    }
  }
}
