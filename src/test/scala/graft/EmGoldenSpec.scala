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

  test("er_golden_record: entities are exactly the unperturbed-name " +
    "clone pairs, survivors are the originals, conflicts match id " +
    "arithmetic") {
    val rows = q("er_golden_record").collect()
    val custkeys = Tables(spark, sf, "customer")
      .select(col("c_custkey")).collect().map(_.getLong(0))
    // λ=6 keeps only name-agreeing pairs (it clears the stranger
    // ceiling at every scale), and a clone's name agrees iff it was
    // not case-folded
    val expected = custkeys.filter(k => k % 5 == 0 && k % 10 != 0).sorted
    assert(rows.map(_.getLong(0)).toSeq === expected.toSeq,
      "entity ids must be exactly the unperturbed-name clone sources")
    rows.foreach { r =>
      assert(r.getLong(1) === 2L,
        "each original has at most one clone — every entity is a pair")
      assert(r.getLong(6) === 0L,
        "band shifts imply folded names (id%20 ⊂ id%10), so no " +
          "band conflict can reach an entity")
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
