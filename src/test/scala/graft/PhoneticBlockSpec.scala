package graft

import org.apache.spark.sql.functions._

import graft.queries.EntityRes

/** Phonetic third blocking pass (`er_fs_classify_phonetic`): the
  * soundex-preserving vowel typo must actually preserve soundex (and
  * break equality at edit distance 1), the planted hard clones must
  * co-block ONLY under the phonetic key, and the 3-pass scheme must
  * strictly improve recall over the 2-pass scheme without giving up
  * precision at the operating thresholds.
  */
class PhoneticBlockSpec extends SparkSpec {

  test("the vowel typo preserves soundex and breaks equality at edit " +
    "distance exactly 1, for every lexicon surname") {
    import spark.implicits._
    val df = EntityRes.PhoneticLexicon.toDF("name")
      .withColumn("typo", EntityRes.vowelTypo(col("name")))
      .select(col("name"), col("typo"),
        (soundex(col("name")) === soundex(col("typo"))).as("same_sx"),
        levenshtein(col("name"), col("typo")).as("lev"))
      .collect()
    df.foreach { r =>
      assert(r.getBoolean(2),
        s"soundex changed: ${r.getString(0)} -> ${r.getString(1)}")
      assert(r.getInt(3) === 1,
        s"typo not distance-1: ${r.getString(0)} -> ${r.getString(1)}")
    }
  }

  test("planted typo clones (nat + name + band perturbed) co-block " +
    "under soundex but under neither (seg, band) nor exact name") {
    val dd = EntityRes.dirtyP(spark, sf)
    val hard = dd.filter(col("link").isNotNull &&
        col("link") % 100 === 0).as("c")
      .join(dd.filter(col("link").isNull).as("o"),
        col("c.link") === col("o.id"))
    val n = hard.count()
    assert(n > 0, "fixture must contain mod-100 clones at this scale")
    val checks = hard.agg(
      sum((col("c.nat") === col("o.nat")).cast("long")).as("nat_eq"),
      sum((col("c.seg") === col("o.seg") &&
        col("c.band") === col("o.band")).cast("long")).as("p2_eq"),
      sum((col("c.name") === col("o.name")).cast("long")).as("name_eq"),
      sum((soundex(col("c.name")) === soundex(col("o.name")))
        .cast("long")).as("sx_eq")).head()
    assert(checks.getLong(0) === 0L, "nat must be typo'd on every one")
    assert(checks.getLong(1) === 0L,
      "the (seg, band) composite must miss every one (band perturbed)")
    assert(checks.getLong(2) === 0L, "exact name must miss (vowel typo)")
    assert(checks.getLong(3) === n,
      "soundex must co-block every planted typo clone")
    // and the pass-3 candidate stream actually carries them: every
    // planted pair disagrees on name (vowel typo), so it shows up in
    // pass 3's true pairs with ag_name = 0 — while the aggregate
    // checks above prove passes 1-2 are structurally blind to them
    // (nat typo'd, (seg, band) broken)
    val (_, _, p3) = EntityRes.passesP(spark, sf)
    assert(p3.filter(col("is_match") === 1 && col("ag_name") === 0)
      .count() >= n, "pass 3 must surface the planted typo pairs")
  }

  test("the passes are disjoint: no candidate pair appears twice in " +
    "the union (suppression, not dedup, enforces it)") {
    val (p1, p2, p3) = EntityRes.passesP(spark, sf)
    // flags are pure pair functions; (in_nat, in_p2) partitions the
    // union: pass 1 ⇔ in_nat=1, pass 2 ⇔ (0,1), pass 3 ⇔ (0,0)
    assert(p1.filter(col("in_nat") =!= 1).count() === 0L)
    assert(p2.filter(col("in_nat") === 1 || col("in_p2") =!= 1)
      .count() === 0L)
    assert(p3.filter(col("in_nat") === 1 || col("in_p2") === 1)
      .count() === 0L)
  }

  test("recall strictly improves scheme over scheme at the operating " +
    "threshold, with precision intact for the phonetic step") {
    val rows = q("er_fs_classify_phonetic").collect()
      .map(r => ((r.getString(0), r.getDouble(1)),
        (r.getDouble(7), r.getDouble(8)))).toMap
    val thresholds = rows.keys.map(_._2).toSeq.distinct.sorted
    thresholds.foreach { t =>
      val (pNat, rNat) = rows(("nat", t))
      val (p2, r2) = rows(("multipass2", t))
      val (p3, r3) = rows(("multipass3", t))
      info(f"t=$t%.0f nat p=$pNat%.4f r=$rNat%.4f | mp2 p=$p2%.4f " +
        f"r=$r2%.4f | mp3 p=$p3%.4f r=$r3%.4f")
      assert(r2 > rNat,
        f"(seg,band) pass must recover nat-typo'd pairs at t=$t%.0f")
      assert(r3 >= r2,
        f"the soundex pass can never LOSE recall at t=$t%.0f")
    }
    // the OPERATING thresholds (0, 4): the soundex-recovered intact-name
    // pairs score wa_name + wa_band + wd_seg ≈ 5 bits, so the gain
    // lands here strictly; at t=8 they sit below and mp3 == mp2 — the
    // threshold sweep is exactly the tool that shows where a pass pays
    thresholds.filter(_ < 8).foreach { t =>
      assert(rows(("multipass3", t))._2 > rows(("multipass2", t))._2,
        f"the soundex pass must strictly recover pairs both earlier " +
          f"passes miss at t=$t%.0f")
    }
    // precision at the top threshold is untouched: everything the
    // phonetic pass adds scores below it
    val top = thresholds.max
    assert(rows(("multipass3", top))._1 >= rows(("multipass2", top))._1,
      "phonetic recall must be free at the top threshold's precision")
  }
}
