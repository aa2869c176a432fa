package graft

/** TF-adjusted Fellegi–Sunter weights (`er_tf_adjust`): agreement
  * evidence must scale inversely with the shared value's corpus
  * frequency — a match on a singleton surname outscores the identical
  * agreement pattern on the modal value, with the unadjusted weight
  * sitting between.
  */
class TfAdjustSpec extends SparkSpec {

  private lazy val rows = q("er_tf_adjust").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    .sortBy(_._1)

  test("the fixture spans the frequency spectrum: a singleton band " +
    "(c=1 → fband 0) and a modal band far above it") {
    assert(rows.head._1 === 0L,
      s"no singleton band: ${rows.map(_._1).toSeq}")
    assert(rows.last._1 >= 4L,
      s"modal band too close to singleton: ${rows.map(_._1).toSeq}")
    assert(rows.length >= 3, "need at least 3 frequency bands")
  }

  test("a match on a singleton surname outscores the same agreement " +
    "pattern on the modal value; the TF-adjusted weight is strictly " +
    "decreasing in the frequency band") {
    val wTf = rows.map(_._6).toSeq
    wTf.zip(wTf.tail).foreach { case (hi, lo) =>
      assert(hi > lo,
        s"w_tf must strictly decrease with frequency: $wTf")
    }
    // all non-TF evidence in the pattern is identical, so the pattern
    // score difference IS the weight difference
    info(f"w_tf singleton=${wTf.head}%.3f modal=${wTf.last}%.3f " +
      f"base=${rows.head._7}%.3f")
    assert(wTf.head > wTf.last + 2.0,
      "the singleton-vs-modal gap should be decisive (> 2 bits), " +
        s"got ${wTf.head} vs ${wTf.last}")
  }

  test("the unadjusted weight sits between the rare and modal ends: " +
    "TF awareness strengthens rare agreements and discounts modal ones") {
    val wBase = rows.head._7
    assert(rows.forall(_._7 == wBase), "w_base must be band-constant")
    assert(rows.head._6 > wBase,
      s"singleton w_tf ${rows.head._6} must exceed w_base $wBase")
    assert(rows.last._6 < wBase,
      s"modal w_tf ${rows.last._6} must undercut w_base $wBase")
  }

  test("applied end-to-end (er_tf_classify): at the derived operating " +
    "threshold the TF scheme sheds exactly the modal agreements — " +
    "precision multiplies while base classifies everything") {
    val rows = q("er_tf_classify").collect()
      .map(r => ((r.getString(0), r.getDouble(1)),
        (r.getLong(3), r.getLong(4), r.getDouble(7), r.getDouble(8))))
      .toMap
    val ts = rows.keys.map(_._2).toSeq.distinct.sorted
    assert(ts.head === 0.0 && ts.last > 0.0)
    // t = 0 anchors the schemes equal: every agreement weight positive
    assert(rows(("base", 0.0)) === rows(("tf", 0.0)),
      "schemes must coincide at t = 0")
    val (tpB, fpB, pB, rB) = rows(("base", ts.last))
    val (tpT, fpT, pT, rT) = rows(("tf", ts.last))
    info(f"t=${ts.last}%.4f base p=$pB%.4f r=$rB%.4f (fp=$fpB) | " +
      f"tf p=$pT%.4f r=$rT%.4f (fp=$fpT)")
    assert(rB === 1.0,
      "the threshold sits just under w_base — base must classify " +
        "every agreement")
    assert(fpT < fpB / 10,
      s"TF must shed the modal stranger mass: fp $fpB -> $fpT")
    assert(pT > pB * 5,
      f"TF precision must multiply: $pB%.4f -> $pT%.4f")
    assert(tpT > 0 && rT > 0.2,
      "mid/rare-value matches must stay classified")
  }

  test("u_adj stays a probability and the band frequency is the " +
    "pair-weighted mean (bounded by the band's c-range)") {
    rows.foreach { case (fb, _, _, fBand, uAdj, _, _) =>
      assert(uAdj > 0.0 && uAdj <= 1.0, s"band $fb u_adj=$uAdj")
      val n = rows.map(_._3).sum.toDouble
      val lo = (1L << fb).toDouble / n
      val hi = ((1L << (fb + 1)) - 1).toDouble / n
      // f_band ships 6dp-rounded — allow the half-ulp of that rounding
      assert(fBand >= lo - 5e-7 && fBand <= hi + 5e-7,
        s"band $fb mean frequency $fBand outside [$lo, $hi]")
    }
  }
}
