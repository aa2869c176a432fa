package graft

/** Batch 13i: the MinHash banding parameter sweep. */
class MinhashTradeoffSpec extends SparkSpec {

  test("dedup_minhash_tradeoff: candidates and recall rise with band " +
    "count, precision falls, and (6,2) reproduces the native key") {
    val out = q("dedup_minhash_tradeoff").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.map(r => (r._1, r._2)).toSeq ===
      Seq((2, 6), (3, 4), (4, 3), (6, 2)))
    // one shared ground truth across all configs, and it is non-trivial
    assert(out.map(_._5).distinct.length === 1)
    val nTruth = out.head._5
    assert(nTruth > 0L, "fixture has no j >= 0.5 pairs — sweep is vacuous")
    out.foreach { case (b, r, nCand, nFound, _, recall, precision) =>
      assert(b * r <= 12, s"($b,$r) exceeds the K=12 signature")
      assert(nFound <= nCand && nFound <= nTruth, s"($b,$r) conservation")
      assert(math.abs(recall - nFound.toDouble / nTruth) <= 1.5e-4)
      assert(math.abs(precision - nFound.toDouble / nCand) <= 1.5e-4)
    }
    // more bands of fewer rows = looser collision requirement:
    // candidate volume and recall are non-decreasing in band count
    val byBands = out.sortBy(_._1)
    assert(byBands.map(_._3).toSeq === byBands.map(_._3).toSeq.sorted,
      "candidate volume must not fall as bands increase")
    assert(byBands.map(_._6).toSeq === byBands.map(_._6).toSeq.sorted,
      "recall must not fall as bands increase")
    // and the cost of that recall: precision at (2,6) >= at (6,2)
    assert(byBands.head._7 >= byBands.last._7 - 1e-9,
      "precision should not improve with looser banding")
    // the (6,2) config IS dedup_minhash_native's banding: its verified
    // pair count equals the sweep's true-found count exactly
    val native = q("dedup_minhash_native").count()
    assert(byBands.last._4 === native,
      s"(6,2) true-found ${byBands.last._4} != native verified $native")
  }
}
