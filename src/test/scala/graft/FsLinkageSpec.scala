package graft

/** Fellegi–Sunter linkage invariants the DuckDB oracle can't see:
  * weight-table shape (the near-unique field dominates, agreement always
  * adds evidence, disagreement always subtracts), confusion-matrix
  * accounting against the KNOWN clone count, and threshold monotonicity
  * across the classification sweep.
  */
class FsLinkageSpec extends SparkSpec {

  test("er_fs_weights: name dominates, every w_agree > 0 > w_disagree, " +
    "m and u are probabilities") {
    val rows = q("er_fs_weights").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(rows.map(_._1).sorted === Array("band", "name", "seg"))
    rows.foreach { case (f, m, u, wa, wd) =>
      assert(m > 0 && m < 1 && u > 0 && u < 1, s"$f: m/u out of (0,1)")
      assert(wa > 0, s"$f: agreement must be positive evidence")
      assert(wd < 0, s"$f: disagreement must be negative evidence")
      assert(m > u, s"$f: a field where m <= u carries no signal")
    }
    val byField = rows.map(r => r._1 -> r._4).toMap
    assert(byField("name") > byField("band") &&
      byField("name") > byField("seg"),
      "the near-unique field must carry the largest agreement weight")
  }

  test("er_fs_classify: cells sum to n_pairs, truth count equals the " +
    "clone count, and the sweep is monotone in the threshold") {
    val sweep = q("er_fs_classify").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(sweep.map(_._1).toSeq === Seq(0.0, 2.0, 4.0))
    val nClones = Tables(spark, sf, "customer")
      .filter(org.apache.spark.sql.functions.col("c_custkey") % 5 === 0)
      .count()
    sweep.foreach { case (th, np, tp, fp, fn, tn) =>
      assert(tp + fp + fn + tn === np, s"λ=$th: cells must sum to n_pairs")
      assert(tp + fn === nClones,
        s"λ=$th: truth pairs must equal the clone count (blocking is " +
          "pair-complete by construction)")
    }
    // raising λ can only shrink the predicted-positive set
    sweep.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._3 <= lo._3, "tp must be non-increasing in λ")
      assert(hi._4 <= lo._4, "fp must be non-increasing in λ")
    }
    assert(sweep.head._3 > 0 && sweep.head._4 > 0 && sweep.head._5 > 0 &&
      sweep.head._6 > 0,
      "λ=0 must populate all four confusion cells — the fixture's " +
        "precision/recall tension is load-bearing")
  }

  test("er_fs_calibration: weight buckets partition the pair stream and " +
    "the diagram is usable (several buckets, probabilities in range, " +
    "confidence rising with weight)") {
    val bins = q("er_fs_calibration").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val classify = q("er_fs_classify").collect()
    val nPairs = classify.head.getLong(1)
    assert(bins.map(_._2).sum === nPairs,
      "every pair must land in exactly one bucket")
    bins.foreach { case (b, n, conf, frac) =>
      assert(n > 0)
      assert(conf >= 0.0 && conf <= 1.0 && frac >= 0.0 && frac <= 1.0,
        s"bucket $b: probabilities out of range")
    }
    assert(bins.map(_._1).toSeq === bins.map(_._1).sorted.toSeq)
    assert(bins.length >= 5,
      "the weight axis must spread the pairs — a near-single-bucket " +
        "diagram means the score collapsed (fixture regression)")
    // predicted confidence is monotone in the bucket by construction
    // (p is monotone in w); observed rate must at least agree at the ends
    bins.sliding(2).foreach { case Array(lo, hi) =>
      assert(hi._3 >= lo._3 - 1e-9, "avg_conf must rise with the bucket")
    }
    assert(bins.last._4 >= bins.head._4,
      "observed match rate must not be inverted across the extremes")
  }
}
