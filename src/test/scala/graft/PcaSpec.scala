package graft

import graft.functions.Jacobi

/** Properties of the tall-skinny PCA path (`embedding_pca_project`):
  * the driver-side Jacobi eigensolver against algebraic ground truth, and
  * the distributed Gram/projection pipeline against its own invariants —
  * this key is oracle=no (double summation order), so these checks ARE its
  * correctness signal.
  */
class PcaSpec extends SparkSpec {

  private def randSym(d: Int, seed: Long): Array[Double] = {
    val rnd = new scala.util.Random(seed)
    val a = new Array[Double](d * d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextGaussian()
      a(i * d + j) = x; a(j * d + i) = x
    }
    a
  }

  test("Jacobi: A·v = λ·v, eigenvalues descending, V orthonormal, " +
    "trace preserved (random symmetric matrices)") {
    for (seed <- Seq(1L, 7L, 42L); d <- Seq(3, 16, 64)) {
      val a = randSym(d, seed)
      val (evals, evecs) = Jacobi.symEigen(a, d)
      assert(evals.length == d && evecs.length == d)
      // descending order
      evals.sliding(2).foreach(p =>
        if (p.length == 2) assert(p(0) >= p(1) - 1e-12))
      // trace preservation: Σλ = tr(A)
      val trace = (0 until d).map(i => a(i * d + i)).sum
      assert(math.abs(evals.sum - trace) < 1e-8 * (1 + math.abs(trace)))
      for (k <- 0 until d) {
        val v = evecs(k)
        // unit norm
        assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-8)
        // residual ||A·v − λ·v||
        val res = (0 until d).map { i =>
          val av = (0 until d).map(j => a(i * d + j) * v(j)).sum
          val r = av - evals(k) * v(i)
          r * r
        }.sum
        assert(math.sqrt(res) < 1e-7,
          s"d=$d seed=$seed comp=$k residual ${math.sqrt(res)}")
        // pairwise orthogonality against the next component
        if (k + 1 < d) {
          val dot = (0 until d).map(i => v(i) * evecs(k + 1)(i)).sum
          assert(math.abs(dot) < 1e-8)
        }
      }
    }
  }

  test("embedding_pca_project: per-component projection variance " +
    "reproduces the eigenvalue; components ordered; explained ratios " +
    "positive and bounded") {
    val rows = q("embedding_pca_project").collect()
    assert(rows.length == 8)
    var prev = Double.MaxValue
    rows.foreach { r =>
      val (comp, ev, ratio, pv) =
        (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(ev > 0 && ratio > 0 && ratio < 1)
      assert(ev <= prev + 1e-9, s"component $comp out of order")
      prev = ev
      // the projection audit must land on the eigenvalue (same data,
      // same covariance; both rounded at 6 decimals)
      assert(math.abs(pv - ev) < 1e-4,
        s"component $comp: proj_var $pv vs eigenvalue $ev")
    }
  }
}
