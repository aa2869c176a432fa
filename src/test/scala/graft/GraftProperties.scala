package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.functions.{GeoMean, GeoMeanBuf}

/** Property-based checks (SURVEY §5.2 item 3) for the pure algorithmic
  * cores — no SparkSession needed, so these run fast and shrink well.
  */
object GraftProperties extends Properties("graft") {

  // the sorted-merge intersection used by dedup_ngram_jaccard
  private def mergeJaccard(a: Array[Long], b: Array[Long]): Double = {
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    if (a.length + b.length - inter == 0) 1.0
    else inter.toDouble / (a.length + b.length - inter)
  }

  private val sortedDistinct: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L))
      .map(_.distinct.sorted.toArray)

  property("merge-jaccard equals set-definition jaccard") =
    forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      val sa = a.toSet
      val sb = b.toSet
      val expected =
        if ((sa ++ sb).isEmpty) 1.0
        else (sa & sb).size.toDouble / (sa ++ sb).size
      math.abs(mergeJaccard(a, b) - expected) < 1e-12
    }

  property("merge-jaccard is symmetric and bounded") =
    forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      val j = mergeJaccard(a, b)
      j == mergeJaccard(b, a) && j >= 0.0 && j <= 1.0
    }

  property("jaccard(x, x) == 1") = forAll(sortedDistinct) { a =>
    a.isEmpty || mergeJaccard(a, a) == 1.0
  }

  // the pruned merge used by dedup_ngram_jaccard since round 2: size
  // prefilter + abandon-once-unreachable bound, threshold j >= 0.5
  private def mergeJaccardPruned(a: Array[Long],
      b: Array[Long]): Option[Double] = {
    val la = a.length; val lb = b.length
    val need = (la + lb + 2) / 3
    if (math.min(la, lb) < need) None
    else {
      var i = 0; var j = 0; var inter = 0
      var feasible = true
      while (feasible && i < la && j < lb) {
        if (inter + math.min(la - i, lb - j) < need) feasible = false
        else {
          val x = a(i); val y = b(j)
          if (x == y) { inter += 1; i += 1; j += 1 }
          else if (x < y) i += 1
          else j += 1
        }
      }
      val jac = inter.toDouble / (la + lb - inter)
      if (jac >= 0.5) Some(jac) else None
    }
  }

  property("pruned merge emits exactly the plain-merge pairs with j >= 0.5, " +
    "with identical values") =
    forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      (a.nonEmpty || b.nonEmpty) ==> {
        val plain = mergeJaccard(a, b)
        mergeJaccardPruned(a, b) match {
          case Some(j) => plain >= 0.5 && j == plain
          case None => plain < 0.5
        }
      }
    }

  private val positives: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0.001, 1e6))

  property("GeoMean merge is order-insensitive (partial aggregation safe)") =
    forAll(positives, positives) { (xs, ys) =>
      def reduceAll(v: List[Double]): GeoMeanBuf =
        v.foldLeft(GeoMean.zero)(GeoMean.reduce)
      val merged = GeoMean.finish(GeoMean.merge(reduceAll(xs), reduceAll(ys)))
      val swapped = GeoMean.finish(GeoMean.merge(reduceAll(ys), reduceAll(xs)))
      val direct = GeoMean.finish(reduceAll(xs ++ ys))
      math.abs(merged - swapped) < 1e-9 * math.max(1.0, merged.abs) &&
        math.abs(merged - direct) < 1e-6 * math.max(1.0, merged.abs)
    }

  property("GeoMean of a constant is the constant") =
    forAll(Gen.chooseNum(0.01, 1e4), Gen.chooseNum(1, 50)) { (x, n) =>
      val buf = (1 to n).foldLeft(GeoMean.zero)((b, _) => GeoMean.reduce(b, x))
      math.abs(GeoMean.finish(buf) - x) < 1e-9 * x
    }

  property("GeoMean ignores non-positive values") =
    forAll(positives) { xs =>
      val withJunk = xs.flatMap(x => List(x, 0.0, -x))
      val a = withJunk.foldLeft(GeoMean.zero)(GeoMean.reduce)
      val b = xs.foldLeft(GeoMean.zero)(GeoMean.reduce)
      a == b
    }

  // Misra–Gries heavy-hitters summary: the invariant that makes the
  // sketch trustworthy is est ≤ true ≤ est + err for EVERY item, with
  // err ≤ n/(k+1), and it must hold for ANY split of the stream into
  // partially-aggregated parts (Spark merges partials in arbitrary
  // order). Skewed token alphabet so real evictions happen.
  private val tokenStream: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.const("hot"),
      3 -> Gen.oneOf("warm1", "warm2", "warm3"),
      2 -> Gen.chooseNum(0, 500).map(i => s"t$i")))

  property("MisraGries: est <= true <= est + err under arbitrary " +
    "partial-aggregation splits, err <= n/(k+1)") =
    forAll(tokenStream, Gen.chooseNum(0, 1000)) { (xs, cut) =>
      import graft.functions.{MisraGries, MGBuf}
      val k = MisraGries.Capacity
      val (l, r) = xs.splitAt(if (xs.isEmpty) 0 else cut % (xs.size + 1))
      def fold(v: List[String]): MGBuf =
        v.foldLeft(MGBuf(Map.empty, 0L))(MisraGries.add)
      val merged = MisraGries.merge(fold(l), fold(r))
      val exact = xs.groupBy(identity).view.mapValues(_.size.toLong)
      val errOk = merged.err <= xs.size.toLong / (k + 1)
      val invariant = exact.forall { case (t, tru) =>
        val est = merged.counts.getOrElse(t, 0L)
        est <= tru && tru <= est + merged.err
      }
      val noGhosts = merged.counts.keySet.subsetOf(exact.keySet.toSet)
      errOk && invariant && noGhosts && merged.counts.size <= k
    }

  // agg_ewma_ordered's hot-key escape hatch: the EWMA step is affine in
  // the accumulator, so per-segment (a, b) coefficients compose
  // associatively — a whale key's series can fold as chunked partials.
  // AnalyticsSpec checks this once on real data; here it's checked for
  // arbitrary series and arbitrary segmentation (incl. empty segments).
  private val series: Gen[List[Double]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-1e6, 1e6))

  property("EWMA affine segmentation: composed per-segment (a,b) " +
    "coefficients equal the direct sequential fold for any chunking") =
    forAll(series, Gen.chooseNum(1, 50)) { (xs, segLen) =>
      val direct = xs.tail.foldLeft(xs.head)((acc, x) => 0.1 * x + 0.9 * acc)
      val (aT, bT) = xs.grouped(segLen).map { seg =>
        seg.foldLeft((1.0, 0.0)) { case ((a, b), x) =>
          (0.9 * a, 0.1 * x + 0.9 * b)
        }
      }.reduce[(Double, Double)] { case ((a1, b1), (a2, b2)) =>
        (a2 * a1, a2 * b1 + b2)
      }
      val viaSegments = aT * xs.head + bT
      val scale = math.max(1.0, math.abs(direct))
      math.abs(viaSegments - direct) / scale < 1e-9
    }

  // dedup_containment's guarded pair loop: one sorted-merge intersection
  // with an early-abandon prune (stop once inter + the shorter remainder
  // cannot reach ceil(0.9·min)). The prune must be LOSSLESS for the
  // emitted threshold: every pair the naive set computation passes at
  // 10·inter >= 9·min must survive the pruned loop with the same
  // intersection count.
  private def prunedContainment(a: Array[Long], b: Array[Long])
      : Option[(Int, Int, Int)] = {
    val la = a.length; val lb = b.length
    val need = (9 * math.min(la, lb) + 9) / 10
    var i = 0; var j = 0; var inter = 0
    var feasible = true
    while (feasible && i < la && j < lb) {
      if (inter + math.min(la - i, lb - j) < need) feasible = false
      else {
        val x = a(i); val y = b(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
    }
    if (10L * inter >= 9L * math.min(la, lb)) Some((inter, la, lb)) else None
  }

  property("containment prune is lossless: pruned merge emits exactly " +
    "the naive-set pairs at 10·inter >= 9·min, with the true " +
    "intersection size") =
    forAll(sortedDistinct, sortedDistinct) { (a, b) =>
      (a.nonEmpty && b.nonEmpty) ==> {
        val trueInter = (a.toSet & b.toSet).size
        val passes = 10L * trueInter >= 9L * math.min(a.length, b.length)
        prunedContainment(a, b) match {
          case Some((inter, la, lb)) =>
            passes && inter == trueInter &&
              la == a.length && lb == b.length
          case None => !passes
        }
      }
    }

  // pack_spfhp's planning core, on ARBITRARY histograms (the PipelineSpec
  // reference fold only sees the corpus): histogram-batched SPFHP must
  // equal the per-doc fold exactly, conserve tokens against opened
  // capacity, and respect the bin-packing bounds.
  private val histGen: Gen[(Int, List[(Int, Long)])] = for {
    cap <- Gen.chooseNum(4, 64)
    nBins <- Gen.chooseNum(1, 12)
    bins <- Gen.listOfN(nBins, for {
      l <- Gen.chooseNum(1, cap)
      c <- Gen.chooseNum(0L, 40L)
    } yield (l, c))
  } yield (cap, bins.groupBy(_._1).view
    .mapValues(_.map(_._2).sum).toList)

  property("SPFHP histogram fold == per-doc fold; conserves tokens; " +
    "within bin-packing bounds") =
    forAll(histGen) { case (cap, hist) =>
      val (nPacks, dist) = graft.operators.Packing.spfhp(hist, cap)
      // per-doc reference: expand the histogram, longest first
      val lens = hist.filter(_._2 > 0).sortBy(-_._1)
        .flatMap { case (l, c) => List.fill(c.toInt)(l) }
      val open = scala.collection.mutable.TreeMap.empty[Int, Long]
      var ref = 0L
      lens.foreach { len =>
        open.rangeFrom(len).headOption match {
          case Some((space, n)) =>
            if (n == 1) open.remove(space) else open(space) = n - 1
            val left = space - len
            if (left > 0) open(left) = open.getOrElse(left, 0L) + 1
          case None =>
            ref += 1
            val left = cap - len
            if (left > 0) open(left) = open.getOrElse(left, 0L) + 1
        }
      }
      val refDist = (open.toMap + (0 -> (ref - open.values.sum)))
        .filter(_._2 > 0)
      val tot = lens.map(_.toLong).sum
      val nDocs = lens.length.toLong
      val sameFold = nPacks == ref && dist == refDist
      val conserved =
        dist.map { case (s, n) => s.toLong * n }.sum + tot == nPacks * cap
      val bounded = nDocs == 0 ||
        (nPacks >= (tot + cap - 1) / cap && nPacks <= nDocs)
      sameFold && conserved && bounded
    }

  // win_cusum_changepoint's window rewrite: the one-sided CUSUM
  // recurrence s_i = max(0, s_{i-1} + d_i) (no alarm reset) has the
  // closed form s_i = P_i - min(0, min_{j<=i} P_j) over prefix sums P —
  // that identity is what lets the query run as two ordered window
  // accumulations instead of a per-key sequential fold. Checked for
  // arbitrary deviation series.
  property("CUSUM closed form: P_i - min(0, running-min P) equals the " +
    "sequential max(0, s+d) recurrence at every step") =
    forAll(series) { ds =>
      val seq = ds.scanLeft(0.0)((s, x) => math.max(0.0, s + x)).tail
      val prefix = ds.scanLeft(0.0)(_ + _).tail
      val closed = prefix.zipWithIndex.map { case (p, i) =>
        p - math.min(0.0, prefix.take(i + 1).min)
      }
      seq.zip(closed).forall { case (a, b) =>
        math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(a))
      }
    }
}
