package graft

import org.apache.spark.sql.functions._

/** Batch 14b replays: effect sizes, Benjamini–Hochberg FDR, and the
  * retrieval ranking-metrics report card.
  */
class FdrEvalSpec extends SparkSpec {

  private lazy val pv = Tables.events(spark, sf)
    .filter(col("event_type").isin("purchase", "view"))
    .select("event_type", "value").collect()
    .map(r => (r.getString(0), r.getDouble(1)))

  test("agg_effect_size replays Cohen's d, Hedges' g, and the rank-sum " +
    "Cliff's delta") {
    val rows = q("agg_effect_size").collect()
    assert(rows.length === 1)
    val a = pv.filter(_._1 == "purchase").map(_._2)
    val b = pv.filter(_._1 == "view").map(_._2)
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    def varS(xs: Seq[Double]) = {
      val m = mean(xs); xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val (n1, n2) = (a.length, b.length)
    val sp = math.sqrt(((n1 - 1) * varS(a) + (n2 - 1) * varS(b)) /
      (n1 + n2 - 2))
    val dd = (mean(a) - mean(b)) / sp
    val g = dd * (1.0 - 3.0 / (4.0 * (n1 + n2) - 9))
    // Cliff's delta brute force, ties as zero contribution
    var gt = 0L; var ltc = 0L
    a.foreach(x => b.foreach { y =>
      if (x > y) gt += 1 else if (x < y) ltc += 1
    })
    val delta = (gt - ltc).toDouble / (n1.toLong * n2)
    val r = rows.head
    assert(r.getAs[Long]("n_purchase") === n1.toLong)
    assert(r.getAs[Long]("n_view") === n2.toLong)
    assert(math.abs(r.getAs[Double]("cohens_d") - dd) <= 1.5e-4)
    assert(math.abs(r.getAs[Double]("hedges_g") - g) <= 1.5e-4)
    assert(math.abs(r.getAs[Double]("cliffs_delta") - delta) <= 1.5e-4)
    // |g| < |d| always (the debias factor is < 1)
    assert(math.abs(r.getAs[Double]("hedges_g")) <=
      math.abs(r.getAs[Double]("cohens_d")) + 1e-9)
    assert(math.abs(delta) <= 1.0)
  }

  test("agg_benjamini_hochberg replays the per-type z, the A-S normal " +
    "tail, and the step-up rejection rule") {
    val rows = q("agg_benjamini_hochberg").collect()
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("value"),
        dayofweek(col("ts")).isin(1, 7).as("we")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getBoolean(2)))
    def stats(xs: Seq[Double]) = {
      val n = xs.size; val m = xs.sum / n
      (n.toDouble, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val phi: Double => Double = { z =>
      val az = math.abs(z)
      val k = 1.0 / (1.0 + 0.2316419 * az)
      val poly = k * (0.319381530 + k * (-0.356563782 +
        k * (1.781477937 + k * (-1.821255978 + k * 1.330274429))))
      2.0 * math.exp(-az * az / 2) / math.sqrt(2.0 * math.Pi) * poly
    }
    val expected = ev.groupBy(_._1).map { case (t, xs) =>
      val (nw, mw, vw) = stats(xs.filter(_._3).map(_._2))
      val (nd, md, vd) = stats(xs.filterNot(_._3).map(_._2))
      val z = (mw - md) / math.sqrt(vw / nw + vd / nd)
      (t, z, phi(z))
    }.toSeq.sortBy(e => (e._3, e._1))
    val m = expected.size
    assert(rows.length === m)
    rows.zip(expected.zipWithIndex).foreach {
      case (row, ((t, z, p), i)) =>
        assert(row.getString(0) === t, s"rank ${i + 1}")
        assert(math.abs(row.getAs[Double]("z_stat") - z) <= 1.5e-3)
        assert(math.abs(row.getAs[Double]("p_value") - p) <= 1.5e-5)
        assert(row.getAs[Long]("bh_rank") === (i + 1).toLong)
        assert(math.abs(row.getAs[Double]("bh_threshold") -
          (i + 1).toDouble / m * 0.10) <= 1.5e-4)
    }
    // step-up: rejected iff rank <= max{i: p_i <= i/m*q}
    val cutoff = expected.zipWithIndex
      .filter { case ((_, _, p), i) => p <= (i + 1).toDouble / m * 0.10 }
      .map(_._2 + 1).maxOption.getOrElse(0)
    rows.foreach { row =>
      assert(row.getAs[Boolean]("rejected") ===
        (row.getAs[Long]("bh_rank") <= cutoff))
    }
    // the fixture must exercise BOTH outcomes or the rule is untested
    assert(rows.exists(_.getAs[Boolean]("rejected")) ||
      cutoff === 0)
  }

  test("eval_ranking_metrics replays exact-cosine top-10 label-match " +
    "precision/RR/NDCG per query") {
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    val byLabel = vecs.groupBy(_._3).view.mapValues(_.size).toMap
    val rows = q("eval_ranking_metrics").collect()
    assert(rows.length === vecs.count(_._1 < 8))
    rows.foreach { row =>
      val qid = row.getLong(0)
      val (_, qv, qlabel) = vecs.find(_._1 == qid).get
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val top = vecs.filter(_._1 != qid).map { case (cid, cv, cl) =>
        val cos = qv.zip(cv).map { case (a, b) => a * b }.sum /
          (qn * math.sqrt(cv.map(x => x * x).sum))
        (cid, cl, cos)
      }.sortBy(t => (-t._3, t._1)).take(10)
      val rels = top.map(_._2 == qlabel)
      val nRel = rels.count(identity)
      assert(row.getInt(1) === qlabel)
      assert(row.getAs[Long]("n_rel_top10") === nRel.toLong)
      assert(math.abs(row.getAs[Double]("precision_at_10") -
        nRel / 10.0) <= 1.5e-4)
      val rr = rels.indexOf(true) match {
        case -1 => 0.0
        case i  => 1.0 / (i + 1)
      }
      assert(math.abs(row.getAs[Double]("reciprocal_rank") - rr) <= 1.5e-4)
      val dcg = rels.zipWithIndex.collect { case (true, i) =>
        1.0 / (math.log(i + 2) / math.log(2)) }.sum
      val rTotal = byLabel(qlabel) - 1
      val idcg = (1 to math.min(rTotal, 10)).map(i =>
        1.0 / (math.log(i + 1) / math.log(2))).sum
      assert(math.abs(row.getAs[Double]("ndcg_at_10") - dcg / idcg)
        <= 1.5e-4)
      assert(row.getAs[Double]("ndcg_at_10") >= 0.0 &&
        row.getAs[Double]("ndcg_at_10") <= 1.0 + 1e-9)
    }
  }
}
