package graft

import org.apache.spark.sql.functions._

/** Batch 26 replays: time-decay attribution and the correlation matrix.
  */
class DecayCorrSpec extends SparkSpec {

  test("mine_attribution_decay conserves one credit per converted path " +
    "and replays the half-life weights") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000,
        r.getLong(2), r.getString(3)))
    val lam = -8.022536812036404e-6
    val credit = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    val nTouch = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    var nPaths = 0L
    ev.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var epc = 0L
      val touches = scala.collection.mutable.ArrayBuffer
        .empty[(Long, String, Long)] // (ep, type, sec)
      val convSec = scala.collection.mutable.Map.empty[Long, Long]
      sorted.foreach { case (_, sec, _, tpe) =>
        if (tpe == "purchase") { convSec(epc) = sec; epc += 1 }
        else touches += ((epc, tpe, sec))
      }
      touches.groupBy(_._1).foreach { case (e, ts) =>
        convSec.get(e).foreach { cs =>
          nPaths += 1
          val ws = ts.map(t => (t._2, math.exp(lam * (cs - t._3))))
          val sw = ws.map(_._2).sum
          ws.foreach { case (tpe, w) =>
            credit(tpe) += w / sw; nTouch(tpe) += 1
          }
        }
      }
    }
    val rows = q("mine_attribution_decay").collect()
    assert(rows.map(_.getString(0)).toSeq === credit.keys.toSeq.sorted)
    rows.foreach { r =>
      val tpe = r.getString(0)
      assert(r.getAs[Long]("n_touches") === nTouch(tpe), tpe)
      assert(math.abs(r.getAs[Double]("decay_credit") - credit(tpe))
        <= 1.5e-3, tpe)
    }
    // conservation: total credit equals the number of converted paths
    assert(math.abs(rows.map(_.getAs[Double]("decay_credit")).sum -
      nPaths) <= 0.01 * nPaths + 0.01)
    assert(nPaths > 0)
  }

  test("agg_corr_matrix replays all six Pearson pairs and stays in " +
    "[-1, 1]") {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val data = Tables(spark, sf, "lineitem").select(cols.map(col): _*)
      .collect().map(r => cols.indices.map(r.getDouble).toArray)
    def pearson(i: Int, j: Int): Double = {
      val (xs, ys) = (data.map(_(i)), data.map(_(j)))
      val (mx, my) = (xs.sum / xs.length, ys.sum / ys.length)
      val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
      cov / math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
        ys.map(y => (y - my) * (y - my)).sum)
    }
    val r = q("agg_corr_matrix").collect()(0)
    assert(r.getAs[Long]("n_rows") === data.length.toLong)
    val expect = Seq("qty_price" -> (0, 1), "qty_discount" -> (0, 2),
      "qty_tax" -> (0, 3), "price_discount" -> (1, 2),
      "price_tax" -> (1, 3), "discount_tax" -> (2, 3))
    expect.foreach { case (name, (i, j)) =>
      val v = r.getAs[Double](name)
      assert(math.abs(v - pearson(i, j)) <= 1.5e-3, name)
      assert(v >= -1.0 && v <= 1.0, name)
    }
  }
}
