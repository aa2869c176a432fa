package graft

import org.apache.spark.sql.functions._

/** Batch 17 replays: Markov removal-effect attribution, dedup-aware
  * sampling weights, and the activity heatmap.
  */
class MarkovWeightsSpec extends SparkSpec {

  test("mine_attribution_markov replays the chain build and the " +
    "absorbing-chain removal effects") {
    val ev = Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2),
        r.getString(3)))
    // chain build: epoch framing identical to the linear-attribution spec
    val trans = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    ev.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      var epc = 0L
      val converted = scala.collection.mutable.Set.empty[Long]
      val byEp = scala.collection.mutable.Map
        .empty[Long, scala.collection.mutable.ArrayBuffer[String]]
      sorted.foreach { case (_, _, _, tpe) =>
        if (tpe == "purchase") { converted += epc; epc += 1 }
        else byEp.getOrElseUpdate(epc,
          scala.collection.mutable.ArrayBuffer.empty) += tpe
      }
      val eps = (byEp.keySet ++ converted).toSeq
      eps.foreach { e =>
        val touches = byEp.getOrElse(e,
          scala.collection.mutable.ArrayBuffer.empty[String])
        if (touches.isEmpty) {
          if (converted(e)) trans(("start", "conv")) += 1
        } else {
          trans(("start", touches.head)) += 1
          touches.sliding(2).filter(_.size == 2)
            .foreach(p => trans((p(0), p(1))) += 1)
          trans((touches.last,
            if (converted(e)) "conv" else "null")) += 1
        }
      }
    }
    val states = trans.keys.map(_._1).toSet - "start"
    val tot = trans.toSeq.groupBy(_._1._1).view
      .mapValues(_.map(_._2).sum).toMap
    def prob(a: String, b: String) =
      trans.get((a, b)).map(_.toDouble / tot(a)).getOrElse(0.0)
    def absorb(removed: Set[String]): Double = {
      val ts = ("start" +: states.toSeq.filterNot(removed)).distinct
      var p = ts.map(_ -> 0.0).toMap
      for (_ <- 1 to 200)
        p = ts.map { st =>
          st -> (ts.map(t2 => prob(st, t2) * p(t2)).sum + prob(st, "conv"))
        }.toMap
      p("start")
    }
    val p0 = absorb(Set.empty)
    val re = states.toSeq.sorted
      .map(ch => ch -> math.max(0.0, 1.0 - absorb(Set(ch)) / p0))
    val sumRe = re.map(_._2).sum
    val totalConv = trans.toSeq.filter(_._1._2 == "conv").map(_._2).sum
    val rows = q("mine_attribution_markov").collect()
    assert(rows.map(_.getString(0)).toSeq === re.map(_._1))
    rows.zip(re).foreach { case (r, (ch, eff)) =>
      assert(math.abs(r.getAs[Double]("removal_effect") - eff)
        <= 1.5e-4, ch)
      assert(math.abs(r.getAs[Double]("attribution_share") - eff / sumRe)
        <= 1.5e-4, ch)
      assert(math.abs(r.getAs[Double]("attributed_conversions") -
        totalConv * eff / sumRe) <= 1.5e-2, ch)
    }
    // shares form a distribution; base conversion prob is a probability
    assert(math.abs(rows.map(_.getAs[Double]("attribution_share")).sum
      - 1.0) <= 1e-3)
    assert(p0 > 0.0 && p0 <= 1.0)
  }

  test("sample_dedup_aware_weights conserves one unit of mass per " +
    "cluster and matches the CC clustering") {
    val rows = q("sample_dedup_aware_weights").collect()
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.length.toLong === nDocs)
    val nClusters = rows.map(_.getAs[Long]("cluster_id")).distinct.length
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - nClusters)
      <= 1e-3 * nClusters)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("weight") *
        r.getAs[Long]("cluster_size") - 1.0) <= 1e-3)
    }
    // docs that the near-dup pairing clusters must carry the same
    // cluster ids here; all other docs self-cluster with weight 1
    val cc = q("dedup_cluster_cc").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (doc, cid) = (r.getLong(0), r.getAs[Long]("cluster_id"))
      cc.get(doc) match {
        case Some(c) => assert(cid === c, doc)
        case None =>
          assert(cid === doc, doc)
          assert(r.getAs[Long]("cluster_size") === 1L, doc)
      }
    }
  }

  test("agg_activity_heatmap replays the Monday-based grid and its " +
    "share columns sum to one") {
    val ev = Tables.events(spark, sf).select("ts").collect()
      .map { r =>
        val z = r.getTimestamp(0).toInstant
          .atZone(java.time.ZoneOffset.UTC)
        (z.getDayOfWeek.getValue - 1, z.getHour)
      }
    val cells = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = q("agg_activity_heatmap").collect()
    assert(rows.length === cells.size)
    val total = ev.length.toDouble
    rows.foreach { r =>
      val k = (r.getInt(0), r.getInt(1))
      val n = r.getAs[Long]("n_events")
      assert(n === cells(k), k)
      assert(math.abs(r.getAs[Double]("pct_total") - n / total)
        <= 1.5e-4, k)
    }
    assert(math.abs(rows.map(_.getAs[Double]("pct_total")).sum - 1.0)
      <= 1e-2)
    rows.groupBy(_.getInt(0)).foreach { case (dow, rs) =>
      assert(math.abs(rs.map(_.getAs[Double]("pct_within_dow")).sum - 1.0)
        <= 1e-2, dow)
    }
  }
}
