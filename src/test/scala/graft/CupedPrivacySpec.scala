package graft

import org.apache.spark.sql.functions._

/** Driver-side replays for batch 13a: CUPED adjustment, Cohen's kappa,
  * l-diversity, token burstiness and interval-union merging. Each test
  * recomputes the closed form independently (plain Scala over collected
  * sf0.001 rows) and checks the distributed result against it — the
  * DuckDB oracle covers cross-engine value equality at sf0.01; these
  * cover "the formula is the one we claim" with an implementation that
  * shares no Spark code with the query.
  */
class CupedPrivacySpec extends SparkSpec {

  private def md5Grp(userId: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(userId.toString.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString
    if (hex.charAt(0).toInt % 2 == 0) "A" else "B"
  }

  test("agg_cuped_adjustment replays the pooled-theta closed form and " +
    "conserves users and the pooled mean") {
    val out = q("agg_cuped_adjustment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.map(_._1).toSeq === Seq("A", "B"))

    // the query's cut is '2024-01-16' in the UTC session zone — compare
    // on the epoch so the replay is immune to the JVM default timezone
    val cutMs = java.time.Instant.parse("2024-01-16T00:00:00Z")
      .toEpochMilli
    val um = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("value")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      .groupBy(_._1).map { case (u, rows) =>
        val pre = rows.filter(_._2.getTime < cutMs).map(_._3).sum
        val post = rows.filter(_._2.getTime >= cutMs).map(_._3).sum
        (u, pre, post)
      }.toSeq
    val n = um.size.toDouble
    val muPre = um.map(_._2).sum / n
    val muPost = um.map(_._3).sum / n
    val theta = um.map(t => (t._2 - muPre) * (t._3 - muPost)).sum /
      um.map(t => (t._2 - muPre) * (t._2 - muPre)).sum
    val byGrp = um.groupBy(t => md5Grp(t._1))
    Seq("A", "B").zip(out).foreach { case (g, row) =>
      val rows = byGrp(g)
      val adj = rows.map(t => t._3 - theta * (t._2 - muPre))
      val post = rows.map(_._3)
      def meanOf(xs: Seq[Double]) = xs.sum / xs.size
      def varOf(xs: Seq[Double]) = {
        val m = meanOf(xs); xs.map(x => (x - m) * (x - m)).sum / xs.size
      }
      assert(row._2 === rows.size.toLong)
      assert(math.abs(row._3 - meanOf(post)) <= 1.5e-4, s"mean_post $g")
      assert(math.abs(row._4 - meanOf(adj)) <= 1.5e-4, s"mean_adj $g")
      assert(math.abs(row._5 - varOf(post)) <= 0.02, s"var_post $g")
      assert(math.abs(row._6 - varOf(adj)) <= 0.02, s"var_adj $g")
    }
    // CUPED must not move the measurement: the user-weighted mean of the
    // adjusted metric equals the raw pooled mean (E[pre - mu_pre] = 0)
    val pooledAdj = out.map(r => r._2 * r._4).sum / out.map(_._2).sum
    assert(math.abs(pooledAdj - muPost) <= 1e-3)
    // CUPED's guarantee is POOLED: theta is the OLS argmin over the whole
    // population, so pooled var(adj) <= pooled var(post) by construction.
    // A single arm CAN get worse (it does at sf0.001 in arm A — theta is
    // fit pooled, not per-arm), so no per-arm claim is made.
    def pooledVar(f: ((Long, Double, Double)) => Double): Double = {
      val xs = um.map(f)
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val vPost = pooledVar(_._3)
    val vAdj = pooledVar(t => t._3 - theta * (t._2 - muPre))
    assert(vAdj <= vPost + 1e-9, "pooled CUPED variance must not grow")
  }

  test("quality_rater_kappa: cells partition each language and kappa " +
    "replays the (po - pe)/(1 - pe) closed form") {
    val out = q("quality_rater_kappa").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("n_chars"), col("text")).collect()
      .map { r =>
        val ra = r.getLong(1) >= 300
        val rb = r.getString(2).toLowerCase.split(" ", -1).length >= 55
        (r.getString(0), ra, rb)
      }
    out.foreach { case (lang, n, n11, n10, n01, n00, kappa) =>
      assert(n === n11 + n10 + n01 + n00, s"cells don't tile $lang")
      val ds = docs.filter(_._1 == lang)
      assert(n === ds.length.toLong)
      assert(n11 === ds.count(d => d._2 && d._3).toLong)
      assert(n00 === ds.count(d => !d._2 && !d._3).toLong)
      val nD = n.toDouble
      val po = (n11 + n00) / nD
      val pe = ((n11 + n10) / nD) * ((n11 + n01) / nD) +
        ((n01 + n00) / nD) * ((n10 + n00) / nD)
      assert(math.abs(kappa - (po - pe) / (1.0 - pe)) <= 1.5e-4, lang)
      assert(kappa >= -1.0 && kappa <= 1.0)
    }
  }

  test("pii_l_diversity: QI groups partition the customer table, l is " +
    "bounded by the band alphabet, and release implies k AND l") {
    val out = q("pii_l_diversity").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(out.nonEmpty)
    val total = Tables.customer(spark, sf).count()
    assert(out.map(_._3).sum === total, "QI groups must tile the table")
    out.foreach { case (_, _, k, l, released) =>
      assert(l >= 1 && l <= 4)
      assert(l <= k)
      assert(released === (k >= 5 && l >= 3))
    }
    // the audit must be non-trivial on this data: both verdicts occur
    assert(out.exists(_._5) && out.exists(!_._5))
  }

  test("text_burstiness replays the variance-to-mean fold and orders by " +
    "document frequency") {
    val out = q("text_burstiness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    assert(out.map(_._2).toSeq === out.map(_._2).toSeq.sortBy(-_))
    val counts = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        r.getString(1).toLowerCase.split(" ", -1)
          .groupBy(identity).map { case (t, o) =>
            (t, o.length) }
      }
    val byTok = counts.groupBy(_._1)
    out.foreach { case (tok, df, meanC, burst) =>
      val cs = byTok(tok).map(_._2.toDouble).toSeq
      assert(df === cs.size.toLong, tok)
      assert(df >= 50)
      val m = cs.sum / cs.size
      val v = cs.map(c => (c - m) * (c - m)).sum / cs.size
      assert(math.abs(meanC - m) <= 1.5e-4, tok)
      assert(math.abs(burst - v / m) <= 1.5e-4, tok)
      assert(burst >= 0.0)
    }
  }

  test("win_interval_merge replays a driver-side sweep over every user") {
    val out = q("win_interval_merge").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.nonEmpty)
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("st")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(out.map(_._1).toSet === ev.keySet)
    out.foreach { case (u, nSpans, covered, longest, maxEv) =>
      val iv = ev(u).sortBy(t => (t._3, t._2)).map(t => (t._3, t._3 + 1800L))
      // sweep: a new span opens when the start clears every prior end
      var spans = List.empty[(Long, Long, Long)] // (s0, e1, nEv)
      iv.foreach { case (s, e) =>
        spans match {
          case (s0, e1, k) :: rest if s < e1 =>
            spans = (s0, math.max(e1, e), k + 1) :: rest
          case _ => spans = (s, e, 1L) :: spans
        }
      }
      assert(nSpans === spans.size.toLong, s"user $u")
      assert(covered === spans.map(sp => sp._2 - sp._1).sum, s"user $u")
      assert(longest === spans.map(sp => sp._2 - sp._1).max, s"user $u")
      assert(maxEv === spans.map(_._3).max, s"user $u")
      assert(covered >= longest && longest >= 1800L)
    }
  }
}
