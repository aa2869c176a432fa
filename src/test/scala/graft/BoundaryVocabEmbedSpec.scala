package graft

import org.apache.spark.sql.functions._

/** Batch 15 replays: boundary-overlap stitching detection, Heaps-law
  * vocabulary growth, and the exact-duplicate embedding census.
  */
class BoundaryVocabEmbedSpec extends SparkSpec {

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("bve_spec").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("dedup_boundary_overlap replays the head/tail join on the fixture " +
    "and finds a planted chunk seam") {
    // fixture replay: the query's pair set must equal the driver's
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).toLowerCase.split(" ")))
      .filter(_._2.length >= 8)
    val heads = docs.map { case (id, t) => (t.take(4).mkString(" "), id) }
    val tails = docs.map { case (id, t) => (t.takeRight(4).mkString(" "), id) }
    val expect = (for {
      (tb, pa) <- tails
      (hb, nb) <- heads
      if tb == hb && pa != nb
    } yield (pa, nb, tb)).toSet
    val got = q("dedup_boundary_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got === expect)

    // planted seam: doc 2's first 4 tokens are doc 1's last 4
    import spark.implicits._
    val dir = freshDir()
    Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "src0", 46L),
      (2L, "epsilon zeta eta theta iota kappa lambda mu", "en", "src1", 44L),
      (3L, "nu xi omicron pi rho sigma tau upsilon", "en", "src2", 38L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val planted = SparkEntry.queries("dedup_boundary_overlap")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted === Set((1L, 2L)))
  }

  test("text_vocab_growth replays first-seen bigrams, cumulative axes, " +
    "and the Heaps log-log slope") {
    val docs = Tables(spark, sf, "documents")
      .select("source", "text").collect()
      .map(r => (r.getString(0).drop(3).toInt,
        r.getString(1).toLowerCase.split(" ")))
    val firstSrc = scala.collection.mutable.Map.empty[(String, String), Int]
    docs.foreach { case (src, t) =>
      t.sliding(2).filter(_.length == 2).foreach { p =>
        val k = (p(0), p(1))
        if (!firstSrc.contains(k) || firstSrc(k) > src) firstSrc(k) = src
      }
    }
    val newVocab = firstSrc.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val nTok = docs.groupBy(_._1).view
      .mapValues(_.map(_._2.length.toLong).sum).toMap
    val axis = nTok.keys.toSeq.sorted
    var (ct, cv) = (0L, 0L)
    val pts = axis.map { s =>
      ct += nTok(s); cv += newVocab(s)
      (s, nTok(s), newVocab(s), ct, cv)
    }
    val lnN = pts.map(p => math.log(p._4.toDouble)) // x: ln cum_tokens
    val lnV = pts.map(p => math.log(p._5.toDouble)) // y: ln cum_vocab
    val mx = lnN.sum / lnN.size
    val my = lnV.sum / lnV.size
    val beta = lnN.zip(lnV).map { case (x, y) => (x - mx) * (y - my) }.sum /
      lnN.map(x => (x - mx) * (x - mx)).sum
    val rows = q("text_vocab_growth").collect()
    assert(rows.length === axis.length)
    rows.zip(pts).foreach { case (r, (s, nt, nv, cumT, cumV)) =>
      assert(r.getInt(0) === s)
      assert(r.getAs[Long]("n_tokens") === nt, s)
      assert(r.getAs[Long]("new_vocab") === nv, s)
      assert(r.getAs[Long]("cum_tokens") === cumT, s)
      assert(r.getAs[Long]("cum_vocab") === cumV, s)
      assert(math.abs(r.getAs[Double]("heaps_beta") - beta) <= 1.5e-3, s)
    }
    // cumulative vocabulary is monotone and ends at the full vocab size
    assert(pts.last._5 === firstSrc.size.toLong)
  }

  test("dedup_embedding_exact counts planted duplicate vectors and " +
    "reports a clean census on the fixture") {
    // fixture: no exact dups by construction — census must say so
    val base = Tables(spark, sf, "embeddings")
    val perLabel = base.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    q("dedup_embedding_exact").collect().foreach { r =>
      val l = r.getLong(0)
      assert(r.getAs[Long]("n_vecs") === perLabel(l), l)
      assert(r.getAs[Long]("n_distinct") === perLabel(l), l)
      assert(r.getAs[Long]("n_dup_vecs") === 0L, l)
      assert(r.getAs[Long]("max_group") === 1L, l)
    }

    // planted: re-ingest every 5th vector under a new id — the census
    // must count exactly those as duplicates, in the right label rows
    val dir = freshDir()
    val dups = base.filter(col("vec_id") % 5 === 0)
      .withColumn("vec_id", col("vec_id") + 1000000L)
    base.unionAll(dups).write.mode("overwrite")
      .parquet(s"$dir/embeddings.parquet")
    val plantedPerLabel = dups.groupBy(col("label").cast("long").as("label"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap.withDefaultValue(0L)
    SparkEntry.queries("dedup_embedding_exact")(spark, dir)
      .collect().foreach { r =>
        val l = r.getLong(0)
        assert(r.getAs[Long]("n_dup_vecs") === plantedPerLabel(l), l)
        assert(r.getAs[Long]("n_vecs") ===
          perLabel(l) + plantedPerLabel(l), l)
        assert(r.getAs[Long]("max_group") ===
          (if (plantedPerLabel(l) > 0) 2L else 1L), l)
      }
  }
}
