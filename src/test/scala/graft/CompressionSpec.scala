package graft

import org.apache.spark.sql.functions._

/** Batch 13d replays: zlib compressibility (exact per-doc Deflater
  * replay), the new-vs-returning split and the embedding cohesion
  * histogram.
  */
class CompressionSpec extends SparkSpec {

  private def deflateRatio(t: String): Double = {
    val bytes = t.getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val defl = new java.util.zip.Deflater(6)
    val dos = new java.util.zip.DeflaterOutputStream(bos, defl)
    dos.write(bytes); dos.close(); defl.end()
    bos.size.toDouble / math.max(1, bytes.length)
  }

  test("text_compression_ratio replays the identical Deflater fold, and " +
    "a planted repetitive string compresses below prose") {
    val out = q("text_compression_ratio").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), deflateRatio(r.getString(1))))
    val byLang = docs.groupBy(_._1)
    assert(out.map(_._1).toSet === byLang.keySet)
    out.foreach { case (lang, n, avgR, minR, nRep) =>
      val rs = byLang(lang).map(_._2)
      assert(n === rs.length.toLong, lang)
      assert(math.abs(avgR - rs.sum / rs.size) <= 1.5e-4, lang)
      assert(math.abs(minR - rs.min) <= 1.5e-4, lang)
      assert(nRep === rs.count(_ < 0.3).toLong, lang)
      assert(avgR > 0.0 && avgR < 1.1, lang)
    }
    // sanity of the signal itself: heavy repetition compresses far
    // below natural prose of the same length
    val prose = docs.map(_._2).max
    assert(deflateRatio("spam " * 2000) < 0.05)
    assert(deflateRatio("spam " * 2000) < prose)
  }

  test("agg_new_vs_returning: the split tiles each day's actives and " +
    "day one is 100% new") {
    val out = q("agg_new_vs_returning").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    val du = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val firstDay = du.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val sorted = out.sortBy(_._1.toEpochDay)
    assert(sorted.head._3 === 0L, "first day cannot have returning users")
    assert(sorted.head._4 === 100.0)
    out.foreach { case (day, nNew, nRet, pct) =>
      val actives = du.filter(_._1 == day).map(_._2)
      assert(nNew + nRet === actives.length.toLong, s"$day tiling")
      assert(nNew === actives.count(u => firstDay(u) == day).toLong, s"$day")
      assert(math.abs(pct - 100.0 * nNew.toDouble / (nNew + nRet))
        <= 1.5e-2, s"$day")
    }
    // every user is new exactly once across the whole report
    assert(out.map(_._2).sum === firstDay.size.toLong)
  }

  test("embedding_cohesion_hist: bins tile the corpus, cosines live in " +
    "[-1, 1], and a driver recompute lands in the same bins") {
    val out = q("embedding_cohesion_hist").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    assert(out.map(_._3).sum === vecs.length.toLong)
    out.foreach { case (_, bin, _, avgCos) =>
      assert(bin >= -10 && bin <= 10)
      assert(avgCos >= -1.0 && avgCos <= 1.0001)
      // the bin's average must sit inside the bin's own edges
      assert(avgCos >= bin / 10.0 - 1e-9 &&
        avgCos <= (bin + 1) / 10.0 + 1e-9)
    }
    val cents = vecs.groupBy(_._2).view.mapValues { vs =>
      val dims = vs.head._3.length
      Array.tabulate(dims)(i => vs.map(_._3(i)).sum / vs.size)
    }.toMap
    val expected = vecs.map { case (_, lab, v) =>
      val c = cents(lab)
      val dot = v.zip(c).map { case (a, b) => a * b }.sum
      val cos = dot / (math.sqrt(v.map(x => x * x).sum) *
        math.sqrt(c.map(x => x * x).sum))
      // the query quantizes to integer ten-thousandths (order-free
      // exact sums); replay the same grid
      val c4 = BigDecimal(cos * 10000).setScale(0,
        BigDecimal.RoundingMode.HALF_UP).toLong
      (lab, math.floor(c4 / 1000.0).toInt)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = out.map(r => ((r._1, r._2), r._3)).toMap
    assert(got === expected.map { case ((l, b), n) => ((l, b), n) })
  }
}
