package graft

import org.apache.spark.sql.functions._

/** MMR diversified re-ranking: the properties the oracle's
  * value-equality cannot judge — greedy step 1 must be the pure
  * relevance winner, and the selected set must actually be more
  * diverse than the cosine top-5 it replaces (lower max pairwise
  * similarity on average; per-query a slight increase is legal, MMR
  * trades diversity against relevance, so the strict claim is the
  * mean plus a majority of queries).
  */
class MmrSpec extends SparkSpec {

  test("step 1 is the relevance top-1; the MMR set is more diverse " +
    "than the cosine top-5 on average and for most queries") {
    val emb = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Number](0).longValue() ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Long, b: Long): Double = {
      val (x, y) = (emb(a), emb(b))
      var d = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < x.length) {
        d += x(i) * y(i); nx += x(i) * x(i); ny += y(i) * y(i); i += 1
      }
      d / math.sqrt(nx * ny)
    }
    def maxPair(s: Seq[Long]): Double =
      (for (i <- s.indices; j <- i + 1 until s.size)
        yield cos(s(i), s(j))).max
    val mmr = q("search_mmr_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._3).map(_._2).toSeq).toMap
    val qids = mmr.keySet.toSeq.sorted
    assert(qids.size === 8 && mmr.values.forall(_.size == 5))
    val top5 = qids.map { qid =>
      qid -> emb.keys.filter(_ != qid).toSeq
        .map(v => (-cos(qid, v), v)).sorted.take(5).map(_._2)
    }.toMap
    qids.foreach { qid =>
      assert(mmr(qid).head === top5(qid).head,
        s"query $qid: greedy step 1 must be the relevance winner")
    }
    val mDiv = qids.map(qid => maxPair(mmr(qid)))
    val tDiv = qids.map(qid => maxPair(top5(qid)))
    assert(mDiv.sum / mDiv.size < tDiv.sum / tDiv.size,
      f"MMR must lower the mean max pairwise similarity " +
        f"(${mDiv.sum / mDiv.size}%.4f vs ${tDiv.sum / tDiv.size}%.4f)")
    val wins = qids.count(qid =>
      maxPair(mmr(qid)) < maxPair(top5(qid)))
    assert(wins * 2 > qids.size,
      s"MMR must win diversity on a majority of queries ($wins/8)")
  }
}
