package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketch as a typed `Aggregator` — the one-pass,
  * bounded-memory alternative to exact `percentile` at corpus scale.
  *
  * Exact quantiles need every value per group in one place (a sort or a
  * full collect_list); this digest keeps at most [[TDigest.Compression]]
  * weighted centroids per partial aggregate, merges associatively (so
  * Catalyst plans map-side combine like any built-in), and interpolates
  * quantiles from the cumulative centroid weights at finish. The shape is
  * a simplified t-digest (Dunning's merging digest): compression merges
  * the CLOSEST centroid pair first, so dense mid-distribution regions
  * collapse while sparse tails keep their resolution — which is exactly
  * where quantile sketches usually lose accuracy.
  *
  * Accuracy is spec-bounded (rank error vs the exact quantile), not
  * oracled: like HLL/CMS, the estimate is engine-specific by design.
  */
case class TDigestBuf(centroids: Seq[(Double, Long)])

object TDigest {
  /** Max centroids kept per buffer — memory is O(Compression), never O(n). */
  val Compression = 64
  /** Reduce-side slack before compressing (amortizes the sort). */
  val BufferSlack = 192

  /** Merge closest-pair-first until at most `Compression` centroids.
    * Returns a Vector so the aggregator's per-row `:+` stays effectively
    * O(1) after a compression (an ArraySeq/List result would put every
    * subsequent append back on the O(n) copy path).
    */
  def compress(cs: Seq[(Double, Long)]): Seq[(Double, Long)] = {
    if (cs.size <= Compression) return cs.sortBy(_._1).toVector
    val buf = scala.collection.mutable.ArrayBuffer.from(cs.sortBy(_._1))
    while (buf.size > Compression) {
      var best = 0
      var bestGap = Double.MaxValue
      var i = 0
      while (i < buf.size - 1) {
        val gap = buf(i + 1)._1 - buf(i)._1
        if (gap < bestGap) { bestGap = gap; best = i }
        i += 1
      }
      val (m1, w1) = buf(best)
      val (m2, w2) = buf(best + 1)
      val w = w1 + w2
      buf(best) = ((m1 * w1 + m2 * w2) / w, w)
      buf.remove(best + 1)
    }
    buf.toVector
  }

  /** Interpolated quantile from sorted centroids (weights as midpoints). */
  def quantile(cs: Seq[(Double, Long)], q: Double): Double = {
    if (cs.isEmpty) return Double.NaN
    val total = cs.map(_._2).sum.toDouble
    val target = q * total
    var cum = 0.0
    var i = 0
    while (i < cs.size) {
      val (mean, w) = cs(i)
      val mid = cum + w / 2.0
      if (target <= mid) {
        if (i == 0) return mean
        val (pm, pw) = cs(i - 1)
        val pmid = cum - pw / 2.0
        val frac = (target - pmid) / (mid - pmid)
        return pm + frac * (mean - pm)
      }
      cum += w
      i += 1
    }
    cs.last._1
  }
}

/** Digest aggregator emitting (q50, q90, q99) — extend the list to taste. */
object TDigestQuantile
    extends Aggregator[Double, TDigestBuf, Seq[Double]] {
  private val qs = Seq(0.5, 0.9, 0.99)

  // r19: Vector, not the default List — reduce appends once per ROW, and
  // List.:+ is O(n) (each append below the 192-centroid slack copied the
  // whole list; ~Slack²/2 cell copies per compression window across every
  // lineitem row). Same elements in the same order, so compress/quantile
  // are byte-identical; only the append cost changes.
  override def zero: TDigestBuf = TDigestBuf(Vector.empty)
  override def reduce(b: TDigestBuf, x: Double): TDigestBuf = {
    val cs = b.centroids :+ ((x, 1L))
    if (cs.size >= TDigest.BufferSlack) TDigestBuf(TDigest.compress(cs))
    else TDigestBuf(cs)
  }
  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf =
    TDigestBuf(TDigest.compress(a.centroids ++ b.centroids))
  override def finish(b: TDigestBuf): Seq[Double] = {
    val cs = TDigest.compress(b.centroids)
    qs.map(q => TDigest.quantile(cs, q))
  }
  override def bufferEncoder: Encoder[TDigestBuf] =
    Encoders.product[TDigestBuf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
