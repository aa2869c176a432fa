package graft.operators

import scala.collection.mutable

/** Shortest-pack-first histogram packing (SPFHP — Krell et al. 2021,
  * "Efficient Sequence Packing without Cross-contamination"): the
  * planning core of `pack_spfhp`, kept pure so GraftProperties can
  * exercise it on arbitrary histograms, not just the corpus.
  *
  * Semantics: documents are placed longest-length-first; each goes into
  * the MOST-FILLED open pack that still fits (= smallest remaining
  * space ≥ len), opening a new pack only when nothing fits. Same-space
  * placements are batched through the histogram count EXCEPT when the
  * filled pack could chain another doc of the same length
  * (space − len ≥ len): then placement is one-at-a-time, because the
  * just-filled pack becomes the new most-filled fit — batching there
  * diverges from true per-doc shortest-pack-first (caught by the
  * PipelineSpec reference fold).
  */
object Packing {

  /** @param hist (length, count) pairs, any order; lengths in [1, cap]
    * @return (total packs, leftover-space histogram including space 0)
    */
  def spfhp(hist: Seq[(Int, Long)], cap: Int): (Long, Map[Int, Long]) = {
    require(hist.forall { case (l, c) => l >= 1 && l <= cap && c >= 0 },
      s"lengths must lie in [1, $cap]")
    val open = mutable.TreeMap.empty[Int, Long]
    var nPacks = 0L
    hist.filter(_._2 > 0).sortBy(-_._1).foreach { case (len, cnt0) =>
      var cnt = cnt0
      while (cnt > 0) {
        open.rangeFrom(len).headOption match {
          case Some((space, n)) =>
            val left = space - len
            val use = if (left >= len) 1L else math.min(cnt, n)
            if (n == use) open.remove(space) else open(space) = n - use
            if (left > 0) open(left) = open.getOrElse(left, 0L) + use
            cnt -= use
          case None =>
            nPacks += 1
            val left = cap - len
            if (left > 0) open(left) = open.getOrElse(left, 0L) + 1
            cnt -= 1
        }
      }
    }
    val full = nPacks - open.values.sum
    val dist = (open.toMap + (0 -> full)).filter(_._2 > 0)
    (nPacks, dist)
  }
}
