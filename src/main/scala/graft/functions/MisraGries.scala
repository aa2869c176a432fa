package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable heavy-hitters summary (Misra–Gries) as a typed
  * `Aggregator` — the bounded-memory answer to "top tokens over a
  * corpus too big to count exactly".
  *
  * Exact top-k needs a full (token → count) aggregation whose
  * cardinality is data-sized; this summary keeps at most [[Capacity]]
  * counters per partial aggregate, merges associatively (Catalyst
  * plans map-side combine like any built-in agg), and carries the
  * classic MG guarantee through merges: for every item,
  * `est ≤ true ≤ est + err` where `err` is the summary's cumulative
  * decrement weight — itself bounded by n/(Capacity+1). Any item with
  * true count > err is therefore GUARANTEED present (its estimate
  * cannot have reached zero). Accuracy is spec-bounded against the
  * exact counts, not oracled: like HLL/CMS/t-digest, the per-run
  * estimates are summary-state-dependent by design.
  */
case class MGBuf(counts: Map[String, Long], err: Long)

case class MGItem(token: String, est: Long, err: Long)

object MisraGries {
  /** Counters kept per partial aggregate — memory O(Capacity), never
    * O(#distinct). 64 counters bound the undercount at n/65.
    */
  val Capacity = 64

  /** Fold one item into the summary: hit → increment; free slot →
    * insert; full → decrement ALL counters by 1 (dropping zeros) and
    * charge 1 to the error budget — the textbook MG step.
    */
  def add(b: MGBuf, tok: String): MGBuf =
    b.counts.get(tok) match {
      case Some(c) => MGBuf(b.counts.updated(tok, c + 1), b.err)
      case None if b.counts.size < Capacity =>
        MGBuf(b.counts.updated(tok, 1L), b.err)
      case None =>
        val dec = b.counts.view.mapValues(_ - 1).filter(_._2 > 0).toMap
        MGBuf(dec, b.err + 1)
    }

  /** Merge two summaries: sum counters, then if over capacity subtract
    * the (Capacity+1)-th largest count from every counter and drop the
    * non-positive ones (Agarwal et al.'s mergeable-summaries rule).
    * The subtracted offset joins the error budget, preserving
    * `est ≤ true ≤ est + err` for the merged summary.
    */
  def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val sum = b.counts.foldLeft(a.counts) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (sum.size <= Capacity) MGBuf(sum, a.err + b.err)
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)
        .apply(Capacity) // (Capacity+1)-th largest
      val kept = sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      MGBuf(kept, a.err + b.err + cut)
    }
  }
}

/** Aggregator emitting the top-10 surviving counters (est desc, token
  * asc) with the summary's error budget attached to every row.
  */
object MisraGriesTopK extends Aggregator[String, MGBuf, Seq[MGItem]] {
  override def zero: MGBuf = MGBuf(Map.empty, 0L)
  override def reduce(b: MGBuf, x: String): MGBuf = MisraGries.add(b, x)
  override def merge(a: MGBuf, b: MGBuf): MGBuf = MisraGries.merge(a, b)
  override def finish(b: MGBuf): Seq[MGItem] =
    b.counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(10)
      .map { case (t, c) => MGItem(t, c, b.err) }
  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[Seq[MGItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[MGItem]]()
}
