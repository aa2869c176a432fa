package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bin-accelerated range join: match left "point" rows to right
  * [lo, hi] interval rows (inclusive bounds).
  *
  * Spark plans an inequality-only join condition as a broadcast
  * nested-loop join — every point row is tested against every interval,
  * O(|L|·|R|) work with the whole right side broadcast. Binning rewrites
  * it as an equi-join: each interval is replicated to every fixed-width
  * bin it overlaps, each point lands in exactly one bin, and the pair
  * can only match if they share a bin, so an equi-join on the bin key
  * followed by the residual BETWEEN filter is exact. Cost becomes one
  * keyed shuffle of |L| + |R|·(avg interval width / bin width) rows plus
  * the true match count — the shape that survives a 100 TB fact⨝fact
  * range join, where a nested loop is a non-starter.
  *
  * `bin` must be MONOTONE non-decreasing in the value (e.g. floor
  * division of epoch seconds by a window size); exactness then follows:
  * lo <= p <= hi implies bin(lo) <= bin(p) <= bin(hi), so every true
  * match shares a bin, and the residual filter on the ORIGINAL columns
  * removes same-bin non-matches at full precision. Bin width trades
  * replication (wide intervals ÷ small bins → many replicas) against
  * candidate density (large bins → more residual-filtered pairs); start
  * at the median interval width.
  *
  * Column names must be unique across the two inputs, and neither may
  * contain the reserved working column `__bin`.
  */
object RangeJoin {

  def binned(left: DataFrame, point: Column, right: DataFrame,
      lo: Column, hi: Column, bin: Column => Column): DataFrame = {
    require(!(left.columns ++ right.columns).contains("__bin"),
      "inputs must not use RangeJoin's reserved working column __bin")
    val lb = left.withColumn("__bin", bin(point).cast("long"))
    // reversed (lo > hi) or null-bounded intervals can never match the
    // residual, but `sequence` would happily DESCEND across a reversed
    // pair and replicate the row into |binLo-binHi|+1 junk bins — drop
    // such rows before the explode (inner-join-safe)
    val rb = right.where(lo <= hi).withColumn("__bin",
      explode(sequence(bin(lo).cast("long"), bin(hi).cast("long"))))
    lb.join(rb, Seq("__bin"))
      .where(point >= lo && point <= hi)
      .drop("__bin")
  }
}
