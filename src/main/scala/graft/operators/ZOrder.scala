package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data clustering.
  *
  * Sorting a table by one column gives min/max file- and row-group
  * skipping on that column only — a predicate on any other column reads
  * everything. Interleaving the bits of two dimensions into one sort key
  * makes files cover small RECTANGLES of the value space instead of
  * stripes, so selective predicates on either dimension (or both) touch
  * a fraction of the files. This is the standard clustering layout for
  * multi-tenant scans at warehouse scale; the curve is built here from
  * plain bitwise built-ins, so the whole sort key stays inside
  * whole-stage codegen.
  *
  * Values are clamped to [0, 2^bits) — callers normalize dimensions
  * (e.g. floor a double, bucket a timestamp) before interleaving;
  * clamping keeps outliers at the curve's edge rather than wrapping.
  */
object ZOrder {

  /** Morton code of two non-negative dimensions, `2*bits` wide:
    * bit i of x lands at position 2i, bit i of y at 2i+1.
    */
  def interleave(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    def clamp(c: Column) =
      least(greatest(c.cast("long"), lit(0L)), lit((1L << bits) - 1))
    val xs = clamp(x)
    val ys = clamp(y)
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }
}
