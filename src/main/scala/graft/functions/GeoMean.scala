package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.B B41): geometric mean as an
  * `Aggregator[IN, BUF, OUT]`.
  *
  * The buffer is (Σ ln x, n) — partial-aggregatable, so Catalyst plans it
  * map-side-combined exactly like a built-in aggregate (no per-group row
  * materialization). Non-positive inputs are skipped (ln undefined).
  */
case class GeoMeanBuf(sumLog: Double, n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)
  override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf =
    if (x > 0.0) GeoMeanBuf(b.sumLog + math.log(x), b.n + 1) else b
  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf =
    GeoMeanBuf(a.sumLog + b.sumLog, a.n + b.n)
  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLog / b.n)
  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
