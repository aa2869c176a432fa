package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

/** Cross-engine zero-sign normalization for rounded float oracle columns.
  *
  * The r10 gate's only red row (`win_rolling_corr`) was an IEEE `-0.0`:
  * a tiny negative correlation rounds to `-0.0` in DuckDB but `+0.0` in
  * Spark — numerically equal (`-0.0 == 0.0`), but the driver's byte-level
  * hash compare differs. `x + 0.0` is the canonical IEEE-754 fix:
  * `-0.0 + 0.0 = +0.0`, every other value (incl. NULL propagation in SQL)
  * is unchanged.
  *
  * Convention, enforced by [[OracleLintSpec]]: every `round()`ed output
  * column whose argument can be negative (signed aggregates — corr/covar/
  * regr_slope/skewness/…, negated entropies, growth/diff ratios) appends
  * `+ 0.0` on BOTH the Spark Column side (via [[roundz]]) and the DuckDB
  * SQL twin (literal `+ 0.0` after the `round(...)`).
  */
object Rounding {
  /** `round(c, scale)` with `-0.0` normalized to `+0.0`. */
  def roundz(c: Column, scale: Int): Column = round(c, scale) + lit(0.0)
}
