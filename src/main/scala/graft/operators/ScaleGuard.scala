package graft.operators

import org.apache.spark.sql.DataFrame

/** Precondition for the intentionally-quadratic baseline operators (exact
  * pairwise Jaccard, exact pairwise embedding cosine): those exist as
  * oracle-able references for the approximate linear-scale twins, and an
  * O(n²) pass over a corpus-scale input is a mistake, not a slow query.
  * The guard fails fast with a pointer to the scale path instead.
  */
object ScaleGuard {

  /** Throws unless `df` has at most `limit` rows. The probe reads
    * `limit + 1` rows at most (LIMIT is pushed into the scan), so the
    * guard itself stays O(limit) regardless of the input size.
    */
  def requireAtMost(df: DataFrame, limit: Int, opName: String,
      alternative: String): Unit = {
    val n = df.limit(limit + 1).count()
    require(n <= limit,
      s"$opName is an exact O(n²) baseline guarded to <= $limit rows; " +
        s"this input exceeds that — use $alternative at corpus scale")
  }
}
