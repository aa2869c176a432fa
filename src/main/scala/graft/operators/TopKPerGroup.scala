package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group by an ordering, as one keyed shuffle + one pass
  * (row_number over a partitioned window). The rank column is kept —
  * callers usually want it — under `rankCol`.
  *
  * The ordering must be total within a group (append a unique tie-break
  * column) or results are nondeterministic between runs; that contract is
  * the caller's, as with any rank-based top-k.
  */
object TopKPerGroup {

  def apply(df: DataFrame, k: Int, groupBy: Seq[Column], orderBy: Seq[Column],
      rankCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(groupBy: _*).orderBy(orderBy: _*)
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
