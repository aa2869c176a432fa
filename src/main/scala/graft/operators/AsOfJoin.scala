package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for every left row, the single most recent right row
  * with `rightTs <= leftTs` for the same key (optionally bounded by a
  * tolerance). Spark has no native ASOF JOIN; the canonical Spark-shaped
  * rewrite is a range join followed by `row_number() = 1` over
  * (left key, right ts desc) — Catalyst plans the range join as a regular
  * equi-join on the keys with the time bound as a post-condition, so the
  * shuffle is keyed and scales like any other join.
  *
  * Determinism: ties on `rightTs` break by `tieBreak` (descending), so two
  * right rows at the same instant always resolve the same way.
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, leftTs: Column, rightTs: Column, tieBreak: Column,
      tolerance: Option[Column] = None): DataFrame = {
    val bound = tolerance match {
      case Some(tol) => rightTs <= leftTs && rightTs >= leftTs - tol
      case None => rightTs <= leftTs
    }
    // per-row id, not the left's columns: duplicate left rows must each
    // keep their own match (partitioning by value columns would collapse
    // identical left rows into one output row)
    val tagged = left.withColumn("__asof_id", monotonically_increasing_id())
    val joined = tagged.join(right, leftKey === rightKey && bound, "left")
    val w = Window.partitionBy(col("__asof_id"))
      .orderBy(rightTs.desc, tieBreak.desc)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn", "__asof_id")
  }
}
