package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 2-D Pareto skyline (minimize x, maximize y): the points no other point
  * dominates — `b` dominates `a` iff x_b ≤ x_a ∧ y_b ≥ y_a with at least
  * one strict. Spark has no skyline operator; the distributed shape used
  * here relies on the algebraic fact skyline(P₁ ∪ P₂) =
  * skyline(skyline(P₁) ∪ skyline(P₂)):
  *
  *  1. each partition computes its LOCAL skyline with an O(n log n)
  *     sort-sweep (sort (x asc, y desc), keep the strictly-rising y
  *     frontier) — this is the mapPartitions-as-last-resort case the
  *     design brief reserves for genuine per-partition imperative logic;
  *  2. the survivor union (tiny: the local fronts) collapses to one
  *     partition for the identical global sweep.
  *
  * At 100 TB step 1 prunes ~everything partition-locally (a random
  * partition's front is O(log n) points in expectation), so the single
  * global pass sees per-partition fronts, not data. Ties: equal (x, y)
  * points are mutually non-dominating and ALL survive; a same-x lower-y
  * point is dominated and dropped.
  */
object Skyline {

  /** Sweep over (key, x, y) sorted by (x asc, y desc, key asc). */
  private def sweep(it: Iterator[(Long, Double, Double)])
      : Iterator[(Long, Double, Double)] = {
    var bestStrict = Double.NegativeInfinity // max y among strictly-smaller x
    var curX = Double.NaN
    var curGroupMaxY = Double.NegativeInfinity
    it.flatMap { case t @ (_, x, y) =>
      if (x != curX) {
        bestStrict = math.max(bestStrict, curGroupMaxY)
        curX = x
        curGroupMaxY = y // first of the x-group = its max y (sort order)
      }
      // survives iff it matches its x-group's best y (equal-(x,y) dups
      // included) and beats every strictly-smaller x's best y
      if (y == curGroupMaxY && y > bestStrict) Some(t) else None
    }
  }

  /** Pareto front of `df` projected to (keyCol, minimize xCol, maximize
    * yCol). Deterministic output order (x asc, y desc, key asc).
    */
  def pareto(spark: SparkSession, df: DataFrame, keyCol: String,
      xCol: String, yCol: String): DataFrame = {
    import spark.implicits._
    val pts = df.select(col(keyCol).cast("long"),
      col(xCol).cast("double"), col(yCol).cast("double"))
      .toDF("_1", "_2", "_3") // positional names so both sweeps sort alike
      .as[(Long, Double, Double)]
    val local = pts
      .repartition(spark.sparkContext.defaultParallelism)
      .sortWithinPartitions(col("_2").asc, col("_3").desc, col("_1").asc)
      .mapPartitions(sweep)
    local
      .repartition(1)
      .sortWithinPartitions(col("_2").asc, col("_3").desc, col("_1").asc)
      .mapPartitions(sweep)
      .toDF(keyCol, xCol, yCol)
  }
}
