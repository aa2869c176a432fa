package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by hash-min label propagation: every
  * vertex starts as its own component, then repeatedly adopts the minimum
  * label among itself and its neighbors until a fixpoint. Each iteration
  * is one keyed join + one keyed aggregation — no driver-side graph state,
  * no adjacency materialization beyond the edge list, so the shuffle-bound
  * cost scales like any join at 100 TB. Convergence takes O(diameter)
  * iterations; near-dup clusters (the intended input: dedup candidate
  * pairs) have tiny diameters, so the default cap is generous.
  *
  * `localCheckpoint` truncates the lineage each round — without it the
  * plan doubles per iteration and the optimizer re-derives the whole
  * history every action.
  *
  * Input: `edges` with columns (src, dst) — treated as undirected.
  * Output: (v, comp) where comp is the minimum vertex id of v's component.
  * Vertices with no edges are not represented (a singleton is its own
  * trivial cluster).
  */
object ConnectedComponents {

  def apply(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the edge list once — every iteration joins against it,
    // and the upstream that produced it (e.g. a full near-dup pair
    // computation) must not be re-executed per round
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    // seed with the first hash-min step fused into initialization:
    // comp₀(v) = min(v, neighbors(v)) — same shuffle as a plain distinct,
    // one fewer propagation round (cliques, the near-dup common case,
    // then converge at the first confirmation)
    var labels = sym.groupBy(col("src").as("v"))
      .agg(min(col("dst")).as("__mind"))
      .select(col("v"), least(col("v"), col("__mind")).as("comp"))
    var changed = 1L
    var iter = 0
    var prev: Option[DataFrame] = None
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("v").as("dst"), col("comp")), "dst")
        .groupBy("src").agg(min("comp").as("nbr_comp"))
      val updated = labels
        .join(nbrMin.select(col("src").as("v"), col("nbr_comp")),
          Seq("v"), "left")
        .select(col("v"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("comp"),
          coalesce(col("nbr_comp") < col("comp"), lit(false)).as("__chg"))
        .persist()
      // the count is the single materializing action per round (the filter
      // touches every partition, so the full frame lands in the cache)
      changed = updated.filter(col("__chg")).count()
      prev.foreach(_.unpersist(false))
      prev = Some(updated)
      labels = updated.select("v", "comp")
      iter += 1
    }
    require(changed == 0,
      s"connected components did not converge in $maxIter iterations — " +
        "raise maxIter (diameter of the largest component exceeds the cap)")
    labels
  }
}
