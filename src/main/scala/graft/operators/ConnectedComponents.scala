package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by hash-min label propagation with
  * pointer jumping: every vertex starts at the minimum of itself and its
  * direct neighbors, then each round adopts the minimum label among its
  * neighbors AND resolves one extra hop through its current label
  * (`comp ← comp(comp(v))`). Each round is two keyed joins + one keyed
  * aggregation — no driver-side graph state, no adjacency materialization
  * beyond the edge list, so the shuffle-bound cost scales like any join
  * at 100 TB. Pointer jumping halves the remaining chain depth per round,
  * so convergence takes O(log diameter) rounds — a path graph of a
  * million vertices converges in ~20, not a million.
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
    while (changed > 0 && iter < maxIter) {
      val nbrMin = sym
        .join(labels.select(col("v").as("dst"), col("comp")), "dst")
        .groupBy("src").agg(min("comp").as("nbr_comp"))
      val step1 = labels
        .join(nbrMin.select(col("src").as("v"), col("nbr_comp")),
          Seq("v"), "left")
        .select(col("v"), col("comp").as("__c0"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("__c1"))
      // pointer jumping: comp ← comp(comp(v)). Every comp value is itself
      // a vertex id, so a self-join resolves one more hop — remaining
      // chain depth halves per round, O(log diameter) rounds total
      // instead of O(diameter).
      val ptr = step1.select(col("v").as("__pv"), col("__c1").as("__pc"))
      val jumped = least(col("__c1"), coalesce(col("__pc"), col("__c1")))
      // localCheckpoint (not persist): the self-join doubles the logical
      // plan per round — without truncating to a LogicalRDD the nested
      // tree grows 2^rounds and planning itself blows up on long chains.
      // LAZY (r19): the changed-count below is the round's first action
      // and materializes the checkpoint as a side effect — one job per
      // round instead of an eager materialization job plus a count job.
      // `updated` appears once in the count's plan, so nothing inside
      // the materializing job double-computes; the next round (and the
      // caller) then read the cached blocks. Block cleanup stays the
      // ContextCleaner's job.
      val updated = step1
        .join(ptr, col("__c1") === col("__pv"), "left")
        .select(col("v"), jumped.as("comp"),
          (jumped < col("__c0")).as("__chg"))
        .localCheckpoint(false)
      changed = updated.filter(col("__chg")).count()
      labels = updated.select("v", "comp")
      iter += 1
    }
    require(changed == 0,
      s"connected components did not converge in $maxIter iterations — " +
        "raise maxIter (diameter of the largest component exceeds the cap)")
    labels
  }
}
