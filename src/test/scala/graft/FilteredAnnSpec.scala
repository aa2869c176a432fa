package graft

import org.apache.spark.sql.functions._

/** Filtered vector search: top-k among the rows matching a metadata
  * predicate. The two contracts worth pinning are (a) the IVF path's
  * recall against the exact filtered referee — a selective filter
  * decimates every probed cell, which is why the key widens nprobe —
  * and (b) the predicate actually PUSHING into the scans: a
  * post-ranking filter both wastes distance arithmetic and silently
  * under-fills k.
  */
class FilteredAnnSpec extends SparkSpec {

  test("every filtered result satisfies the predicate, and k is filled") {
    val labels = Tables(spark, sf, "embeddings")
      .select("vec_id", "label").collect()
      .map(r => r.getAs[Number](0).longValue() ->
        r.getAs[Number](1).longValue()).toMap
    Seq("simsearch_filtered_topk", "simsearch_ivf_filtered").foreach { k =>
      val rows = q(k).collect()
      assert(rows.nonEmpty, k)
      rows.foreach { r =>
        assert(labels(r.getLong(1)) % 2 === 0L,
          s"$k returned vec ${r.getLong(1)} outside the predicate")
      }
      // every query fills all 5 slots (the filtered corpus is ~half the
      // table — far more than k)
      val perQ = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
      assert(perQ.values.forall(_ === 5), s"$k under-filled k: $perQ")
    }
  }

  test("filtered IVF reaches recall@5 >= 0.9 vs the exact filtered " +
    "referee despite the filter decimating each probed cell") {
    val exact = q("simsearch_filtered_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = q("simsearch_ivf_filtered").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, f"filtered recall@5 = $recall%.3f")
  }

  test("constant probe widening collapses under a selective filter; " +
    "the selectivity-adaptive rule recovers recall@5 >= 0.9") {
    // one label ≈ 0.09 selectivity vs the production key's 0.5: each
    // probed cell keeps ~1/11 of its rows, so the old NProbe+2 constant
    // demonstrably under-probes, while the adaptive rule (nprobe =
    // NProbe/σ capped at the cell count) degrades to scanning every
    // cell's matching rows — the brute-force fallback a decimating
    // filter is supposed to trigger
    val labels = Seq(3)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = ids(queries.SimSearch.filteredExact(spark, sf, labels))
    val const = ids(queries.SimSearch
      .ivfFiltered(spark, sf, labels, adaptive = false))
    val adapt = ids(queries.SimSearch
      .ivfFiltered(spark, sf, labels, adaptive = true))
    val rConst = (exact & const).size.toDouble / exact.size
    val rAdapt = (exact & adapt).size.toDouble / exact.size
    assert(rConst < 0.9,
      f"constant widening reached recall $rConst%.3f — the failure " +
        "this fixture exists to exhibit has vanished (index layout " +
        "changed?)")
    assert(rAdapt >= 0.9,
      f"adaptive probing only reached recall $rAdapt%.3f")
  }

  test("the metadata predicate and the probe set push into the scans") {
    // referee: label IN (...) reaches the parquet scan as a pushed filter
    val bf = q("simsearch_filtered_topk")
      .queryExecution.executedPlan.toString
    assert(bf.contains("PushedFilters") && bf.contains("In(label"),
      "brute-force candidate scan must push the label IN filter")
    // IVF: the cell probe set is a PARTITION filter (the index is
    // cell-partitioned) and the label filter pushes into the data scan
    val ivf = q("simsearch_ivf_filtered")
      .queryExecution.executedPlan.toString
    assert(ivf.contains("PartitionFilters") && ivf.contains("cell"),
      "probed cells must prune index partitions")
    assert(ivf.contains("In(label"),
      "the label filter must push into the index scan")
  }
}
