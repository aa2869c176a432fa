package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev utility: dump formatted physical plans for the named queries (or a
  * default headline set) against sf0.001 — the plan-review loop.
  *   runMain graft.PlanDump [query ...]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("join_sortmerge", "agg_groupby_multi", "simsearch_cosine_topk",
        "cities_count", "scan_xml_source_v2", "fn_map", "dedup_exact")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
      println(df.queryExecution.explainString(ExplainMode.fromString("formatted")))
    }
    spark.stop()
  }
}
