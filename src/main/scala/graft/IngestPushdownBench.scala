package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic main (PERF.md evidence): the tag-filter pushdown delta on
  * the staged bulk XML corpus, measured APPLES TO APPLES — the V2 source
  * with and without the `tag = 'LangCd'` predicate reaching the StAX
  * loop. The pushdown cannot skip tokenizing bytes (StAX still walks the
  * whole document), so the saving is in what it never does for the 24/27
  * non-matching elements per filing: no text buffering, no TagText
  * allocation, no InternalRow, no downstream pipeline row. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=… runMain graft.IngestPushdownBench
  */
object IngestPushdownBench {
  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }
  private def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[32]"))
      .appName("graft-ingest-pushdown")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val dir = graft.queries.Ingest.ensureBulkStaged(s, d)
    def v2(filtered: Boolean) = {
      val df = s.read.format("graft.sources.XmlManifestSource")
        .option("manifest", s"$dir/manifest.txt")
        .option("partitions", "32")
        .load()
      (if (filtered) df.filter(col("tag") === "LangCd") else df).count()
    }
    v2(filtered = false); v2(filtered = true) // warm both plans
    val off = (1 to 3).map(_ => timed(v2(filtered = false)))
    val on = (1 to 3).map(_ => timed(v2(filtered = true)))
    println(s"""{"sf":"$d","v2_full_sec":${f"${median(off)}%.2f"},""" +
      s""""v2_pushdown_sec":${f"${median(on)}%.2f"},""" +
      s""""speedup":${f"${median(off) / median(on)}%.2f"}}""")
    s.stop()
  }
}
