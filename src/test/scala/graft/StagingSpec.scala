package graft

import org.apache.spark.sql.functions._

/** Refresh contract for staged derived artifacts (IVF cells, PQ codes,
  * near-dup edges): an index keyed only by dataset dir would silently
  * serve codes trained on a PREVIOUS corpus after the source table
  * changes. `Staging.fingerprint` (metadata-only: file path+length+mtime,
  * never a data read) stamps every staged layout; a mismatch rebuilds.
  */
class StagingSpec extends SparkSpec {

  private def freshDir(): String = {
    val f = java.nio.file.Files.createTempDirectory("graft_staging_spec")
    f.toFile.deleteOnExit()
    f.toString
  }

  private def writeEmb(dir: String, n: Int): Unit =
    Tables(spark, sf, "embeddings").filter(col("vec_id") < n)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  test("fingerprint is stable across calls on an unchanged source and " +
    "moves when the source is rewritten") {
    val dir = freshDir()
    writeEmb(dir, 32)
    val src = s"$dir/embeddings.parquet"
    val f1 = Staging.fingerprint(spark, src)
    assert(f1 === Staging.fingerprint(spark, src))
    writeEmb(dir, 48) // different rows → different data files
    assert(Staging.fingerprint(spark, src) !== f1)
  }

  test("a changed embeddings corpus rebuilds the PQ code index (and an " +
    "unchanged corpus does NOT re-stage)") {
    val dir = freshDir()
    writeEmb(dir, 40)
    val p = queries.SimSearch.pqStaged(spark, dir)
    assert(spark.read.parquet(s"$p/index").count() === 40L)
    // unchanged corpus: the second call must be a no-op — parquet
    // overwrite generates fresh part-file names, so an identical file
    // set proves no rewrite happened
    val files1 = new java.io.File(s"$p/index").list().sorted.toSeq
    queries.SimSearch.pqStaged(spark, dir)
    assert(new java.io.File(s"$p/index").list().sorted.toSeq === files1)
    // grown corpus: stamp mismatch → retrain + re-encode, never stale codes
    writeEmb(dir, 60)
    val p2 = queries.SimSearch.pqStaged(spark, dir)
    assert(spark.read.parquet(s"$p2/index").count() === 60L)
  }

  test("a changed embeddings corpus rebuilds the persisted IVF index") {
    val dir = freshDir()
    writeEmb(dir, 40)
    val p = queries.SimSearch.ivfStaged(spark, dir)
    // soft assignment writes each vector into 2 cells
    assert(spark.read.parquet(s"$p/index").count() === 80L)
    writeEmb(dir, 60)
    queries.SimSearch.ivfStaged(spark, dir)
    assert(spark.read.parquet(s"$p/index").count() === 120L)
  }

  test("a changed documents corpus rebuilds the staged near-dup edge set") {
    val dir = freshDir()
    def writeDocs(n: Int): Unit =
      Tables(spark, sf, "documents").filter(col("doc_id") < n)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    writeDocs(60)
    val p = queries.TextOps.edgesStaged(spark, dir)
    val n1 = spark.read.parquet(p).count()
    val files1 = new java.io.File(p).list().sorted.toSeq
    // unchanged → no re-stage
    queries.TextOps.edgesStaged(spark, dir)
    assert(new java.io.File(p).list().sorted.toSeq === files1)
    // a larger slice of the corpus can only keep or add true j>=0.5 edges
    writeDocs(200)
    queries.TextOps.edgesStaged(spark, dir)
    assert(spark.read.parquet(p).count() >= n1)
    assert(new java.io.File(p).list().sorted.toSeq !== files1)
  }
}
