package graft

/** Log-level pins for the transactional partition-overwrite sink — the
  * properties the DuckDB oracles can't check because they live in the
  * manifest files, not the query output: the v1 commit actually REMOVED
  * partition F's v0 files (not just appended), v0's manifest is
  * physically untouched by the overwrite, and the crashed v2 writer's
  * bytes are on disk but referenced by no snapshot.
  */
class TxnOverwriteSpec extends SparkSpec {

  private lazy val path = queries.Physical.txnOverwriteStaged(spark, sf)

  private def manifest(v: Int): Seq[String] = {
    val f = new java.io.File(s"$path/_commits", f"v$v%05d.manifest")
    assert(f.exists(), s"missing manifest v$v")
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toSeq finally src.close()
  }

  test("the overwrite commit swaps partition F's files and leaves the " +
    "rest of the snapshot untouched") {
    val v0 = manifest(0)
    val v1 = manifest(1)
    val v0F = v0.filter(_.contains("/status=F/"))
    assert(v0F.nonEmpty, "fixture must have a partition F at v0")
    // removed: no v0 F-file survives into v1
    assert(v1.intersect(v0F).isEmpty, "v1 still references replaced files")
    // replaced: v1 carries the rewritten partition from the v1 data dir
    assert(v1.exists(_.contains("/v1/status=F/")), "rewritten F missing")
    // untouched: every non-F v0 file is still referenced verbatim
    val v0rest = v0.filterNot(_.contains("/status=F/"))
    assert(v0rest.forall(v1.contains), "non-overwritten partitions moved")
  }

  test("the crashed overwrite's bytes exist on disk but no snapshot " +
    "references them") {
    val orphanDir = new java.io.File(s"$path/data/v2/status=O")
    assert(orphanDir.isDirectory &&
      orphanDir.listFiles.exists(_.getName.startsWith("part-")),
      "fixture must carry the crashed writer's data files")
    Seq(0, 1).foreach { v =>
      assert(!manifest(v).exists(_.contains("/v2/")),
        s"v$v references the uncommitted slice")
    }
  }

  test("sink_manifest_skipping prunes files by manifest stats (strictly " +
    "fewer than the layout's file count) and loses no qualifying row") {
    import org.apache.spark.sql.functions._
    val path = queries.Physical.statsManifestStaged(spark, sf)
    val stats = spark.read.parquet(s"$path/stats").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(stats.length === 8, "range layout should produce 8 files")
    val bounds = Tables(spark, sf, "orders")
      .agg(floor(max("o_orderkey") * 0.37).cast("long"),
        floor(max("o_orderkey") * 0.55).cast("long")).collect()(0)
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val pruned = stats.filter { case (_, mn, mx) => mx >= lo && mn <= hi }
    assert(pruned.nonEmpty && pruned.length < stats.length,
      s"pruning must drop files: ${pruned.length}/${stats.length}")
    // the pruned read equals a full-scan filter over the same layout
    val full = spark.read.parquet(s"$path/data")
      .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi).count()
    val viaManifest = q("sink_manifest_skipping").collect()
      .map(_.getLong(1)).sum
    assert(viaManifest === full)
  }

  test("time travel: the v0 snapshot still equals the full pre-overwrite " +
    "table after the overwrite landed") {
    import org.apache.spark.sql.functions._
    val v0 = queries.Physical.manifestRead(spark, path, Some(0))
    val expected = Tables(spark, sf, "orders").count()
    assert(v0.count() === expected)
    // and the latest snapshot is strictly smaller on partition F only
    val latest = queries.Physical.manifestRead(spark, path, None)
    val byStatus = latest.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val v0ByStatus = v0.groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    v0ByStatus.foreach { case (st, n) =>
      if (st == "F") assert(byStatus.getOrElse(st, 0L) < n, st)
      else assert(byStatus.getOrElse(st, 0L) === n, st)
    }
  }
}
