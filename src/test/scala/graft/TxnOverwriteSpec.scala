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
