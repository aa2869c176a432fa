package graft

import org.apache.spark.sql.functions._

/** Join-view IVM (`sink_changefeed_ivm_join`): the delta-join fold must
  * equal a from-scratch recompute of the v1 join aggregate, and the
  * classic mistake — folding the fact delta against the OLD dim, which
  * drops the ΔF⨝ΔD cross term — must measurably differ on this fixture
  * (it is built so customers exist whose orders AND segment both
  * changed in the same version step).
  */
class IvmJoinSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq

  /** From-scratch recompute of the v1 view straight from the staged
    * logs' v1 snapshots — the referee the fold must match exactly.
    */
  private def recomputeV1() = {
    val p = queries.Physical.joinIvmStaged(spark, sf)
    val fact = queries.Physical.manifestRead(spark, s"$p/fact", Some(1))
    val dim = queries.Physical.manifestRead(spark, s"$p/dim", Some(1))
    fact.join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("double"), 2).as("revenue"))
      .orderBy("seg")
  }

  test("the correct fold (ΔA⨝D_new + A0⨝ΔD) equals the v1 recompute " +
    "exactly; the naive ΔA⨝D_old fold does not") {
    val correct = rowsOf(
      queries.Physical.joinIvmMaintained(spark, sf, naive = false))
    val referee = rowsOf(recomputeV1())
    assert(correct === referee,
      "delta-join maintenance must equal the from-scratch join view")
    val naive = rowsOf(
      queries.Physical.joinIvmMaintained(spark, sf, naive = true))
    assert(naive !== referee,
      "the fixture must expose the dropped ΔF⨝ΔD cross term — if the " +
        "naive fold passes, no customer changed on both sides and the " +
        "spec proves nothing")
    // the damage is localized where the cross term lives: the
    // reassigned segment (and the donors) disagree, because inserts
    // for custkey ≡ 0 (mod 50) were joined to the stale segment
    val diff = naive.zip(referee).filter { case (a, b) => a != b }
    assert(diff.exists(_._2._1 == "REASSIGNED"),
      s"expected the reassigned segment to carry the miscount: $diff")
  }

  test("the fixture exercises the cross term: some arriving fact rows " +
    "belong to customers whose dim row also changed") {
    val p = queries.Physical.joinIvmStaged(spark, sf)
    def files(log: String, v: Int): Seq[String] =
      queries.Physical.readManifestLines(spark, s"$p/$log",
        f"v$v%05d.manifest").filterNot(_.startsWith("#"))
    val added = files("fact", 1).diff(files("fact", 0))
    val crossed = spark.read.parquet(added: _*)
      .filter(col("o_custkey") % 50 === 0).count()
    assert(crossed > 0,
      "no arriving order belongs to a reassigned customer — the naive " +
        "fold would accidentally be correct")
  }

  test("the fold is a pure function of the logs: re-running it yields " +
    "identical rows (replay safety without state)") {
    val a = rowsOf(q("sink_changefeed_ivm_join"))
    val b = rowsOf(q("sink_changefeed_ivm_join"))
    assert(a === b)
    assert(a.nonEmpty && a.exists(_._1 == "REASSIGNED"),
      "the maintained view must carry the segment that only exists at v1")
  }

  test("the streaming twin tails the commit feed to the identical " +
    "view, and replaying an applied event is a structural no-op") {
    val batch = rowsOf(q("sink_changefeed_ivm_join"))
    val streamed = rowsOf(q("stream_changefeed_ivm_join"))
    assert(streamed === batch,
      "feed-tailing maintenance must converge to the batch fold")
    // replay: both events are in the state's applied set — re-applying
    // must not grow the view log or move its content
    val fix = queries.Physical.joinIvmStaged(spark, sf)
    val (state, _) = streaming.StreamingOps.joinIvmStreamDirs(spark, sf)
    val before = queries.Physical.listCommits(spark, state)
    streaming.StreamingOps.applyJoinIvmEvent(spark, fix, state, "dim", 1)
    streaming.StreamingOps.applyJoinIvmEvent(spark, fix, state, "fact", 1)
    assert(queries.Physical.listCommits(spark, state) === before,
      "replayed events must not commit")
    assert(rowsOf(q("stream_changefeed_ivm_join")) === batch,
      "state must not move under replay")
  }
}
