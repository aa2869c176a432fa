package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of join: for every left row, the single most recent right row
  * with `rightTs <= leftTs` for the same key (optionally bounded by a
  * tolerance). Spark has no native ASOF JOIN.
  *
  * Shape: instead of a key-equi join with the time bound as a
  * post-condition (which materializes m·n intermediate rows for a hot key
  * with m left × n right events before any filter), both sides are unioned
  * into one keyed timeline, sorted within the key by (ts, side, tieBreak),
  * and each left row picks up the last right row seen so far via
  * `last(_, ignoreNulls)` over a running window. One keyed shuffle, output
  * linear in the input — a hot key costs sort(m+n), never m·n.
  *
  * Determinism: ties on `rightTs` break by `tieBreak`, so two right rows
  * at the same instant always resolve the same way — backward picks the
  * LARGEST tieBreak (the latest-entered row wins a last-before race),
  * forward the SMALLEST (the earliest-entered row wins a first-after
  * race). A right row exactly at `leftTs` matches in both directions
  * (the bound is inclusive): the union sort places right rows on the
  * eligible side of left rows at equal ts.
  *
  * Directions: "backward" (default) carries the most recent right row
  * with `rightTs <= leftTs`; "forward" the earliest right row with
  * `rightTs >= leftTs` — the same single-shuffle shape with the window
  * frame mirrored (running `last` becomes forward-looking `first`).
  *
  * API contract (enforced): `rightTs` must be a plain named column of
  * `right` — the tolerance bound re-resolves it as a field of the carried
  * right-row struct, which a computed expression has no field for — and
  * neither input may use the reserved `__k/__ts/__side/__tb/__l/__r/
  * __carry` working names (pre-project/rename around either constraint).
  */
object AsOfJoin {

  private val reserved =
    Seq("__k", "__ts", "__side", "__tb", "__l", "__r", "__carry",
      "__c", "__lastr", "__inc")

  /** Validate inputs and build the two sides of the union timeline —
    * shared by the single-window [[apply]] and the two-phase [[chunked]].
    * Returns (leftSide, rightSide, rightTsName).
    */
  private def prep(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, leftTs: Column, rightTs: Column,
      tieBreak: Column): (DataFrame, DataFrame, String) = {
    val rightTsName = right.select(rightTs).columns.head
    require(right.columns.contains(rightTsName),
      s"rightTs must resolve to a plain named column of `right` (got " +
        s"'$rightTsName', not among ${right.columns.mkString(", ")}); " +
        "pre-compute the expression into a column first")
    val clash = (left.columns ++ right.columns).distinct.filter(reserved.contains)
    require(clash.isEmpty,
      s"inputs must not use AsOfJoin's reserved working columns: " +
        clash.mkString(", "))
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val lType = left.select(lStruct.as("l")).schema("l").dataType
    val rType = right.select(rStruct.as("r")).schema("r").dataType
    val tbType = right.select(tieBreak.as("tb")).schema("tb").dataType

    val l = left.select(leftKey.as("__k"), leftTs.as("__ts"),
      lit(1).as("__side"), lit(null).cast(tbType).as("__tb"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r"))
    // null key / null ts right rows can never satisfy rightKey = leftKey
    // AND rightTs <= leftTs — drop them up front (join semantics; the
    // union timeline would otherwise group them under SQL NULL).
    val r = right
      .filter(rightKey.isNotNull && rightTs.isNotNull)
      .select(rightKey.as("__k"), rightTs.as("__ts"),
        lit(0).as("__side"), tieBreak.as("__tb"),
        lit(null).cast(lType).as("__l"), rStruct.as("__r"))
    (l, r, rightTsName)
  }

  /** Apply the tolerance bound to the carried right row and project back
    * to user columns — the shared tail of both variants.
    */
  private def finish(carried: DataFrame, rightCols: Seq[String],
      rightTsName: String, tolerance: Option[Column],
      direction: String): DataFrame = {
    val bounded = tolerance match {
      case Some(tol) =>
        val inBound =
          if (direction == "backward")
            col("__carry").getField(rightTsName) >= col("__ts") - tol
          else col("__carry").getField(rightTsName) <= col("__ts") + tol
        carried.withColumn("__carry", when(inBound, col("__carry")))
      case None => carried
    }
    bounded.select(col("__l.*") +: rightCols.map(c =>
      col("__carry").getField(c).as(c)): _*)
  }

  def apply(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, leftTs: Column, rightTs: Column, tieBreak: Column,
      tolerance: Option[Column] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val (l, r, rightTsName) = prep(left, right, leftKey, rightKey,
      leftTs, rightTs, tieBreak)

    // backward: right rows (__side 0) sort BEFORE left rows at equal ts
    // and the frame looks back — running `last` carries the most recent
    // right row seen, largest __tb winning a same-instant race (it sorts
    // last within the frame). forward mirrors the SORT, not the frame:
    // ordering by __ts desc walks time backwards, so the running `last`
    // at a left row is the right row with the smallest rightTs >= leftTs
    // seen so far; right-before-left at equal ts keeps the bound
    // inclusive, and __tb desc makes the smallest tieBreak the last one
    // met. Both directions therefore use the incremental
    // [unboundedPreceding, currentRow] frame — a forward-looking
    // [currentRow, unboundedFollowing] frame would re-aggregate the
    // whole remaining suffix per row (O(n²) on a hot key), which is
    // exactly the blow-up this operator exists to avoid.
    //
    // Null left timestamps: `rightTs <= NULL` / `rightTs >= NULL` is never
    // true, so a null-ts left row must carry nothing. Backward's asc sort
    // is NULLS FIRST, which places those rows before any right row — no
    // right row seen yet, carry null, correct for free. Forward's desc
    // sort is NULLS LAST by default, which would place them AFTER every
    // right row in the key and hand them the minimum-rightTs row — a
    // spurious match — so it must be desc_nulls_first to keep the same
    // "null left rows see nothing" invariant.
    val w = direction match {
      case "backward" =>
        Window.partitionBy(col("__k"))
          .orderBy(col("__ts").asc_nulls_first, col("__side").asc,
            col("__tb").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      case _ =>
        Window.partitionBy(col("__k"))
          .orderBy(col("__ts").desc_nulls_first, col("__side").asc,
            col("__tb").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val carry = last(col("__r"), ignoreNulls = true).over(w)
    val carried = l.unionAll(r)
      .withColumn("__carry", carry)
      .filter(col("__side") === 1)
    finish(carried, right.columns.toSeq, rightTsName, tolerance, direction)
  }

  /** Skew-safe two-phase as-of join (backward direction). [[apply]] is
    * single-exchange, but ALL events of one key land in one window
    * partition — a key holding 50% of a 100 TB timeline serializes onto
    * one task. Here the timeline is additionally split by a caller-chosen
    * time chunk (`chunkOf` maps the ts column to a chunk id that must be
    * monotone non-decreasing in ts — e.g. a day bucket), and the carry is
    * computed in two phases:
    *
    *  1. LOCAL: the running-`last` window runs per (key, chunk) — a hot
    *     key now spreads over as many tasks as it has chunks.
    *  2. BOUNDARY: per (key, chunk), the last right row inside the chunk
    *     (one `max_by` aggregate row per chunk); a per-key window over
    *     this CHUNK-level table (rows = #chunks, not #events) computes
    *     each chunk's incoming carry from all strictly-earlier chunks,
    *     which then fills left rows whose local carry is null.
    *
    * Every per-event shuffle is keyed by (key, chunk); only the
    * chunk-level boundary table — #keys × #chunks rows, independent of
    * event count — passes through a per-key window. Output is identical
    * to `apply(direction = "backward")` for any monotone `chunkOf`
    * (spec-checked under ≥10× hot-key skew).
    */
  def chunked(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, leftTs: Column, rightTs: Column, tieBreak: Column,
      chunkOf: Column => Column,
      tolerance: Option[Column] = None): DataFrame = {
    val (l, r, rightTsName) = prep(left, right, leftKey, rightKey,
      leftTs, rightTs, tieBreak)
    // null left ts ⇒ null chunk: the boundary window's asc ordering puts
    // the null chunk first, so its incoming carry is empty — preserving
    // apply()'s "a null-ts left row sees nothing" invariant.
    val timeline = l.unionAll(r).withColumn("__c", chunkOf(col("__ts")))

    // phase 1 — local carry, partitioned by (key, chunk)
    val wLocal = Window.partitionBy(col("__k"), col("__c"))
      .orderBy(col("__ts").asc_nulls_first, col("__side").asc,
        col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val localCarried = timeline
      .withColumn("__carry", last(col("__r"), ignoreNulls = true).over(wLocal))
      .filter(col("__side") === 1)

    // phase 2 — chunk-level boundary carries. max_by's (ts, tb) struct
    // ordering matches the local window's sort, so the same right row
    // wins a same-instant race in both phases.
    val chunks = timeline.select(col("__k"), col("__c")).distinct()
    val lastPerChunk = timeline.filter(col("__side") === 0)
      .groupBy(col("__k"), col("__c"))
      .agg(max_by(col("__r"), struct(col("__ts"), col("__tb"))).as("__lastr"))
    val wChunk = Window.partitionBy(col("__k"))
      .orderBy(col("__c").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, -1)
    val incoming = chunks.join(lastPerChunk, Seq("__k", "__c"), "left")
      .withColumn("__inc",
        last(col("__lastr"), ignoreNulls = true).over(wChunk))
      .select(col("__k"), col("__c"), col("__inc"))

    val carried = localCarried.join(incoming, Seq("__k", "__c"), "left")
      .withColumn("__carry", coalesce(col("__carry"), col("__inc")))
    finish(carried, right.columns.toSeq, rightTsName, tolerance, "backward")
  }
}
