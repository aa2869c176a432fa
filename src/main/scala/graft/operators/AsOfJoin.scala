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
    Seq("__k", "__ts", "__side", "__tb", "__l", "__r", "__carry")

  def apply(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, leftTs: Column, rightTs: Column, tieBreak: Column,
      tolerance: Option[Column] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
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
    val bounded = tolerance match {
      case Some(tol) =>
        val inBound =
          if (direction == "backward")
            col("__carry").getField(rightTsName) >= col("__ts") - tol
          else col("__carry").getField(rightTsName) <= col("__ts") + tol
        carried.withColumn("__carry", when(inBound, col("__carry")))
      case None => carried
    }
    bounded.select(col("__l.*") +: right.columns.map(c =>
      col("__carry").getField(c).as(c)): _*)
  }
}
