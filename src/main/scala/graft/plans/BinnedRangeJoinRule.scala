package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite an inequality-only point-in-interval inner
  * join into the binned equi-join of [[graft.operators.RangeJoin]],
  * automatically.
  *
  * Spark's join selection has no hash-join strategy for a condition with
  * no equi conjunct — it falls back to BroadcastNestedLoopJoin, which
  * tests every left row against every right row (O(|L|·|R|), right side
  * broadcast whole). When the condition is `lo <= p AND p <= hi` with
  * `p` from one side and `lo`/`hi` from the other, the binned rewrite
  * applies: replicate each interval row to every fixed-width bin it
  * overlaps (Explode∘Sequence), compute each point's bin, equi-join on
  * the bin key, and keep the ORIGINAL condition as the residual filter —
  * bit-exact semantics at any bin width, since floor-division binning is
  * monotone (every true match shares a bin) and the residual removes
  * same-bin non-matches.
  *
  * Safety rails:
  *  - fires only when `spark.graft.rangeJoin.binWidthSeconds` is set
  *    (> 0) on the session — an opt-in, like AQE's thresholds;
  *  - batch inner joins only (a streaming join's state/watermark
  *    semantics must not be restructured behind the planner's back);
  *  - skips joins that already carry an equi conjunct (hash-joinable
  *    as-is; also makes the rewrite a fixpoint — its own output carries
  *    the bin equi-key);
  *  - point/bounds must be timestamp or numeric and deterministic;
  *  - interval rows with `lo > hi` or a null bound are dropped before
  *    the explode (they cannot satisfy the residual; dropping also keeps
  *    `Sequence` from seeing reversed boundaries).
  */
case class BinnedRangeJoinRule(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import BinnedRangeJoinRule.ConfKey

  private def binOf(e: Expression, w: Double): Expression = {
    // TIMESTAMP_NTZ has no direct numeric cast; hop through TIMESTAMP
    // (session tz — monotone non-decreasing even across DST transitions,
    // which is all the bin cover needs)
    val numeric = e.dataType match {
      case TimestampNTZType =>
        Cast(Cast(e, TimestampType,
          Some(session.sessionState.conf.sessionLocalTimeZone)), DoubleType)
      case _ => Cast(e, DoubleType)
    }
    Cast(Floor(Divide(numeric, Literal(w))), LongType)
  }

  private def supported(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case _: NumericType => true
    case _ => false
  }

  private def candidate(left: LogicalPlan, right: LogicalPlan,
      cond: Expression): Option[(Expression, Expression, Expression)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    def sideOk(e: Expression, side: LogicalPlan) =
      e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
        e.deterministic
    def crossEq(a: Expression, b: Expression) =
      (sideOk(a, left) && sideOk(b, right)) ||
        (sideOk(a, right) && sideOk(b, left))
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => crossEq(a, b)
      case EqualNullSafe(a, b) => crossEq(a, b)
      case _ => false
    }
    if (hasEqui) None
    else {
      def pl(p: Expression, b: Expression) =
        sideOk(p, left) && sideOk(b, right)
      val lowers = conjuncts.collect {
        case GreaterThanOrEqual(p, lo) if pl(p, lo) => (p, lo)
        case GreaterThan(p, lo) if pl(p, lo) => (p, lo)
        case LessThanOrEqual(lo, p) if pl(p, lo) => (p, lo)
        case LessThan(lo, p) if pl(p, lo) => (p, lo)
      }
      val uppers = conjuncts.collect {
        case LessThanOrEqual(p, hi) if pl(p, hi) => (p, hi)
        case LessThan(p, hi) if pl(p, hi) => (p, hi)
        case GreaterThanOrEqual(hi, p) if pl(p, hi) => (p, hi)
        case GreaterThan(hi, p) if pl(p, hi) => (p, hi)
      }
      (for {
        (p1, lo) <- lowers
        (p2, hi) <- uppers
        if p1.semanticEquals(p2) && supported(p1.dataType) &&
          supported(lo.dataType) && supported(hi.dataType)
      } yield (p1, lo, hi)).headOption
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = session.conf.getOption(ConfKey)
      .flatMap(s => scala.util.Try(s.toDouble).toOption).filter(_ > 0)
    width match {
      case None => plan
      case Some(w) => plan.transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if !j.isStreaming =>
          candidate(left, right, cond) match {
            case None => j
            case Some((p, lo, hi)) =>
              val binL = Alias(binOf(p, w), "__graft_bin_l")()
              val newLeft = Project(left.output :+ binL, left)
              val binR = AttributeReference("__graft_bin_r", LongType)()
              val guarded = Filter(LessThanOrEqual(lo, hi), right)
              val newRight = Generate(
                Explode(Sequence(binOf(lo, w), binOf(hi, w),
                  Some(Literal(1L)),
                  Some(session.sessionState.conf.sessionLocalTimeZone))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(binR), child = guarded)
              val newCond = And(EqualTo(binL.toAttribute, binR), cond)
              Project(j.output.map(a => a: NamedExpression),
                Join(newLeft, newRight, Inner, Some(newCond), hint))
          }
      }
    }
  }
}

object BinnedRangeJoinRule {
  /** Bin width for the auto range-join rewrite: seconds for timestamp
    * points, plain units for numeric points. Unset/<=0 disables the rule.
    */
  val ConfKey = "spark.graft.rangeJoin.binWidthSeconds"
}
