package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Rewrites the interval OVERLAP join — a join whose cross-side
  * predicate contains the conjunct pair
  *
  *   l_start ≤ r_end  AND  r_start ≤ l_end
  *
  * (any ≤/< spelling, timestamp or integral columns) and no cross-side
  * equality — from the BroadcastNestedLoopJoin Spark plans for it into
  * the partitioned interval join (DeWitt et al. 1991; q349's
  * hand-built shape):
  *
  *   Project(original output)
  *     Join(bkt_l = bkt_r AND bkt_l = ⌊max(l_start, r_start)/W⌋
  *          AND <original condition>)
  *       :- Generate(explode(sequence(⌊lo_l/W⌋, ⌊hi_l/W⌋)))
  *       +- Generate(explode(sequence(⌊lo_r/W⌋, ⌊hi_r/W⌋)))
  *
  * BOTH sides explode to the width-W buckets their interval covers
  * (unlike the point-band BandJoinRule, where only the build side
  * fans out); overlapping pairs share at least the owner bucket
  * ⌊max(l_start, r_start)/W⌋ — which both covered ranges provably
  * contain under the overlap predicate (max(starts) ∈ [lo, hi] of each
  * side, with per-side lo/hi min/max-normalized so even an inverted
  * interval row keeps the cover) — and the owner equality keeps each
  * pair EXACTLY once. The original predicate runs as the equi join's
  * residual, so the rewrite is result-identical for any data.
  *
  * The bucket width is WORKLOAD knowledge (typical span / density —
  * Spark has no stats for it at this point in planning), so the rule
  * fires only when `spark.graft.intervalJoin.width` is set to a
  * positive long in the columns' long backing unit (MICROSECONDS for
  * timestamps — UnixMicros, never a seconds-rounding cast; raw for
  * bigints). Unset ⇒ the rule is a no-op and plans are untouched.
  *
  * Guards: INNER/CROSS only (both sides fan out, so an outer join
  * would null-extend each unmatched preserved row once per bucket
  * copy); no cross-side equality conjunct (the planner already
  * hash-joins those — and this makes the rule a provable no-op on its
  * own output, whose bucket equality is exactly such a conjunct); the
  * four endpoint expressions deterministic, each referencing exactly
  * one side, timestamp/integral typed. Null endpoints: the exploded
  * sequence is null ⇒ the row drops, and the naive join drops such
  * pairs too (NULL comparisons fail the predicate). */
object IntervalJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.intervalJoin.width"

  private def longBacked(e: Expression): Boolean = e.dataType match {
    case TimestampType | TimestampNTZType => true
    case IntegerType | LongType | ShortType => true
    case _ => false
  }

  /** The expression's exact long value (micros for timestamps); the
    * NTZ→TZ cast and the bucket Sequence are TimeZoneAwareExpressions
    * and must carry the session zone to stay resolved post-analysis. */
  private def asLong(e: Expression): Expression = e.dataType match {
    case TimestampType => UnixMicros(e)
    case TimestampNTZType =>
      UnixMicros(Cast(e, TimestampType, Some(conf.sessionLocalTimeZone)))
    case LongType => e
    case _ => Cast(e, LongType)
  }

  /** `a ≤ b` / `a < b` as (a, b); strict is sound — the bucket cover
    * only needs to be ≥ the predicate's reach, and the original
    * predicate stays the residual. */
  private def lte(c: Expression): Option[(Expression, Expression)] =
    c match {
      case LessThanOrEqual(a, b) => Some((a, b))
      case LessThan(a, b) => Some((a, b))
      case GreaterThanOrEqual(b, a) => Some((a, b))
      case GreaterThan(b, a) => Some((a, b))
      case _ => None
    }

  private def oneSided(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = try {
      conf.getConfString(WidthConf, "").trim match {
        case "" => 0L
        case s => s.toLong
      }
    } catch { case _: NumberFormatException => 0L }
    if (width <= 0L) plan
    else plan.transformUp {
      case j @ Join(l, r, Inner | Cross, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasCrossEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (oneSided(a, l) && oneSided(b, r)) ||
              (oneSided(a, r) && oneSided(b, l))
          case EqualNullSafe(a, b) =>
            (oneSided(a, l) && oneSided(b, r)) ||
              (oneSided(a, r) && oneSided(b, l))
          case _ => false
        }
        // the overlap pair: one conjunct puts a LEFT expr ≤ a RIGHT
        // expr, another a RIGHT expr ≤ a LEFT expr — (l_start, r_end)
        // and (r_start, l_end) in the canonical orientation
        val pairs = conjuncts.flatMap(lte(_))
        val lr = pairs.collectFirst {
          case (a, b)
              if oneSided(a, l) && oneSided(b, r) &&
                longBacked(a) && longBacked(b) => (a, b)
        }
        val rl = pairs.collectFirst {
          case (a, b)
              if oneSided(a, r) && oneSided(b, l) &&
                longBacked(a) && longBacked(b) => (a, b)
        }
        if (hasCrossEqui || lr.isEmpty || rl.isEmpty) j
        else {
          val (lStart, rEnd) = lr.get
          val (rStart, lEnd) = rl.get
          val w = Literal(width)
          // sign-safe exact-long floor division (BandJoinRule's form);
          // callers pass already-long expressions so Least/Greatest
          // never mix a timestamp with a bigint
          def bkt(xv: Expression): Expression =
            Subtract(IntegralDivide(xv, w),
              If(And(LessThan(xv, Literal(0L)),
                  Not(EqualTo(Remainder(xv, w), Literal(0L)))),
                Literal(1L), Literal(0L)))
          def ranged(side: LogicalPlan, s: Expression, e: Expression,
              tag: String): (Generate, Attribute) = {
            val lo = bkt(Least(Seq(asLong(s), asLong(e))))
            val hi = bkt(Greatest(Seq(asLong(s), asLong(e))))
            val arr = Alias(
              Sequence(lo, hi, Some(Literal(1L)),
                Some(conf.sessionLocalTimeZone)), s"_iv_arr$tag")()
            val proj = Project(side.output :+ arr, side)
            val bktAttr = AttributeReference(
              s"_iv_bkt$tag", LongType, nullable = true)()
            (Generate(Explode(arr.toAttribute),
              unrequiredChildIndex = Seq(side.output.size),
              outer = false, qualifier = None,
              generatorOutput = Seq(bktAttr), proj), bktAttr)
          }
          val (genL, lBkt) = ranged(l, lStart, lEnd, "_l")
          val (genR, rBkt) = ranged(r, rStart, rEnd, "_r")
          val owner = bkt(Greatest(Seq(asLong(lStart), asLong(rStart))))
          val newCond = And(EqualTo(lBkt, rBkt),
            And(EqualTo(lBkt, owner), cond))
          Project(j.output,
            Join(genL, genR, Inner, Some(newCond), hint))
        }
    }
  }
}
