package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Rewrites the numeric band join — a join whose ONLY cross-side
  * predicate is `|x_l − x_r| ≤ ε` (or the equivalent
  * `x_l BETWEEN x_r − ε AND x_r + ε` pair) — from the
  * BroadcastNestedLoopJoin Spark plans for it (no equi keys ⇒ every
  * probe row scans the whole build side; the first plan to die at
  * scale) into the classic bucketed band join (DeWitt et al. 1991,
  * q330's hand-built shape):
  *
  *   Project(original output)
  *     Join(bkt_l = bkt_r AND <original condition>)
  *       :- Project(left,  ⌊x_l / (ε+1)⌋ AS bkt_l)
  *       +- Generate(explode([b−1, b, b+1]))        b = ⌊x_r / (ε+1)⌋
  *            Project(right)
  *
  * The probe keys on its single width-(ε+1) bucket, the build side
  * explodes to its bucket ±1 (any pair within ε spans at most one
  * bucket boundary), and the original predicate runs as the equi
  * join's residual — so each true pair meets EXACTLY once (the probe's
  * one bucket occurs once among the build row's three), candidate
  * volume is band-density-bound, and the shuffle is an ordinary
  * hash-partitioned exchange. Output attributes are preserved exactly
  * (the restore Project), so parent plans never notice.
  *
  * Guards: inner/cross/left-outer/right-outer/semi/anti join with a
  * condition; NO cross-side equality conjunct (if one exists the
  * planner already hash-joins and the band predicate is a fine
  * residual — this also makes the rule a no-op on its own output);
  * band sides numeric (int/bigint/float/double), deterministic, each
  * referencing exactly one side; ε a foldable non-negative literal.
  * Integral bands bucket at width ⌊ε⌋+1 in EXACT long arithmetic
  * (never a double cast — 2^52-plus epoch longs would round across
  * buckets and drop true pairs) with build-side explode ±1 (exact: a
  * true pair spans at most one boundary in integer arithmetic).
  * Fractional bands bucket at width ε with explode ±2: the quotient
  * gap (a−b)/ε is ≤ 1 only up to division rounding, and a floor flip
  * at the boundary could push a true pair two buckets apart — the
  * extra offset buys immunity while the original predicate (the equi
  * join's residual) keeps exactness. Fractional ε = 0 degenerates to
  * float equality and is left alone. Outer variants explode the
  * NON-preserved side (right-outer mirrors), so each unmatched
  * preserved row null-extends exactly once; semi/anti are insensitive
  * to build-side duplication by construction.
  */
object BandJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def litNum(e: Expression): Option[Double] = e match {
    case Literal(v: Int, IntegerType) => Some(v.toDouble)
    case Literal(v: Long, LongType) => Some(v.toDouble)
    case Literal(v: Short, ShortType) => Some(v.toDouble)
    case Literal(v: Double, DoubleType) => Some(v)
    case Literal(v: Float, FloatType) => Some(v.toDouble)
    case _ => None
  }

  /** `|x − y| ≤ eps` in its comparison spellings → (x, y, eps). */
  private def absBand(c: Expression)
      : Option[(Expression, Expression, Double)] = c match {
    case LessThanOrEqual(Abs(Subtract(x, y, _), _), l) =>
      litNum(l).map((x, y, _))
    case GreaterThanOrEqual(l, Abs(Subtract(x, y, _), _)) =>
      litNum(l).map((x, y, _))
    // strict `<` keeps ε as the BUCKET bound (sound for any type: the
    // bucket width only needs to be ≥ the band's reach — the original
    // strict predicate still runs as the residual); mapping to ε−1
    // would under-size fractional buckets and miss pairs
    case LessThan(Abs(Subtract(x, y, _), _), l) =>
      litNum(l).map(v => (x, y, v))
    case GreaterThan(l, Abs(Subtract(x, y, _), _)) =>
      litNum(l).map(v => (x, y, v))
    case _ => None
  }

  /** `x ≥ y − eps` (the lower half of a BETWEEN band). */
  private def lowBound(c: Expression)
      : Option[(Expression, Expression, Double)] = c match {
    case GreaterThanOrEqual(x, Subtract(y, e, _)) =>
      litNum(e).map((x, y, _))
    case LessThanOrEqual(Subtract(y, e, _), x) =>
      litNum(e).map((x, y, _))
    case _ => None
  }

  /** `x ≤ y + eps` (the upper half of a BETWEEN band). */
  private def highBound(c: Expression)
      : Option[(Expression, Expression, Double)] = c match {
    case LessThanOrEqual(x, Add(y, e, _)) => litNum(e).map((x, y, _))
    case GreaterThanOrEqual(Add(y, e, _), x) => litNum(e).map((x, y, _))
    case _ => None
  }

  private def integral(e: Expression): Boolean = e.dataType match {
    case IntegerType | LongType | ShortType => true
    case _ => false
  }

  private def fractional(e: Expression): Boolean = e.dataType match {
    case DoubleType | FloatType => true
    case _ => false
  }

  private def bandable(e: Expression): Boolean =
    integral(e) || fractional(e)

  /** The band (x, y, eps) from the conjunct set: one abs-form conjunct,
    * or a matching lower/upper BETWEEN pair (same x/y, same eps). */
  private def findBand(conjuncts: Seq[Expression])
      : Option[(Expression, Expression, Double)] = {
    val abs = conjuncts.flatMap(absBand(_)).headOption
    if (abs.isDefined) abs
    else {
      val lows = conjuncts.flatMap(lowBound(_))
      val highs = conjuncts.flatMap(highBound(_))
      lows.flatMap { case (x, y, e) =>
        highs.collect {
          case (x2, y2, e2)
              if e2 == e && x2.semanticEquals(x) && y2.semanticEquals(y) =>
            (x, y, e)
        }
      }.headOption
    }
  }

  private def oneSided(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet) &&
      e.deterministic

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(l, r,
        Inner | Cross | LeftOuter | RightOuter | LeftSemi | LeftAnti,
        Some(cond), hint) =>
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
      val band = if (hasCrossEqui) None else findBand(conjuncts)
      // orient the band as (left-side expr, right-side expr)
      val oriented = band.flatMap { case (x, y, eps) =>
        if (eps < 0 || !bandable(x) || !bandable(y)) None
        else if (oneSided(x, l) && oneSided(y, r)) Some((x, y, eps))
        else if (oneSided(x, r) && oneSided(y, l)) Some((y, x, eps))
        else None
      }
      oriented match {
        case None => j
        case Some((xl, xr, eps)) =>
          // both sides integral ⇒ the gap a−b is an exact integer, so
          // |a−b| ≤ ε ⟺ |a−b| ≤ ⌊ε⌋ even for fractional ε — route ALL
          // integral bands through the exact-long path (never through
          // a double cast, which rounds at |x| ≥ 2^52 and would place
          // a true pair of nanosecond-epoch longs many buckets apart,
          // silently dropping matches)
          val isInt = integral(xl) && integral(xr)
          // fractional bands with ε = 0 degenerate to float equality —
          // no finite bucket width; leave those to the planner
          if (!isInt && eps == 0.0) j
          else {
          // integral: width ⌊ε⌋+1, a true pair spans ≤ 1 bucket boundary
          // EXACTLY (integer arithmetic). fractional: width ε, the
          // quotient gap (a−b)/ε ≤ 1 only up to division rounding, so
          // the build side explodes to ±2 — one extra candidate bucket
          // buys immunity to a floor flip at the boundary
          val offs: Seq[Long] = if (isInt) Seq(-1L, 0L, 1L)
            else Seq(-2L, -1L, 0L, 1L, 2L)
          // sign-safe floor-division bucket. Integral sides: EXACT long
          // arithmetic — truncating `div` corrected down by one when a
          // negative value has a nonzero remainder (no subtraction form,
          // so no Long.MinValue underflow; ADVICE round 12). Fractional
          // sides: double floor-div (double is the value's own type —
          // no precision added or lost by the bucket computation).
          def bkt(x: Expression): Expression =
            if (isInt) {
              val wl = Literal(eps.toLong + 1L)
              val xv = Cast(x, LongType)
              Subtract(IntegralDivide(xv, wl),
                If(And(LessThan(xv, Literal(0L)),
                    Not(EqualTo(Remainder(xv, wl), Literal(0L)))),
                  Literal(1L), Literal(0L)))
            } else
              Floor(Divide(Cast(x, DoubleType), Literal(eps)))
          // Which side explodes: the side whose rows may DUPLICATE
          // without changing the result. A left-preserving join
          // (inner/cross/left outer/semi/anti) explodes the RIGHT —
          // an unmatched left row null-extends (or anti-passes) once
          // per LEFT row, so right-side copies are invisible to it. A
          // RIGHT OUTER join must explode the LEFT for the mirror
          // reason: exploding the preserved side would null-extend
          // each unmatched row once per bucket copy (3–5 duplicates).
          def keyed(side: LogicalPlan, x: Expression)
              : (Project, Attribute) = {
            val a = Alias(bkt(x), "_band_bkt")()
            (Project(side.output :+ a, side), a.toAttribute)
          }
          def exploded(side: LogicalPlan, x: Expression)
              : (Generate, Attribute) = {
            val arr = Alias(CreateArray(
              offs.map(o => Add(bkt(x), Literal(o)))), "_band_arr")()
            val proj = Project(side.output :+ arr, side)
            val bktAttr = AttributeReference(
              "_band_bkt_x", LongType, nullable = true)()
            (Generate(Explode(arr.toAttribute),
              unrequiredChildIndex = Seq(side.output.size), outer = false,
              qualifier = None, generatorOutput = Seq(bktAttr), proj),
              bktAttr)
          }
          val rewritten = j.joinType match {
            case RightOuter =>
              val (genL, lBkt) = exploded(l, xl)
              val (keyR, rBkt) = keyed(r, xr)
              Join(genL, keyR, RightOuter,
                Some(And(EqualTo(lBkt, rBkt), cond)), hint)
            case jt =>
              val (keyL, lBkt) = keyed(l, xl)
              val (genR, rBkt) = exploded(r, xr)
              val t = if (jt == Cross) Inner else jt
              Join(keyL, genR, t,
                Some(And(EqualTo(lBkt, rBkt), cond)), hint)
          }
          Project(j.output, rewritten)
          }
      }
  }
}
