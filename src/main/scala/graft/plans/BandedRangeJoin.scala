package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite tolerance range joins into banded equi-joins.
  *
  * A join whose condition contains `abs(l - r) <= d` (l from the left
  * side, r from the right, d a positive literal) would plan as a
  * cartesian/nested-loop product, or — with extra equi keys — as an
  * equi-join whose per-key candidate set is the key's WHOLE range. The
  * rewrite buckets both sides into width-d bins, explodes the left side
  * to bins ±1, joins EQUI on (existing equi keys..., bin), and keeps the
  * original range predicate as a residual inside the join condition —
  * the same lossless transformation `Graft.bandedToleranceJoin` applies
  * by hand (any partition into intervals of width >= d puts two points
  * within d into the same or adjacent intervals), but driven from the
  * natural user-written predicate. This is the banded/bucketed
  * range-join optimization Databricks SQL and Flink interval joins
  * apply; re-derived here for the engine's tolerance-match operators
  * (SURVEY.md §2.4: time ±TIME_DELTA, depth ±DEPTH_DELTA).
  *
  * Enable with `spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Binning is computed in the OPERANDS' OWN post-coercion type so the
  * bin and the residual predicate can never disagree:
  *  - integral operands bin with integral division (exact at any
  *    magnitude — a double-cast bin would misplace values beyond 2^53,
  *    e.g. nanosecond epochs, and silently drop rows);
  *  - float/double operands bin in double (their residual already
  *    evaluates in double, so bin-space == residual-space);
  *  - timestamp operands (`abs(ts_l - ts_r) <= INTERVAL`) bin on exact
  *    epoch micros;
  *  - DecimalType operands are NOT rewritten (a double bin could
  *    misplace high-precision values; binning exactly in decimal space
  *    is possible but not needed by the engine's operators).
  *
  * Scope guards: inner joins; `d > 0`; fires once (guarded by a
  * STRUCTURAL check for a band-Generate feeding the join — a user
  * column that merely shares the generated name cannot disable it).
  * Null semantics are preserved by keeping the original predicate as
  * the residual. Supported value domain: `l - r` must not overflow
  * long for integral operands with ANSI off (a wrapped subtraction
  * satisfies the residual but lands in distant bins; operands within a
  * 2^63 span of each other are exact).
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Positive tolerance literal: plain numerics for numeric operands,
    * day-time intervals (micros) for timestamp operands. */
  private def tolLit(e: Expression): Option[Double] = e match {
    case Literal(v: Number, _: NumericType) if v.doubleValue() > 0 => Some(v.doubleValue())
    case Literal(v: Long, _: DayTimeIntervalType) if v > 0 => Some(v.toDouble)
    case _ => None
  }

  /** Matches abs(a - b) <= d / d >= abs(a - b) with a, b single-sided.
    * Timestamp subtraction analyzes to SubtractTimestamps with an
    * interval result, so both operand shapes are matched. */
  private def toleranceConjunct(
      c: Expression, left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
        Some((a, b))
      else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        Some((b, a))
      else None
    def operands(abs: Expression): Option[(Expression, Expression)] = abs match {
      case Abs(Subtract(a, b, _), _)          => Some((a, b))
      case Abs(SubtractTimestamps(a, b, _, _), _) => Some((a, b))
      case _                                  => None
    }
    c match {
      case LessThanOrEqual(absE, d) =>
        for (dd <- tolLit(d); (a, b) <- operands(absE); (l, r) <- sides(a, b))
          yield (l, r, dd)
      case GreaterThanOrEqual(d, absE) =>
        for (dd <- tolLit(d); (a, b) <- operands(absE); (l, r) <- sides(a, b))
          yield (l, r, dd)
      case _ => None
    }
  }

  /** Bin function in the operand's own type space (None = unsupported
    * type, skip the rewrite). Integral/timestamp bins use truncating
    * integral division: its intervals all have width >= ceil(d) (the
    * one around zero is wider), which keeps the ±1 expansion lossless. */
  private def binFn(t: DataType, d: Double): Option[Expression => Expression] = t match {
    case ByteType | ShortType | IntegerType | LongType =>
      val w = Literal(math.max(math.ceil(d).toLong, 1L))
      Some(x => new IntegralDivide(Cast(x, LongType), w))
    case DoubleType | FloatType =>
      Some(x => Floor(Divide(Cast(x, DoubleType), Literal(d))))
    case TimestampType =>
      val w = Literal(math.max(math.ceil(d).toLong, 1L)) // d already micros
      Some(x => new IntegralDivide(UnixMicros(x), w))
    case TimestampNTZType =>
      val w = Literal(math.max(math.ceil(d).toLong, 1L))
      // fixed UTC zone, NOT the session zone: NTZ residuals evaluate in
      // wall-clock space, and a DST-observing session zone folds an hour
      // at fall-back — two rows within tolerance straddling the
      // transition would land >1 bin apart and be silently dropped. UTC
      // keeps the bin affine to the wall-clock residual at all times.
      Some(x => new IntegralDivide(
        UnixMicros(Cast(x, TimestampType, Some("UTC"))), w))
    case _ => None // DecimalType etc. — see scaladoc
  }

  private def isBinExpr(e: Expression): Boolean = e match {
    case Floor(Divide(_, _: Literal, _))       => true
    case d: IntegralDivide                     => d.right.isInstanceOf[Literal]
    case _                                     => false
  }

  /** Attributes produced by a band Generate (explode of [bin-1, bin,
    * bin+1]) anywhere under `plan`. A join whose condition references
    * one was already rewritten — the STRUCTURAL form of the guard, so a
    * user column named like the generated attribute cannot suppress the
    * rule, and other rules renaming attributes cannot re-trigger it.
    * The guard matters because `injectOptimizerRule` places user rules
    * in FIXED-POINT batches that also run predicate pushdown — without
    * it, the rule and PushDownPredicates ping-pong (each iteration
    * re-banding the same join) until max-iterations, stacking
    * Generates. */
  private def bandGeneratedAttrs(plan: LogicalPlan): AttributeSet = AttributeSet(
    plan.collect {
      case g: Generate => g.generator match {
        case Explode(CreateArray(Seq(
            Subtract(b1, Literal(1L, LongType), _), b2, Add(b3, Literal(1L, LongType), _)), _))
            if isBinExpr(b2) && b1.semanticEquals(b2) && b3.semanticEquals(b2) =>
          g.generatorOutput
        case _ => Nil
      }
    }.flatten)

  private def alreadyBanded(j: Join): Boolean =
    j.condition.exists(_.references.intersect(bandGeneratedAttrs(j.left)).nonEmpty)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) if !alreadyBanded(j) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val tol = conjuncts.iterator
        .map(c => (c, toleranceConjunct(c, left, right)))
        .collectFirst { case (c, Some(t)) => (c, t) }
      tol match {
        case Some((_, (l, r, d))) if l.dataType == r.dataType =>
          binFn(l.dataType, d) match {
            case Some(bin) =>
              val lBin = bin(l)
              val binAttr = AttributeReference("_graft_bin", LongType, nullable = true)()
              val gen = Generate(
                Explode(CreateArray(Seq(
                  Subtract(lBin, Literal(1L)), lBin, Add(lBin, Literal(1L))))),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(binAttr), child = left)
              val rBinAlias = Alias(bin(r), "_graft_bin_r")()
              val proj = Project(right.output :+ rBinAlias, right)
              // the residual range predicate stays INSIDE the join
              // condition: hoisting it as a Filter would hand it straight
              // back to predicate pushdown (see bandGeneratedAttrs)
              val newCond = (conjuncts :+ EqualTo(binAttr, rBinAlias.toAttribute)).reduce(And)
              Project(j.output, Join(gen, proj, Inner, Some(newCond), hint))
            case None => j
          }
        case _ => j
      }
  }
}

/** `spark.sql.extensions` entry point installing the engine's rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => BandedRangeJoinRule)
}
