package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite tolerance range joins into banded equi-joins.
  *
  * A join whose condition contains `abs(l - r) <= d` (l from the left
  * side, r from the right, d a positive numeric literal) would plan as
  * a cartesian/nested-loop product, or — with extra equi keys — as an
  * equi-join whose per-key candidate set is the key's WHOLE range. The
  * rewrite buckets both sides into width-d bins, explodes the left side
  * to bins ±1, joins EQUI on (existing equi keys..., bin), and keeps the
  * original range predicate as a residual filter — the same lossless
  * transformation `Graft.bandedToleranceJoin` applies by hand (any row
  * within ±d of l lies in bins floor(l/d) ± 1), but driven from the
  * natural user-written predicate. This is the banded/bucketed
  * range-join optimization Databricks SQL and Flink interval joins
  * apply; re-derived here for the engine's tolerance-match operators
  * (SURVEY.md §2.4: time ±TIME_DELTA, depth ±DEPTH_DELTA).
  *
  * Enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `GraftExtensions.install(builder)`.
  *
  * Scope guards: inner joins; `d > 0`; both operands castable to
  * double; fires once (the rewritten join carries no abs-pattern).
  * Null semantics are preserved by re-applying the original predicate
  * as the residual filter.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private def numericLit(e: Expression): Option[Double] = e match {
    case Literal(v: Number, _) if v.doubleValue() > 0 => Some(v.doubleValue())
    case _ => None
  }

  /** Matches abs(a - b) <= d / d >= abs(a - b) with a, b single-sided. */
  private def toleranceConjunct(
      c: Expression, left: LogicalPlan, right: LogicalPlan): Option[(Expression, Expression, Double)] = {
    def sides(a: Expression, b: Expression): Option[(Expression, Expression)] =
      if (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
        Some((a, b))
      else if (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
        Some((b, a))
      else None
    c match {
      case LessThanOrEqual(Abs(Subtract(a, b, _), _), d) =>
        numericLit(d).flatMap(dd => sides(a, b).map { case (l, r) => (l, r, dd) })
      case GreaterThanOrEqual(d, Abs(Subtract(a, b, _), _)) =>
        numericLit(d).flatMap(dd => sides(a, b).map { case (l, r) => (l, r, dd) })
      case _ => None
    }
  }

  private def bin(x: Expression, d: Double): Expression =
    Floor(Divide(Cast(x, DoubleType), Literal(d)))

  /** A join this rule already rewrote: its condition references the
    * generated bin attributes. The guard matters because
    * `injectOptimizerRule` places user rules in FIXED-POINT batches
    * that also run predicate pushdown — without it, the rule and
    * PushDownPredicates ping-pong (each iteration re-banding the same
    * join) until max-iterations, stacking Generates. */
  private def alreadyBanded(cond: Expression): Boolean =
    cond.references.exists(a => a.name == "_graft_bin" || a.name == "_graft_bin_r")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) if !alreadyBanded(cond) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val tol = conjuncts.iterator
        .map(c => (c, toleranceConjunct(c, left, right)))
        .collectFirst { case (c, Some(t)) => (c, t) }
      tol match {
        case Some((rangePred, (l, r, d))) if l.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
            && r.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] =>
          val lBin = bin(l, d)
          val binAttr = AttributeReference("_graft_bin", LongType, nullable = true)()
          val gen = Generate(
            Explode(CreateArray(Seq(
              Subtract(lBin, Literal(1L)), lBin, Add(lBin, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(binAttr), child = left)
          val rBinAlias = Alias(bin(r, d), "_graft_bin_r")()
          val proj = Project(right.output :+ rBinAlias, right)
          // the residual range predicate stays INSIDE the join condition:
          // hoisting it as a Filter would hand it straight back to
          // predicate pushdown (see alreadyBanded)
          val newCond = (conjuncts :+ EqualTo(binAttr, rBinAlias.toAttribute)).reduce(And)
          Project(j.output, Join(gen, proj, Inner, Some(newCond), hint))
        case _ => j
      }
  }
}

/** `spark.sql.extensions` entry point installing the engine's rules. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => BandedRangeJoinRule)
}
