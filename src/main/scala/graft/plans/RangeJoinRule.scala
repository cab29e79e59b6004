package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Catalyst optimizer rule: rewrite inner joins whose only cross-side
  * predicate is an interval containment — `point >= start AND point <= end`
  * (what `between` analyzes to) — into the binned equi-join of
  * [[graft.ops.RangeJoin]], automatically.
  *
  * Without this, Catalyst can only plan such a join as a broadcast
  * nested-loop / cartesian product: O(|points|·|intervals|) comparisons,
  * unusable at scale. The rewrite buckets both sides by
  * `floor(value / binWidth)` — points project ONE bin, intervals Generate
  * (explode) every bin they overlap — and re-checks the original predicate
  * after the bin equi-join, so results are exactly those of the naive plan
  * (bins only over-approximate; asserted equal in RangeJoinRuleSpec).
  * Planning then proceeds as for any equi-join: shuffled or broadcast hash,
  * AQE sizing, the lot.
  *
  * Scope guards:
  *  - fires only when `spark.graft.rangeJoin.binWidth` is set > 0 (the
  *    width is in the point column's units; correctness does not depend on
  *    the value, only fan-out does);
  *  - integral-typed bounds only (floor-div bins via double division — the
  *    same arithmetic RangeJoin uses; exact for |values| < 2^53);
  *  - skips joins that already have a cross-side equi predicate (those are
  *    hash-joinable as-is; extra bin fan-out would only add rows);
  *  - skips its own output (the minted bin attribute is recognizable), so
  *    the rule is a fixed point.
  *
  * Registered by [[graft.GraftExtensions]] (`injectOptimizerRule`) or
  * per-session via `spark.experimental.extraOptimizations`.
  */
object RangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinWidthConf = "spark.graft.rangeJoin.binWidth"
  private val BinName = "__graft_bin"
  // same contract as RangeJoin.pointInInterval's maxBinsPerInterval: a
  // mis-chosen width raises instead of silently exploding a huge array
  private val MaxBinsPerInterval = 10000L

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Defensive parse: this rule runs on EVERY plan in the session, so an
    // unparseable conf value must mean "disabled", never an exception that
    // breaks all queries.
    scala.util.Try(conf.getConfString(BinWidthConf, "0").trim.toLong)
      .toOption.filter(_ > 0) match {
      case None => plan
      case Some(w) => plan.transformUp {
        case j @ Join(_, _, Inner, Some(cond), _)
            if !cond.references.exists(_.name.startsWith(BinName)) =>
          rewrite(j, w).getOrElse(j)
      }
    }
  }

  private def refsInOnly(e: Expression, p: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(p.outputSet)

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)

    val crossEqui = conjuncts.exists {
      case EqualTo(a, b) =>
        (refsInOnly(a, j.left) && refsInOnly(b, j.right)) ||
          (refsInOnly(a, j.right) && refsInOnly(b, j.left))
      case _ => false
    }
    if (crossEqui) return None

    // (bounded expr, bound expr, isLowerBound) — strict bounds are safe:
    // the inclusive bin range is a superset and the original predicate is
    // re-checked after the join
    val normed: Seq[(Expression, Expression, Boolean)] = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
      case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
      case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
      case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
      case _ => Nil
    }
    val pairs = for {
      (p1, s, true) <- normed
      (p2, e, false) <- normed
      if p1.canonicalized == p2.canonicalized
      if integral(p1) && integral(s) && integral(e)
    } yield (p1, s, e)

    val chosen: Option[(LogicalPlan, LogicalPlan, Expression, Expression, Expression, Boolean)] =
      pairs.collectFirst {
        case (p, s, e) if refsInOnly(p, j.left) &&
            refsInOnly(s, j.right) && refsInOnly(e, j.right) =>
          (j.left, j.right, p, s, e, true)
        case (p, s, e) if refsInOnly(p, j.right) &&
            refsInOnly(s, j.left) && refsInOnly(e, j.left) =>
          (j.right, j.left, p, s, e, false)
      }

    chosen.map { case (pointPlan, intervalPlan, p, s, e, pointIsLeft) =>
      def binOf(x: Expression): Expression =
        Floor(Divide(Cast(x, DoubleType), Literal(w.toDouble)))
      val pBin = Alias(binOf(p), BinName)()
      val newPoint = Project(pointPlan.output :+ pBin, pointPlan)
      val genOut = AttributeReference(BinName + "_g", LongType, nullable = false)()
      val lo = binOf(s)
      val hi = binOf(e)
      // Fan-out guard, inline in the exploded expression (a separate dropped
      // column would be pruned before it ran): one wide interval under a
      // small binWidth raises a clear error instead of materializing a huge
      // per-row array. RaiseError is minted LongType so the If stays
      // type-consistent post-analysis (no coercion runs in the optimizer).
      val guardedHi = If(
        GreaterThanOrEqual(Subtract(hi, lo), Literal(MaxBinsPerInterval)),
        new RaiseError(Literal("USER_RAISED_EXCEPTION"),
          CreateMap(Seq(Literal("errorMessage"),
            Concat(Seq(
              Literal(s"range join fan-out exceeds $MaxBinsPerInterval bins: "),
              Cast(Add(Subtract(hi, lo), Literal(1L)), StringType),
              Literal(" (spark.graft.rangeJoin.binWidth too small)"))))),
          LongType),
        hi)
      // timeZoneId must be supplied: optimizer-injected expressions never see
      // ResolveTimeZone, and a TimeZoneAwareExpression without it is unresolved
      val newInterval = Generate(
        Explode(Sequence(lo, guardedHi, None, Some(conf.sessionLocalTimeZone))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(genOut), child = intervalPlan)
      val binEq = EqualTo(pBin.toAttribute, genOut)
      val (nl, nr) = if (pointIsLeft) (newPoint, newInterval) else (newInterval, newPoint)
      val newJoin = Join(nl, nr, Inner, Some(And(binEq, j.condition.get)), j.hint)
      Project(j.output, newJoin)
    }
  }
}
