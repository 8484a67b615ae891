package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Optimizer rule that plans key-less range joins scalably — the
  * whole-plan complement to [[graft.ops.RangeJoin]] (bin decomposition
  * per the public IEJoin / range-join-hint literature; the reference repo
  * has no range-join surface — this is a scale extension).
  *
  * OSS Spark has no range-join optimization: an inner join whose only
  * cross-side predicates are range comparisons (`p >= s AND p < e`) has
  * no equi-key, so the physical plan is BroadcastNestedLoopJoin —
  * O(|points| x |intervals|) comparisons, a non-starter at 100 TB. When
  * `spark.graft.rangeJoin.binWidth` is set to a positive long W (in the
  * join columns' own units), this rule rewrites the logical join:
  *
  *   - point side gains `bin(p) = floorDiv(p, W)` (exact long
  *     arithmetic, no double rounding),
  *   - interval side explodes to one row per covered bin
  *     (`sequence(bin(s), bin(e))`, empty when inverted),
  *   - the join becomes an EQUI-join on the bin with the original
  *     condition re-checked, and a final projection restores the
  *     original output.
  *
  * A qualifying pair meets in exactly one bin (the point's), so results
  * are identical to the naive join — asserted by the rule's on/off
  * equality spec. The rewrite deliberately skips joins that already
  * have a cross-side equi predicate (Catalyst plans those fine, and the
  * guard also makes the rule a no-op on its own output, keeping the
  * fixed-point batch stable).
  *
  * Scope guards: inner joins; deterministic point/bound expressions of
  * integral type (int/long — timestamps enter as `unix_micros`
  * everywhere in this engine). Bin arithmetic assumes |value| stays
  * clear of Long.MaxValue - W (any real time/measure scale does).
  */
object BinnedRangeJoin extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.binWidth"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // A malformed width must not throw from inside the optimizer batch
    // (that would fail every query in the session); treat it as unset.
    val w = SQLConf.get.getConfString(WidthKey, "0").toLongOption.getOrElse(0L)
    if (w <= 0) plan
    else plan.transformUp {
      case j: Join => rewrite(j, w).getOrElse(j)
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  /** floorDiv(x, w) in exact long arithmetic: pmod is non-negative, so
    * x - pmod(x, w) is the floor multiple and the integral divide is
    * exact (no truncation-toward-zero error for negative x).
    */
  private def bin(x: Expression, w: Long): Expression = {
    val xl = asLong(x)
    IntegralDivide(Subtract(xl, Pmod(xl, Literal(w))), Literal(w))
  }

  private def rewrite(j: Join, w: Long): Option[LogicalPlan] = j match {
    case Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      def crossSide(a: Expression, b: Expression): Boolean =
        (canEvaluate(a, left) && canEvaluate(b, right)) ||
          (canEvaluate(a, right) && canEvaluate(b, left))
      // Only a genuinely cross-side equality (attributes on BOTH sides)
      // counts as an equi key: a literal canEvaluate on either side, so
      // a leftover one-side conjunct like `p.kind = 'click'` must not
      // suppress the rewrite.
      def attrEquality(a: Expression, b: Expression): Boolean =
        a.references.nonEmpty && b.references.nonEmpty && crossSide(a, b)
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b) => attrEquality(a, b)
        case EqualNullSafe(a, b) => attrEquality(a, b)
        case _ => false
      }
      if (hasEqui) return None

      // normalize every cross-side comparison to (lo ≲ hi)
      val ineqs = conjuncts.collect {
        case GreaterThanOrEqual(a, b) if crossSide(a, b) => (b, a)
        case GreaterThan(a, b) if crossSide(a, b) => (b, a)
        case LessThanOrEqual(a, b) if crossSide(a, b) => (a, b)
        case LessThan(a, b) if crossSide(a, b) => (a, b)
      }
      // point-in-interval: some p bounded below by s and above by e,
      // with s and e on p's opposite side
      val triple = (for {
        (s, p1) <- ineqs
        (p2, e) <- ineqs
        if p1.semanticEquals(p2) && integral(p1) && integral(s) && integral(e)
        if p1.deterministic && s.deterministic && e.deterministic
        // the point must be a real column and at least one bound must
        // come from the other side's attributes — otherwise the "range
        // join" is a single-side filter over a cross join, and binning
        // it would shuffle everything onto a handful of constant bins
        if p1.references.nonEmpty && (s.references.nonEmpty || e.references.nonEmpty)
        pointsOnLeft = canEvaluate(p1, left)
        if (pointsOnLeft && canEvaluate(s, right) && canEvaluate(e, right)) ||
          (!pointsOnLeft && canEvaluate(p1, right) &&
            canEvaluate(s, left) && canEvaluate(e, left))
      } yield (p1, s, e, pointsOnLeft)).headOption

      triple.map { case (p, s, e, pointsOnLeft) =>
        val (pointPlan, intervalPlan) = if (pointsOnLeft) (left, right) else (right, left)

        val pBin = Alias(bin(p, w), "_graft_bin_p")()
        val pointProj = Project(pointPlan.output :+ pBin, pointPlan)

        val binS = bin(s, w); val binE = bin(e, w)
        // Sequence is TimeZoneAwareExpression: without a zone id it reports
        // unresolved and the optimizer's plan validation aborts the batch
        val seq = If(LessThanOrEqual(binS, binE),
          new Sequence(binS, binE, Some(Literal(1L)),
            Some(SQLConf.get.sessionLocalTimeZone)),
          Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
        val binAttr = AttributeReference("_graft_bin_iv", LongType, nullable = false)()
        val intervalGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(binAttr), intervalPlan)

        val newCond = And(EqualTo(pBin.toAttribute, binAttr), cond)
        val (newLeft, newRight) =
          if (pointsOnLeft) (pointProj, intervalGen) else (intervalGen, pointProj)
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
    case _ => None
  }
}
