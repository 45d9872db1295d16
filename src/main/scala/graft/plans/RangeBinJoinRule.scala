package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType}

/** Optimizer rule: point-in-interval joins become binned equi-joins.
  *
  * An inner join whose only cross-side condition is a range sandwich
  *
  *   lo ⋈ point ⋈ hi      (⋈ ∈ {<, <=}, lo/hi from one side,
  *                          point from the other, integral types)
  *
  * has no equi-join key, so Spark plans a broadcast-nested-loop join —
  * O(|points|·|intervals|) comparisons, and the build side must fit in
  * memory. The scalable form is the bin trick (the hand-written
  * `core.Joins.rangeJoinBinned`): pick a bin width W, explode each
  * interval into the bins it spans (`sequence(lo div W, hi div W)`),
  * tag each point with its bin (`point div W`), hash-join on the bin,
  * and re-apply the exact range as a residual filter. This rule is the
  * plan-level version: a user writing the natural `BETWEEN` join gets
  * the hash-join plan without knowing the rewrite exists.
  *
  * Correctness: truncating integer division is monotone, so
  * lo <= p <= hi implies bin(lo) <= bin(p) <= bin(hi) — the point's
  * bin always lands inside the interval's bin sequence (bins are a
  * superset of matches; the residual original condition restores
  * exactness, including strict-vs-inclusive bounds). Each surviving
  * pair joins exactly once because a point has exactly ONE bin and a
  * sequence never repeats values, so no dedup step is needed. Rows
  * with null or inverted bounds generate an empty bin array and drop
  * out, exactly as the original (null/false) predicate dropped them;
  * a null point gets a null bin, which the equi-join drops.
  *
  * Scope guards: inner joins only; both bounds from the same side;
  * integral (int/long) types only — float bins would need
  * floor-division semantics both engines agree on, and timestamps
  * should be joined on integer epoch columns; deterministic
  * conditions only; joins that already carry a cross-side equality
  * are left alone (they already plan as hash joins, and this guard is
  * also what makes the rewrite idempotent under the fixed-point
  * batch: the rewritten join's bin equality trips it). Bin width is
  * `spark.graft.rangeJoin.binWidth` (default 1024 units); intervals
  * spanning many bins replicate proportionally — size W near the
  * typical interval length. A production extension would pick W from
  * column statistics and clamp per-row bin counts.
  */
object RangeBinJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  private val BIN_WIDTH_KEY = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Long =
    try conf.getConfString(BIN_WIDTH_KEY, "1024").toLong max 1L
    catch { case _: NumberFormatException => 1024L }

  private def integral(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType => true
    case _ => false
  }

  /** (point, bound, boundIsLower) orientations of one comparison —
    * either operand may turn out to be the point; pairing decides. */
  private def orientations(e: Expression)
      : Seq[(Expression, Expression, Boolean)] = e match {
    case GreaterThanOrEqual(a, b) => Seq((a, b, true), (b, a, false))
    case GreaterThan(a, b)        => Seq((a, b, true), (b, a, false))
    case LessThanOrEqual(a, b)    => Seq((a, b, false), (b, a, true))
    case LessThan(a, b)           => Seq((a, b, false), (b, a, true))
    case _ => Seq.empty
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // Batch only: a stream-stream range join's state eviction reasons
    // about the raw time-interval condition, and the bins would hide
    // it; stream-static joins must stay broadcastable as written.
    case j @ Join(left, right, Inner, Some(cond), hint)
        if cond.deterministic && !left.isStreaming && !right.isStreaming =>
      val conjuncts = splitConjunctivePredicates(cond)
      val leftOut = left.outputSet
      val rightOut = right.outputSet

      def sideOf(x: Expression): Option[Boolean] = {
        val refs = x.references
        if (refs.isEmpty) None
        else if (refs.subsetOf(leftOut)) Some(true)
        else if (refs.subsetOf(rightOut)) Some(false)
        else None
      }

      val hasCrossEquality = conjuncts.exists {
        case EqualTo(a, b) =>
          (sideOf(a), sideOf(b)) match {
            case (Some(sa), Some(sb)) => sa != sb
            case _ => false
          }
        case _ => false
      }

      // All valid (point, bound, isLower, pointOnLeft) candidates.
      val bounds = for {
        c <- conjuncts
        (p, b, isLower) <- orientations(c)
        if integral(p) && integral(b)
        ps <- sideOf(p).toSeq
        bs <- sideOf(b).toSeq
        if ps != bs
      } yield (p, b, isLower, ps)

      val sandwich = (for {
        (p1, lo, true, ps1) <- bounds
        (p2, hi, false, ps2) <- bounds
        if ps1 == ps2 && p1.semanticEquals(p2)
      } yield (p1, lo, hi, ps1)).headOption

      sandwich match {
        case Some((point, lo, hi, pointOnLeft)) if !hasCrossEquality =>
          val w = Literal(binWidth)
          def bin(e: Expression) = IntegralDivide(Cast(e, LongType), w)

          val pAlias = Alias(bin(point), "__graft_pbin")()
          val (pointPlan, intervalPlan) =
            if (pointOnLeft) (left, right) else (right, left)
          val pointProj = Project(pointPlan.output :+ pAlias, pointPlan)

          val iBin = AttributeReference("__graft_ibin", LongType,
            nullable = false)()
          // Sequence is TimeZoneAwareExpression: unresolved until the
          // session zone is attached (irrelevant for integral bounds,
          // but resolution requires it after analysis).
          val bins = If(
            And(And(IsNotNull(lo), IsNotNull(hi)), LessThanOrEqual(lo, hi)),
            new Sequence(bin(lo), bin(hi), Literal(1L))
              .withTimeZone(conf.sessionLocalTimeZone),
            Literal.create(Array.empty[Long], ArrayType(LongType, false)))
          val gen = Generate(Explode(bins), unrequiredChildIndex = Nil,
            outer = false, qualifier = None, generatorOutput = Seq(iBin),
            child = intervalPlan)

          val (newLeft, newRight) =
            if (pointOnLeft) (pointProj, gen) else (gen, pointProj)
          val newCond = And(EqualTo(pAlias.toAttribute, iBin), cond)
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))

        case _ => j
      }
  }
}
