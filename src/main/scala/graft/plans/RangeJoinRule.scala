package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite a PURE point-in-interval range join — which
  * Spark can only plan as a BroadcastNestedLoopJoin / cartesian product,
  * the O(n·m) wall every time-alignment query hits — into the bucketed
  * equi-join the engine builds by hand in
  * [[graft.operators.Temporal.rangeJoin]]:
  *
  * {{{
  *   A ⋈ B ON  A.p BETWEEN B.lo AND B.hi          -- planned as BNLJ
  *   ⇒  A+bucket(p) ⋈ B×buckets([lo,hi])          -- hash/SMJ equi-join
  *        ON bucketA = bucketB AND <original condition>
  * }}}
  *
  * Every qualifying pair shares at least one bucket; the original bounds
  * re-evaluate inside the join, so results are EXACTLY the theta join's
  * (duplicates impossible: a point lives in one bucket). The bucketing
  * uses truncating `div` on both sides — any per-value monotone bucket
  * function agrees across sides, so sign handling is uniform.
  *
  * Opt-in and conservative by construction:
  *  - fires only when `spark.graft.rangejoin.bucket` (the bucket width in
  *    the point column's own units) is set;
  *  - only on INNER joins whose cross-side conjuncts are exactly one
  *    lower and one upper bound on the same Long point expression — any
  *    cross-side equality means Spark already has an equi-join to plan,
  *    and anything else is not the shape this transform proves out;
  *  - marker columns make the rewrite self-guarding (idempotent under
  *    fixed-point batches and under re-entry via either injection path:
  *    `spark.experimental.extraOptimizations` on a live session, or
  *    `GraftExtensions`' `injectOptimizerRule` at session build).
  *
  * The interval side replicates once per covered bucket (⌈(hi−lo)/W⌉+1
  * rows) — the same cost the hand-built rangeJoin pays, chosen by the
  * caller through the width conf.
  */
object RangeJoinBucketRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangejoin.bucket"
  private val Marker = "__graft_bucket"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthConf, "")
    if (width.isEmpty || width.toLong <= 0) return plan
    val w = width.toLong
    plan transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if j.resolved &&
            !j.output.exists(_.name.startsWith(Marker)) =>
        rewrite(j, left, right, cond, hint, w).getOrElse(j)
    }
  }

  /** One reading of a comparison conjunct: `point ≥/≤ bound` with the two
    * expressions on opposite sides of the join.
    */
  private case class Reading(point: Expression, bound: Expression,
                             pointOnLeft: Boolean, isLower: Boolean)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      w: Long): Option[LogicalPlan] = {
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(left.outputSet)) Some(true)
      else if (e.references.subsetOf(right.outputSet)) Some(false)
      else None

    val conjuncts = splitConjunctivePredicates(cond)

    // a cross-side equality ⇒ Spark already plans an equi-join; stand down
    val crossEquality = conjuncts.exists {
      case EqualTo(a, b) => (side(a), side(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
      case EqualNullSafe(a, b) => (side(a), side(b)) match {
        case (Some(x), Some(y)) => x != y
        case _ => false
      }
      case _ => false
    }
    if (crossEquality) return None

    def readings(a: Expression, b: Expression, aIsLower: Boolean): Seq[Reading] =
      (side(a), side(b)) match {
        case (Some(sa), Some(sb))
            if sa != sb && a.dataType == LongType && b.dataType == LongType =>
          // a ≥ b ⇒ "a lower-bounded by b" AND "b upper-bounded by a"
          Seq(Reading(a, b, sa, isLower = aIsLower),
            Reading(b, a, sb, isLower = !aIsLower))
        case _ => Seq.empty
      }
    val all = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) => readings(a, b, aIsLower = true)
      case LessThanOrEqual(a, b)    => readings(b, a, aIsLower = true)
      case GreaterThan(a, b)        => readings(a, b, aIsLower = true)
      case LessThan(a, b)           => readings(b, a, aIsLower = true)
      case _                        => Seq.empty
    }
    val pair = (for {
      lo <- all if lo.isLower
      hi <- all if !hi.isLower &&
        hi.pointOnLeft == lo.pointOnLeft &&
        hi.point.semanticEquals(lo.point)
    } yield (lo, hi)).headOption

    pair.map { case (lo, hi) =>
      val wLit = Literal(w, LongType)
      // truncating div: monotone, hence bucket(p) ∈ [bucket(lo), bucket(hi)]
      // for every p ∈ [lo, hi] regardless of sign
      def bucket(e: Expression) = IntegralDivide(e, wLit)

      val pAlias = Alias(bucket(lo.point), s"${Marker}_p")()
      val loB = bucket(lo.bound)
      val hiB = bucket(hi.bound)
      // guard an inverted interval (condition is unsatisfiable for the
      // row): emit NO buckets instead of letting Sequence throw
      // both If branches must agree EXACTLY on type: Sequence produces
      // array<long> with containsNull = false. Sequence is timezone-aware
      // (for timestamp sequences) and counts as UNRESOLVED until a zone
      // is bound, even over longs — bind the session zone explicitly.
      val seq = If(LessThanOrEqual(loB, hiB),
        new Sequence(loB, hiB, Some(Literal(1L, LongType)),
          Some(conf.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val bAttr = AttributeReference(s"${Marker}_b", LongType, nullable = false)()

      val (pointSide, intervalSide) =
        if (lo.pointOnLeft) (left, right) else (right, left)
      val pointPlan = Project(pointSide.output :+ pAlias, pointSide)
      val intervalPlan = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(bAttr),
        child = intervalSide)

      val newCond = And(cond, EqualTo(pAlias.toAttribute, bAttr))
      val (newLeft, newRight) =
        if (lo.pointOnLeft) (pointPlan, intervalPlan)
        else (intervalPlan, pointPlan)
      // prune the marker columns back to the join's original output
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
    }
  }
}
