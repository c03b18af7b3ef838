package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

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
  * function agrees across sides, so sign handling is uniform. Point types
  * beyond Long hit the same BNLJ wall and get the same rewrite through a
  * monotone exact to-Long conversion: int (widening cast), date (days
  * since epoch), timestamp (epoch microseconds).
  *
  * '''Bucket width is per-plan wherever possible.''' When both bounds
  * share one base expression with literal offsets — `p BETWEEN x − W AND
  * x`, the dominant time-alignment shape — the span W is read off the
  * join condition itself and used as the width: each interval row then
  * covers at most 2 buckets, so the rewrite is safe by construction and
  * needs no externally supplied width. The session conf
  * `spark.graft.rangejoin.bucket` only selects the MODE:
  *
  *  - unset / malformed → rule disabled (malformed never fails a query);
  *  - `auto`            → rewrite exactly the joins whose span is
  *                        inferable, width = that join's own span. No
  *                        session-sticky width exists in this mode, so a
  *                        later unrelated range join can never be
  *                        rewritten with a width chosen for a different
  *                        query — it either infers its own or is left
  *                        alone;
  *  - a positive long   → inferred span still wins where available (a
  *                        blanket width can never misconfigure a
  *                        constant-span join into ⌈span/W⌉ replication);
  *                        the number applies only to variable-span
  *                        intervals, in the point column's to-Long units
  *                        (native for int/long, days for date,
  *                        microseconds for timestamp).
  *
  * Conservative by construction:
  *  - only on INNER joins whose cross-side conjuncts are exactly one
  *    lower and one upper bound on the same point expression — any
  *    cross-side equality means Spark already has an equi-join to plan,
  *    and anything else is not the shape this transform proves out;
  *  - marker columns make the rewrite self-guarding (idempotent under
  *    fixed-point batches and under re-entry via either injection path:
  *    `spark.experimental.extraOptimizations` on a live session, or
  *    `GraftExtensions`' `injectOptimizerRule` at session build).
  *
  * The interval side replicates once per covered bucket (⌈(hi−lo)/W⌉+1
  * rows): exactly ≤2 under an inferred width, caller-chosen under an
  * explicit one — the same cost the hand-built rangeJoin pays.
  */
object RangeJoinBucketRule extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangejoin.bucket"

  /** [[WidthConf]] value enabling inference-only mode. */
  val Auto = "auto"
  private val Marker = "__graft_bucket"

  private sealed trait Mode
  private case object AutoMode extends Mode
  private case class FixedWidth(w: Long) extends Mode

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val mode: Option[Mode] = conf.getConfString(WidthConf, "") match {
      case "" => None
      case Auto => Some(AutoMode)
      // malformed conf disables the rule (never fails the query)
      case s => scala.util.Try(s.toLong).toOption.filter(_ > 0).map(FixedWidth)
    }
    mode.fold(plan) { m =>
      plan transformUp {
        case j @ Join(left, right, Inner, Some(cond), hint)
            if j.resolved &&
              !j.output.exists(_.name.startsWith(Marker)) =>
          rewrite(j, left, right, cond, hint, m).getOrElse(j)
      }
    }
  }

  /** Point types with a monotone EXACT to-Long conversion. */
  private val SupportedTypes: Set[DataType] =
    Set(LongType, IntegerType, DateType, TimestampType)

  private def toLong(e: Expression): Expression = e.dataType match {
    case LongType      => e
    case IntegerType   => Cast(e, LongType)
    case DateType      => Cast(UnixDate(e), LongType) // days since epoch
    case TimestampType => UnixMicros(e)               // epoch microseconds
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  /** `e` as `base + offset` (in [[toLong]] units) when the offset is a
    * literal of the matching addend type; `(e, 0)` otherwise.
    */
  private def baseAndOffset(e: Expression): (Expression, Long) = e match {
    case Add(b, Literal(v: Long, LongType), _)      => (b, v)
    case Add(Literal(v: Long, LongType), b, _)      => (b, v)
    case Subtract(b, Literal(v: Long, LongType), _) => (b, -v)
    case Add(b, Literal(v: Int, IntegerType), _)      => (b, v.toLong)
    case Add(Literal(v: Int, IntegerType), b, _)      => (b, v.toLong)
    case Subtract(b, Literal(v: Int, IntegerType), _) => (b, -v.toLong)
    case DateAdd(b, Literal(v: Int, IntegerType)) => (b, v.toLong)
    case DateSub(b, Literal(v: Int, IntegerType)) => (b, -v.toLong)
    case TimestampAddInterval(b, Literal(v: Long, _: DayTimeIntervalType), _) => (b, v)
    case _ => (e, 0L)
  }

  /** The statically-known interval span `hi − lo`, when both bounds are
    * literal offsets from one shared base expression.
    */
  private def inferredSpan(lo: Expression, hi: Expression): Option[Long] = {
    val (bl, ol) = baseAndOffset(lo)
    val (bh, oh) = baseAndOffset(hi)
    if (bl.semanticEquals(bh)) Some(oh - ol).filter(_ > 0) else None
  }

  /** One reading of a comparison conjunct: `point ≥/≤ bound` with the two
    * expressions on opposite sides of the join.
    */
  private case class Reading(point: Expression, bound: Expression,
                             pointOnLeft: Boolean, isLower: Boolean)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint,
                      mode: Mode): Option[LogicalPlan] = {
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
            if sa != sb && a.dataType == b.dataType &&
              SupportedTypes.contains(a.dataType) =>
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

    if (pair.isEmpty)
      return overlapRewrite(j, left, right, cond, hint, mode, conjuncts, side)

    pair.flatMap { case (lo, hi) =>
      val span = inferredSpan(lo.bound, hi.bound)
      val width = mode match {
        case AutoMode      => span
        case FixedWidth(w) => Some(span.getOrElse(w))
      }
      width.map { w =>
        val wLit = Literal(w, LongType)
        // truncating div: monotone, hence bucket(p) ∈ [bucket(lo), bucket(hi)]
        // for every p ∈ [lo, hi] regardless of sign
        def bucket(e: Expression) = IntegralDivide(toLong(e), wLit)

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

  /** One normalized cross-side inequality `small ≤ big` (strictness is
    * immaterial: the original condition re-evaluates inside the join).
    */
  private case class SideIneq(small: Expression, big: Expression,
                              smallOnLeft: Boolean)

  /** INTERVAL-OVERLAP extension (r6): the two-sided shape
    *
    * {{{
    *   A ⋈ B ON A.lo ≤ B.hi AND B.lo ≤ A.hi        -- planned as BNLJ
    *   ⇒  A×buckets([A.lo,A.hi]) ⋈ B×buckets([B.lo,B.hi])
    *        ON bucketA = bucketB AND <original condition>
    *        AND bucketA = bucket(greatest(A.lo, B.lo))
    * }}}
    *
    * Every overlapping pair shares the bucket containing the larger of
    * the two interval starts, and the last conjunct keeps exactly that
    * one emission — no post-join distinct (the same dedup guard
    * [[graft.operators.Temporal.intervalOverlapJoin]] builds by hand).
    * Point-in-range is the degenerate case where one side's lo ≡ hi and
    * is handled first (one-sided replication is cheaper); this path only
    * sees genuine two-sided shapes.
    *
    * Width: in auto mode BOTH spans must be inferable (literal offsets
    * from a shared base per side — which also proves every interval is
    * well-formed, lo ≤ hi on every row) and the width is their max, so
    * each side replicates to at most 2 buckets. Under an explicit width,
    * intervals may be malformed on some rows (lo > hi with the overlap
    * condition still satisfiable), so the bucket cover is built
    * orientation-insensitively (least..greatest) — completeness holds for
    * every satisfiable pair either way.
    */
  private def overlapRewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                             cond: Expression, hint: JoinHint, mode: Mode,
                             conjuncts: Seq[Expression],
                             side: Expression => Option[Boolean]): Option[LogicalPlan] = {
    def mk(small: Expression, big: Expression): Option[SideIneq] =
      (side(small), side(big)) match {
        case (Some(ss), Some(sb))
            if ss != sb && small.dataType == big.dataType &&
              SupportedTypes.contains(small.dataType) =>
          Some(SideIneq(small, big, smallOnLeft = ss))
        case _ => None
      }
    val ineqs = conjuncts.flatMap {
      case LessThanOrEqual(a, b)    => mk(a, b)
      case GreaterThanOrEqual(a, b) => mk(b, a)
      case LessThan(a, b)           => mk(a, b)
      case GreaterThan(a, b)        => mk(b, a)
      case _                        => None
    }
    val shape = (for {
      c1 <- ineqs if c1.smallOnLeft   // L.lo ≤ R.hi
      c2 <- ineqs if !c2.smallOnLeft  // R.lo ≤ L.hi
      if c1.small.dataType == c2.small.dataType
    } yield (c1, c2)).headOption

    shape.flatMap { case (c1, c2) =>
      val (lLo, rHi, rLo, lHi) = (c1.small, c1.big, c2.small, c2.big)
      val spanL = inferredSpan(lLo, lHi)
      val spanR = inferredSpan(rLo, rHi)
      val inferred = for { a <- spanL; b <- spanR } yield math.max(a, b)
      val width = mode match {
        case AutoMode      => inferred
        case FixedWidth(w) => Some(inferred.getOrElse(w))
      }
      width.map { w =>
        val wLit = Literal(w, LongType)
        def bucket(e: Expression) = IntegralDivide(toLong(e), wLit)
        // orientation-insensitive cover; Sequence over least..greatest can
        // never throw, and a NULL endpoint yields a NULL sequence, which
        // Explode drops — correct, the original condition is NULL there too
        def cover(lo: Expression, hi: Expression): Expression = {
          val (l, h) = (bucket(lo), bucket(hi))
          new Sequence(Least(Seq(l, h)), Greatest(Seq(l, h)),
            Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))
        }
        val aAttr = AttributeReference(s"${Marker}_a", LongType, nullable = false)()
        val bAttr = AttributeReference(s"${Marker}_b", LongType, nullable = false)()
        val leftPlan = Generate(Explode(cover(lLo, lHi)), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(aAttr), child = left)
        val rightPlan = Generate(Explode(cover(rLo, rHi)), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(bAttr), child = right)
        val dedupGuard = EqualTo(aAttr,
          IntegralDivide(Greatest(Seq(toLong(lLo), toLong(rLo))), wLit))
        val newCond = And(And(cond, EqualTo(aAttr, bAttr)), dedupGuard)
        Project(j.output, Join(leftPlan, rightPlan, Inner, Some(newCond), hint))
      }
    }
  }
}
