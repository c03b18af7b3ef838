package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** AS-OF JOIN as a first-class physical operator — the temporal join
  * Spark lacks natively (DuckDB `ASOF JOIN`, kdb `aj`, pandas
  * `merge_asof`): for every left row, the single most recent right row
  * of the same key with `r.time <= l.time` (optionally within a
  * tolerance). The (c)-tier sibling of [[TopKPerGroupNode]] on the
  * extension ladder: logical node + strategy + exec with DECLARED
  * distribution and ordering requirements.
  *
  * Why a physical operator: the composable spelling
  * ([[graft.operators.Temporal.asofJoin]] — union both sides, running
  * `max(when(is_right, time))` window, filter back to left rows) is
  * one shuffle but materializes the union and runs full per-partition
  * sorts inside WindowExec, carrying every right row through the window
  * frame machinery. This exec declares
  * `ClusteredDistribution(keys)` + per-key `(key, time)` ordering on
  * both children — EnsureRequirements co-partitions and sorts, exactly
  * as for a sort-merge join — then streams ONE forward merge per
  * partition with O(1) state (the current candidate row), no
  * materialized union, no window frames. At 100 TB both spellings
  * shuffle the same bytes; the merge replaces the window's sort-heavy
  * inner loop with a linear scan.
  *
  * Semantics bound to the oracle's: ties match (`<=`), the LATEST
  * qualifying right row wins (multiple right rows at one (key, time):
  * last in sort order), unmatched left rows emit nulls (LEFT OUTER).
  * Keys and times must be non-null (filter upstream); times are
  * LongType (epoch micros — cast at the API).
  */
case class AsofJoinNode(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs at least one equi-key per side")
  // the merge compares positionally-paired key rows with ONE ordering
  // built from the left types — mismatched pairs (int vs bigint) would
  // compare raw representations and silently mis-match (ADVICE r7)
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join keys must pair identical types: " +
      s"${leftKeys.map(_.dataType.simpleString).mkString(",")} vs " +
      s"${rightKeys.map(_.dataType.simpleString).mkString(",")}")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(lk, rk, lt, rt, tol, l, r) =>
      AsofJoinExec(lk, rk, lt, rt, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    toleranceUs: Option[Long],
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numMatched" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "left rows with an as-of match"))

  // both children clustered on their keys; EnsureRequirements makes the
  // two hash partitionings compatible (same as sort-merge join planning)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // per-partition merge order: (keys…, time) ascending on each side
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // the merge streams the left side in order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = leftKeys; val rk = rightKeys
    val lt = leftTime; val rt = rightTime
    val tol = toleranceUs
    val lSchema = left.output; val rSchema = right.output
    val rowsMetric = longMetric("numOutputRows")
    val matchedMetric = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lSchema)
      val rKeyProj = UnsafeProjection.create(rk, rSchema)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lSchema)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rSchema)
      val keyOrd = RowOrdering
        .createNaturalAscendingOrdering(lk.map(_.dataType))
      val nullRight = new GenericInternalRow(rSchema.length)
      val joined = new JoinedRow
      // emit UnsafeRows: SparkPlan.getByteArrayRdd casts to UnsafeRow, so
      // a bare JoinedRow crashes whenever this exec is the TOP of the
      // plan (no Project above to convert) — found by the r8 session-
      // scoping pin test, which collects the join output directly. The
      // projection MUST read through the nullability-WIDENED output
      // attributes (this is a left outer join): binding the right side's
      // original non-nullable attrs would read unmatched rows' null
      // fields as zeros.
      val outAttrs = lSchema ++ rSchema.map(_.withNullability(true))
      val toUnsafe = UnsafeProjection.create(
        outAttrs.map(a => a: Expression), outAttrs)
      // candidate = most recent consumed right row; its key is COPIED
      // (projections reuse buffers), the row itself copied on retention
      var candKey: UnsafeRow = null
      var candTime = 0L
      var candRow: InternalRow = null
      var rRow: InternalRow = null
      var rKey: UnsafeRow = null
      var rTime = 0L
      var rHas = false
      def advanceRight(): Unit = {
        if (rIter.hasNext) {
          rRow = rIter.next()
          rKey = rKeyProj(rRow)
          rTime = rTimeProj(rRow).getLong(0)
          rHas = true
        } else rHas = false
      }
      advanceRight()
      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lTime = lTimeProj(lRow).getLong(0)
        // consume every right row at an earlier key, or same key with
        // time <= lTime; the last same-key one becomes the candidate
        var more = rHas
        while (more) {
          val c = keyOrd.compare(rKey, lKey)
          if (c < 0 || (c == 0 && rTime <= lTime)) {
            if (c == 0) {
              candKey = rKey.copy(); candTime = rTime; candRow = rRow.copy()
            }
            advanceRight()
            more = rHas
          } else more = false
        }
        rowsMetric += 1
        val hit = candRow != null && keyOrd.compare(candKey, lKey) == 0 &&
          candTime <= lTime && tol.forall(t => lTime - candTime <= t)
        if (hit) { matchedMetric += 1; toUnsafe(joined(lRow, candRow)) }
        else toUnsafe(joined(lRow, nullRight))
      }
    }
  }
}

object AsofJoin {

  /** Public API: as-of LEFT join `left ⟕asof right` on positionally
    * paired key columns with `right.time <= left.time` (and optional
    * tolerance in the time column's own units). Name right-side columns
    * distinctly — the output carries both sides' columns. Times are cast
    * to long. The strategy lives on a CHILD session (the r6/r7 scoping
    * discipline — `Temporal.ruleScopedSession`): the caller's planner
    * state is never mutated, so no sticky extraStrategies entry leaks
    * into every later query on the session. The child shares the
    * SparkContext and catalog state; explicitly-set parent SQL confs are
    * copied so the plan forms under the caller's settings.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKeyCols: Seq[String], rightKeyCols: Seq[String],
               leftTimeCol: String, rightTimeCol: String,
               tolerance: Option[Long] = None): DataFrame = {
    val parent = left.sparkSession
    val spark = parent.newSession()
    parent.sessionState.conf.getAllConfs.foreach { case (k, v) =>
      scala.util.Try(spark.conf.set(k, v)) // skip static/non-settable entries
    }
    spark.experimental.extraStrategies =
      spark.experimental.extraStrategies :+ AsofJoinStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute = plan.output
      .find(a => spark.sessionState.conf.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    def asLong(e: Expression): Expression =
      if (e.dataType == LongType) e else Cast(e, LongType)
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      AsofJoinNode(
        leftKeyCols.map(attr(lp, _)), rightKeyCols.map(attr(rp, _)),
        asLong(attr(lp, leftTimeCol)), asLong(attr(rp, rightTimeCol)),
        tolerance, lp, rp))
  }
}
