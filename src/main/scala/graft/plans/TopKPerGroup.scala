package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** TOP-K PER GROUP as a first-class operator: logical node + planner
  * strategy + bounded-heap physical operator, registered through
  * `SparkSessionExtensions` (the (c) tier of the extension ladder, next
  * to this repo's optimizer rule and codegen expressions).
  *
  * Why Spark needs it: the built-in spelling is
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k`. Spark ≥ 3.5
  * does optimize it (`WindowGroupLimit` inserts partial/final group
  * limits around the exchange, so the SHUFFLE is already bounded) — but
  * each group limit sits ON TOP of a full per-partition `Sort`: every
  * input row is still sorted, O(n log n) per partition, then the rank
  * machinery runs over the survivors. The heap operator removes the
  * sorts entirely — one O(n log k) pass with O(groups·k) state on each
  * side of the exchange — and, like the built-in limit, forwards at
  * most k rows per group per partition to the shuffle.
  *
  * Determinism: callers must pass a TOTAL ordering (tie-break to a key
  * column), exactly as they must for the window spelling to be
  * deterministic. Output row order within a group is unspecified (it is
  * a heap), as with partial aggregates; order presentationally after.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Planner strategy: partial heap (any distribution) → shuffle on the
  * group keys (inserted by EnsureRequirements from the final node's
  * required distribution) → final heap. Same two-phase shape as hash
  * aggregation, for the same reason.
  */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, ord, k, child) =>
      val partial = TopKPerGroupExec(g, ord, k, partial = true, planLater(child))
      TopKPerGroupExec(g, ord, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // observability contract of a production operator: retained rows and
  // group count surface in the SQL UI / plan metrics, so "did the partial
  // stage actually bound the shuffle" is answerable from the UI alone
  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of groups"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else Seq(ClusteredDistribution(groupExprs))

  // the heap is row-preserving per partition, so the child's partitioning
  // survives — declaring it lets a downstream group-keyed operator (e.g.
  // the residual rank window over the kept k-row groups) reuse the final
  // node's exchange instead of shuffling again
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val groupE = groupExprs
    val ordE = ordering
    val kk = k
    val rowsMetric = longMetric("numOutputRows")
    val groupsMetric = longMetric("numGroups")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupE, schema)
      // head of the max-heap = the WORST retained row; a new row enters
      // only by beating it. Rows and keys are copied (Spark iterators
      // reuse row buffers).
      val cmp = RowOrdering.create(ordE, schema)
      implicit val rowOrd: Ordering[InternalRow] =
        Ordering.comparatorToOrdering(cmp)
      val heaps = scala.collection.mutable.HashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      while (iter.hasNext) {
        val row = iter.next()
        // probe with the projection's REUSED buffer; copy the key only on
        // first sight of a group (copying per row is 1 allocation/row —
        // measured as 2-3x wall time in GC churn at 100M rows)
        val probe = keyProj(row)
        val heap = heaps.get(probe) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow]
            heaps.put(probe.copy(), h)
            h
        }
        if (heap.size < kk) heap.enqueue(row.copy())
        else if (cmp.compare(row, heap.head) < 0) {
          heap.dequeue(); heap.enqueue(row.copy())
        }
      }
      groupsMetric += heaps.size
      heaps.valuesIterator.flatMap(_.iterator)
        .map { r => rowsMetric += 1; r }
    }
  }
}

object TopKPerGroup {

  /** Public API: first `k` rows per group under `orderBy` (must be a
    * total order for deterministic results). Self-registers the strategy
    * on the session (idempotent), as [[RangeJoinBucketRule]]'s entry
    * point does, so plain-builder sessions work without extensions.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    val lp = df.queryExecution.analyzed
    def attr(name: String): Attribute = lp.output
      .find(a => spark.sessionState.conf.resolver(a.name, name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${lp.output.map(_.name).mkString(", ")}"))
    val ord = orderBy.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    org.apache.spark.sql.graftbridge.Bridge.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr), ord, k, lp))
  }
}
