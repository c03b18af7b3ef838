package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Signed-weight relation (z-set) algebra over DataFrames.
  *
  * Replaces the reference's `StreamEvent.action ∈ {Insert, Delete}` string
  * plumbing (no_websocket.java:60–86) with a weight column `__w ∈ {+1,−1}`:
  *  - join: output weight = product of input weights — exactly the
  *    reference's "output action = Insert iff both inputs Insert" rule
  *    (no_websocket.java:430, 499) generalized to multiplicities;
  *  - aggregation: `sum(__w · x)` — Insert adds, Delete subtracts, the
  *    reference's IncrementalAggregateFunction (no_websocket.java:546–550)
  *    with zero custom state code;
  *  - consolidation: identical rows merge by summing weights; net-zero rows
  *    vanish (the state-cleanup the reference does imperatively via
  *    `state.clear()`/`MapState.remove`, no_websocket.java:404–425).
  *
  * Every operation is a plain Catalyst plan — joins shuffle on their keys,
  * aggregates get partial/final hash aggregation, all codegen'd. State
  * lives one of two ways: cached DataFrames cut from their lineage via
  * `localCheckpoint` (the default, executor storage memory), or — with
  * [[IncrementalQ3]]'s spill mode on — bucketed-by-join-key tables that
  * each compaction MERGEs, bounding the memory envelope to the deltas
  * since the last compaction while the delta joins read the state
  * shuffle-free.
  */
object ZSet {
  /** The weight column name, reserved on every z-set DataFrame. */
  val W = "__w"

  /** Merge duplicate rows (all columns but weight) and drop net-zero rows. */
  def consolidate(df: DataFrame): DataFrame = {
    val keys = df.columns.filterNot(_ == W).toIndexedSeq.map(col)
    df.groupBy(keys: _*).agg(sum(col(W)).as(W)).filter(col(W) =!= 0)
  }

  /** Weighted inner join: weights multiply through. */
  def join(l: DataFrame, r: DataFrame, cond: Column): DataFrame = {
    val lw = l.withColumnRenamed(W, "__wl")
    val rw = r.withColumnRenamed(W, "__wr")
    lw.join(rw, cond)
      .withColumn(W, col("__wl") * col("__wr"))
      .drop("__wl", "__wr")
  }

  /** Delta of `A ⋈ B` given old states and this batch's deltas (the bilinear
    * delta rule Δ(A⋈B) = ΔA⋈B ∪ ΔA⋈ΔB ∪ A⋈ΔB): everything the reference's
    * two-sided symmetric-join state machine computes record-at-a-time
    * (no_websocket.java:378–512), as three batch joins per micro-batch.
    *
    * Spelled fully distributed (three joins, not `ΔA⋈(B∪ΔB)` two) so each
    * STATE side sits directly under its join: when the state is a bucketed
    * table ([[IncrementalQ3]]'s spill mode) the join inherits its
    * partitioning and only the batch-sized delta shuffles — a union above
    * the state scan would erase the bucketing and reshuffle the whole
    * state every batch.
    */
  def deltaJoin(aOld: DataFrame, dA: DataFrame,
                bOld: DataFrame, dB: DataFrame, cond: Column): DataFrame =
    join(dA, bOld, cond)
      .unionByName(join(dA, dB, cond))
      .unionByName(join(aOld, dB, cond))
}
