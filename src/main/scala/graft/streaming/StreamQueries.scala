package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract (batch-checkable) entry points for the streaming engine:
  * each runs the changelog pipeline to convergence inside the call and
  * returns a deterministic DataFrame the DuckDB oracle can reproduce.
  */
object StreamQueries {

  // Micro-batches per simulated run. With the two-phase changelog this
  // makes the middle batch a MIXED insert+delete batch (t spans the phase
  // boundary) — the consolidation-triggering case — while the first is
  // append-only and the last delete-only.
  private val K = 3

  /** Generate + parse the full insert/delete changelog and count events per
    * (relation, action) — verifies the generator honors the reference's
    * 2×(nL+nO+nC) event-count contract (README.md:731; SURVEY §1.4).
    */
  def changelogCounts(spark: SparkSession, dir: String): DataFrame = {
    // generate, NOT generateCached: this query scans the stream exactly
    // once, so materializing 2×(nL+nO+nC) lines into block storage first
    // (the memo's localCheckpoint) is pure overhead here
    val parsed = Changelog.parse(Changelog.generate(spark, dir))
    parsed.select(
        when(col("tag") === "CU", "customer")
          .when(col("tag") === "OR", "orders")
          .otherwise("lineitem").as("relation"),
        when(col(ZSet.W) === 1, "Insert").otherwise("Delete").as("action"))
      .groupBy("relation", "action").agg(count(lit(1)).as("n"))
  }

  private def topAsStrings(st: IncrementalQ3.State): DataFrame =
    IncrementalQ3.topN(st)
      .select(col("l_orderkey"), col("o_orderdate").cast("string").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))

  /** Insert-only changelog folded through the incremental pipeline: the
    * converged top-20 must equal the batch/oracle Q3 answer exactly
    * (SURVEY §5 — "final streaming answer over the all-inserts prefix ≡
    * batch answer").
    */
  def q3Converged(spark: SparkSession, dir: String): DataFrame =
    topAsStrings(IncrementalQ3.runBatches(spark,
      Changelog.generateCached(spark, dir, insertOnly = true), K))

  /** Full build-up-then-tear-down changelog (reference default capacity,
    * StreamDataProcessor.py:22,136): every insert is later retracted, so
    * the converged aggregate must be EMPTY — the strongest retraction
    * check (exact-decimal state cancels to zero, not ≈zero).
    */
  def q3FullCycle(spark: SparkSession, dir: String): DataFrame =
    topAsStrings(IncrementalQ3.runBatches(spark,
      Changelog.generateCached(spark, dir), K))

  /** MID-STREAM snapshot: fold the two-phase changelog only up to the end
    * of batch 2-of-3 — mid-teardown, with ~nL/3 of the deletes applied —
    * and emit that intermediate top-20. This is the reference's defining
    * behavior (continuous emission while ingesting, no_websocket.java:
    * 554–582) made oracle-checkable: the prefix boundary T = ceil(4·nL/3)
    * sits in phase 2, where a row is live iff its insertion trigger
    * exceeds T − nL, so DuckDB can reconstruct the exact net table state
    * from the same closed-form trigger arithmetic the generator uses
    * (possible because the generator's per-table ordering is
    * key-complete, hence every rank is deterministic).
    */
  def q3PrefixSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val ev = Changelog.generateCached(spark, dir)
    val tMax = ev.agg(max(col("t"))).head().getLong(0)
    val boundary = (2L * tMax + 2L) / 3L // largest t in batch ≤ 1 of 3
    topAsStrings(IncrementalQ3.runBatches(spark,
      ev.filter(col("t") <= boundary), k = 2, tMaxKnown = Some(boundary)))
  }

  /** A SECOND incremental query over the same changelog — revenue per
    * order priority — on the SAME z-set machinery: the aggregation grain
    * is a parameter ([[IncrementalQ3.DefaultAggKeys]]), so nothing but the
    * key list changes. Demonstrates the IVM engine is not Q3-shaped.
    * Converged insert-only answer ≡ the batch group-sum (DuckDB oracle).
    */
  def priorityRevenueConverged(spark: SparkSession, dir: String): DataFrame = {
    val st = IncrementalQ3.runBatches(spark,
      Changelog.generateCached(spark, dir, insertOnly = true), k = 2,
      aggKeys = Seq("o_orderpriority"))
    st.agg
      .select(col("o_orderpriority"), col("revenue").cast("double").as("revenue"))
      .orderBy("o_orderpriority")
  }
}
