package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Query-PARAMETRIC incremental view maintenance over the CU/OR/LI
  * changelog — the proof that the z-set fold is an ENGINE, not a Q3
  * implementation.
  *
  * [[IncrementalQ3]] is the production fold: amortized compaction,
  * dirty-bucket spill, adaptive engagement, multi-grain aggregates — but
  * its relation projections and state schemas are Q3's. This module
  * factors the QUERY out of the fold: an [[IvmSpec]] names the per-relation
  * delta projections (parse-time filter + column pruning, the reference's
  * pre-join placement, no_websocket.java:192–201), the two join
  * conditions, the post-join projection, and the maintained grain; the
  * fold itself — the bilinear delta rule per join ([[ZSet.deltaJoin]]),
  * weighted-sum aggregation, net-zero state cleanup — is shared by every
  * query verbatim.
  *
  * Design rule the specs follow (and a real deployment would): STATIC
  * dimensions stay OUT of the incremental state. Q5 joins supplier ⋈
  * nation ⋈ region and Q10 joins nation/customer display columns, but
  * none of those relations arrive on the stream — so the fold maintains
  * the aggregate at the finest grain the STREAMED relations determine
  * ((c_nationkey, l_suppkey) for Q5, c_custkey for Q10), and the driver
  * query finishes with broadcast joins against the parquet dims at
  * emission. Sound because the maintained measures are additive and the
  * dim attributes are functionally dependent on the grain keys;
  * scale-critical because the incremental state never widens with
  * dimension payload, and a dim UPDATE (repriced region, renamed
  * customer) needs no state rebuild at all — the next emission just joins
  * the new dim rows.
  *
  * State upkeep here is the simple form: consolidate-every-batch with
  * lazily materialized `localCheckpoint` cuts (lineage stays one batch
  * deep). The amortized-compaction / bucketed-spill variants of that
  * upkeep are [[IncrementalQ3]]'s and are proven there; this module pins
  * query-parametricity, not the storage policy.
  */
object IncrementalIvm {

  private val revType = "decimal(38,4)"

  /** A 3-relation incremental query: deltas in, maintained aggregate out.
    *
    * @param dC        parsed changelog → customer-relation delta z-set
    *                  (filter + projection; must keep [[ZSet.W]])
    * @param dO        same for orders
    * @param dL        same for lineitem; must produce the additive
    *                  `measures` columns (e.g. `revenue`)
    * @param coCond    join condition customer ⋈ orders
    * @param coCols    columns kept after c⋈o (the l-side join key plus
    *                  whatever the grain needs; [[ZSet.W]] implicit)
    * @param colCond   join condition (c⋈o) ⋈ lineitem
    * @param aggKeys   the maintained grain — columns of the 3-way join
    * @param measures  additive measure columns summed per group (a
    *                  weighted row count `cnt` is always maintained too;
    *                  groups whose cnt nets to zero are dropped — exact
    *                  under retraction by the changelog's ± pairing)
    */
  final case class IvmSpec(dC: DataFrame => DataFrame,
                           dO: DataFrame => DataFrame,
                           dL: DataFrame => DataFrame,
                           coCond: Column,
                           coCols: Seq[String],
                           colCond: Column,
                           aggKeys: Seq[String],
                           measures: Seq[String] = Seq("revenue"))

  /** All maintained state: the three relation z-sets, the c⋈o
    * intermediate, and the grain aggregate. Every frame is consolidated
    * and cut from its lineage at each step.
    */
  final case class State(c: DataFrame, o: DataFrame, l: DataFrame,
                         co: DataFrame, agg: DataFrame)

  private def emptyLike(spark: SparkSession, proto: DataFrame): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      proto.schema)

  def init(spark: SparkSession, spec: IvmSpec): State = {
    // Derive every state schema from the spec itself by projecting an
    // empty parse — no per-query schema lists to keep in sync.
    val noLines = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("line",
          org.apache.spark.sql.types.StringType))))
    val parsed = Changelog.parse(noLines)
    val c = spec.dC(parsed); val o = spec.dO(parsed); val l = spec.dL(parsed)
    val co = ZSet.join(c, o, spec.coCond)
      .select((spec.coCols.map(col) :+ col(ZSet.W)): _*)
    val agg = aggDelta(spec, ZSet.join(co, l, spec.colCond))
    State(emptyLike(spark, c), emptyLike(spark, o), emptyLike(spark, l),
      emptyLike(spark, co), emptyLike(spark, agg))
  }

  /** Weighted partial aggregate of a (signed) join-result delta. */
  private def aggDelta(spec: IvmSpec, joined: DataFrame): DataFrame = {
    val outs = spec.measures.map(m =>
      sum(col(ZSet.W) * col(m)).cast(revType).as(m)) :+
      sum(col(ZSet.W)).as("cnt")
    joined.groupBy(spec.aggKeys.map(col): _*).agg(outs.head, outs.tail: _*)
  }

  /** Merge an aggregate-state frame with a new partial at the same grain.
    * Lazy: the merge chain is grain-sized per link and is evaluated once,
    * at emission (or at the next chained merge's checkpoint).
    */
  private def mergeAgg(spec: IvmSpec, old: DataFrame, delta: DataFrame): DataFrame = {
    val outs = spec.measures.map(m => sum(col(m)).cast(revType).as(m)) :+
      sum(col("cnt")).as("cnt")
    old.unionByName(delta)
      .groupBy(spec.aggKeys.map(col): _*)
      .agg(outs.head, outs.tail: _*)
      .filter(col("cnt") =!= 0)
      .localCheckpoint(eager = false)
  }

  /** Apply one micro-batch of raw changelog lines. Same shape as
    * [[IncrementalQ3.step]]'s in-memory path: one parse of the batch
    * (cached — each relation delta is reused by two joins plus upkeep),
    * a bilinear ΔJ per join, delta-sized aggregation.
    *
    * State upkeep is PURE UNION: z-set algebra is linear, so joins and
    * weighted sums distribute over an unconsolidated state — appending
    * the checkpointed delta is all correctness needs, and it keeps each
    * batch's materialization DELTA-sized (the eager checkpoints below
    * are the only jobs a step runs). Re-grouping the full state every
    * batch — the first cut of this fold — paid an O(state) shuffle per
    * state per batch for nothing on an insert-only run.
    *
    * `consolidateState` flips that trade for RETRACTION-heavy runs: with
    * deletes in flight, consolidation is what lets ± pairs cancel OUT of
    * the state, so each batch's joins see the net rows instead of the
    * ever-growing ± union (measured on the sf0.1 ± cycle: 89 s
    * unconsolidated vs ~30 s consolidated; the insert-only converged
    * runs show the exact opposite split). The consolidations are LAZY
    * checkpoints — they read only already-checkpointed deltas, so they
    * piggyback on the next batch's first materialization and the batch
    * cache can still be dropped here. Bounding state under sustained
    * retraction at production scale is [[IncrementalQ3]]'s
    * amortized-compaction job; this flag is the same policy at
    * fold-simulation scale.
    */
  def step(st: State, lines: DataFrame, spec: IvmSpec,
           consolidateState: Boolean = false): State = {
    val parsed = Changelog.parse(lines)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager: everything reading `parsed` is materialized inside the step
    // so the batch cache can be dropped before returning
    val dC = spec.dC(parsed).localCheckpoint()
    val dO = spec.dO(parsed).localCheckpoint()
    val dL = spec.dL(parsed).localCheckpoint()

    // the c⋈o delta IS consolidated before checkpointing: it feeds two
    // joins in the next batch, and at delta size the re-group is cheap
    val dCO = ZSet.consolidate(
        ZSet.deltaJoin(st.c, dC, st.o, dO, spec.coCond)
          .select((spec.coCols.map(col) :+ col(ZSet.W)): _*))
      .localCheckpoint()
    val dCOL = ZSet.deltaJoin(st.co, dCO, st.l, dL, spec.colCond)
    val dAgg = aggDelta(spec, dCOL)

    def upkeep(state: DataFrame, delta: DataFrame): DataFrame = {
      val merged = state.unionByName(delta)
      // eager: each consolidated state is pinned per batch, so the ±
      // cancellation pays off immediately in THIS batch's join sizes and
      // the end-of-run evaluation never re-walks a deep lazy chain
      if (consolidateState) ZSet.consolidate(merged).localCheckpoint()
      else merged
    }
    val next = State(
      c = upkeep(st.c, dC),
      o = upkeep(st.o, dO),
      l = upkeep(st.l, dL),
      co = upkeep(st.co, dCO),
      agg = mergeAgg(spec, st.agg, dAgg))
    parsed.unpersist()
    next
  }

  /** Fold `k` event-time-contiguous micro-batches of the changelog, same
    * batch assignment as [[IncrementalQ3.runBatches]].
    */
  def runBatches(spark: SparkSession, events: DataFrame, k: Int,
                 spec: IvmSpec, consolidateState: Boolean = false): State = {
    val tMax = events.agg(max(col("t"))).head().getLong(0)
    val batched = events.withColumn("batch",
      least(expr(s"CAST(((t - 1L) * ${k}L) DIV ${tMax}L AS INT)"), lit(k - 1)))
    (0 until k).foldLeft(init(spark, spec)) { (st, b) =>
      step(st, batched.filter(col("batch") === b).select("line"), spec,
        consolidateState)
    }
  }
}
