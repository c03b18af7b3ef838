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
    * batch answer"). Served by [[convergedFold]] — ONE fold maintains both
    * this query's grain and [[priorityRevenueConverged]]'s.
    */
  def q3Converged(spark: SparkSession, dir: String): DataFrame = {
    val f = convergedFold(spark, dir)
    asRows(spark, f.q3Schema, f.q3)
  }

  /** ONE FOLD, MANY GRAINS (r10 verdict item 4): the two insert-only
    * converged driver queries — Q3's top-20 grain and the per-priority
    * revenue grain — are served by a SINGLE fold that maintains both
    * aggregates off one shared ΔJ per batch ([[IncrementalQ3.State.aggs]]).
    * This is the multi-query IVM shape a real deployment runs: N standing
    * queries over one changelog pay one delta-join pipeline, not N folds.
    * Results are memoized as collected rows (same lifecycle argument as
    * [[fullCycleFold]]); whichever query runs first pays the fold.
    */
  private final case class ConvFold(q3Schema: org.apache.spark.sql.types.StructType,
                                    q3: Seq[org.apache.spark.sql.Row],
                                    prSchema: org.apache.spark.sql.types.StructType,
                                    pr: Seq[org.apache.spark.sql.Row],
                                    odSchema: org.apache.spark.sql.types.StructType,
                                    od: Seq[org.apache.spark.sql.Row])

  private val convCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, ConvFold]]())

  private def convergedFold(spark: SparkSession, dir: String): ConvFold = {
    val perSession = convCache.synchronized {
      convCache.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty[String, ConvFold])
    }
    perSession.getOrElseUpdate(dir, {
      val st = IncrementalQ3.runBatches(spark,
        Changelog.generateCached(spark, dir, insertOnly = true), K,
        grains = Seq(IncrementalQ3.DefaultAggKeys, Seq("o_orderpriority"),
          Seq("o_orderdate")))
      val q3 = topAsStrings(st)
      val pr = st.aggs(1)._2
        .select(col("o_orderpriority"), col("revenue").cast("double").as("revenue"))
        .orderBy("o_orderpriority")
      val od = st.aggs(2)._2
        .select(col("o_orderdate").cast("string").as("o_orderdate"),
          col("revenue").cast("double").as("revenue"),
          col("cnt").as("n_items"))
        .orderBy("o_orderdate")
      ConvFold(q3.schema, q3.collect().toIndexedSeq,
        pr.schema, pr.collect().toIndexedSeq,
        od.schema, od.collect().toIndexedSeq)
    })
  }

  private def asRows(spark: SparkSession,
                     schema: org.apache.spark.sql.types.StructType,
                     rows: Seq[org.apache.spark.sql.Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows.asJava, schema)
  }

  /** ONE shared fold of the full two-phase changelog serves BOTH driver
    * queries over it (VERDICT r4 item 3 — the prefix snapshot used to be
    * its own third full fold, the bench's most expensive query): the
    * intermediate top-20 is captured at the batch-2/3 boundary via
    * [[IncrementalQ3.runBatches]]'s onBatch hook, the fold continues to
    * the converged (empty) end state. Both results are memoized as
    * COLLECTED rows (≤20 each), never DataFrames: Bench/Verify's
    * per-query isolation bulk-unpersists every block between queries,
    * which would orphan a checkpointed frame, but local rows survive —
    * whichever query runs first pays the fold, the other replays rows.
    */
  private final case class Q3Fold(schema: org.apache.spark.sql.types.StructType,
                                  snapshot: Seq[org.apache.spark.sql.Row],
                                  converged: Seq[org.apache.spark.sql.Row])

  // weak keys: same lifecycle argument as Changelog.generateCached's memo
  private val foldCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Q3Fold]]())

  /** Drop the session's fold memo so the next full-cycle query genuinely
    * re-executes. The memo exists so ONE fold serves both driver queries
    * (Verify correctness runs keep it); Bench invalidates it between
    * measurements of `stream_q3_full_cycle` so a re-measure is a real
    * second execution, not a 0.05 s memo read.
    */
  private[graft] def invalidateFold(spark: SparkSession): Unit = {
    foldCache.synchronized {
      Option(foldCache.get(spark)).foreach(_.clear())
    }
    convCache.synchronized {
      Option(convCache.get(spark)).foreach(_.clear())
    }
  }

  private def fullCycleFold(spark: SparkSession, dir: String): Q3Fold = {
    val perSession = foldCache.synchronized {
      foldCache.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty[String, Q3Fold])
    }
    perSession.getOrElseUpdate(dir, {
      var snapshot: Seq[org.apache.spark.sql.Row] = Seq.empty
      val fin = IncrementalQ3.runBatches(spark,
        Changelog.generateCached(spark, dir), K,
        onBatch = (b, st) =>
          if (b == K - 2) snapshot = topAsStrings(st).collect().toIndexedSeq)
      val conv = topAsStrings(fin)
      Q3Fold(conv.schema, snapshot, conv.collect().toIndexedSeq)
    })
  }

  private def asDf(spark: SparkSession, f: Q3Fold,
                   rows: Q3Fold => Seq[org.apache.spark.sql.Row]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(rows(f).asJava, f.schema)
  }

  /** Full build-up-then-tear-down changelog (reference default capacity,
    * StreamDataProcessor.py:22,136): every insert is later retracted, so
    * the converged aggregate must be EMPTY — the strongest retraction
    * check (exact-decimal state cancels to zero, not ≈zero).
    */
  def q3FullCycle(spark: SparkSession, dir: String): DataFrame =
    asDf(spark, fullCycleFold(spark, dir), _.converged)

  /** FULL ± CYCLE FOLDED THROUGH THE SPILLED STATE PATH — the same
    * exact-cancellation contract as [[q3FullCycle]], but with the z-set
    * states MERGEd into bucketed tables at every compaction
    * (`graft.ivm.spill.dir`, [[IncrementalQ3]]'s bounded-memory mode) so
    * the driver's oracle gate exercises the 100×-scale storage path, not
    * just the in-memory fold. The changelog is capacity-windowed (nL/4)
    * so deletes interleave from early on and the fold compacts — hence
    * spills — mid-stream; a fold that never spilled would silently test
    * nothing, so that is a loud failure. Converged answer: exactly empty,
    * reconstructed THROUGH two generations of bucketed-table state.
    */
  def q3SpilledCycle(spark: SparkSession, dir: String): DataFrame =
    q3SpilledCycle(spark, dir, format = None)

  /** The SAME full-±-cycle spilled fold, FORMAT-pinned to the bucketed-
    * parquet implementation — since r14 the COMPATIBILITY format (the
    * mergelog is the session default, promoted on the 10× evidence), so
    * the pinned query flipped sides: the contract spec proves the
    * [[SpillFormat]] seam's algebra for both formats, but only a
    * driver-oracle-gated full cycle proves a format under real compaction
    * cadence, version GC, and the exact-cancellation contract — and BOTH
    * formats keep that gate (`stream_q3_spilled` runs the default).
    * Identical oracle to `stream_q3_spilled`.
    */
  def q3SpilledCycleParquet(spark: SparkSession, dir: String): DataFrame =
    q3SpilledCycle(spark, dir, format = Some("parquet"))

  private def q3SpilledCycle(spark: SparkSession, dir: String,
                             format: Option[String]): DataFrame = {
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivm-spill-q").toString
    // bind the fresh root to the requested format BEFORE first spill —
    // thereafter every write/read/GC resolves through the root's marker
    format.foreach(SpillFormat.pin(root, _))
    try {
      // the spill root is THREADED as a parameter (ADVICE r10): mutating
      // the process-global graft.ivm.spill.dir here would silently flip
      // any concurrently-running fold in the same JVM into spill mode
      val fin = {
        // the capacity-windowed changelog is DISK-staged once per
        // (session, fixture) — generateCached's memo would be wiped by the
        // bench's per-query resetSession (its checkpoint blocks are
        // unrecoverable after a bulk unpersist), while a parquet staging
        // survives it, so re-measures pay the fold, not the generation
        val staged = graft.sources.Staging.ensure(
          graft.sources.Staging.dirFor(spark, "q3spill", dir)) { out =>
          val nL = graft.sources.Tables.table(spark, dir, "lineitem").count()
          Changelog.generate(spark, dir, capacity = Some(math.max(1L, nL / 4)))
            .write.mode("overwrite").parquet(out)
        }
        val ev = spark.read.parquet(staged)
        IncrementalQ3.runBatches(spark, ev, 6, spillDir = Some(root))
      }
      require(fin.spillHistory.nonEmpty,
        "stream_q3_spilled: the fold never compacted — the spill path went unexercised")
      val conv = topAsStrings(fin)
      val rows = conv.collect().toIndexedSeq // materialize BEFORE dropping tables
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.asJava, conv.schema)
    } finally
      // scans the root, so a fold that failed mid-stream is reaped too
      IncrementalQ3.cleanupSpillRoot(spark, root)
  }

  /** ADAPTIVE SPILL, crossed MID-RUN (r13 verdict item 1): the spill is a
    * STATE-SIZE POLICY, not a constructor flag. The insert-only changelog
    * is folded in 8 batches with a spill dir and a DATA-DERIVED
    * threshold (nEvents/8 consolidated rows — below the converged state's
    * ~0.55·nEvents at any SF, above the first compaction's share), so the
    * fold provably starts IN-MEMORY (the first compaction consolidates on
    * the heap — structurally pinned), crosses the threshold at a
    * compaction-time measurement mid-stream, latches engagement, and
    * MERGEs the post-engagement compaction into the bucketed tables. The
    * converged answer must still be the batch Q3 top-20 — the strong
    * oracle, unchanged by where the state lived. (Post-engagement batches
    * ride the IDENTICAL code path as an always-on spill fold — the latch
    * is the only new machinery, so this gate buys the mid-run switch and
    * leaves carry-forward/GC to the always-on gates that already prove
    * them.)
    */
  def q3SpillAdaptive(spark: SparkSession, dir: String): DataFrame = {
    val events = Changelog.generateCached(spark, dir, insertOnly = true)
    val root = java.nio.file.Files
      .createTempDirectory("graft-ivm-adaptive").toString
    try {
      val n = events.count()
      val tau = math.max(1L, n / 8)
      var inMemCompactions = 0
      var engagedAtBatch = -1
      val fin = IncrementalQ3.runBatches(spark, events, 8,
        spillDir = Some(root), spillAtRows = tau,
        onBatch = (b, st) => {
          // dirty resets to 0 exactly at compactions (every batch counts
          // toward the cadence under a spill dir); no spill version yet
          // means the compaction consolidated on the heap
          if (st.dirty == 0 && st.spillHistory.isEmpty) inMemCompactions += 1
          if (st.spillEngaged && engagedAtBatch < 0) engagedAtBatch = b
        })
      require(inMemCompactions >= 1,
        "adaptive spill: no in-memory compaction preceded engagement — " +
          "the fold never ran below its threshold, the policy went untested")
      require(fin.spillHistory.nonEmpty,
        s"adaptive spill: the threshold ($tau rows of ${n} events) was " +
          "never crossed — the engagement path went unexercised")
      require(engagedAtBatch > 0 && engagedAtBatch < 7,
        s"adaptive spill: engagement at batch $engagedAtBatch is not " +
          "mid-run — nothing spilled under the policy after it")
      val conv = topAsStrings(fin)
      val rows = conv.collect().toIndexedSeq // materialize BEFORE cleanup
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.asJava, conv.schema)
    } finally IncrementalQ3.cleanupSpillRoot(spark, root)
  }

  /** MID-STREAM snapshot: the top-20 after batch 2-of-3 of the SAME fold
    * [[q3FullCycle]] consumes — mid-teardown, with ~nL/3 of the deletes
    * applied. This is the reference's defining behavior (continuous
    * emission while ingesting, no_websocket.java:554–582) made
    * oracle-checkable: the batch-2/3 boundary T = (2·tMax+2) div 3 sits in
    * phase 2, where a row is live iff its insertion trigger exceeds
    * T − nL, so DuckDB can reconstruct the exact net table state from the
    * same closed-form trigger arithmetic the generator uses (possible
    * because the generator's per-table ordering is key-complete, hence
    * every rank is deterministic). Snapshot-at-boundary equals the old
    * separate prefix fold because z-set folds are batching-invariant:
    * both apply exactly the events with t ≤ T.
    */
  def q3PrefixSnapshot(spark: SparkSession, dir: String): DataFrame =
    asDf(spark, fullCycleFold(spark, dir), _.snapshot)

  /** A SECOND incremental query over the same changelog — revenue per
    * order priority — on the SAME z-set machinery: the aggregation grain
    * is a parameter, so nothing but the key list changes. Since r11 it is
    * the second grain of [[convergedFold]]'s SHARED fold: both converged
    * queries pay one delta-join pipeline per batch (multi-query IVM).
    * Converged insert-only answer ≡ the batch group-sum (DuckDB oracle).
    */
  def priorityRevenueConverged(spark: SparkSession, dir: String): DataFrame = {
    val f = convergedFold(spark, dir)
    asRows(spark, f.prSchema, f.pr)
  }

  /** A THIRD grain on the shared fold — revenue per order DATE. Unlike the
    * 5-value priority grain this one is FACT-SIZED (hundreds of distinct
    * dates, growing with the data), which is exactly the shape the
    * per-grain dirty-bucket probe exists for (r11 verdict item 4): under
    * spill its agg table compacts O(dirty buckets), not O(state) — pinned
    * by IncrementalSpillSpec's fact-grain carry-forward assertion.
    * Converged insert-only answer ≡ the batch per-date group-sum (DuckDB
    * oracle).
    */
  def orderdateRevenueConverged(spark: SparkSession, dir: String): DataFrame = {
    val f = convergedFold(spark, dir)
    asRows(spark, f.odSchema, f.od)
  }

  /** EVENT-TIME Q3 WITH LATE-DATA ACCOUNTING (r10 verdict item 6) — the
    * semantic extension the processing-time-only reference lacks (SURVEY
    * §2.8), composing `stream_windows_late`'s watermark discipline with
    * the IVM fold. The insert-only changelog's trigger `t` is the event
    * time; ARRIVAL is perturbed deterministically: every lineitem insert
    * with `l_orderkey % 10 == 3` is withheld and delivered in one final
    * batch, long after the watermark (max event time seen, delay 0) has
    * passed it. Each arriving batch is split at the CURRENT watermark —
    * `t < wm` is dropped-and-counted, the rest folds — so the final
    * answer is Q3 over exactly the on-time events, with the dropped count
    * part of the asserted output. DuckDB reproduces both sides in closed
    * form: the watermark before the late batch is always `nL` (the last
    * customer/orders insert fires at trigger nL), lineitem's event time
    * is its all-columns rank, so late ≡ deferred ∧ rank < nL.
    */
  def q3EventTime(spark: SparkSession, dir: String): DataFrame = {
    val (top, dropped, _) = q3EventTimeFold(spark, dir, delay = 0L)
    top.withColumn("dropped_late", lit(dropped))
  }

  /** BOUNDED-DELAY WATERMARK (the Flink-style allowed-lateness heuristic —
    * the one watermark discipline the engine's event-time family did not
    * yet offer, r12 verdict "missing" #5): the watermark trails the max
    * arrived event time by a DELAY δ, so a straggler within δ of the
    * frontier is ADMITTED and folds normally; only events more than δ
    * behind are dropped-and-counted. δ here is data-derived (nL/20 —
    * 5% of the event-time span) so the oracle reproduces it exactly:
    * a deferred lineitem is dropped iff its rank < nL − δ, admitted
    * otherwise, and the answer is Q3 over everything but the dropped set,
    * with BOTH totals asserted (zero admitted would mean the window
    * tested nothing — loudly required away).
    */
  def q3EventTimeDelayed(spark: SparkSession, dir: String): DataFrame = {
    val nL = graft.sources.Tables.table(spark, dir, "lineitem").count()
    val (top, dropped, admitted) = q3EventTimeFold(spark, dir, delay = nL / 20)
    require(admitted > 0, "bounded-delay event-time Q3: no straggler fell " +
      "inside the lateness window — the delay semantics went untested")
    top.withColumn("dropped_late", lit(dropped))
      .withColumn("admitted_late", lit(admitted))
  }

  /** The shared fold: watermark = max arrived event time − `delay`; an
    * arriving event is dropped iff `t < wm − delay`, ADMITTED-LATE iff
    * `wm − delay ≤ t < wm` (inside the allowed-lateness window; 0 by
    * construction for on-time arrivals, which are frontier-ordered).
    * Returns (converged top-20, dropped count, admitted-late count).
    */
  private def q3EventTimeFold(spark: SparkSession, dir: String,
                              delay: Long): (DataFrame, Long, Long) = {
    val events = Changelog.generateCached(spark, dir, insertOnly = true)
    val fields = split(substring(col("line"), 5, Int.MaxValue), "\\|")
    val withDef = events.withColumn("deferred",
      substring(col("line"), 2, 2) === "LI" &&
        element_at(fields, 1).cast("long") % 10 === 3)
    val tMax = events.agg(max(col("t"))).head().getLong(0)
    val batched = withDef.filter(!col("deferred")).withColumn("batch",
      least(expr(s"CAST(((t - 1L) * ${K}L) DIV ${tMax}L AS INT)"), lit(K - 1)))
    val arrivals: Seq[DataFrame] =
      (0 until K).map(b => batched.filter(col("batch") === b).drop("batch")) :+
        withDef.filter(col("deferred"))
    var wm = Long.MinValue // max event time arrived; cutoff is wm − delay
    var dropped = 0L
    var admitted = 0L
    var st = IncrementalQ3.init(spark)
    arrivals.foreach { a =>
      if (wm > Long.MinValue) {
        // one job for both counters (cutoff split + window occupancy)
        val s = a.agg(
          sum(when(col("t") < wm - delay, 1L).otherwise(0L)).as("d"),
          sum(when(col("t") >= wm - delay && col("t") < wm, 1L)
            .otherwise(0L)).as("w")).head()
        dropped += (if (s.isNullAt(0)) 0L else s.getLong(0))
        admitted += (if (s.isNullAt(1)) 0L else s.getLong(1))
      }
      val onTime = if (wm > Long.MinValue) a.filter(col("t") >= wm - delay)
                   else a
      st = IncrementalQ3.step(st, onTime.select("line"))
      val mx = a.agg(max(col("t"))).head()
      if (!mx.isNullAt(0)) wm = math.max(wm, mx.getLong(0))
    }
    require(dropped > 0, "event-time Q3: no late events were dropped — " +
      "the deterministic lateness injection failed, the query is testing nothing")
    (topAsStrings(st), dropped, admitted)
  }

  /** EVENT-TIME LATENESS UNDER RETRACTION (r12 verdict item 7) — the
    * full ± cycle with DELETES arriving late, which forces the question
    * insert-only event time never asks: what does "drop late data" mean
    * when the late datum is a retraction? Drop-and-count-everything
    * double-counts revenue forever (the on-time insert stays in the
    * state); retract-everything corrupts the state when the late
    * delete's own insert was itself dropped (a −1 residue for a row the
    * query never emitted). The policy gated here is the consistent one:
    *
    *  - a late INSERT is dropped and counted (its window is finalized) —
    *    and leaves a TOMBSTONE;
    *  - a late DELETE whose insert was APPLIED still retracts, counted
    *    as `late_applied_deletes` (not retracting is the double-count);
    *  - a late DELETE matching a tombstone — its insert was itself
    *    dropped — is dropped and counted (retracting it would fabricate
    *    a −1 row the state never held).
    *
    * So a row and its retraction share ONE fate, whatever the arrival
    * pattern: both applied or both dropped — exactly the invariant that
    * makes the converged full-cycle state EXACTLY EMPTY again.
    *
    * Lateness injection is deterministic and disjoint by class:
    * lineitems with `l_orderkey % 10 == 3` defer BOTH events (insert
    * dropped, delete tombstone-dropped); `% 10 == 7` defer the DELETE
    * only (insert applied on time, delete applied late). Both classes
    * restrict to insertion rank < nL so every deferred event is provably
    * late (the on-time stream's final deletes always carry event time
    * `nL + capacity`); the batch-boundary watermark coincides with the
    * PREFIX watermark here because arrival order is a pure function of
    * the stream (on-time events in event-time order, then the deferred
    * tail), so the same closed-form DuckDB oracle gates any slicing.
    * Output: one row of the four accounting totals, `live_groups = 0`
    * being the exact-cancellation-through-lateness proof.
    */
  def q3EventTimeCycle(spark: SparkSession, dir: String): DataFrame =
    q3EventTimeCycleK(spark, dir, K)

  /** [[q3EventTimeCycle]] with the on-time batch count as a parameter —
    * the spec pins the answer IDENTICAL under different slicings (the
    * policy is per-event, so batching must not matter).
    */
  private[streaming] def q3EventTimeCycleK(spark: SparkSession, dir: String,
                                           k: Int): DataFrame = {
    val events = Changelog.generateCached(spark, dir) // full ± cycle, cap = nL
    val nL = graft.sources.Tables.table(spark, dir, "lineitem").count()
    val fields = split(substring(col("line"), 5, Int.MaxValue), "\\|")
    val isLI = substring(col("line"), 2, 2) === "LI"
    val isDel = substring(col("line"), 1, 1) === "-"
    val key = element_at(fields, 1).cast("long")
    // idx IS the lineitem insertion rank (generator contract): rank < nL
    // keeps the max-rank row's events on time, so EVERY deferred event is
    // late under the final on-time watermark nL + cap = 2·nL
    val defer = isLI && col("idx") < nL &&
      (key % 10 === 3 || (key % 10 === 7 && isDel))
    val withDef = events.withColumn("deferred", defer)
    val onTime = withDef.filter(!col("deferred"))
    val tMax = onTime.agg(max(col("t"))).head().getLong(0)
    val batched = onTime.withColumn("batch",
      least(expr(s"CAST(((t - 1L) * ${k}L) DIV ${tMax}L AS INT)"), lit(k - 1)))
    val arrivals: Seq[DataFrame] =
      (0 until k).map(b => batched.filter(col("batch") === b).drop("batch")) :+
        withDef.filter(col("deferred"))
    val spark2 = spark; import spark2.implicits._
    var wm = Long.MinValue
    var droppedIns = 0L; var droppedDel = 0L; var lateApplied = 0L
    // tombstones: bodies (line sans sign) of dropped late inserts — the
    // set a late delete must check before retracting. DISTINCT is sound:
    // identical rows share a key, hence a class, hence a fate.
    var tombstones = Seq.empty[String].toDF("body")
    var st = IncrementalQ3.init(spark)
    arrivals.foreach { a =>
      val aa = a.localCheckpoint()
      val late = if (wm > Long.MinValue) aa.filter(col("t") < wm)
                 else aa.filter(lit(false))
      val lateIns = late.filter(!isDel)
        .select(substring(col("line"), 2, Int.MaxValue).as("body"))
        .distinct().localCheckpoint()
      val nIns = lateIns.count()
      if (nIns > 0) {
        droppedIns += late.filter(!isDel).count()
        tombstones = tombstones.unionByName(lateIns).localCheckpoint()
      }
      val lateDel = late.filter(isDel)
        .withColumn("body", substring(col("line"), 2, Int.MaxValue))
      val nLateDel = lateDel.count()
      if (nLateDel > 0) {
        val applied = lateDel.join(tombstones, Seq("body"), "left_anti")
          .localCheckpoint()
        val nApplied = applied.count()
        droppedDel += nLateDel - nApplied
        lateApplied += nApplied
        st = IncrementalQ3.step(st,
          aa.filter(col("t") >= wm).select("line")
            .unionByName(applied.select("line")))
      } else {
        st = IncrementalQ3.step(st,
          (if (wm > Long.MinValue) aa.filter(col("t") >= wm) else aa)
            .select("line"))
      }
      val mx = aa.agg(max(col("t"))).head()
      if (!mx.isNullAt(0)) wm = math.max(wm, mx.getLong(0))
    }
    require(droppedIns > 0 && lateApplied > 0 && droppedDel > 0,
      s"event-time cycle: lateness injection degenerate (ins=$droppedIns, " +
        s"del=$droppedDel, applied=$lateApplied) — the policy went untested")
    val live = st.agg.count()
    Seq((droppedIns, droppedDel, lateApplied, live))
      .toDF("dropped_late_inserts", "dropped_late_deletes",
        "late_applied_deletes", "live_groups")
  }

  /** RETRACTION FOR NON-INVERTIBLE AGGREGATES — per-priority MIN/MAX
    * order value maintained under the ±OR changelog. SUM-family
    * aggregates invert (apply the delta — [[RetractableSum]]); MIN/MAX do
    * NOT: deleting the current minimum needs the SUPPORTING MULTISET to
    * surface the runner-up. The z-set answer: the maintained state IS the
    * consolidated support at the grain the aggregate needs —
    * `(priority, totalprice) → multiplicity` — kept by the same
    * [[ZSet.consolidate]] the Q3 fold uses (grain-compressed: state size
    * is DISTINCT (priority, price) pairs, not order count), and extrema
    * are a query over live support at emission. Per-batch cost:
    * delta-sized consolidation shuffle + support-sized emission aggregate
    * — the honest frame-native cost; the O(log n)-per-event alternative
    * is [[RetractableSum]]'s transformWithState shape with a per-key
    * ordered map. Converged insert-only answer ≡ the batch extrema
    * (DuckDB oracle); the full ±cycle converges to EMPTY support
    * (spec-pinned, the non-invertible retraction check).
    */
  def priorityExtremaConverged(spark: SparkSession, dir: String): DataFrame =
    extremaOf(extremaFold(spark,
      Changelog.generateCached(spark, dir, insertOnly = true), k = 2))

  /** Fold the ±OR events into the consolidated (priority, price) support. */
  private[streaming] def extremaFold(spark: SparkSession, events: DataFrame,
                                     k: Int): DataFrame = {
    val tMax = events.agg(max(col("t"))).head().getLong(0)
    val batched = events.withColumn("batch",
      least(expr(s"CAST(((t - 1L) * ${k}L) DIV ${tMax}L AS INT)"), lit(k - 1)))
    val init = {
      import spark.implicits._
      Seq.empty[(String, Double, Long)]
        .toDF("o_orderpriority", "o_totalprice", ZSet.W)
    }
    (0 until k).foldLeft(init) { (st, b) =>
      val delta = Changelog.orders(Changelog.parse(
          batched.filter(col("batch") === b).select("line")))
        .select(col("o_orderpriority"), col("o_totalprice"), col(ZSet.W))
      ZSet.consolidate(st.unionByName(delta)).localCheckpoint()
    }
  }

  /** Extrema over live support (weights are multiplicities ≥ 1 here). */
  private[streaming] def extremaOf(support: DataFrame): DataFrame =
    support.groupBy(col("o_orderpriority"))
      .agg(min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        sum(col(ZSet.W)).cast("long").as("n_orders"))
      .orderBy("o_orderpriority")
}
