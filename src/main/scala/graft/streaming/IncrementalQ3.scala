package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Relational

/** Incremental (retraction-correct) TPC-H Q3 over a changelog stream —
  * the reference's capability #2 (SURVEY.md §0), re-expressed as
  * signed-weight incremental view maintenance.
  *
  * The reference chains four hand-built stateful operators
  * (no_websocket.java:168–241): symmetric join customer⋈orders, symmetric
  * join (c⋈o)⋈lineitem, retractable SUM, single-task top-N. Here the same
  * dataflow is a per-micro-batch delta computation over z-set states:
  *
  * {{{
  *   ΔCO  = ΔC⋈O  ∪ ΔC⋈ΔO  ∪ C⋈ΔO                   (custkey)
  *   ΔJ   = ΔCO⋈L ∪ ΔCO⋈ΔL ∪ CO⋈ΔL                  (orderkey)
  *   for each GRAIN g:   ΔAgg_g = ΔJ groupBy g agg sum(w·revenue), sum(w)
  *                       Agg_g' = consolidate(Agg_g ∪ ΔAgg_g)
  *   emit top-20 of Agg_0'
  * }}}
  *
  * The aggregation grain is a PARAMETER, and since r11 a state maintains
  * ANY NUMBER of grains off ONE shared ΔJ per batch — the multi-query IVM
  * shape a real deployment runs (N dashboards over one changelog pay one
  * delta-join pipeline, not N).
  *
  * Revenue is kept as exact decimal so insert/delete pairs cancel to
  * EXACTLY zero and the converged streaming answer is bit-equal to the
  * batch answer (vs. the reference's drifting `double` state,
  * no_websocket.java:546–550). Built-in Structured Streaming cannot chain
  * a stream-stream join into an update-mode aggregate, so the deltas run
  * inside `foreachBatch` (see [[StreamingQ3]]) — each delta join/aggregate
  * is a full Catalyst plan: shuffles on the join keys, partial/final hash
  * aggregation, whole-stage codegen, AQE.
  */
object IncrementalQ3 {

  /** Spill bookkeeping carried between compactions (spill mode only):
    * which buckets each state has dirtied since `version` was written, and
    * the per-state delta frames accumulated since then (references to the
    * already-checkpointed per-batch deltas — no extra storage). Together
    * they let the next compaction rewrite ONLY the dirty buckets: input =
    * `readBuckets(version, dirty) ∪ pending ∪ batch delta`, everything
    * else carried forward unrewritten.
    */
  final case class SpillMeta(root: String, version: Long,
                             dirty: Map[String, Set[Int]],
                             pending: Map[String, Vector[DataFrame]])

  /** All maintained state. `c/o/l/co` are z-set DataFrames with weight
    * [[ZSet.W]]; `aggs` is one maintained aggregate per grain (key list →
    * z-set frame), all served by the shared ΔJ. `dirty` counts batches
    * since the base states were last compacted (see the
    * amortized-compaction note in [[step]]). `spillHistory` is this fold's
    * spill versions, newest first (at most the two newest stay on disk —
    * see the spill note in [[step]]); `spillMeta` is the dirty-bucket
    * bookkeeping since the newest version. `spillEngaged` is the ADAPTIVE
    * spill latch (see the threshold note in [[step]]): once the measured
    * consolidated state crosses the engagement threshold it stays set —
    * state size under IVM is effectively monotone between compactions, and
    * a spilled fold flapping back to heap would re-read the whole table
    * for nothing.
    */
  final case class State(c: DataFrame, o: DataFrame, l: DataFrame,
                         co: DataFrame,
                         aggsRaw: Vector[(Seq[String], DataFrame)],
                         dirty: Int = 0,
                         spillHistory: List[Long] = Nil,
                         spillMeta: Option[SpillMeta] = None,
                         aggDepth: Int = 0,
                         spillEngaged: Boolean = false,
                         /** Per-state delta of the LAST applied batch, present
                           * exactly for the states whose upkeep took the
                           * plain-union path that batch (state' = state ∪ delta,
                           * nothing rewritten) — what lets a per-batch snapshot
                           * hard-link the previous snapshot's files and write
                           * only the delta ([[Snapshots.saveBatch]], r14).
                           * Never persisted; rebuilt every step.
                           */
                         snapDeltas: Map[String, DataFrame] = Map.empty) {
    /** The maintained aggregates, one per grain, CONSOLIDATED on read.
      * Internally (`aggsRaw`) each grain is a chain of per-batch delta
      * partials — consolidating only at compaction and at emission is
      * what makes a non-compacting batch fully DELTA-sized (the per-batch
      * full-aggregate merge was the last O(state) step each batch paid).
      * Consolidation is an associative re-grouping, so the view equals
      * the eagerly-merged aggregate exactly (sum over partials ≡ sum over
      * rows; a net-cnt-0 group carries exactly-0 revenue by the changelog
      * invariant, so dropping it at any consolidation point is sound).
      */
    def aggs: Vector[(Seq[String], DataFrame)] =
      aggsRaw.map { case (keys, df) => keys -> consolidateAgg(keys, df) }
    /** The primary grain's aggregate (what [[topN]] emits). */
    def agg: DataFrame = aggs.head._2
    /** Raw frames, aligned with [[names]] — what gets pinned/persisted. */
    def all: Seq[DataFrame] = Seq(c, o, l, co) ++ aggsRaw.map(_._2)
    /** Spill state names, aligned with [[all]]: base states + one per grain. */
    def names: Seq[String] = Seq("c", "o", "l", "co") ++
      aggsRaw.indices.map(aggName)
  }

  /** Merge a chain of aggregate partials at `keys` grain: sum the
    * additive measures per group, drop groups whose membership count
    * nets to zero, restore the z-set weight column.
    */
  private[streaming] def consolidateAgg(keys: Seq[String], df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col("revenue")).cast(revType).as("revenue"),
        sum(col("cnt")).as("cnt"))
      .filter(col("cnt") =!= 0)
      .withColumn(ZSet.W, lit(1L))

  private[streaming] def aggName(i: Int): String = s"agg$i"

  /** Compact the base states after this many delete-carrying batches (or,
    * under spill, after this many batches of ANY kind — see below). A
    * z-set with canceling ±1 pairs is still correct — only the AGGREGATE
    * needs per-batch consolidation (it drives emission) — so base-state
    * compaction is purely a size/cost trade: every compaction rewrites the
    * state (O(state) shuffle in-memory; O(dirty buckets) when spilled),
    * while skipping it leaves dead pairs that enlarge the next delta
    * joins. Amortizing over N batches turns "state-sized shuffle per
    * delete batch" into "state-sized shuffle per N batches" — the
    * difference between 95K and ~150K events/s at fine batching (k=8,
    * 15.3M events).
    */
  private val CompactEvery =
    Integer.getInteger("graft.compact.every", 4).intValue()

  // --- state spill to bucketed tables (the 100× memory story) -----------
  //
  // By default the five states are localCheckpoint'd frames — executor
  // storage memory (with BlockManager disk overflow), fine at driver-test
  // scale but an unbounded envelope at 100×: the 153 M-event StreamBench
  // run peaks above 100 M state rows. With a spill dir set (the
  // `spillDir` parameter of [[step]]/[[runBatches]], defaulting to
  // `-Dgraft.ivm.spill.dir`), every compaction instead MERGEs each state
  // into a bucketed-by-join-key table (the `join_bucketed` zero-Exchange
  // shape) through the [[SpillFormat]] seam:
  //  - memory holds only the deltas since the last compaction — the
  //    envelope is CompactEvery × batch size, not accumulated state
  //    (under spill, compaction fires every CompactEvery batches even on
  //    insert-only streams, so the envelope claim holds without deletes);
  //  - the next batches' delta joins read the state scan pre-partitioned
  //    on its join key, so only the batch-sized delta shuffles (the
  //    three-term [[ZSet.deltaJoin]] keeps the scan directly under each
  //    join for exactly this reason);
  //  - a compaction after the first rewrites ONLY the buckets the deltas
  //    since the last spill touched ([[SpillMeta]]); untouched buckets
  //    carry forward as hard links — at 100 TB state with trigger-sized
  //    deltas the write is O(delta keys), never O(state). Locally the
  //    format is bucketed parquet ([[BucketedParquetSpill]]); at cluster
  //    scale the same seam targets a transactional table format.
  // Spill dirs are versioned (v1, v2, …): a new version is fully written
  // before the state rebinds to it, and only then is everything older
  // than the PREVIOUS version deleted — a consumer holding last batch's
  // State keeps readable files (hard links keep carried-forward content
  // alive across pruning), same discipline as Snapshots.saveBatch.
  private[streaming] def spillRoot: Option[String] =
    sys.props.get("graft.ivm.spill.dir").map(_.trim)
      .filter(d => d.nonEmpty && d != "off")

  // storage-seam implementation, BOUND TO THE ROOT (its FORMAT marker,
  // written at first use from the `graft.ivm.spill.format` session
  // default): bucketed parquet + hard links by default, the manifest/GC
  // MERGE shape as the transactional-format stand-in — both pinned by
  // the shared SpillFormatContractSpec. Root-bound resolution means a
  // resume (or a spec) can never read a root with the wrong layout.
  private def spillFmt(root: String): SpillFormat = SpillFormat.forRoot(root)

  // Version allocation is PER ROOT and seeded from whatever v<N> dirs
  // already exist there — a resumed process (Snapshots restores
  // spillHistory, but the JVM counter restarts) must never re-issue a
  // version that still has files on disk.
  private val spillCounters = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicLong]

  private def versionsOnDisk(root: String): Seq[Long] =
    Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty)
      .toIndexedSeq
      .flatMap(f => if (f.getName.startsWith("v"))
        f.getName.stripPrefix("v").toLongOption else None)

  private def nextSpillVersion(root: String): Long =
    spillCounters.getOrElseUpdate(root, {
      val existing = versionsOnDisk(root)
      new java.util.concurrent.atomic.AtomicLong(
        if (existing.isEmpty) 0L else existing.max)
    }).incrementAndGet()

  /** Bucket keys: each state's delta-join key ([[step]]'s joins), the
    * aggregate's leading grain key.
    */
  private def spillKey(name: String, grains: Seq[Seq[String]]): String = name match {
    case "c" => "c_custkey"
    case "o" => "o_custkey"
    case "l" => "l_orderkey"
    case "co" => "o_orderkey"
    case a => grains(a.stripPrefix("agg").toInt).head
  }

  /** End-of-query cleanup: drop EVERY spill version under `root` (scanned
    * from disk, not from a State — so it also reaps versions left by a
    * fold that failed mid-stream) and the root itself.
    */
  private[graft] def cleanupSpillRoot(spark: SparkSession, root: String): Unit = {
    versionsOnDisk(root).foreach(dropSpill(spark, root, _))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  private def dropSpill(spark: SparkSession, root: String, version: Long): Unit = {
    // state dirs are scanned from disk, not assumed: a root written by a
    // different grain list (or the pre-r11 single "agg" layout) is reaped
    // all the same
    val vDir = new java.io.File(s"$root/v$version")
    val names = Option(vDir.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory).map(_.getName)
    names.foreach(spillFmt(root).drop(spark, root, version, _))
    org.apache.commons.io.FileUtils.deleteQuietly(vDir)
  }

  private val cutoff = to_date(lit(Relational.Q3Date))

  private val revType = "decimal(38,4)"

  /** Q3's native aggregation grain. The grain is a PARAMETER of the
    * engine, not part of it: any subset of the join output's dimension
    * columns maintains the same way, and one State maintains several at
    * once (see [[StreamQueries.convergedFold]], where the Q3 grain and
    * the per-priority grain share one fold).
    */
  val DefaultAggKeys: Seq[String] =
    Seq("l_orderkey", "o_orderdate", "o_orderpriority")

  private val keyTypes: Map[String, DataType] = Map(
    "l_orderkey" -> LongType, "o_orderkey" -> LongType,
    "o_orderdate" -> DateType, "o_orderpriority" -> StringType)

  private def empty(spark: SparkSession, fields: (String, DataType)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(fields.map { case (n, t) => StructField(n, t) } :+
        StructField(ZSet.W, LongType)))

  private def emptyAgg(spark: SparkSession, keys: Seq[String]): DataFrame =
    empty(spark, keys.map(k => k -> keyTypes(k)) :+
      ("revenue" -> DataType.fromDDL(revType)) :+ ("cnt" -> (LongType: DataType)): _*)

  def init(spark: SparkSession,
           grains: Seq[Seq[String]] = Seq(DefaultAggKeys)): State = State(
    c = empty(spark, "c_custkey" -> LongType),
    o = empty(spark, "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderdate" -> DateType, "o_orderpriority" -> StringType),
    l = empty(spark, "l_orderkey" -> LongType,
      "revenue" -> DataType.fromDDL(revType)),
    co = empty(spark, "o_orderkey" -> LongType, "o_orderdate" -> DateType,
      "o_orderpriority" -> StringType),
    aggsRaw = grains.toVector.map(keys => keys -> emptyAgg(spark, keys)))

  /** Q3's pushed-down filters + projections on the delta, mirroring the
    * reference's pre-join filter placement (no_websocket.java:192–201) and
    * parse-time projection (no_websocket.java:292–315).
    */
  private def project(parsed: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val dC = Changelog.customers(parsed)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col(ZSet.W))
    val dO = Changelog.orders(parsed)
      .filter(col("o_orderdate") < cutoff)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"), col(ZSet.W))
    val dL = Changelog.lineitems(parsed)
      .filter(col("l_shipdate") > cutoff)
      .select(col("l_orderkey"),
        Relational.revenueExpr.cast(revType).as("revenue"),
        col(ZSet.W))
    (dC, dO, dL)
  }

  /** The session default for [[step]]'s `spillAtRows` when a caller opts
    * into ADAPTIVE spill: consolidated state rows above which a fold with
    * a spill dir moves its state from executor memory to the bucketed
    * tables. Sized so the 10×-bench event-time state (~2–3 M consolidated
    * rows) stays comfortably in-memory on a 128 GiB driver-test JVM while
    * a 100× run (tens of millions of rows) engages the bounded-memory
    * path; at cluster scale an operator would set it from executor
    * storage budget / row width.
    */
  def adaptiveSpillThreshold: Long =
    java.lang.Long.getLong("graft.ivm.spill.threshold", 8000000L)

  /** Apply one micro-batch of raw changelog lines to the state. The
    * maintained grains come from `st` (set at [[init]]); `spillDir`
    * bounds the memory envelope via bucketed-table state spill (default:
    * the `graft.ivm.spill.dir` system property — threaded as a parameter
    * so concurrent folds in one JVM never share a mutable global).
    *
    * `spillAtRows` makes the spill a POLICY instead of a switch (r13
    * verdict item 1): with a positive threshold the fold starts IN-MEMORY
    * — compacting on the spill cadence (every CompactEvery batches) so
    * consolidated state size is measured at each compaction for free —
    * and ENGAGES the bucketed-table path only once the measured state
    * crosses the threshold. Below it, the fold never pays table-write
    * I/O it doesn't need (the r13 `stream_q3_event_time_replay` lesson:
    * unconditional spill cost 2.03× baseline at a scale where the state
    * still fit); above it, the same query rides the bounded-memory
    * envelope — automatically, no re-deploy. `0` (the default) is the
    * legacy unconditional engage, which the exact-cancellation spill
    * gates rely on.
    */
  def step(st: State, lines: DataFrame,
           spillDir: Option[String] = spillRoot,
           spillAtRows: Long = 0L): State = {
    val grains = st.aggsRaw.map(_._1)
    // adaptive-threshold latch: below the threshold the fold behaves as
    // in-memory (no bucket probes, no table writes) EXCEPT that it keeps
    // the spill compaction cadence — each compaction is the measurement
    val engaged = spillDir.nonEmpty && (spillAtRows <= 0L || st.spillEngaged)
    // ONE pass over the raw text: parse into a cached tagged z-set, then
    // derive the three relation deltas from the cached blocks. (Checkpointing
    // the deltas individually instead would re-run the line parse once per
    // relation — 3 scans of the batch.) Unpersisted at the end of the step:
    // the delta checkpoints are self-contained by then.
    val buildT0 = System.nanoTime()
    val parsed = Changelog.parse(lines)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Each delta is reused 2–3× (both branches of the next delta join plus
    // the state upkeep union); checkpoint lazily so the projection runs once
    // and later uses hit the cached blocks.
    val (dC0, dO0, dL0) = project(parsed)
    val (dC, dO, dL) = graft.Phase("ivm.step.build.deltas") {
      (dC0.localCheckpoint(eager = false),
       dO0.localCheckpoint(eager = false),
       dL0.localCheckpoint(eager = false))
    }

    val dCO = graft.Phase("ivm.step.build.dco") {
      ZSet.deltaJoin(st.c, dC, st.o, dO,
          col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"), col(ZSet.W))
        .localCheckpoint(eager = false)
    }
    val dJ0 = ZSet.deltaJoin(st.co, dCO, st.l, dL,
      col("o_orderkey") === col("l_orderkey"))
    // the shared ΔJ: with several grains each reads it once — checkpoint so
    // the delta joins run ONCE per batch, not once per grain; with a single
    // grain the extra pin would be pure storage cost
    val dJ = if (grains.size > 1) dJ0.localCheckpoint(eager = false) else dJ0

    val strict = java.lang.Boolean.getBoolean("graft.strict")
    // Per grain, ONLY the delta aggregate is computed per batch — partials
    // at the grain, weights folded into the additive measures. The state
    // is a CHAIN of these (consolidated at compaction and on read via
    // State.aggs), so a non-compacting batch's aggregate work is
    // delta-sized — the per-batch full-aggregate merge was the last
    // O(state) step every batch paid (r11). Each partial is checkpointed:
    // it is the one link holding this batch's contribution, and later
    // consolidations must hit cached blocks, never re-run the delta joins.
    val dAggs: Vector[DataFrame] = graft.Phase("ivm.step.build.daggs") {
      st.aggsRaw.map { case (keys, agg) =>
      dJ.groupBy(keys.map(col): _*)
        .agg(sum(col(ZSet.W) * col("revenue")).cast(revType).as("revenue"),
          sum(col(ZSet.W)).as("cnt"))
        .withColumn(ZSet.W, lit(1L))
        .select(agg.columns.toIndexedSeq.map(col): _*)
        .localCheckpoint(eager = false)
      }
    }
    if (graft.Phase.enabled) System.err.println(
      f"[phase] ivm.step.build: ${(System.nanoTime() - buildT0) / 1e9}%.2fs")
    // A well-formed changelog's deletes mirror their inserts exactly, so a
    // group whose membership count reaches 0 must also have revenue exactly
    // 0 — dropping it at a consolidation point is then pure compaction.
    // Strict mode (tests: -Dgraft.strict=true) re-derives the invariant on
    // the full merge EVERY batch, loudly, instead of silently discarding a
    // residue left by a malformed stream (ADVICE r1) — test-only cost.
    if (strict) st.aggsRaw.zip(dAggs).foreach { case ((keys, agg), dAgg) =>
      val merged = agg.unionByName(dAgg)
        .groupBy(keys.map(col): _*)
        .agg(sum(col("revenue")).cast(revType).as("revenue"),
          sum(col("cnt")).as("cnt"))
      val bad = merged.filter(col("cnt") === 0 && col("revenue") =!= 0).count()
      require(bad == 0,
        s"malformed changelog: $bad zero-count groups carry nonzero revenue")
    }

    // State upkeep, cheapest-sufficient form per state and batch:
    //  - compacting batch → consolidate + checkpoint (or spill-table MERGE),
    //    so retracted rows actually leave the state;
    //  - otherwise → a plain union over the already-cached delta blocks:
    //    NOTHING is rewritten (the reference's per-record state insert,
    //    amortized). The union chain stays shallow because every link is a
    //    checkpointed delta.
    // Materialize the SHARED plan parents in dependency order BEFORE the
    // concurrent per-state fan-out below. Concurrent Spark jobs do not
    // share in-flight computation — five futures racing over the same
    // un-checkpointed parents each re-run the parse and the delta joins
    // (observed: escalating per-batch times on the delete phase). One
    // action per layer pins each layer's blocks exactly once:
    //   1. full text parse FIRST, as its own serial action (count, never
    //      isEmpty — isEmpty short-circuits and leaves most partitions
    //      uncached). Folding this into the deltas action below re-runs
    //      the parse up to 3× concurrently (one per union branch racing
    //      before the cache fills) — measured 233K → 145K events/s at k=8;
    val hasDeletes = graft.Phase("ivm.step.parsePin") {
      parsed.filter(col(ZSet.W) < 0).count() > 0
    }
    val spark = lines.sparkSession
    val bucketN = SpillFormat.buckets
    def bucketExpr(key: String) = pmod(hash(col(key)), lit(bucketN)).cast("int")
    //   2. the three relation deltas, in ONE action over the cached parse.
    //      Under spill that action IS the dirty-bucket probe — the same
    //      full scan that pins the delta blocks also returns which state
    //      buckets this batch touches;
    //   3. the first delta join (both branches of ΔJ and the co upkeep
    //      read it) — likewise doubling as the co bucket probe.
    // Each agg grain gets its OWN exact probe over its delta PARTIAL
    // (r11 verdict item 4 — the old shortcut marked non-`l_orderkey`
    // grains all-dirty, silently degrading a fact-sized grain to O(state)
    // agg rewrites every compaction): only groups ΔAgg touches can change
    // at the merge, so buckets(ΔAgg.leadingKey) is exact for ANY grain.
    // The probe is the partial's pin action — the per-batch dAgg jobs
    // below then hit the cached blocks, so no plan runs twice.
    val batchBuckets: Map[String, Set[Int]] =
      if (!engaged) {
        graft.Phase("ivm.step.deltaPin") {
          dC.select(col(ZSet.W)).unionByName(dO.select(col(ZSet.W)))
            .unionByName(dL.select(col(ZSet.W))).count()
        }
        graft.Phase("ivm.step.dcoPin") { dCO.count() }
        Map.empty
      } else {
        val deltaProbe = dC.select(lit("c").as("s"), bucketExpr("c_custkey").as("b"))
          .unionByName(dO.select(lit("o").as("s"), bucketExpr("o_custkey").as("b")))
          .unionByName(dL.select(lit("l").as("s"), bucketExpr("l_orderkey").as("b")))
          .distinct().collect()
          .groupBy(_.getString(0)).map { case (s, rs) => s -> rs.map(_.getInt(1)).toSet }
        val coBuckets = dCO.select(bucketExpr("o_orderkey").as("b"))
          .distinct().collect().map(_.getInt(0)).toSet
        val aggBuckets = grains.indices.map { i =>
          aggName(i) -> dAggs(i).select(bucketExpr(grains(i).head).as("b"))
            .distinct().collect().map(_.getInt(0)).toSet
        }
        (deltaProbe ++ Map("co" -> coBuckets) ++ aggBuckets)
          .withDefaultValue(Set.empty[Int])
      }
    // Under spill, compaction fires every CompactEvery batches whether or
    // not deletes arrived (ADVICE r10): an insert-only build-up phase must
    // still flush its deltas to the tables, or the "memory envelope is
    // deltas-since-last-compaction" claim only holds once deletes
    // interleave. In-memory mode keeps the delete-triggered cadence —
    // insert-only unions are already O(1) there and a rewrite buys nothing.
    // An adaptive fold below its threshold keeps the spill CADENCE (its
    // compactions are the state-size measurements) but consolidates
    // in-memory (spillTo stays None until engagement).
    val countsTowardCompaction = hasDeletes || spillDir.nonEmpty
    val compact = countsTowardCompaction && st.dirty + 1 >= CompactEvery
    val spillTo = if (compact && engaged) spillDir else None
    val version = spillTo.map(nextSpillVersion)

    // accumulated dirty buckets / pending deltas since the last spill,
    // INCLUDING this batch (this batch's delta is part of the compaction
    // input, so its buckets are dirty too)
    def dirtySince(name: String): Set[Int] =
      st.spillMeta.map(_.dirty.getOrElse(name, Set.empty)).getOrElse(Set.empty) ++
        batchBuckets.getOrElse(name, Set.empty)
    def pendingSince(name: String): Vector[DataFrame] =
      st.spillMeta.map(_.pending.getOrElse(name, Vector.empty)).getOrElse(Vector.empty)

    /** Spill `name` at `version`: incremental (dirty buckets only, clean
      * ones carried forward) when the previous version is known and the
      * batch left any bucket untouched; full rewrite otherwise. `cons` is
      * the state's consolidator — [[ZSet.consolidate]] for the base
      * z-sets, the grain's additive [[consolidateAgg]] for aggregates;
      * both are sound on a bucket-restricted subset because a row's
      * duplicates/partials can only live in its own key's bucket.
      */
    def spill(root: String, name: String, key: String,
              cons: DataFrame => DataFrame,
              state: DataFrame, delta: DataFrame): DataFrame = {
      // WRITE path: first spill pins the root to the session default
      // (atomic create — ADVICE r12); read/cleanup paths never pin
      SpillFormat.ensurePinned(root)
      val dirty = dirtySince(name)
      st.spillMeta match {
        case Some(meta) if meta.root == root && dirty.size < bucketN =>
          val prev = spillFmt(root).readBuckets(spark, root, meta.version, name,
            state.schema, dirty)
          val rows = cons(
            (prev +: pendingSince(name)).reduce(_ unionByName _)
              .unionByName(delta))
          spillFmt(root).write(spark, root, version.get, name, key, rows,
            carry = Some((meta.version, dirty)))
        case _ =>
          spillFmt(root).write(spark, root, version.get, name, key,
            cons(state.unionByName(delta)), carry = None)
      }
    }

    // The agg chains consolidate on their OWN cadence (every CompactEvery
    // batches, deletes or not): unlike the base z-sets — whose insert-only
    // unions are free — an unconsolidated agg chain grows the EMISSION
    // plan per batch, so a long-running insert-only live query would pay
    // ever-deeper union plans at every topN. Depth-capping bounds both
    // the plan and the per-emission scan at CompactEvery partials.
    val aggCompact = compact || st.aggDepth + 1 >= CompactEvery

    def upkeepWith(name: String, key: String, cons: DataFrame => DataFrame,
                   state: DataFrame, delta: DataFrame,
                   consolidateNow: Boolean): DataFrame =
      spillTo match {
        case Some(root) => spill(root, name, key, cons, state, delta)
        case None if consolidateNow =>
          cons(state.unionByName(delta)).localCheckpoint(eager = false)
        case None => state.unionByName(delta)
      }

    def upkeep(name: String, state: DataFrame, delta: DataFrame): DataFrame =
      upkeepWith(name, spillKey(name, grains), ZSet.consolidate, state, delta,
        consolidateNow = compact)

    val history = version.map(_ :: st.spillHistory).getOrElse(st.spillHistory)
    val nextMeta: Option[SpillMeta] = (spillTo, version) match {
      case (Some(root), Some(v)) =>
        // fresh bookkeeping window starting at the just-written version
        Some(SpillMeta(root, v, Map.empty, Map.empty))
      case _ => st.spillMeta match {
        case Some(meta) if spillDir.contains(meta.root) =>
          // accumulate this batch's buckets + delta references (the agg
          // grains' pendings are their per-batch delta PARTIALS)
          val deltas = Map("c" -> dC, "o" -> dO, "l" -> dL, "co" -> dCO) ++
            dAggs.zipWithIndex.map { case (d, i) => aggName(i) -> d }
          Some(meta.copy(
            dirty = (st.names.map(n => n -> dirtySince(n))).toMap,
            pending = deltas.map { case (n, d) =>
              n -> (meta.pending.getOrElse(n, Vector.empty) :+ d)
            }))
        case _ => None // no spill version yet (or dir changed): first
                       // compaction full-writes, nothing to track
      }
    }
    val upkeepT0 = System.nanoTime()
    val next = State(
      c = upkeep("c", st.c, dC),
      o = upkeep("o", st.o, dO),
      l = upkeep("l", st.l, dL),
      co = upkeep("co", st.co, dCO),
      aggsRaw = st.aggsRaw.zip(dAggs).zipWithIndex.map {
        case (((keys, raw), dAgg), i) =>
          keys -> upkeepWith(aggName(i), keys.head,
            consolidateAgg(keys, _), raw, dAgg, consolidateNow = aggCompact)
      },
      dirty = if (compact) 0
        else if (countsTowardCompaction) st.dirty + 1 else st.dirty,
      spillHistory = history.take(2),
      spillMeta = nextMeta,
      aggDepth = if (spillTo.nonEmpty || aggCompact) 0 else st.aggDepth + 1,
      spillEngaged = st.spillEngaged || engaged,
      // which states this batch merely UNIONed (snapshot can link + append):
      // base z-sets unless this batch consolidated/spilled them; agg
      // partial chains unless this batch depth-capped/spilled them
      snapDeltas = (if (spillTo.isEmpty && !compact)
          Map("c" -> dC, "o" -> dO, "l" -> dL, "co" -> dCO)
        else Map.empty[String, DataFrame]) ++
        (if (spillTo.isEmpty && !aggCompact)
          dAggs.zipWithIndex.map { case (d, i) => aggName(i) -> d }.toMap
        else Map.empty[String, DataFrame]))
    if (graft.Phase.enabled) System.err.println(
      f"[phase] ivm.step.upkeepBuild: ${(System.nanoTime() - upkeepT0) / 1e9}%.2fs")
    // everything older than the previous spill is now unreachable (carried-
    // forward files survive as hard links under the newer versions)
    spillTo.foreach(root => history.drop(2).foreach(dropSpill(spark, root, _)))
    // Materialize ONLY the frames this step newly checkpointed,
    // CONCURRENTLY (independent Spark jobs — wall time is the slowest,
    // not the sum). On a non-compacting batch c/o/l/co are plain unions
    // over already-pinned delta blocks: counting them each batch re-scans
    // the whole accumulated state for nothing (O(k²) cached-block scans
    // over a k-batch fold); only the new DELTA-sized agg partials need
    // jobs. With several grains, pin the shared ΔJ serially FIRST —
    // concurrent partial pins racing over an unmaterialized dJ would each
    // recompute the delta joins (the same no-shared-in-flight-computation
    // rule as the parse/delta layers above).
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    if (grains.size > 1 && spillTo.isEmpty) dJ.count()
    val wantSizes = java.lang.Boolean.getBoolean("graft.ivm.sizes")
    // a spill batch already materialized every state as its table write —
    // nothing to pin unless the sizes diagnostic wants the counts
    val toPin =
      if (spillTo.nonEmpty) (if (wantSizes) next.all else Seq.empty)
      else if (compact || wantSizes) next.all
      else if (aggCompact) next.aggsRaw.map(_._2) // agg-only consolidation
      else dAggs // the only frames this batch newly checkpointed: the
                 // delta-sized partials (the chain's older links are
                 // already pinned; counting the whole chain per batch
                 // would be the O(k²) trap the comment above names)
    val sizes = graft.Phase(
      if (compact) "ivm.step.upkeepPin.compact" else "ivm.step.upkeepPin") {
      Await.result(
        Future.sequence(toPin.map(df => Future { df.count() })), Duration.Inf)
    }
    // the sizes diagnostic (z-set rows incl. not-yet-compacted ± pairs,
    // for capacity planning) counts all states regardless
    if (wantSizes)
      System.err.println("[ivm] state rows " +
        next.names.zip(sizes)
          .map { case (n, s) => s"$n=$s" }.mkString(" "))
    parsed.unpersist(blocking = false)
    // adaptive engagement: a pre-engagement compaction just measured the
    // consolidated state (toPin == next.all exactly then, so sizes.sum IS
    // total state rows). Crossing the threshold latches the flag — the
    // NEXT compaction MERGEs into the bucketed tables (full write first,
    // then incremental), and every later batch rides the bounded-memory
    // path. The first post-engagement batches still union in-memory until
    // that compaction — the envelope is CompactEvery batches of deltas
    // past the threshold, the same amortization bound as steady state.
    val crossed = spillDir.nonEmpty && spillAtRows > 0L &&
      !next.spillEngaged && compact && sizes.sum >= spillAtRows
    if (crossed)
      System.err.println(s"[ivm] adaptive spill engaged: " +
        s"state ${sizes.sum} >= $spillAtRows rows")
    if (crossed) next.copy(spillEngaged = true) else next
  }

  /** Current top-20 (the reference's TopNFunction contract,
    * no_websocket.java:590–650 — minus its append-only duplicate defect,
    * SURVEY.md §7.4b): sort by (revenue desc, orderdate asc), limit 20.
    */
  def topN(st: State, n: Int = 20): DataFrame =
    st.agg
      .select(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"),
        col("revenue").cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(n)

  /** Batch-simulated run: slice the generated changelog into `k`
    * trigger-ordered micro-batches and fold [[step]] over them.
    * `onBatch(b, state)` fires after each applied batch — mid-stream
    * consumers (the prefix-snapshot query shares this fold instead of
    * re-folding its prefix) read intermediate state there.
    */
  def runBatches(spark: SparkSession, events: DataFrame, k: Int,
                 grains: Seq[Seq[String]] = Seq(DefaultAggKeys),
                 tMaxKnown: Option[Long] = None,
                 spillDir: Option[String] = spillRoot,
                 spillAtRows: Long = 0L,
                 onBatch: (Int, State) => Unit = (_, _) => ()): State = {
    val tMax = tMaxKnown.getOrElse(events.agg(max(col("t"))).head().getLong(0))
    // NO re-checkpoint here: both call sites (generateCached, StreamBench)
    // hand over an already-pinned frame, and the batch column is a trivial
    // projection per cached scan — re-materializing millions of lines just
    // to attach it cost more than every per-batch filter combined.
    val batched = events.withColumn("batch",
      least(expr(s"CAST(((t - 1L) * ${k}L) DIV ${tMax}L AS INT)"), lit(k - 1)))
    val fin = (0 until k).foldLeft(init(spark, grains)) { (st, b) =>
      val t0 = System.nanoTime()
      val r = step(st, batched.filter(col("batch") === b).select("line"),
        spillDir, spillAtRows)
      System.err.println(f"[ivm] batch $b: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      onBatch(b, r)
      r
    }
    fin
  }
}
