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
  *   ΔAgg = ΔJ groupBy (orderkey, orderdate, priority)
  *                agg sum(w·revenue), sum(w)
  *   Agg' = consolidate(Agg ∪ ΔAgg);  emit top-20 of Agg'
  * }}}
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

  /** All maintained state, each a z-set DataFrame with weight [[ZSet.W]].
    * `dirty` counts delete-carrying batches since the base states were
    * last compacted (see the amortized-compaction note in [[step]]).
    * `spillHistory` is this fold's spill versions, newest first (at most
    * the two newest stay on disk — see the spill note in [[step]]).
    */
  final case class State(c: DataFrame, o: DataFrame, l: DataFrame,
                         co: DataFrame, agg: DataFrame, dirty: Int = 0,
                         spillHistory: List[Long] = Nil) {
    def all: Seq[DataFrame] = Seq(c, o, l, co, agg)
  }

  /** Compact the base states after this many delete-carrying batches. A
    * z-set with canceling ±1 pairs is still correct — only the AGGREGATE
    * needs per-batch consolidation (it drives emission) — so base-state
    * compaction is purely a size/cost trade: every compaction is a full
    * groupBy-rewrite of all state (O(state) shuffle), while skipping it
    * leaves dead pairs that enlarge the next delta joins. Amortizing over
    * N batches turns "state-sized shuffle per delete batch" into
    * "state-sized shuffle per N batches" — the difference between 95K and
    * ~150K events/s at fine batching (k=8, 15.3M events).
    */
  private val CompactEvery =
    Integer.getInteger("graft.compact.every", 4).intValue()

  // --- state spill to bucketed tables (the 100× memory story) -----------
  //
  // By default the five states are localCheckpoint'd frames — executor
  // storage memory (with BlockManager disk overflow), fine at driver-test
  // scale but an unbounded envelope at 100×: the 153 M-event StreamBench
  // run peaks above 100 M state rows. With `graft.ivm.spill.dir` set,
  // every compaction instead MERGEs each consolidated state into a
  // bucketed-by-join-key table (the `join_bucketed` zero-Exchange shape):
  //  - memory holds only the deltas since the last compaction — the
  //    envelope is CompactEvery × batch size, not accumulated state;
  //  - the next batches' delta joins read the state scan pre-partitioned
  //    on its join key, so only the batch-sized delta shuffles (the
  //    three-term [[ZSet.deltaJoin]] keeps the scan directly under each
  //    join for exactly this reason);
  //  - at cluster scale the same writes target a transactional table
  //    format; the z-set algebra above is unchanged.
  // Spill dirs are versioned (v1, v2, …): a new version is fully written
  // before the state rebinds to it, and only then is everything older
  // than the PREVIOUS version deleted — a consumer holding last batch's
  // State keeps readable files, same discipline as Snapshots.saveBatch.
  private def spillRoot: Option[String] =
    sys.props.get("graft.ivm.spill.dir").map(_.trim)
      .filter(d => d.nonEmpty && d != "off")

  private val SpillBuckets =
    Integer.getInteger("graft.ivm.spill.buckets", 32).intValue()

  // Version allocation is PER ROOT and seeded from whatever v<N> dirs
  // already exist there — a resumed process (Snapshots restores
  // spillHistory, but the JVM counter restarts) must never re-issue a
  // version that still has files on disk.
  private val spillCounters = scala.collection.concurrent.TrieMap
    .empty[String, java.util.concurrent.atomic.AtomicLong]

  private def nextSpillVersion(root: String): Long =
    spillCounters.getOrElseUpdate(root, {
      val existing = Option(new java.io.File(root).listFiles())
        .getOrElse(Array.empty)
        .flatMap(f => if (f.getName.startsWith("v"))
          f.getName.stripPrefix("v").toLongOption else None)
      new java.util.concurrent.atomic.AtomicLong(
        if (existing.isEmpty) 0L else existing.max)
    }).incrementAndGet()

  /** Bucket keys: each state's delta-join key ([[step]]'s joins), the
    * aggregate's leading grain key.
    */
  private def spillKey(name: String, aggKeys: Seq[String]): String = name match {
    case "c" => "c_custkey"
    case "o" => "o_custkey"
    case "l" => "l_orderkey"
    case "co" => "o_orderkey"
    case "agg" => aggKeys.head
  }

  /** Catalog names are root-scoped (versions are per-root, so two roots
    * in one session would otherwise both own a `…_v1`).
    */
  private def spillTable(root: String, name: String, version: Long): String =
    s"graft_ivm_${Integer.toHexString(root.hashCode)}_${name}_v$version"

  private def spillState(spark: SparkSession, root: String, version: Long,
                         name: String, key: String, df: DataFrame): DataFrame = {
    val tbl = spillTable(root, name, version)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    df.write.mode("overwrite").option("path", s"$root/v$version/$name")
      .bucketBy(SpillBuckets, key).sortBy(key).saveAsTable(tbl)
    spark.table(tbl)
  }

  /** End-of-query cleanup: drop EVERY spill version under `root` (scanned
    * from disk, not from a State — so it also reaps versions left by a
    * fold that failed mid-stream) and the root itself.
    */
  private[graft] def cleanupSpillRoot(spark: SparkSession, root: String): Unit = {
    Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .flatMap(f => if (f.getName.startsWith("v"))
        f.getName.stripPrefix("v").toLongOption else None)
      .foreach(dropSpill(spark, root, _))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  private def dropSpill(spark: SparkSession, root: String, version: Long): Unit = {
    Seq("c", "o", "l", "co", "agg").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS ${spillTable(root, n, version)}"))
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$root/v$version"))
  }

  private val cutoff = to_date(lit(Relational.Q3Date))

  private val revType = "decimal(38,4)"

  /** Q3's native aggregation grain. The grain is a PARAMETER of the
    * engine, not part of it: any subset of the join output's dimension
    * columns maintains the same way (see [[StreamQueries
    * .priorityRevenueConverged]] for the per-priority grain — only the key
    * list differs).
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

  def init(spark: SparkSession,
           aggKeys: Seq[String] = DefaultAggKeys): State = State(
    c = empty(spark, "c_custkey" -> LongType),
    o = empty(spark, "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderdate" -> DateType, "o_orderpriority" -> StringType),
    l = empty(spark, "l_orderkey" -> LongType,
      "revenue" -> DataType.fromDDL(revType)),
    co = empty(spark, "o_orderkey" -> LongType, "o_orderdate" -> DateType,
      "o_orderpriority" -> StringType),
    agg = empty(spark, aggKeys.map(k => k -> keyTypes(k)) :+
      ("revenue" -> DataType.fromDDL(revType)) :+ ("cnt" -> (LongType: DataType)): _*))

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

  /** Apply one micro-batch of raw changelog lines to the state.
    * `aggKeys` sets the maintained aggregate's grain (must match the
    * `init` that produced `st`).
    */
  def step(st: State, lines: DataFrame,
           aggKeys: Seq[String] = DefaultAggKeys): State = {
    // ONE pass over the raw text: parse into a cached tagged z-set, then
    // derive the three relation deltas from the cached blocks. (Checkpointing
    // the deltas individually instead would re-run the line parse once per
    // relation — 3 scans of the batch.) Unpersisted at the end of the step:
    // the delta checkpoints are self-contained by then.
    val parsed = Changelog.parse(lines)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Each delta is reused 2–3× (both branches of the next delta join plus
    // the state upkeep union); checkpoint lazily so the projection runs once
    // and later uses hit the cached blocks.
    val (dC0, dO0, dL0) = project(parsed)
    val dC = dC0.localCheckpoint(eager = false)
    val dO = dO0.localCheckpoint(eager = false)
    val dL = dL0.localCheckpoint(eager = false)

    val dCO = ZSet.deltaJoin(st.c, dC, st.o, dO,
        col("c_custkey") === col("o_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"), col(ZSet.W))
      .localCheckpoint(eager = false)
    val dJ = ZSet.deltaJoin(st.co, dCO, st.l, dL,
      col("o_orderkey") === col("l_orderkey"))
    val dAgg = dJ
      .groupBy(aggKeys.map(col): _*)
      .agg(sum(col(ZSet.W) * col("revenue")).cast(revType).as("revenue"),
        sum(col(ZSet.W)).as("cnt"))

    val strict = java.lang.Boolean.getBoolean("graft.strict")
    val merged0 = st.agg.unionByName(
        dAgg.withColumn(ZSet.W, lit(1L)).select(st.agg.columns.toIndexedSeq.map(col): _*))
      .groupBy(aggKeys.map(col): _*)
      .agg(sum(col("revenue")).cast(revType).as("revenue"), sum(col("cnt")).as("cnt"))
    // checkpoint under strict mode so the invariant count and newAgg share
    // one computation of the merge instead of running it twice
    val merged = if (strict) merged0.localCheckpoint(eager = false) else merged0
    // A well-formed changelog's deletes mirror their inserts exactly, so a
    // group whose membership count reaches 0 must also have revenue exactly
    // 0 — dropping it is then pure compaction. Strict mode (tests:
    // -Dgraft.strict=true) checks the invariant loudly instead of silently
    // discarding a residue left by a malformed stream (ADVICE r1).
    if (strict) {
      val bad = merged.filter(col("cnt") === 0 && col("revenue") =!= 0).count()
      require(bad == 0,
        s"malformed changelog: $bad zero-count groups carry nonzero revenue")
    }
    val newAgg = merged
      .filter(col("cnt") =!= 0)
      .withColumn(ZSet.W, lit(1L))

    // State upkeep, cheapest-sufficient form per state and batch:
    //  - batch carries retractions → consolidate + checkpoint (compaction
    //    rewrite, so retracted rows actually leave the state);
    //  - insert-only batch → a plain union over the already-cached delta
    //    blocks: NOTHING is rewritten (the reference's per-record state
    //    insert, amortized). The union chain stays shallow because every
    //    link is a checkpointed delta; a long-running deployment compacts
    //    periodically (or uses a real state store).
    // Materialize the SHARED plan parents in dependency order BEFORE the
    // concurrent per-state fan-out below. Concurrent Spark jobs do not
    // share in-flight computation — five futures racing over the same
    // un-checkpointed parents each re-run the parse and the delta joins
    // (observed: escalating per-batch times on the delete phase). A
    // count() per layer pins each layer's blocks exactly once:
    //   1. full text parse FIRST, as its own serial action (count, never
    //      isEmpty — isEmpty short-circuits and leaves most partitions
    //      uncached). Folding this into the deltas action below re-runs
    //      the parse up to 3× concurrently (one per union branch racing
    //      before the cache fills) — measured 233K → 145K events/s at k=8;
    val hasDeletes = parsed.filter(col(ZSet.W) < 0).count() > 0
    //   2. the three relation deltas, in ONE action over the cached parse;
    dC.select(col(ZSet.W)).unionByName(dO.select(col(ZSet.W)))
      .unionByName(dL.select(col(ZSet.W))).count()
    //   3. the first delta join (both branches of ΔJ and the co upkeep
    //      read it).
    dCO.count()
    val compact = hasDeletes && st.dirty + 1 >= CompactEvery
    val spark = lines.sparkSession
    val spillTo = if (compact) spillRoot else None
    val version = spillTo.map(nextSpillVersion)
    def upkeep(name: String, state: DataFrame, delta: DataFrame): DataFrame = {
      val merged = state.unionByName(delta)
      spillTo match {
        case Some(root) => spillState(spark, root, version.get, name,
          spillKey(name, aggKeys), ZSet.consolidate(merged))
        case None if compact =>
          ZSet.consolidate(merged).localCheckpoint(eager = false)
        case None => merged
      }
    }
    val history = version.map(_ :: st.spillHistory).getOrElse(st.spillHistory)
    val next = State(
      c = upkeep("c", st.c, dC),
      o = upkeep("o", st.o, dO),
      l = upkeep("l", st.l, dL),
      co = upkeep("co", st.co, dCO),
      agg = spillTo match {
        case Some(root) => spillState(spark, root, version.get, "agg",
          spillKey("agg", aggKeys), newAgg)
        case None => newAgg.localCheckpoint(eager = false)
      },
      dirty = if (compact) 0 else if (hasDeletes) st.dirty + 1 else st.dirty,
      spillHistory = history.take(2))
    // everything older than the previous spill is now unreachable
    spillTo.foreach(root => history.drop(2).foreach(dropSpill(spark, root, _)))
    // Materialize ONLY the frames this step newly checkpointed,
    // CONCURRENTLY (independent Spark jobs — wall time is the slowest,
    // not the sum). On a non-compacting batch c/o/l/co are plain unions
    // over already-pinned delta blocks: counting them each batch re-scans
    // the whole accumulated state for nothing (O(k²) cached-block scans
    // over a k-batch fold); only the new agg checkpoint needs a job.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val wantSizes = java.lang.Boolean.getBoolean("graft.ivm.sizes")
    // a spill batch already materialized every state as its table write —
    // nothing to pin unless the sizes diagnostic wants the counts
    val toPin =
      if (spillTo.nonEmpty) (if (wantSizes) next.all else Seq.empty)
      else if (compact || wantSizes) next.all
      else Seq(next.agg)
    val sizes = Await.result(
      Future.sequence(toPin.map(df => Future { df.count() })), Duration.Inf)
    // the sizes diagnostic (z-set rows incl. not-yet-compacted ± pairs,
    // for capacity planning) counts all five regardless
    if (wantSizes)
      System.err.println("[ivm] state rows " +
        Seq("c", "o", "l", "co", "agg").zip(sizes)
          .map { case (n, s) => s"$n=$s" }.mkString(" "))
    parsed.unpersist(blocking = false)
    next
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
                 aggKeys: Seq[String] = DefaultAggKeys,
                 tMaxKnown: Option[Long] = None,
                 onBatch: (Int, State) => Unit = (_, _) => ()): State = {
    val tMax = tMaxKnown.getOrElse(events.agg(max(col("t"))).head().getLong(0))
    // NO re-checkpoint here: both call sites (generateCached, StreamBench)
    // hand over an already-pinned frame, and the batch column is a trivial
    // projection per cached scan — re-materializing millions of lines just
    // to attach it cost more than every per-batch filter combined.
    val batched = events.withColumn("batch",
      least(expr(s"CAST(((t - 1L) * ${k}L) DIV ${tMax}L AS INT)"), lit(k - 1)))
    val fin = (0 until k).foldLeft(init(spark, aggKeys)) { (st, b) =>
      val t0 = System.nanoTime()
      val r = step(st, batched.filter(col("batch") === b).select("line"), aggKeys)
      System.err.println(f"[ivm] batch $b: ${(System.nanoTime() - t0) / 1e9}%.1fs")
      onBatch(b, r)
      r
    }
    fin
  }
}
