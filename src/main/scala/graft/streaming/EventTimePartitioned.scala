package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.{PartitionedReplayProvider, ReplayServer}

/** EVENT-TIME Q3 OVER THE PARTITIONED TRANSPORT — the real broker shape.
  *
  * A Kafka topic promises order only WITHIN a partition; the standard CDC
  * layout is one ordered log per table. This query consumes exactly that:
  * three independently-growing replay partitions (customer / orders /
  * lineitem), a vector of per-partition offsets checkpointed by the
  * engine, Kafka-style apportioned admission — and lateness decided by the
  * PER-PARTITION prefix watermark: an event is late iff an earlier event
  * IN ITS OWN PARTITION carried a greater event time.
  *
  * Per-partition-prefix is the only honest deterministic semantics here:
  * a GLOBAL watermark over a partitioned transport depends on how the
  * consumer interleaves partitions at runtime (Flink's merged watermarks
  * make late counts run-dependent for exactly this reason), while the
  * per-partition prefix is a pure function of the partition logs — so the
  * DuckDB oracle can state the dropped set in closed form: the withheld
  * lineitems land at the END of the lineitem log, making one late iff its
  * rank precedes the last ON-TIME lineitem's rank (`rk < max on-time rk`
  * — NOT the single-log `rk < n_lineitem`: the other tables' event times
  * live in other partitions and must not gate this one).
  *
  * Recovery discipline is [[EventTimeReplay]]'s, with the watermark STATE
  * a per-partition vector: fold snapshot-skipped by batch id, accounting
  * (per-partition running maxima + dropped count) on its own id
  * watermark, kill mid-production, resume from checkpoint + snapshot.
  */
object EventTimePartitioned {

  private val G = 4096L

  /** `(lastAppliedBatchId, dropped, admittedLate, wm per partition)`.
    * `admitted` counts stragglers inside the bounded-delay window of the
    * delayed variant (always 0 under the plain per-partition prefix
    * watermark, whose window is empty).
    */
  private final case class Meta(lastId: Long, dropped: Long, admitted: Long,
                                wm: Map[Int, Long])

  private def loadMeta(path: String): Meta =
    if (!Files.exists(Paths.get(path))) Meta(-1L, 0L, 0L, Map.empty)
    else {
      val Array(id, d, a, wms) = new String(Files.readAllBytes(Paths.get(path)),
        StandardCharsets.UTF_8).trim.split("\\|", 4)
      Meta(id.toLong, d.toLong, a.toLong,
        wms.split(",").filter(_.nonEmpty).map { kv =>
          val Array(p, w) = kv.split(":"); p.toInt -> w.toLong
        }.toMap)
    }

  private def saveMeta(path: String, m: Meta): Unit = {
    val tmp = Paths.get(path + ".tmp")
    val wms = m.wm.toSeq.sortBy(_._1).map { case (p, w) => s"$p:$w" }.mkString(",")
    Files.write(tmp, s"${m.lastId}|${m.dropped}|${m.admitted}|$wms"
      .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Per-partition prefix late split, distributed like
    * [[EventTimeReplay.prefixLateFlag]] but with every block scoped to its
    * partition: blocks are (partition, offset-range) cells, the tiny
    * per-cell maxima collect gives each cell's carry-in via a per-partition
    * driver scan, and a `partitionBy(partition, block) orderBy(offset)`
    * running max finishes inside each cell. Input: `partition INT,
    * offset LONG, t LONG` (+ anything else, preserved).
    */
  private[streaming] def prefixLateFlagP(batch: DataFrame,
                                         carryIn: Map[Int, Long],
                                         blockSize: Long = G,
                                         delay: Long = 0L): DataFrame = {
    require(delay >= 0L, s"allowed lateness must be >= 0, got $delay")
    val withBlock = batch.withColumn("_blk", floor(col("offset") / blockSize))
    val cells = withBlock.groupBy(col("partition"), col("_blk"))
      .agg(max(col("t")).as("_mx")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val carry = cells.groupBy(_._1).toSeq.flatMap { case (p, cs) =>
      var running = carryIn.getOrElse(p, Long.MinValue)
      cs.sortBy(_._2).map { case (_, b, mx) =>
        val c = running; running = math.max(running, mx); (p, b, c)
      }
    }
    val spark = batch.sparkSession
    import spark.implicits._
    val carryDf = carry.toDF("partition", "_blk", "_carry")
    val w = Window.partitionBy(col("partition"), col("_blk"))
      .orderBy(col("offset"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the drop cutoff trails each PARTITION's own frontier by `delay`
    // (δ = 0 is the plain per-partition prefix watermark — empty window).
    // The MinValue sentinel ("no event precedes this one in its
    // partition") is guarded with CASE WHEN, not `&&`, for the same
    // codegen-CSE overflow reason as [[EventTimeReplay.prefixLateFlag]].
    val frontier = greatest(col("_carry"),
      coalesce(col("_pm"), lit(Long.MinValue)))
    withBlock.join(broadcast(carryDf), Seq("partition", "_blk"))
      .withColumn("_pm", max(col("t")).over(w))
      .withColumn("_frontier", frontier)
      .withColumn("_cut",
        when(col("_frontier") === Long.MinValue, lit(Long.MinValue))
          .otherwise(col("_frontier") - lit(delay)))
      .withColumn("late", col("t") < col("_cut"))
      .withColumn("late_admitted",
        col("t") >= col("_cut") && col("t") < col("_frontier"))
      .drop("_blk", "_carry", "_pm", "_frontier", "_cut")
  }

  /** One ordered log per relation (the CDC topic layout), each line
    * `<t>\t<line>`: customer and orders in event-time order; lineitem
    * with the deterministic lateness injection — the withheld events
    * (`l_orderkey % 10 == 3`) appended AFTER all on-time ones.
    */
  private def relationLogs(spark: SparkSession, dir: String): Seq[DataFrame] = {
    val events = Changelog.generateCached(spark, dir, insertOnly = true)
    val fields = split(substring(col("line"), 5, Int.MaxValue), "\\|")
    val tagged = events.withColumn("tag", substring(col("line"), 2, 2))
      .withColumn("deferred",
        col("tag") === "LI" &&
          element_at(fields, 1).cast("long") % 10 === 3)
    def log(tag: String) =
      tagged.filter(col("tag") === tag)
        .orderBy(col("deferred").asc, col("t"), col("sub"), col("idx"))
        .select(concat_ws("\t", col("t").cast("string"), col("line")).as("line"))
    Seq(log("CU"), log("OR"), log("LI"))
  }

  private def loadProgress(path: String): (Long, Long) =
    if (!Files.exists(Paths.get(path))) (-1L, 0L)
    else {
      val Array(id, cum) = new String(Files.readAllBytes(Paths.get(path)),
        StandardCharsets.UTF_8).trim.split("\\|")
      (id.toLong, cum.toLong)
    }

  private def saveProgress(path: String, id: Long, cum: Long): Unit = {
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, s"$id|$cum".getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, Paths.get(path),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  /** `stream_q3_event_time_partitioned` — the driver query: three growing
    * partition logs, vector offsets, per-partition prefix watermarks, the
    * kill landing mid-production, resume from checkpoint + snapshot.
    */
  def q3EventTimePartitioned(spark: SparkSession, dir: String): DataFrame =
    run(spark, dir, delay = 0L)

  /** `stream_q3_event_time_delayed_partitioned` — the BOUNDED-DELAY
    * watermark over the PARTITIONED transport, the one transport the
    * δ-admission semantics had not yet crossed (batch fold:
    * [[StreamQueries.q3EventTimeDelayed]]; single-log broker:
    * [[EventTimeReplay.q3EventTimeDelayedReplay]]). Each partition's drop
    * cutoff trails ITS OWN prefix frontier by δ = nL/20 — the Kafka shape,
    * where allowed lateness is judged against the partition an event
    * actually rides, not a merged global clock: a lineitem straggler
    * within δ of the lineitem log's frontier is ADMITTED and folds, only
    * events more than δ behind their own partition drop. The per-partition
    * (wm, dropped, admitted) vector persists through the mid-production
    * KILL on the meta file's id watermark, so the resumed query re-derives
    * identical admission decisions (flags are a pure function of
    * (partition, offset, stream, δ)). Oracle closed form: the withheld
    * lineitems ride at the END of the lineitem log sorted by event time,
    * so each one's frontier is m = the last ON-TIME lineitem's rank —
    * dropped iff rk < m − δ, admitted iff m − δ ≤ rk < m, on-time past m.
    */
  def q3EventTimeDelayedPartitioned(spark: SparkSession, dir: String): DataFrame = {
    val nL = graft.sources.Tables.table(spark, dir, "lineitem").count()
    run(spark, dir, delay = nL / 20)
  }

  private def run(spark: SparkSession, dir: String, delay: Long): DataFrame = {
    val logs = relationLogs(spark, dir)
    // Per-partition backpressure: each log's producer paces against its
    // own consumers, and the kill provably lands mid-production (total
    // staged is bounded by total read + the windows). Admission nuance
    // (ADVICE r12): each window is 4/16 OF ITS OWN LOG, so while all
    // three logs are producing the combined backlog comfortably exceeds
    // the global minBatchSize (1/6 of the stream) — but once the small
    // customer/orders logs drain, the remaining window is ~4/16 of
    // lineitem's share (~0.20 of the stream at TPC-H ratios, borderline
    // vs 1/6 and data-dependent). The TAIL-DRAIN CONTRACT is therefore
    // explicit: maxTriggerDelayMs below flushes sub-minBatchSize batches
    // after 500 ms, so the tail drains in a few delay-paced batches
    // (each paying a fold + snapshot) rather than stalling — a stated
    // trade, not an accidental default.
    val handles = logs.map(l => ReplayServer.serveGrowing(l,
      chunks = 16, intervalMs = 10L, maxAheadChunks = 3))
    val work = Files.createTempDirectory("graft-etpart").toString
    val snapDir = s"$work/snap"
    val spillRoot = s"$work/spill"
    val metaFile = s"$work/meta"
    val progressFile = s"$work/progress"
    try {
      val expected = handles.map(_.expected).sum
      require(expected > 0, "empty changelog — nothing to replay")
      val batchSize = math.max(1L, expected / 6)
      def startQuery(): StreamingQuery = {
        val resumed = Snapshots.loadLatest(spark, snapDir)
        var state = resumed.fold(IncrementalQ3.init(spark))(_._1)
        var expectedBatch = resumed.fold(0L)(_._2 + 1)
        StreamTune.prepare(spark)
        spark.readStream
          .format(classOf[PartitionedReplayProvider].getName)
          .option("host", "127.0.0.1")
          .option("ports", handles.map(_.port).mkString(","))
          .option("batchSize", batchSize.toString)
          .option("minBatchSize", batchSize.toString)
          // the tail-drain contract (see the serveGrowing comment above):
          // once only the lineitem log is still producing, its window can
          // sit below minBatchSize — this flush bounds the wait, stated
          // explicitly rather than inherited as the source default
          .option("maxTriggerDelayMs", "500")
          .load()
          .writeStream
          .queryName(s"graft_et_part_${handles.head.port}")
          .option("checkpointLocation", s"$work/ckpt")
          .trigger(Trigger.ProcessingTime("50 milliseconds"))
          .foreachBatch { (batch: DataFrame, id: Long) =>
            val meta = loadMeta(metaFile)
            val parts = split(col("value"), "\t", 2)
            val stamped = batch.select(col("partition"), col("offset"),
              parts.getItem(0).cast("long").as("t"),
              parts.getItem(1).as("line"))
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            val flagged = prefixLateFlagP(stamped, meta.wm, delay = delay)
              .localCheckpoint()
            stamped.unpersist(blocking = false)
            try {
              if (id >= expectedBatch) {
                require(id == expectedBatch,
                  s"batch $id delivered but IVM state is at $expectedBatch — " +
                    "a gap would corrupt the aggregate")
                // ADAPTIVE spill, the same policy as [[EventTimeReplay]]:
                // in-memory below the state-size threshold (bench scales),
                // bucketed-table MERGE above it (a 100× run) — every
                // transport-fed fold carries the bounded-memory path
                state = IncrementalQ3.step(state,
                  flagged.filter(!col("late")).select("line"),
                  spillDir = Some(spillRoot),
                  spillAtRows = IncrementalQ3.adaptiveSpillThreshold)
                Snapshots.saveBatchAuto(state, snapDir, id)
                expectedBatch = id + 1
              }
              // one small job for all per-batch statistics: per-partition
              // max t (the wm vector), dropped + admitted counts, total rows
              val stats = flagged.groupBy(col("partition"))
                .agg(sum(when(col("late"), 1L).otherwise(0L)).as("late"),
                  sum(when(col("late_admitted"), 1L).otherwise(0L)).as("adm"),
                  max(col("t")).as("mx"), count(lit(1)).as("n"))
                .collect() // ≤ one row per partition
              if (id > meta.lastId) {
                val late = stats.map(r => if (r.isNullAt(1)) 0L else r.getLong(1)).sum
                val adm = stats.map(r => if (r.isNullAt(2)) 0L else r.getLong(2)).sum
                val wm2 = meta.wm ++ stats.map { r =>
                  val p = r.getInt(0)
                  p -> math.max(meta.wm.getOrElse(p, Long.MinValue), r.getLong(3))
                }
                saveMeta(metaFile,
                  Meta(id, meta.dropped + late, meta.admitted + adm, wm2))
              }
              val (lastCounted, cum) = loadProgress(progressFile)
              if (id > lastCounted)
                saveProgress(progressFile, id, cum + stats.map(_.getLong(4)).sum)
            } finally flagged.unpersist()
          }
          .start()
      }
      def seen(): Long = loadProgress(progressFile)._2
      def await(target: Long, q: StreamingQuery, what: String): Unit = {
        val deadline = System.nanoTime() +
          (180L + target / 20000L) * 1000000000L
        while (seen() < target && q.isActive &&
               System.nanoTime() < deadline) Thread.sleep(25)
        require(seen() >= target,
          s"$what: saw ${seen()} of $target events before timeout " +
            s"(query active: ${q.isActive})")
      }
      val qa = startQuery()
      try {
        await(expected / 3, qa, "phase A")
        val stagedAtKill = handles.map(h =>
          ReplayServer.count("127.0.0.1", h.port)).sum
        require(stagedAtKill < expected,
          "the producers finished before the kill — the arrival-driven " +
            s"path went unexercised ($stagedAtKill of $expected staged)")
      } finally qa.stop()
      val afterKill = seen()
      require(afterKill < expected,
        "the kill must land mid-stream or the resume proves nothing " +
          s"(saw $afterKill of $expected before restart)")
      val qb = startQuery()
      try await(expected, qb, "phase B (post-resume)") finally qb.stop()
      require(seen() == expected,
        s"exactly-once violated at the transport: ${seen()} != $expected")
      val meta = loadMeta(metaFile)
      require(meta.dropped > 0, "event-time Q3 (partitioned): no late " +
        "events were dropped — the deterministic lateness injection " +
        "failed, the query is testing nothing")
      if (delay > 0L)
        require(meta.admitted > 0,
          "bounded-delay event-time Q3 (partitioned): no straggler fell " +
            "inside its partition's lateness window — the δ-admission " +
            "semantics went untested")
      val st = Snapshots.loadLatest(spark, snapDir)
        .getOrElse(sys.error("no snapshot after drain"))._1
      // TWO-SIDED policy pin ([[EventTimeReplay]]'s): spilled ⇔ the state
      // warranted it — not spilling must be the policy's correct call
      // (final consolidated state under the threshold), not a silent miss
      if (st.spillHistory.isEmpty) {
        require(!st.spillEngaged,
          "event-time Q3 (partitioned): threshold crossed but no spill " +
            "version was written — the engagement latch is broken")
        val consolidated =
          Seq(st.c, st.o, st.l, st.co).map(f => ZSet.consolidate(f).count()).sum +
            st.aggs.map(_._2.count()).sum
        require(consolidated < IncrementalQ3.adaptiveSpillThreshold,
          s"event-time Q3 (partitioned): state grew to $consolidated rows " +
            s"past the ${IncrementalQ3.adaptiveSpillThreshold}-row " +
            "threshold without engaging the spill — the policy is broken")
      }
      val top0 = IncrementalQ3.topN(st)
        .select(col("l_orderkey"),
          col("o_orderdate").cast("string").as("o_orderdate"),
          col("o_orderpriority"), col("revenue"))
        .withColumn("dropped_late", lit(meta.dropped))
      val top = if (delay > 0L)
        top0.withColumn("admitted_late", lit(meta.admitted)) else top0
      val rows = top.collect().toIndexedSeq
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.asJava, top.schema)
    } finally {
      handles.foreach(_.close())
      IncrementalQ3.cleanupSpillRoot(spark, spillRoot)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(work))
    }
  }
}
