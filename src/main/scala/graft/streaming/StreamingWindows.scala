package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.Tables

/** Event-time windowed aggregation as a REAL Structured Streaming query
  * with watermarking — the beyond-parity streaming surface (the reference
  * is processing-time only, SURVEY §2.8): late events beyond the watermark
  * are dropped and append-mode emits each window exactly once, finalized.
  *
  * The batch twins in [[graft.operators.Windows]] share the same window
  * expressions, so the driver's SQL oracle validates the semantics and
  * this wiring validates the streaming execution (StreamingWindowsSpec).
  */
object StreamingWindows {

  /** Stage the events table as time-ordered parquet chunks (a replayable
    * "stream archive" — files arrive in event-time order like a log).
    *
    * The file stream source orders files by MODIFICATION TIME, and a
    * single multi-file write can finish its newest-events part first — the
    * watermark would then jump ahead and silently drop the older chunks as
    * late data. Rather than sleeping between sequential writes (1.1 s per
    * chunk), each chunk's files get an explicit back-dated mtime encoding
    * its event-time order.
    */
  def stage(spark: SparkSession, dir: String, outDir: String, nFiles: Int = 3): Unit = {
    // One range-partitioned write job: nFiles part files in strict ts-range
    // order (no global-window ntile — that plan is a single-partition sort
    // of the whole table; range chunks are ~even by sampling and, unlike
    // ntile, need no rank pass at all).
    val tmp = outDir + ".staging"
    Tables.table(spark, dir, "events")
      .select("ts", "user_id", "event_type", "value")
      .repartitionByRange(nFiles, col("ts"))
      .sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(tmp)
    // part-file name order = range order; back-date mtimes in that order
    publishChunks(outDir, partFiles(tmp))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  /** Part files of one staged write, in part-file-name (= range) order. */
  private def partFiles(dir: String): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(dir))) { files =>
      files.iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq
        .sortBy(_.getFileName.toString)
    }
  }

  /** THE replay-order contract, in one place: move `parts` into `outDir`
    * as `chunk<i>-…` with mtimes back-dated in rank order, so the file
    * stream source (oldest-mtime-first) replays them in exactly the given
    * order. Shared by [[stage]] and [[stageLate]] — the ordering rule
    * must never fork between the on-time and late archives.
    */
  private def publishChunks(outDir: String,
                            parts: Seq[java.nio.file.Path]): Unit = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val out = Paths.get(outDir)
    org.apache.commons.io.FileUtils.deleteQuietly(out.toFile)
    Files.createDirectories(out)
    val now = System.currentTimeMillis()
    parts.zipWithIndex.foreach { case (p, i) =>
      val dest = out.resolve(s"chunk${i + 1}-${p.getFileName}")
      Files.move(p, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(
          now - (parts.size - 1 - i) * 60000L))
    }
  }

  private val sinkCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  // One staging of the events archive per (application, fixture dir): the
  // staged files are immutable once written, so every streaming query in
  // a session replays the same on-disk archive instead of re-writing it
  // (6 driver queries × a write job + mtime stamping, all identical).
  private val stagedMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  private def stagedEvents(spark: SparkSession, dir: String): String =
    stagedMemo.getOrElseUpdate(
      spark.sparkContext.applicationId + "#" + dir, {
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_stream_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/events"
        stage(spark, dir, path)
        path
      })

  // [[StreamTune]] wrapper for this file's STATEFUL queries: engine
  // streaming defaults (checkpoint-checksum switch) + input-size-derived
  // state partition count (one state store instance per partition per
  // batch is a fixed cost — see StreamTune's measurements), wrapped
  // around start-to-termination so the conf restore cannot race the
  // query-start capture.
  private def tuned[A](spark: SparkSession, staged: String)(body: => A): A = {
    StreamTune.prepare(spark)
    StreamTune.withStatePartitions(spark,
      StreamTune.statePartitions(spark, StreamTune.dirBytes(staged)))(body)
  }

  /** Driver-contract entry: run the watermarked append-mode tumbling query
    * END TO END through real Structured Streaming (stage → readStream →
    * AvailableNow → memory sink) and return the finalized windows. The
    * result is deterministic — at termination the watermark sits at
    * `max(ts) − 1 h`, so exactly the windows whose end ≤ that finalize —
    * which is what makes a true streaming run DuckDB-oracle-checkable.
    */
  def streamTumbling(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedEvents(spark, dir)
    val sink = s"graft_stream_tumbling_${sinkCounter.incrementAndGet()}"
    tuned(spark, staged) {
      val q = startTumbling(spark, staged, sink)
      q.awaitTermination()
    }
    spark.table(sink)
  }

  /** Session windows (12 h gap, per user) as a REAL watermarked streaming
    * query — the stateful shape tumbling can't exercise: sessions MERGE
    * across micro-batches (an event can bridge two open sessions into
    * one), so this drives the session-state store, not just bucket
    * assignment. Append mode finalizes a session once the watermark
    * passes its end (= last event + gap); at AvailableNow termination the
    * watermark sits at max(ts) − 1 h, so the finalized set — every
    * session whose end ≤ that — is deterministic and oracle-checkable,
    * same contract as [[streamTumbling]].
    */
  def streamSession(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedEvents(spark, dir)
    val sink = s"graft_stream_session_${sinkCounter.incrementAndGet()}"
    tuned(spark, staged) {
      val q = startSession(spark, staged, sink)
      q.awaitTermination()
    }
    spark.table(sink)
  }

  /** 12-hour-gap session windows per user with a 1-hour watermark, append
    * mode into an in-memory table named `sinkName`. Output schema matches
    * the batch twin [[graft.operators.Windows.session]].
    */
  def startSession(spark: SparkSession, stagedDir: String,
                   sinkName: String): StreamingQuery = {
    StreamTune.prepare(spark)
    val schema = "ts timestamp, user_id bigint, event_type string, value double"
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stagedDir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "12 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        col("n_events"), col("value_sum"))
      .writeStream
      .queryName(sinkName)
      .format("memory")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** LATE-DATA DROP — the first event-time semantic a production user
    * hits, proven end to end: rows that arrive AFTER the watermark has
    * passed their window are dropped, exactly and silently, and the
    * emitted windows are those of the on-time rows alone.
    *
    * The archive is staged so lateness is REAL, not simulated: the
    * even-user rows of the stream's oldest hour are held back into a
    * final chunk whose mtime is the NEWEST — the file source replays
    * oldest-mtime-first, so by the time that chunk becomes a micro-batch
    * the watermark already sits at max(ts) − 1 h (advanced by the
    * previous chunk, which held the stream's maximum). Their window's
    * end (oldest hour + 1 h) is far below it, so Structured Streaming's
    * watermark filter drops every one of them before the aggregate.
    *
    * The query itself is [[tumblingFrame]] verbatim — same windows, same
    * watermark — which is the point: the DELTA between this result and
    * `stream_windows_tumbling`'s is precisely the held-back rows'
    * contribution, and the DuckDB oracle replays the on-time prefix
    * (`NOT (ts < oldest_hour_end AND user_id % 2 = 0)`) in batch.
    */
  def streamLate(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedLateEvents(spark, dir)
    val sink = s"graft_stream_late_${sinkCounter.incrementAndGet()}"
    tuned(spark, staged) {
      val q = startTumbling(spark, staged, sink)
      q.awaitTermination()
    }
    spark.table(sink)
  }

  private val stagedLateMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  private def stagedLateEvents(spark: SparkSession, dir: String): String =
    stagedLateMemo.getOrElseUpdate(
      spark.sparkContext.applicationId + "#" + dir, {
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_stream_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/events_late"
        stageLate(spark, dir, path)
        path
      })

  /** Stage the events archive with the oldest hour's even-user rows held
    * back into the newest-mtime chunk (see [[streamLate]]). On-time rows
    * keep [[stage]]'s contract: ts-range chunks, mtime in range order.
    */
  def stageLate(spark: SparkSession, dir: String, outDir: String): Unit = {
    val ev = Tables.table(spark, dir, "events")
      .select("ts", "user_id", "event_type", "value")
    // two bounded driver scalars: the oldest hour's end (the late rows'
    // window end) and the stream maximum (the terminal watermark + 1 h)
    val bounds = ev.agg(
      (date_trunc("hour", min(col("ts"))) + expr("INTERVAL 1 HOUR")).as("fhe"),
      max(col("ts")).as("mx")).head()
    val firstHourEnd = bounds.getTimestamp(0)
    val maxTs = bounds.getTimestamp(1)
    // the drop is only guaranteed when the watermark can pass the late
    // rows' window end before they arrive — needs ≥ 2 h of event span
    require(firstHourEnd.getTime <= maxTs.getTime - 3600000L,
      s"stageLate: events span under 2 hours ($firstHourEnd .. $maxTs); " +
        "the late chunk's window end would not be below the terminal watermark")
    val lateCond = col("ts") < lit(firstHourEnd) && col("user_id") % 2 === 0
    val tmp = outDir + ".staging"
    ev.filter(!lateCond)
      .repartitionByRange(2, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(s"$tmp/ontime")
    ev.filter(lateCond).coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/late")
    // on-time chunks first, the late chunk last (newest mtime)
    publishChunks(outDir, partFiles(s"$tmp/ontime") ++ partFiles(s"$tmp/late"))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
  }

  /** Sliding windows (2 h length, 1 h slide — each event lands in two
    * windows) as a watermarked append-mode streaming query, completing the
    * tumbling/sliding/session triad. Distinct aggregation is not allowed
    * on a streaming aggregate, so unlike the batch twin this counts events
    * and sums value. Finalization contract as [[streamTumbling]]: windows
    * whose END (start + 2 h) ≤ terminal watermark emit exactly once.
    */
  def streamSliding(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedEvents(spark, dir)
    val sink = s"graft_stream_sliding_${sinkCounter.incrementAndGet()}"
    tuned(spark, staged) {
    val q = spark.readStream
      .schema("ts timestamp, user_id bigint, event_type string, value double")
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("window.start").cast("string").as("window_start"),
        col("n"), col("value_sum"))
      .writeStream.queryName(sink).format("memory")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    }
    spark.table(sink)
  }

  /** Streaming exact deduplication: `dropDuplicates` over the staged event
    * stream — the streaming twin of batch DISTINCT, and the shape a
    * continuous training-data ingest runs (emit each newly-seen key once,
    * as it arrives). State is one entry per distinct key; at production
    * scale the bounded form is `dropDuplicatesWithinWatermark` (keys age
    * out past the horizon) — here the unbounded form keeps the final
    * emitted set exactly equal to batch DISTINCT, which is what the
    * DuckDB oracle checks.
    */
  def streamDedup(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedEvents(spark, dir)
    val sink = s"graft_stream_dedup_${sinkCounter.incrementAndGet()}"
    tuned(spark, staged) {
    val q = spark.readStream
      .schema("ts timestamp, user_id bigint, event_type string, value double")
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .select("user_id", "event_type")
      .dropDuplicates("user_id", "event_type")
      .writeStream.queryName(sink).format("memory")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    }
    spark.table(sink).orderBy("user_id", "event_type")
  }

  /** Stream–static enrichment: the streamed events join a STATIC
    * broadcast dimension (customer segment, keyed by the event's
    * user_id) inside the streaming query — the canonical "enrich a
    * stream against reference data" pattern. The join is stateless, so
    * it needs no watermark and append mode emits each enriched event
    * exactly once; at 100 TB/day the dimension broadcasts once per
    * micro-batch and the stream side never shuffles. Determinism is
    * trivial (no windowing), so the converged sink aggregates to
    * exactly the batch join's answer (the DuckDB oracle).
    */
  def streamEnrichStatic(spark: SparkSession, dir: String): DataFrame = {
    StreamTune.prepare(spark)
    val staged = stagedEvents(spark, dir)
    val dim = Tables.table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val sink = s"graft_stream_enrich_${sinkCounter.incrementAndGet()}"
    val q = spark.readStream
      .schema("ts timestamp, user_id bigint, event_type string, value double")
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .select("c_mktsegment", "event_type", "value")
      .writeStream.queryName(sink).format("memory")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(sink)
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
  }

  /** Stream–SCD2 temporal enrichment: the streamed purchase events join
    * the user's STATE HISTORY (an SCD Type-2 dimension of validity
    * intervals, built from each user's non-purchase activity with the
    * same collapse rule as [[graft.operators.Pipelines.scd2Build]]) on
    * `user = key AND valid_from <= ts < valid_to` — so each purchase is
    * tagged with the dimension VERSION that was live at its event time,
    * not the latest one. This is the production join for applying a
    * slowly-changing dimension to a stream (price books, account tiers,
    * consent flags).
    *
    * Scale shape: the dimension broadcasts (stream–static joins permit
    * arbitrary residual conditions because the static side is bounded);
    * Catalyst extracts the `user_id = d_user` equi-conjunct for the
    * broadcast hash join and evaluates the interval bound as a row-local
    * residual, so the stream side never shuffles and the join is
    * stateless — no watermark, append mode, each enriched purchase emits
    * exactly once. Each purchase matches AT MOST one interval (intervals
    * partition the user's timeline from first activity), so the converged
    * sink aggregates to exactly the batch interval join — the DuckDB
    * oracle.
    */
  def streamScdEnrich(spark: SparkSession, dir: String): DataFrame = {
    StreamTune.prepare(spark)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("d_user")).orderBy(col("d_ts"), col("event_id"))
    val dim = Tables.table(spark, dir, "events")
      .filter(col("event_type") =!= "purchase")
      .select(col("user_id").as("d_user"), col("ts").as("d_ts"),
        col("event_id"), col("event_type").as("state"))
      .withColumn("prev", lag(col("state"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("state"))
      .withColumn("valid_to", lead(col("d_ts"), 1).over(w))
      .select(col("d_user"), col("state"),
        col("d_ts").as("valid_from"), col("valid_to"))
    val staged = stagedEvents(spark, dir)
    val sink = s"graft_stream_scd_${sinkCounter.incrementAndGet()}"
    val q = spark.readStream
      .schema("ts timestamp, user_id bigint, event_type string, value double")
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .filter(col("event_type") === "purchase")
      .join(broadcast(dim),
        col("user_id") === col("d_user") &&
          col("ts") >= col("valid_from") &&
          (col("valid_to").isNull || col("ts") < col("valid_to")))
      .select("state", "user_id", "value")
      .writeStream.queryName(sink).format("memory")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(sink)
      .groupBy(col("state"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .orderBy(col("state"))
  }

  /** Stream–stream event-time interval join: clicks attributed to the
    * view they followed within one hour, per user — the attribution
    * join every product-analytics pipeline runs, and the one streaming
    * join shape the reference cannot express at all (its joins are
    * equi-inner over the full history; SURVEY §2.4).
    *
    * Both sides are watermarked and the join carries an event-time RANGE
    * bound, which is exactly what lets Structured Streaming evict state:
    * a buffered view older than `watermark − 1 h` can never match a
    * future click, so per-key state is bounded by the interval × arrival
    * rate, not the stream length — the property that makes this run at
    * 100 TB/day. Inner-join matches emit as soon as both sides arrive,
    * so the converged append-mode output is the batch interval join
    * exactly (the DuckDB oracle).
    */
  def streamJoinInterval(spark: SparkSession, dir: String): DataFrame = {
    val staged = stagedEvents(spark, dir)
    val sink = s"graft_stream_joinint_${sinkCounter.incrementAndGet()}"
    tuned(spark, staged) {
      val q = startJoinInterval(spark, staged, sink)
      q.awaitTermination()
    }
    spark.table(sink).orderBy("user_id", "view_ts", "click_ts")
  }

  /** The interval join as an unbound streaming frame — shared by the
    * memory-sink driver query and the checkpointed file-sink recovery
    * path (StreamingWindowsSpec), so both run the identical plan.
    */
  def joinIntervalFrame(spark: SparkSession, staged: String): DataFrame = {
    StreamTune.prepare(spark)
    val schema = "ts timestamp, user_id bigint, event_type string, value double"
    // one column namespace per side: stream-stream self-joins must not
    // share attribute ids, and the watermark column is per-side
    def side(tag: String, et: String): DataFrame =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .filter(col("event_type") === et)
        .select(col("user_id").as(s"${tag}_user"), col("ts").as(s"${tag}_ts"))
        .withWatermark(s"${tag}_ts", "1 hour")
    side("v", "view").join(side("c", "click"),
        col("v_user") === col("c_user") &&
          col("c_ts") >= col("v_ts") &&
          col("c_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("v_user").as("user_id"),
        date_format(col("v_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("view_ts"),
        date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("click_ts"))
  }

  /** The interval join as a started query (spec entry: the state-eviction
    * assertion needs the query handle's progress metrics).
    */
  def startJoinInterval(spark: SparkSession, staged: String,
                        sinkName: String): StreamingQuery =
    joinIntervalFrame(spark, staged)
      .writeStream.queryName(sinkName).format("memory")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()

  /** Checkpointed file-sink interval join: the stream-stream JOIN state —
    * both sides' watermark-bounded buffers, the expensive part of this
    * query — plus offsets and the sink commit log all live under `ckpt`,
    * so a killed query resumes to the identical converged answer without
    * re-emitting committed batches. Same operability contract as
    * [[startTumblingCheckpointed]], proven for join state by
    * StreamingWindowsSpec's kill-and-resume test.
    */
  def startJoinIntervalCheckpointed(spark: SparkSession, staged: String,
                                    ckpt: String, outDir: String): StreamingQuery =
    joinIntervalFrame(spark, staged)
      .writeStream
      .option("checkpointLocation", ckpt)
      .format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** The tumbling aggregation as an unbound streaming frame — shared by
    * the memory-sink driver query and the checkpointed file-sink recovery
    * path (StreamingWindowsSpec), so both run the identical plan.
    */
  def tumblingFrame(spark: SparkSession, stagedDir: String): DataFrame = {
    StreamTune.prepare(spark)
    val schema = "ts timestamp, user_id bigint, event_type string, value double"
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(stagedDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("window.start").cast("string").as("window_start"),
        col("event_type"), col("n"), col("value_sum"))
  }

  /** 1-hour tumbling count/sum per event_type with a 1-hour watermark,
    * append mode into an in-memory table named `sinkName`.
    */
  def startTumbling(spark: SparkSession, stagedDir: String,
                    sinkName: String): StreamingQuery =
    tumblingFrame(spark, stagedDir)
      .writeStream
      .queryName(sinkName)
      .format("memory")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Checkpointed file-sink variant: offsets + window state + the file
    * sink's commit log all live under `ckpt`, so a stopped query RESUMES
    * — already-committed batches are not re-emitted (exactly-once at the
    * sink) and the watermark/state pick up where they left off. This is
    * the operability path a long-running deployment uses.
    */
  def startTumblingCheckpointed(spark: SparkSession, stagedDir: String,
                                ckpt: String, outDir: String): StreamingQuery =
    tumblingFrame(spark, stagedDir)
      .writeStream
      .option("checkpointLocation", ckpt)
      .format("parquet")
      .option("path", outDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

  /** Streaming→table MERGE via `foreachBatch` — the production pattern
    * for continuously upserting a keyed table from a stream (the
    * streaming twin of [[graft.operators.Pipelines.cdcUpsert]]'s batch
    * MERGE shape). Each micro-batch: reduce the batch to its per-user
    * latest row (ordered-struct max over (ts, event_type, value) — a
    * TOTAL order, so deterministic), merge with the prior state version
    * by the same associative max, write state version v_b. Because the
    * per-key max is associative and commutative, the final state is
    * BATCHING-INVARIANT — however AvailableNow chops the archive into
    * micro-batches, the result equals the one-shot batch answer, which
    * is exactly what makes a foreachBatch upsert oracle-checkable.
    * Versioned directories stand in for a table format's atomic commit
    * (each batch reads v_{b-1}, writes v_b — never in place).
    */
  def streamCdcUpsert(spark: SparkSession, dir: String): DataFrame = {
    StreamTune.prepare(spark)
    val staged = stagedEvents(spark, dir)
    val base = System.getProperty("java.io.tmpdir") +
      s"/graft_upsert_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}_${sinkCounter.incrementAndGet()}"
    val schema = "ts timestamp, user_id bigint, event_type string, value double"
    val latest = max(struct(col("ts"), col("event_type"), col("value"))).as("s")
    @volatile var version = 0
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val changes = batch.groupBy(col("user_id")).agg(latest)
        val merged =
          if (version == 0) changes
          else changes.sparkSession.read.parquet(s"$base/v$version")
            .union(changes).groupBy(col("user_id"))
            .agg(max(col("s")).as("s"))
        merged.write.mode("overwrite").parquet(s"$base/v${version + 1}")
        version += 1
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // raw timestamp out (not a string cast): the driver compares
    // timestamp VALUES, and string formats of timestamps are not
    // engine-portable
    spark.read.parquet(s"$base/v$version")
      .select(col("user_id"),
        col("s.ts").as("last_ts"),
        col("s.event_type").as("last_type"),
        col("s.value").as("last_value"))
      .orderBy(col("user_id"))
  }
}
