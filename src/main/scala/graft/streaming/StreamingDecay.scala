package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Temporal

/** CONTINUOUS TIME-DECAYED FEATURES — the streaming twin of
  * [[Temporal.decayedSum]], the sixth mergeable-summary pair (beside
  * co-moments, KLL, Misra–Gries, drift counts, Count-Min): the decay
  * weight depends only on (event day, reference day), so the
  * maintainable state is the per-(user, day) exact-integer partial —
  * cent sum / event count / purchase count — which merges across
  * micro-batches by plain addition. Weighting is deferred to READ time
  * with the reference day = max day seen so far, so the monitor never
  * peeks at unseen data and re-weighting as the frontier advances costs
  * O(state), not a history rescan — the property that makes decayed
  * features maintainable at all (per-event weights would change
  * retroactively every new day).
  *
  * This is the feature-store freshness loop run continuously: as events
  * stream in, every user's "recent activity" signal is readable at any
  * moment. Driver state is the (user × active-day) grid — O(users·span),
  * not O(stream); at production scale the same partials live in a state
  * store keyed by (user, day) and the finisher is the serving query.
  * Batch equality at ANY batching is bit-exact because the partials are
  * integer sums and [[Temporal.decayedFinish]] is shared verbatim.
  */
object StreamingDecay {

  private val runCounter = new AtomicInteger(0)
  private val stagedMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Stage the 4 needed event columns as several files so
    * maxFilesPerTrigger produces a genuinely multi-batch stream.
    */
  private def stagedEvents(spark: SparkSession, dir: String): String =
    stagedMemo.getOrElseUpdate(
      spark.sparkContext.applicationId + "#" + dir, {
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_streamdecay_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/events"
        graft.sources.Tables.table(spark, dir, "events")
          .select("user_id", "ts", "event_type", "value")
          .repartition(6)
          .write.mode("overwrite").parquet(path)
        path
      })

  def streamDecayedSum(spark: SparkSession, dir: String): DataFrame =
    streamDecayedSum(spark, dir, maxFilesPerTrigger = 1)

  def streamDecayedSum(spark: SparkSession, dir: String,
                       maxFilesPerTrigger: Int): DataFrame = {
    val staged = stagedEvents(spark, dir)
    // accumulator: (user, epoch-day) -> (cents, n_events, n_purchases);
    // written only from the stream thread, read after awaitTermination
    val acc = scala.collection.concurrent.TrieMap
      .empty[(Long, java.sql.Date), (Long, Long, Long)]
    StreamTune.prepare(spark)
    val q = spark.readStream
      .schema("user_id bigint, ts timestamp, event_type string, value double")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(staged)
      .writeStream
      .queryName(s"graft_stream_decay_${runCounter.incrementAndGet()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Temporal.decayedPartials(batch)
          .collect() // (user × day)-grid rows — the partial, not the data
          .foreach { r =>
            val k = (r.getLong(0), r.getDate(1))
            val (c, n, p) = acc.getOrElse(k, (0L, 0L, 0L))
            acc(k) = (c + r.getLong(2), n + r.getLong(3), p + r.getLong(4))
          }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import spark.implicits._
    Temporal.decayedFinish(
      acc.toSeq.map { case ((u, d), (c, n, p)) => (u, d, c, n, p) }
        .toDF("user_id", "d", "cents_sum", "n_events", "n_purchases"))
  }
}
