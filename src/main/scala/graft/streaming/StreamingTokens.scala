package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** STREAMING HEAVY HITTERS — the Misra–Gries half of
  * [[graft.functions.TextOps.frequentTokens]] run over a micro-batched
  * stream: MG summaries are MERGEABLE (Agarwal et al., "Mergeable
  * Summaries", PODS'12 — combine counters, then decrement all by the
  * (c+1)-th largest and drop ≤0; the N/(c+1) error bound survives
  * arbitrary merge trees), so each batch contributes its partition
  * summaries and the accumulated driver state stays ≤ capacity counters
  * no matter how long the stream runs — the dashboard "top tokens so far"
  * contract.
  *
  * Exactness contract (same as the batch twin): the sketch only NOMINATES
  * candidates; a final exact count-join over the corpus produces the
  * returned top-k, and the conservative completeness gate (`k-th count >
  * N/(c+1)`) proves no true heavy hitter can be missing. The result is
  * therefore bit-equal to the batch operator and shares its DuckDB
  * oracle — recall-then-verify survives streaming.
  */
object StreamingTokens {

  private val sinkCounter = new AtomicInteger(0)
  private val stagedMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  private def stagedDocs(spark: SparkSession, dir: String): String =
    stagedMemo.getOrElseUpdate(
      spark.sparkContext.applicationId + "#" + dir, {
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_streamtok_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/documents"
        graft.sources.Tables.table(spark, dir, "documents")
          .select("doc_id", "text")
          .repartition(6)
          .write.mode("overwrite").parquet(path)
        path
      })

  def streamFrequentTokens(spark: SparkSession, dir: String): DataFrame =
    streamFrequentTokens(spark, dir, maxFilesPerTrigger = 1)

  def streamFrequentTokens(spark: SparkSession, dir: String,
                           maxFilesPerTrigger: Int, k: Int = 20,
                           capacity: Int = 4096): DataFrame = {
    import spark.implicits._
    val staged = stagedDocs(spark, dir)
    // accumulated MG summary + exact stream length; both bounded
    val acc = scala.collection.mutable.HashMap.empty[String, Long]
    var total = 0L
    def mergeInto(summary: Iterator[(String, Long)], weight: Long): Unit = {
      summary.foreach { case (t, c) => acc.update(t, acc.getOrElse(t, 0L) + c) }
      total += weight
      if (acc.size > capacity) {
        // decrement by the (capacity+1)-th largest so ≤ capacity survive
        val d = acc.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
        acc.mapValuesInPlace((_, c) => c - d)
        acc.filterInPlace((_, c) => c > 0)
      }
    }
    StreamTune.prepare(spark)
    val q = spark.readStream
      .schema("doc_id bigint, text string")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(staged)
      .writeStream
      .queryName(s"graft_stream_tokens_${sinkCounter.incrementAndGet()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // per-batch distributed MG per partition (bounded summaries), then
        // a bounded collect: ≤ capacity × partitions (token, count) rows
        val parts = batch
          .select(explode(split(trim(col("text")), "\\s+")).as("token"))
          .as[String]
          .mapPartitions { it =>
            val counts = scala.collection.mutable.HashMap.empty[String, Long]
            var n = 0L
            it.foreach { t =>
              n += 1
              counts.get(t) match {
                case Some(c) => counts.update(t, c + 1)
                case None if counts.size < capacity => counts.update(t, 1L)
                case None =>
                  counts.mapValuesInPlace((_, c) => c - 1)
                  counts.filterInPlace((_, c) => c > 0)
              }
            }
            counts.iterator.map { case (t, c) => (t, c, 0L) } ++
              Iterator(("", 0L, n))
          }.collect()
        acc.synchronized {
          mergeInto(parts.iterator.filter(_._3 == 0L).map(p => (p._1, p._2)),
            parts.iterator.map(_._3).sum)
        }
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // exact verify over the corpus, exactly as the batch operator does
    val candidates = acc.keys.toSeq.toDF("token")
    val exact = graft.sources.Tables.table(spark, dir, "documents")
      .select(explode(split(trim(col("text")), "\\s+")).as("token"))
      .join(broadcast(candidates), "token")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
      .localCheckpoint()
    val kth = exact.agg(coalesce(min(col("n")), lit(0L))).head().getLong(0)
    require(kth > total / (capacity + 1),
      s"recall bound violated after streaming merge: k-th count $kth ≤ " +
        s"N/(c+1) = ${total / (capacity + 1)} — raise capacity")
    exact
  }
}
