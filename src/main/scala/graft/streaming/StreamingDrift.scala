package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Profiling

/** CONTINUOUS DRIFT MONITORING — the streaming twin of
  * [[Profiling.profileDrift]], completing the "mergeable summaries
  * survive streaming" family beside [[StreamingProfile]] (co-moments),
  * [[StreamingQuantiles]] (KLL) and [[StreamingTokens]] (Misra–Gries):
  * the drift histogram's partial is per-bucket train/val COUNTS, which
  * merge by plain addition, so each micro-batch of arriving documents
  * contributes one ≤11-row aggregate and the accumulated state feeds the
  * SAME [[Profiling.driftFinish]] closed form the batch operator uses —
  * bit-identical output (and oracle) at ANY batching.
  *
  * This is the training-pipeline admission gate run continuously: as a
  * corpus drop streams in, the train-vs-val length-distribution skew is
  * readable at every moment without rescanning history. Driver state is
  * the 11-bucket count map — O(histogram), not O(stream).
  */
object StreamingDrift {

  private val runCounter = new AtomicInteger(0)
  private val stagedMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Stage the 2 drift columns as several files so maxFilesPerTrigger
    * produces a genuinely multi-batch stream.
    */
  private def stagedDocs(spark: SparkSession, dir: String): String =
    stagedMemo.getOrElseUpdate(
      spark.sparkContext.applicationId + "#" + dir, {
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_streamdrift_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/documents"
        graft.sources.Tables.table(spark, dir, "documents")
          .select("doc_id", "n_chars")
          .repartition(6)
          .write.mode("overwrite").parquet(path)
        path
      })

  def streamDrift(spark: SparkSession, dir: String): DataFrame =
    streamDrift(spark, dir, maxFilesPerTrigger = 1)

  def streamDrift(spark: SparkSession, dir: String,
                  maxFilesPerTrigger: Int): DataFrame = {
    val staged = stagedDocs(spark, dir)
    // accumulator: bucket -> (n_train, n_val); written only from the
    // stream thread, read after awaitTermination
    val acc = scala.collection.concurrent.TrieMap.empty[Int, (Long, Long)]
    StreamTune.prepare(spark)
    val q = spark.readStream.schema("doc_id bigint, n_chars bigint")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(staged)
      .writeStream
      .queryName(s"graft_stream_drift_${runCounter.incrementAndGet()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Profiling.driftCounts(Profiling.driftSliced(batch))
          .collect() // ≤ 11 histogram rows — the partial, not the data
          .foreach { r =>
            val k = r.getInt(0)
            val (t, v) = acc.getOrElse(k, (0L, 0L))
            acc(k) = (t + r.getLong(1), v + r.getLong(2))
          }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import spark.implicits._
    Profiling.driftFinish(
      acc.toSeq.map { case (b, (t, v)) => (b, t, v) }
        .toDF("bucket", "n_train", "n_val"))
  }
}
