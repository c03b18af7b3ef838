package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Profiling

/** CONTINUOUS BENFORD MONITORING — the streaming twin of
  * [[Profiling.profileBenford]], the seventh mergeable-summary pair:
  * the first-digit partial is a ≤9-row count vector that merges by
  * plain addition, so the forensic money-column gate is readable at
  * every moment of an ingest without rescanning history. Driver state
  * is the 9-entry digit map — O(alphabet), not O(stream) — and the
  * finisher (ppm shares against the shared literal expectation table)
  * is [[Profiling.benfordFinish]] verbatim, so batch equality is
  * bit-exact at ANY batching.
  */
object StreamingBenford {

  private val runCounter = new AtomicInteger(0)
  private val stagedMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  private def stagedOrders(spark: SparkSession, dir: String): String =
    stagedMemo.getOrElseUpdate(
      spark.sparkContext.applicationId + "#" + dir, {
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_streambenford_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/orders"
        graft.sources.Tables.table(spark, dir, "orders")
          .select("o_orderkey", "o_totalprice")
          .repartition(6)
          .write.mode("overwrite").parquet(path)
        path
      })

  def streamBenford(spark: SparkSession, dir: String): DataFrame =
    streamBenford(spark, dir, maxFilesPerTrigger = 1)

  def streamBenford(spark: SparkSession, dir: String,
                    maxFilesPerTrigger: Int): DataFrame = {
    val staged = stagedOrders(spark, dir)
    // accumulator: digit -> count; written only from the stream thread,
    // read after awaitTermination
    val acc = scala.collection.concurrent.TrieMap.empty[Long, Long]
    StreamTune.prepare(spark)
    val q = spark.readStream
      .schema("o_orderkey bigint, o_totalprice double")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(staged)
      .writeStream
      .queryName(s"graft_stream_benford_${runCounter.incrementAndGet()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Profiling.benfordCounts(batch)
          .collect() // ≤ 9 digit rows — the partial, not the data
          .foreach { r =>
            val d = r.getLong(0)
            acc(d) = acc.getOrElse(d, 0L) + r.getLong(1)
          }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import spark.implicits._
    Profiling.benfordFinish(
      acc.toSeq.map { case (d, n) => (d, n) }.toDF("digit", "n"))
  }
}
