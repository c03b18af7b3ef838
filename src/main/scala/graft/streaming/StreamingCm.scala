package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.CmSketch
import graft.operators.Sketches

/** STREAMING COUNT-MIN — the fifth mergeable-summary twin (beside
  * co-moments, KLL, Misra–Gries, drift counts): each micro-batch runs
  * ONE keyless [[CmSketch]] aggregate and the accumulated driver state is
  * the element-wise SUM of the counter arrays — addition commutes, so
  * the accumulated counters are BIT-IDENTICAL to the one-shot batch
  * sketch at any batching, and the final audit is the same
  * [[Sketches.cmFinish]] surface (and DuckDB oracle) the batch query
  * uses. Driver state: one 4×1024 long array + a total — O(sketch),
  * not O(stream).
  */
object StreamingCm {

  private val sinkCounter = new AtomicInteger(0)
  private val stagedMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  private def stagedDocs(spark: SparkSession, dir: String): String =
    stagedMemo.getOrElseUpdate(
      spark.sparkContext.applicationId + "#" + dir, {
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_streamcm_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/documents"
        graft.sources.Tables.table(spark, dir, "documents")
          .select("doc_id", "text")
          .repartition(6)
          .write.mode("overwrite").parquet(path)
        path
      })

  def streamCmFrequencies(spark: SparkSession, dir: String): DataFrame =
    streamCmFrequencies(spark, dir, maxFilesPerTrigger = 1)

  def streamCmFrequencies(spark: SparkSession, dir: String,
                          maxFilesPerTrigger: Int): DataFrame = {
    CmSketch.register(spark)
    val staged = stagedDocs(spark, dir)
    val acc = new Array[Long](CmSketch.Depth * CmSketch.Width)
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    StreamTune.prepare(spark)
    val q = spark.readStream
      .schema("doc_id bigint, text string")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(staged)
      .writeStream
      .queryName(s"graft_stream_cm_${sinkCounter.incrementAndGet()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val row = batch
          .select(explode(graft.functions.TextOps.tokens).as("t"))
          .filter(length(col("t")) > 0)
          .agg(count(lit(1)), CmSketch(col("t")))
          .head() // the partial: 1 row, depth·width longs
        total.addAndGet(row.getLong(0))
        val part = row.getSeq[Long](1)
        acc.synchronized {
          var i = 0
          while (i < acc.length) { acc(i) += part(i); i += 1 }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    import spark.implicits._
    val skDf = acc.synchronized {
      Seq((total.get(), acc.toSeq)).toDF("n_total", "sk")
    }
    Sketches.cmFinish(Sketches.cmTokens(spark, dir), skDf)
  }
}
