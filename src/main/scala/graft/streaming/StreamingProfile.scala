package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** INCREMENTAL PROFILING over a stream — the "any associative aggregate is
  * maintainable" demonstration, applied to the correlation profile: the
  * nine decimal-exact co-moment sums of
  * [[graft.operators.Profiling.correlationSums]] are linear in the data,
  * so each micro-batch contributes an exact decimal(38,4) partial and the
  * accumulated state is just per-flag exact addition. The final closed form is
  * the SAME [[graft.operators.Profiling.correlationFinish]] the batch
  * operator uses, so the streaming answer is bit-identical to the batch
  * one — and to the DuckDB oracle — REGARDLESS of how the stream was
  * batched (batching invariance is the whole point, and is spec-pinned).
  *
  * Scale shape: per batch, one map-side-combined hash aggregate over the
  * batch's rows; accumulated driver state is O(#flags × 10) scalars — the
  * monitoring-dashboard contract (a profile you can read at any moment
  * without rescanning history). A restartable deployment would persist the
  * accumulator row per batch id (idempotent overwrite, like
  * [[StreamingDedup]]'s per-batch output); here the stream is bounded and
  * the invariance + batch-equality contract is what the oracle checks.
  */
object StreamingProfile {

  private val sinkCounter = new AtomicInteger(0)
  private val stagedMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Stage the 4 profile columns of lineitem as several parquet files so
    * maxFilesPerTrigger produces a genuinely multi-batch stream.
    */
  private def stagedLineitem(spark: SparkSession, dir: String): String =
    stagedMemo.getOrElseUpdate(
      spark.sparkContext.applicationId + "#" + dir, {
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_streamprof_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/lineitem"
        graft.sources.Tables.table(spark, dir, "lineitem")
          .select("l_returnflag", "l_quantity", "l_extendedprice", "l_discount")
          .repartition(6)
          .write.mode("overwrite").parquet(path)
        path
      })

  def streamCorrelation(spark: SparkSession, dir: String): DataFrame =
    streamCorrelation(spark, dir, maxFilesPerTrigger = 1)

  def streamCorrelation(spark: SparkSession, dir: String,
                        maxFilesPerTrigger: Int): DataFrame = {
    val staged = stagedLineitem(spark, dir)
    val schema = "l_returnflag string, l_quantity double, " +
      "l_extendedprice double, l_discount double"
    // accumulator: flag -> (n, [q_e2, p_e2, d_e2, qq, pp, dd, qp, qd, pd])
    // — the count stays a long, the nine co-moments are exact BigDecimals
    // (the decimal(38,4) export, r11): addition is exact and order-free,
    // which is what keeps the accumulation batching-invariant
    final case class Acc(var n: Long, sums: Array[java.math.BigDecimal])
    val acc = scala.collection.mutable.Map.empty[String, Acc]
    StreamTune.prepare(spark)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(staged)
      .writeStream
      .queryName(s"graft_stream_profile_${sinkCounter.incrementAndGet()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val partials = graft.operators.Profiling.correlationSums(batch).collect()
        acc.synchronized {
          partials.foreach { r =>
            val a = acc.getOrElseUpdate(r.getString(0),
              Acc(0L, Array.fill(9)(java.math.BigDecimal.ZERO)))
            a.n += r.getLong(1)
            (0 until 9).foreach(i =>
              a.sums(i) = a.sums(i).add(r.getDecimal(i + 2)))
          }
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val schemaOut = graft.operators.Profiling
      .correlationSums(
        graft.sources.Tables.table(spark, dir, "lineitem").limit(0))
      .schema
    val rows = acc.toSeq.sortBy(_._1).map { case (flag, a) =>
      // re-pin the export scale: BigDecimal.add can widen the scale
      // representationally, and createDataFrame requires the declared
      // decimal(38,4)
      Row.fromSeq(flag +: a.n +: a.sums.toSeq.map(_.setScale(4)))
    }
    graft.operators.Profiling.correlationFinish(
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schemaOut))
  }
}
