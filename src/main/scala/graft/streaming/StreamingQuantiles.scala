package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

import graft.functions.KllSketch

/** STREAMING quantile monitoring — the mergeable-sketch story applied to
  * distributions: each micro-batch contributes one per-group KLL partial
  * (the serialized compactor ladder, `graft_kll_state`), and the
  * accumulated state is `Buffer.mergeIn` — the SAME merge the batch
  * aggregate's partial path runs, so the final sketch is a legitimate
  * sketch of the whole history whatever the batching (the estimate may
  * sit anywhere inside the error bound, which is why the emitted answer
  * is the CHECKED bound + exact audit of [[graft.operators.Sketches
  * .kllFinish]], shared verbatim with the batch twin and its oracle).
  *
  * Scale shape: per batch one map-side-combined hash aggregate; driver
  * state is one bounded ladder per event type (~levels·capacity doubles),
  * readable at any moment — the live latency-percentile dashboard
  * contract. The closing exact audit is the offline verification pass, not
  * part of the streaming cost.
  */
object StreamingQuantiles {

  private val sinkCounter = new AtomicInteger(0)
  private val stagedMemo = scala.collection.concurrent.TrieMap.empty[String, String]

  private def stagedEvents(spark: SparkSession, dir: String): String =
    stagedMemo.getOrElseUpdate(
      spark.sparkContext.applicationId + "#" + dir, {
        val path = System.getProperty("java.io.tmpdir") +
          s"/graft_streamkll_${spark.sparkContext.applicationId}_${Integer.toHexString(dir.hashCode)}/events"
        graft.sources.Tables.table(spark, dir, "events")
          .select("event_type", "value")
          .repartition(6)
          .write.mode("overwrite").parquet(path)
        path
      })

  def streamKllQuantiles(spark: SparkSession, dir: String): DataFrame =
    streamKllQuantiles(spark, dir, maxFilesPerTrigger = 1)

  def streamKllQuantiles(spark: SparkSession, dir: String,
                         maxFilesPerTrigger: Int): DataFrame = {
    KllSketch.register(spark)
    val staged = stagedEvents(spark, dir)
    // accumulator: event_type -> (ladder, row count)
    val acc = scala.collection.mutable.Map.empty[String, (KllSketch.Buffer, Long)]
    StreamTune.prepare(spark)
    val q = spark.readStream.schema("event_type string, value double")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(staged)
      .writeStream
      .queryName(s"graft_stream_kll_${sinkCounter.incrementAndGet()}")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val partials = batch.groupBy(col("event_type"))
          .agg(KllSketch.state(col("value")).as("s"), count(lit(1)).as("n"))
          .collect()
        acc.synchronized {
          partials.foreach { r =>
            val incoming = KllSketch.Buffer.fromBytes(r.getAs[Array[Byte]]("s"))
            acc.get(r.getString(0)) match {
              case Some((buf, n)) =>
                buf.mergeIn(incoming, KllSketch.DefaultCapacity)
                acc(r.getString(0)) = (buf, n + r.getAs[Long]("n"))
              case None =>
                acc(r.getString(0)) = (incoming, r.getAs[Long]("n"))
            }
          }
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val estRows = acc.toSeq.sortBy(_._1).map { case (et, (buf, n)) =>
      Row(et, n, buf.quantiles(KllSketch.DefaultPs))
    }
    val estSchema = StructType(Seq(
      StructField("event_type", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("est", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val est = spark.createDataFrame(
      spark.sparkContext.parallelize(estRows, 1), estSchema)
    graft.operators.Sketches.kllFinish(
      graft.sources.Tables.table(spark, dir, "events"), est)
  }
}
