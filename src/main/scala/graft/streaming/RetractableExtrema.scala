package graft.streaming

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimerValues, TTLConfig}

/** NON-INVERTIBLE aggregate retraction through the arbitrary-state API —
  * the [[RetractableSum]] sibling for MIN/MAX: a delete cannot be applied
  * to extrema state (subtracting tells you nothing about the runner-up),
  * so the per-key state is the SUPPORT MULTISET itself —
  * `MapState[price_e4, multiplicity]` on RocksDB — the same structure a
  * Flink KeyedProcessFunction would keep in MapState for this operator
  * (SURVEY §2.9). Each event mutates one map entry (point lookup +
  * upsert/delete — RocksDB-resident, never deserialized wholesale); each
  * EMISSION scans the key's support for min/max — support-sized, bounded
  * by distinct prices per key, the honest cost of non-invertible
  * aggregates without an ordered index.
  *
  * Mirrors [[StreamQueries.priorityExtremaConverged]] (the frame-native
  * z-set spelling, which carries the DuckDB oracle): same grain
  * compression (multiplicities per distinct price), same exact
  * fixed-point values, and the same contract — a full ±cycle must drain
  * every key's support to empty, which this processor reports as an
  * explicit `(key, 0, 0, 0)` retraction emission before clearing state.
  */
class RetractableExtrema
    extends StatefulProcessor[String, (String, Long, Long), (String, Long, Long, Long)] {

  @transient private var support: MapState[Long, Long] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    support = getHandle.getMapState[Long, Long](
      "support", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[(String, Long, Long)],
                               timers: TimerValues): Iterator[(String, Long, Long, Long)] = {
    // consolidate THIS batch's deltas per price first: one state
    // round-trip per distinct touched price, not per event
    val batchDelta = scala.collection.mutable.Map.empty[Long, Long]
    rows.foreach { case (_, p, w) =>
      batchDelta(p) = batchDelta.getOrElse(p, 0L) + w
    }
    batchDelta.foreach { case (p, dw) =>
      if (dw != 0L) {
        val cur = if (support.containsKey(p)) support.getValue(p) else 0L
        val next = cur + dw
        if (next == 0L) support.removeKey(p)
        else support.updateValue(p, next)
      }
    }
    // emission: scan the key's live support (support-sized by design)
    var mn = Long.MaxValue; var mx = Long.MinValue; var n = 0L
    support.iterator().foreach { case (p, c) =>
      if (p < mn) mn = p
      if (p > mx) mx = p
      n += c
    }
    if (n == 0L) {
      support.clear() // drained: report the retraction, then drop the key
      Iterator.single((key, 0L, 0L, 0L))
    } else Iterator.single((key, mn, mx, n))
  }
}

object RetractableExtrema {

  /** `(priority, price_e4, weight)` deltas from raw changelog lines —
    * money in exact fixed-point ten-thousandths, as [[RetractableSum]].
    */
  def deltas(lines: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Changelog.orders(Changelog.parse(lines))
      .select(col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 10000).cast("long").as("price_e4"),
        col(ZSet.W).as("w"))

  /** Continuous per-priority extrema via transformWithState; emits
    * `(priority, min_e4, max_e4, n)` on every update.
    */
  def start(spark: SparkSession, changelogDir: String,
            onBatch: (Long, Array[(String, Long, Long, Long)]) => Unit,
            maxFilesPerTrigger: Int = 1): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    RetractableSum.configure(spark)
    val updates = deltas(spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger).text(changelogDir))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RetractableExtrema,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update(),
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong))
    updates.writeStream
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[(String, Long, Long, Long)], id: Long) =>
        onBatch(id, df.collect())
      }
      .start()
  }
}
