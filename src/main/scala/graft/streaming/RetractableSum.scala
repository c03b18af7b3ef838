package graft.streaming

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimerValues, TTLConfig, ValueState}

import graft.operators.Relational

/** Literal port of the reference's `IncrementalAggregateFunction`
  * (no_websocket.java:521–583: KeyedProcessFunction + ValueState&lt;Double&gt;,
  * Insert ⇒ `+= delta`, Delete ⇒ `-= delta`) onto Spark 4.x
  * `transformWithState` — the §7.2-option-(b) design, kept alongside the
  * preferred z-set pipeline as the demonstration of the arbitrary-state
  * API (SURVEY §2.9: KeyedProcessFunction ↔ StatefulProcessor).
  *
  * One deliberate upgrade over the reference: revenue state is held in
  * exact fixed-point ten-thousandths (the inputs carry ≤2 decimals each,
  * so `price·(1−discount)·10⁴` is an integer) instead of drifting double
  * state — a retracted group's STATE returns to exactly 0 and is cleared;
  * the zero-total update is still emitted so downstream consumers observe
  * the retraction (unlike the reference's `revenue > 0` gate,
  * no_websocket.java:568, which silently hides it).
  */
class RetractableSum extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {

  @transient private var sum: ValueState[Long] = _

  override def init(outputMode: OutputMode,
                    timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    sum = getHandle.getValueState[Long]("sum", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
                               timers: TimerValues): Iterator[(Long, Long)] = {
    val prev = if (sum.exists()) sum.get() else 0L
    val total = prev + rows.map(_._2).sum
    if (total == 0L) sum.clear() else sum.update(total)
    Iterator.single((key, total))
  }
}

object RetractableSum {

  /** Signed fixed-point revenue deltas per orderkey from raw changelog
    * lines (filter pushed before the stateful op, as in the reference).
    */
  def deltas(lines: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    Changelog.lineitems(Changelog.parse(lines))
      .filter(col("l_shipdate") > to_date(lit(Relational.Q3Date)))
      .select(col("l_orderkey"),
        (Relational.revenueExpr * 10000).cast("long")
          .multiply(col(ZSet.W)).as("delta"))

  /** Continuous per-orderkey revenue via transformWithState. Emits
    * `(l_orderkey, revenue_e4)` on every update; requires the RocksDB
    * state store provider (set by [[configure]]).
    */
  def start(spark: SparkSession, changelogDir: String,
            onBatch: (Long, Array[(Long, Long)]) => Unit,
            maxFilesPerTrigger: Int = 1): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    configure(spark)
    val updates = deltas(spark.readStream
        .option("maxFilesPerTrigger", maxFilesPerTrigger).text(changelogDir))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new RetractableSum, org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update(),
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    updates.writeStream
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[(Long, Long)], id: Long) =>
        onBatch(id, df.collect())
      }
      .start()
  }

  def configure(spark: SparkSession): Unit = {
    StreamTune.prepare(spark)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  }
}
