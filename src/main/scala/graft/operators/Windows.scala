package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Event-time window aggregations over the `events` stream table —
  * tumbling / sliding / session windows (SURVEY §7.1 step 7: the
  * beyond-parity streaming surface; the reference has no operator windows
  * at all, its "window" lives in the changelog data, SURVEY §2.8).
  *
  * These run identically in batch and in Structured Streaming (same
  * `window`/`session_window` expressions + `withWatermark` — exercised in
  * WindowsSpec); the driver checks the batch semantics against SQL oracles.
  */
object Windows {

  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "events")

  /** 1-hour tumbling windows: count + value sum per (window, event_type). */
  def tumbling(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("window.start").cast("string").as("window_start"),
        col("event_type"), col("n"), col("value_sum"))

  /** 2-hour windows sliding every 1 hour (each event lands in 2 windows). */
  def sliding(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").cast("string").as("window_start"),
        col("n"), col("n_users"))

  /** Session windows with a 12-hour inactivity gap, per user. */
  def session(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(session_window(col("ts"), "12 hours"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("session_start"),
        col("n_events"), col("value_sum"))
}
