package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch table loaders over the driver-provided parquet fixtures
  * (TESTDATA.md: `region nation customer supplier part orders lineitem
  * events documents embeddings`).
  *
  * Replaces the reference's per-table filesystem CSV sources — the SQL DDL
  * connectors (TPCHQuery3SQL_Batch.java:32–95) and the three hand-rolled
  * `SourceFunction` CSV parsers (TPCHQuery3_BatchProcessor.java:382–619).
  * Spark's columnar parquet reader subsumes all of them and adds predicate
  * pushdown + column pruning at the scan, which the reference did manually
  * at parse time (no_websocket.java:292–315).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Fixture generations encode events.ts differently: older ones carry
    // TIMESTAMP(NANOS), which Spark's reader rejects unless the legacy
    // conf maps it to a nanos long; newer ones TIMESTAMP(MICROS,
    // isAdjustedToUTC=false), which reads as TIMESTAMP_NTZ. Normalize
    // both to a session-zone TIMESTAMP (the session is pinned UTC, so
    // the instant is identical) — downstream epoch arithmetic
    // (`unix_micros`) and the streaming schemas require the zoned type.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // NB: integer division (`div`), not `/`: ns-epoch longs
          // (~1.7e18) overflow double's 53-bit mantissa and `/` would
          // round ±1µs.
          df.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          df.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => df
      }
    else df
  }

  /** Register every fixture table as a temp view (for the `spark.sql` path,
    * mirroring the reference's Table-API catalog registration).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
