package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** The one `private[sql]` doorway this library uses: constructing a
  * DataFrame from a hand-built [[LogicalPlan]] (for the custom operator
  * nodes under `graft.plans`). `Dataset.ofRows` is the blessed internal
  * constructor every Spark extension library bridges to (Delta,
  * GraphFrames, Sedona all ship this same shim); everything else in the
  * repo stays on the public API. Spark 4 moved the classic implementation
  * to `org.apache.spark.sql.classic` — the cast is safe in this repo's
  * non-Connect (local/cluster JVM) deployments.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Forwarder for the `private[sql]` float-key canonicalizer (-0.0 → 0.0,
    * NaN → canonical NaN) that Aggregate/Join planning applies to its own
    * keys — graft's top-k-per-group strategy needs the identical treatment
    * for ITS group keys so byte equality matches ordering equality.
    */
  def normalizeFloatingNumbers(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.catalyst.optimizer.NormalizeFloatingNumbers.normalize(e)
}
