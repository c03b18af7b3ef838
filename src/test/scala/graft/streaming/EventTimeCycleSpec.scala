package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Lateness under retraction ([[StreamQueries.q3EventTimeCycle]]): the
  * tombstone policy — late insert dropped + tombstoned, late delete of an
  * applied insert retracts, late delete of a tombstoned insert dropped —
  * must (a) close the fate-sharing invariant (converged state exactly
  * empty), (b) match an independent replay of both injection classes, and
  * (c) be SLICING-INDEPENDENT: the policy is per-event, so the on-time
  * batch count must not change a single counter. The driver's DuckDB
  * oracle pins the same closed form at sf0.01.
  */
class EventTimeCycleSpec extends SparkSpec {

  private def run(k: Int): Map[String, Long] = {
    val row = StreamQueries.q3EventTimeCycleK(spark, sfDir, k).head()
    row.schema.fieldNames.map(n => n -> row.getAs[Long](n)).toMap
  }

  test("tombstone policy: counters match the injection replay, state empty") {
    val got = run(3)
    assert(got("live_groups") == 0L,
      "lateness under retraction broke exact cancellation — some row and " +
        "its retraction took different fates")

    // independent replay of the two injection classes (rank < nL each)
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
    val nL = li.count()
    val ranked = li.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))))
    val classI = ranked
      .filter(col("l_orderkey") % 10 === 3 && col("rk") < nL).count()
    val classD = ranked
      .filter(col("l_orderkey") % 10 === 7 && col("rk") < nL).count()
    assert(got("dropped_late_inserts") == classI)
    assert(got("dropped_late_deletes") == classI,
      "every tombstoned insert's delete must be dropped with it")
    assert(got("late_applied_deletes") == classD,
      "every applied insert's late delete must still retract")
  }

  test("the policy is slicing-independent: k=2 and k=5 agree exactly") {
    assert(run(2) == run(5),
      "per-event policy produced batching-dependent counters")
  }
}
