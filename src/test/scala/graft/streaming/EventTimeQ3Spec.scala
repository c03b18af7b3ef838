package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Event-time Q3 ([[StreamQueries.q3EventTime]]): the watermark must drop
  * EXACTLY the deterministically-late set — no more (on-time answer equals
  * batch Q3 over the complement) and no fewer (the dropped count equals
  * the late set's size). The driver's DuckDB oracle pins the same
  * contract at sf0.01; this spec pins it in-engine at spec scale with an
  * independent replay of the lateness rule.
  */
class EventTimeQ3Spec extends SparkSpec {

  test("late deletes drop-and-count exactly; on-time prefix equals batch Q3") {
    val out = StreamQueries.q3EventTime(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(out.nonEmpty, "fixture produced an empty top-20")
    val dropped = out.map(_.last.asInstanceOf[Long]).distinct
    assert(dropped.size == 1, "dropped_late must be constant across rows")

    // independent replay of the lateness rule: watermark before the
    // deferred batch is nL (the last customer/orders inserts fire at
    // trigger nL); lineitem's event time is its all-columns rank
    val li = graft.sources.Tables.table(spark, sfDir, "lineitem")
    val nL = li.count()
    val ranked = li.withColumn("rk",
      row_number().over(org.apache.spark.sql.expressions.Window.orderBy(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate"))))
    val wantDropped = ranked
      .filter(col("l_orderkey") % 10 === 3 && col("rk") < nL).count()
    assert(dropped.head == wantDropped,
      s"dropped ${dropped.head} late events, lateness replay says $wantDropped")

    // batch Q3 over the on-time complement must equal the emitted top-20
    val onTimeLi = ranked
      .filter(!(col("l_orderkey") % 10 === 3 && col("rk") < nL))
    val cutoff = to_date(lit(graft.operators.Relational.Q3Date))
    val want = graft.sources.Tables.table(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .join(graft.sources.Tables.table(spark, sfDir, "orders")
        .filter(col("o_orderdate") < cutoff),
        col("c_custkey") === col("o_custkey"))
      .join(onTimeLi.filter(col("l_shipdate") > cutoff),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)")))).as("rev"))
      .orderBy(col("rev").desc, col("o_orderdate").asc, col("l_orderkey").asc)
      .limit(20)
      .select(col("l_orderkey"),
        col("o_orderdate").cast("date").cast("string"),
        col("o_orderpriority"), col("rev").cast("double"))
      .collect().map(_.toSeq).toSeq
    assert(out.map(_.dropRight(1)) == want,
      "on-time top-20 must equal batch Q3 over the non-late complement")
  }
}
