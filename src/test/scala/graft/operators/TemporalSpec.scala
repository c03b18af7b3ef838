package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Invariant checks for the temporal operators; exact value parity is
  * enforced by the driver's DuckDB gate (temporal_asof_join's oracle is
  * DuckDB's native ASOF JOIN).
  */
class TemporalSpec extends SparkSpec {

  test("asof join: one row per distinct purchase, bound is at-or-before") {
    val ev = Tables.table(spark, sfDir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
      .distinct().count()
    val out = Temporal.asofJoin(spark, sfDir)
    assert(out.count() == purchases)
    assert(out.filter(col("last_view_us") > col("purchase_us")).isEmpty)
  }

  test("asof join: picked view is the LATEST view at-or-before") {
    val ev = Tables.table(spark, sfDir, "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), unix_micros(col("ts")).as("v_us"))
    // a strictly-later view still <= purchase_us would contradict maximality
    val violated = Temporal.asofJoin(spark, sfDir)
      .join(views, col("user_id") === col("v_user") &&
        col("v_us") <= col("purchase_us") && col("v_us") > col("last_view_us"))
    assert(violated.isEmpty)
  }

  test("range join: bucketized count equals the naive theta-join count") {
    val ev = Tables.table(spark, sfDir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), unix_micros(col("ts")).as("e_us")).distinct()
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"))
    val naive = errors.join(clicks,
        col("user_id") === col("c_user") &&
          col("c_us") >= col("e_us") - 300000000L && col("c_us") <= col("e_us"),
        "left")
      .groupBy(col("user_id"), col("e_us").as("error_us"))
      .agg(count(col("c_us")).as("n_clicks_5m"))
    val fast = Temporal.rangeJoin(spark, sfDir)
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("range-join rule: BNLJ becomes a bucketed equi-join, same answer") {
    import graft.plans.RangeJoinBucketRule
    val ev = Tables.table(spark, sfDir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select(unix_micros(col("ts")).as("error_us")).distinct()
    val clicks = ev.filter(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("c_us"))
    def theta = errors.join(clicks,
      col("c_us") >= col("error_us") - 300000000L && col("c_us") <= col("error_us"))

    // rule disabled: the only plan Spark has is a nested-loop product
    spark.conf.unset(RangeJoinBucketRule.WidthConf)
    val naive = theta
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "pure range join should baseline as BNLJ")
    val want = naive.groupBy(col("error_us"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val out = Temporal.rangeJoinViaRule(spark, sfDir)
    try {
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule must eliminate the nested-loop join:\n$plan")
      assert(plan.contains("__graft_bucket"), "bucketed rewrite not applied")
      val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, "rewritten join must reproduce the theta join exactly")
    } finally spark.conf.unset(RangeJoinBucketRule.WidthConf)
  }

  test("overlap rule: two-sided BNLJ becomes a bucketed equi-join, same answer") {
    import graft.plans.RangeJoinBucketRule
    val ev = Tables.table(spark, sfDir, "events")
    val a = ev.filter(col("event_type") === "error")
      .select(unix_micros(col("ts")).as("e_us")).distinct()
    val b = ev.filter(col("event_type") === "click")
      .select(unix_micros(col("ts")).as("c_us")).distinct()
    def theta = a.join(b,
      col("e_us") <= col("c_us") &&
        col("c_us") - 300000000L <= col("e_us") + 600000000L)

    spark.conf.unset(RangeJoinBucketRule.WidthConf)
    assert(theta.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "pure overlap join should baseline as BNLJ")
    val want = theta.groupBy(col("e_us"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val out = Temporal.intervalOverlapViaRule(spark, sfDir)
    try {
      val plan = out.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"overlap rule must eliminate the nested-loop join:\n$plan")
      assert(plan.contains("__graft_bucket"), "bucketed overlap rewrite not applied")
      val got = out.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, "rewritten overlap join must reproduce the theta join exactly")
    } finally spark.conf.unset(RangeJoinBucketRule.WidthConf)
  }

  test("window frames: trailing never exceeds cumulative; counts positive") {
    val out = Temporal.windowFrames(spark, sfDir)
    assert(out.filter(col("n_1h") < 1).isEmpty)
    assert(out.filter(col("sum_1h") > col("cum_sum") + 1e-6).isEmpty)
  }

  test("interval overlap: bucketed pairs equal the naive theta join, no duplicates") {
    val got = Temporal.intervalOverlapJoin(spark, sfDir)
      .collect().map(_.toSeq)
    assert(got.length == got.distinct.length, "dedup guard must hold")
    // naive theta join over the same interval construction
    import graft.sources.Tables
    val ev = Tables.table(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
    val a = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("us").as("e_us")).distinct()
    val b = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("bu"), col("us").as("c_us")).distinct()
    val want = a.join(b, col("user_id") === col("bu") &&
        col("e_us") <= col("c_us") &&
        col("c_us") - 300000000L <= col("e_us") + 600000000L)
      .select(col("user_id"), col("e_us"), col("c_us"))
      .collect().map(_.toSeq)
    assert(got.toSet == want.toSet && got.nonEmpty == want.nonEmpty)
  }

  test("pattern match: counts equal a sequential string replay") {
    val got = Temporal.patternMatch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toList
    val ev = graft.sources.Tables.table(spark, sfDir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    def c(t: String) = t match {
      case "click" => "c"; case "error" => "e"; case "purchase" => "p"
      case "signup" => "s"; case _ => "v"
    }
    def countNonOverlap(s: String, pat: String): Long =
      (s.length - s.replace(pat, "").length).toLong / pat.length
    val want = ev.groupBy(_._1).toList.map { case (u, g) =>
      val s = g.map(e => (e._2, c(e._3))).sorted.map(_._2).mkString
      val maxRun = (s.split("[^e]", -1).map(_.length) :+ 0).max.toLong
      (u, g.length.toLong, countNonOverlap(s, "vc"), countNonOverlap(s, "vcp"), maxRun)
    }.sortBy(_._1)
    assert(got == want, "pattern counts must match the replay")
    assert(got.exists(_._3 > 0) && got.exists(_._5 > 1),
      "fixture must exercise both pattern families")
  }

  test("asof exec: equals the window spelling; plan is merge, not window") {
    val df = Temporal.asofJoinViaExec(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).sortBy(x => (x._1, x._2))
    val want = Temporal.asofJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)))).sortBy(x => (x._1, x._2))
    assert(got.toSeq == want.toSeq && got.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec must plan:\n$plan")
    assert(!plan.contains("WindowExec") && !plan.contains("Window "),
      s"no window machinery in the exec spelling:\n$plan")
  }

  test("asof exec: tolerance + adversarial random streams equal a replay") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // dense key space + duplicate times force every merge edge case:
    // repeated left keys, right runs between left keys, ties at equal us
    val lefts = Seq.fill(400)((rng.nextInt(12).toLong, rng.nextInt(50).toLong))
      .distinct
    val rights = Seq.fill(300)((rng.nextInt(12).toLong, rng.nextInt(50).toLong))
      .distinct
    val l = lefts.toDF("k", "lt").repartition(7)
    val r = rights.toDF("rk", "rt").repartition(5)
    for (tol <- Seq(None, Some(5L))) {
      val got = graft.plans.AsofJoin.asofJoin(l, r,
          Seq("k"), Seq("rk"), "lt", "rt", tol)
        .select(col("k"), col("lt"), col("rt")).collect()
        .map(x => (x.getLong(0), x.getLong(1), Option(x.get(2)))).sortBy(x => (x._1, x._2))
      val want = lefts.map { case (k, t) =>
        val cand = rights.filter(p => p._1 == k && p._2 <= t &&
          tol.forall(w => t - p._2 <= w))
        (k, t, if (cand.isEmpty) None else Some(cand.map(_._2).max: Any))
      }.sortBy(x => (x._1, x._2))
      assert(got.toSeq == want.toSeq, s"tol=$tol merge must equal the replay")
    }
  }

  test("asof exec: mismatched key types fail at construction (ADVICE r7 pin)") {
    import spark.implicits._
    val l = Seq((1, 10L)).toDF("k", "lt")     // k: int
    val r = Seq((1L, 5L)).toDF("rk", "rt")    // rk: bigint
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsofJoin.asofJoin(l, r, Seq("k"), Seq("rk"), "lt", "rt")
    }
    assert(e.getMessage.contains("identical types"),
      s"must name the type contract: ${e.getMessage}")
  }

  test("asof exec: the caller session's planner state is never mutated (ADVICE r7 pin)") {
    import spark.implicits._
    val before = spark.experimental.extraStrategies
    val l = Seq((1L, 10L)).toDF("k", "lt")
    val r = Seq((1L, 5L)).toDF("rk", "rt")
    val out = graft.plans.AsofJoin.asofJoin(l, r, Seq("k"), Seq("rk"), "lt", "rt")
    assert(out.collect().length == 1)
    assert(spark.experimental.extraStrategies == before,
      "the strategy must live on the scoped child session only")
  }

  test("decayed sum: cents width guard trips loudly instead of wrapping") {
    import spark.implicits._
    // two $5·10⁸ events on one (user, day): cents_sum = 10¹³ > 2⁴³ —
    // 2¹⁵-weighted summation could wrap int64, so the partial must raise
    val big = Seq(
      (7L, "2024-01-02 10:00:00", "purchase", 5.0e10),
      (7L, "2024-01-02 11:00:00", "purchase", 5.0e10))
      .toDF("user_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val ex = intercept[Exception] {
      Temporal.decayedPartials(big).collect()
    }
    assert(ex.getMessage.contains("exceeds 2^43"),
      s"expected the width guard, got: ${ex.getMessage}")
    // the guard must also hold on MERGED partials (the streaming path
    // adds per-batch sums before finishing)
    val merged = Seq((7L, java.sql.Date.valueOf("2024-01-02"),
      8796093022208L, 2L, 2L))
      .toDF("user_id", "d", "cents_sum", "n_events", "n_purchases")
    val ex2 = intercept[Exception] { Temporal.decayedFinish(merged).collect() }
    assert(ex2.getMessage.contains("exceeds 2^43"))
    // in-range values pass through bit-identically
    val ok = Seq((7L, "2024-01-02 10:00:00", "purchase", 12.34))
      .toDF("user_id", "ts", "event_type", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val row = Temporal.decayedPartials(ok).collect().head
    assert(row.getLong(2) == 1234L && row.getLong(3) == 1L && row.getLong(4) == 1L)
  }
}
