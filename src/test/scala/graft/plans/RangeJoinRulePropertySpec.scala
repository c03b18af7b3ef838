package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec

/** Property coverage for [[RangeJoinBucketRule]]: over adversarial value
  * domains (negatives straddling bucket boundaries, inverted intervals,
  * nulls, empty matches) the rewritten join must reproduce the theta
  * join's multiset EXACTLY — the truncating-div bucketing argument
  * (monotone ⇒ bucket(p) ∈ [bucket(lo), bucket(hi)]) holds regardless of
  * sign, and a point pairs with an interval through exactly one bucket.
  */
class RangeJoinRulePropertySpec extends SparkSpec
    with TableDrivenPropertyChecks {

  private def joined(widthConf: Option[String]) = {
    import spark.implicits._
    widthConf match {
      case Some(v) => spark.conf.set(RangeJoinBucketRule.WidthConf, v)
      case None    => spark.conf.unset(RangeJoinBucketRule.WidthConf)
    }
    if (!spark.experimental.extraOptimizations.contains(RangeJoinBucketRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinBucketRule
    // deterministic pseudo-random domain straddling zero and bucket edges,
    // plus nulls and inverted (lo > hi) intervals
    val points = (0 until 400).map { i =>
      val v: java.lang.Long =
        if (i % 37 == 0) null else (i * 7919L % 2000L) - 1000L
      (i.toLong, v)
    }.toDF("pid", "p")
    val intervals = (0 until 300).map { i =>
      val lo: java.lang.Long =
        if (i % 41 == 0) null else (i * 104729L % 2000L) - 1000L
      val hi: java.lang.Long =
        if (lo == null) null
        else if (i % 13 == 0) lo - 50L // inverted: matches nothing
        else lo + (i * 31L % 260L)
      (i.toLong, lo, hi)
    }.toDF("iid", "lo", "hi")
    points.join(intervals, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid")
  }

  test("rewritten range join ≡ theta join over negatives, nulls, inverted and empty intervals") {
    try {
      val want = joined(None)
      assert(want.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      val wantRows = want.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(wantRows.nonEmpty, "domain must produce matches to compare")
      // widths around and across the value range, including W=1 (bucket
      // per value) and W larger than the whole domain (single bucket)
      forAll(Table("width", 1L, 7L, 64L, 100L, 1000L, 100000L)) { w =>
        val got = joined(Some(w.toString))
        val plan = got.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__graft_bucket"),
          s"W=$w: rule did not rewrite:\n$plan")
        assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
          .sameElements(wantRows), s"W=$w: rewritten join diverged")
      }
    } finally spark.conf.unset(RangeJoinBucketRule.WidthConf)
  }

  /** Deterministic pseudo-random base values shared by the typed domains:
    * a long point stream and an interval anchor stream, both with nulls.
    */
  private def rawPoints = (0 until 400).map { i =>
    val v: java.lang.Long =
      if (i % 37 == 0) null else (i * 7919L % 2000L) - 1000L
    (i.toLong, v)
  }
  private def rawAnchors = (0 until 300).map { i =>
    val a: java.lang.Long =
      if (i % 41 == 0) null else (i * 104729L % 2000L) - 1000L
    (i.toLong, a)
  }

  /** Constant-span joins (`p BETWEEN x − W AND x`) per point type: in
    * `auto` mode the rule must infer each join's own width from its
    * condition — no numeric conf anywhere — rewrite it, and reproduce the
    * theta join exactly. Covers the long/int/date/timestamp conversions.
    */
  test("auto mode: span inference rewrites constant-span joins of every supported type") {
    import spark.implicits._
    if (!spark.experimental.extraOptimizations.contains(RangeJoinBucketRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinBucketRule

    // (label, build) — each builds the SAME logical pairing through a
    // different point type; date offsets quantize to days via v/20
    val cases: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "long" -> (() => {
        val p = rawPoints.toDF("pid", "p")
        val x = rawAnchors.toDF("iid", "x")
        p.join(x, col("p") >= col("x") - 170L && col("p") <= col("x"))
          .select("pid", "iid")
      }),
      // mixed literal offsets on BOTH bounds (x − a AND x + b): exercises
      // the Add-form pattern and the cross-bound span a+b
      "long-mixed" -> (() => {
        val p = rawPoints.toDF("pid", "p")
        val x = rawAnchors.toDF("iid", "x")
        p.join(x, col("p") >= col("x") - 100L && col("p") <= col("x") + 70L)
          .select("pid", "iid")
      }),
      "int" -> (() => {
        val p = rawPoints.toDF("pid", "pl").select(col("pid"), col("pl").cast("int").as("p"))
        val x = rawAnchors.toDF("iid", "xl").select(col("iid"), col("xl").cast("int").as("x"))
        p.join(x, col("p") >= col("x") - 170 && col("p") <= col("x"))
          .select("pid", "iid")
      }),
      "date" -> (() => {
        val p = rawPoints.toDF("pid", "pl")
          .select(col("pid"), date_add(lit("2020-06-01").cast("date"), (col("pl") / 20L).cast("int")).as("p"))
        val x = rawAnchors.toDF("iid", "xl")
          .select(col("iid"), date_add(lit("2020-06-01").cast("date"), (col("xl") / 20L).cast("int")).as("x"))
        p.join(x, col("p") >= date_sub(col("x"), 9) && col("p") <= col("x"))
          .select("pid", "iid")
      }),
      "timestamp" -> (() => {
        val p = rawPoints.toDF("pid", "pl")
          .select(col("pid"), timestamp_micros(col("pl") * 1000000L).as("p"))
        val x = rawAnchors.toDF("iid", "xl")
          .select(col("iid"), timestamp_micros(col("xl") * 1000000L).as("x"))
        p.join(x, col("p") >= col("x") - expr("INTERVAL 170 SECONDS") && col("p") <= col("x"))
          .select("pid", "iid")
      }))

    forAll(Table("type", cases: _*)) { case (label, build) =>
      spark.conf.unset(RangeJoinBucketRule.WidthConf)
      val want = build()
      assert(want.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"),
        s"$label: baseline should be BNLJ")
      val wantRows = want.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(wantRows.nonEmpty, s"$label: domain must produce matches")

      spark.conf.set(RangeJoinBucketRule.WidthConf, RangeJoinBucketRule.Auto)
      try {
        val got = build()
        val plan = got.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__graft_bucket"),
          s"$label: auto mode did not infer+rewrite:\n$plan")
        assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
          .sameElements(wantRows), s"$label: rewritten join diverged")
      } finally spark.conf.unset(RangeJoinBucketRule.WidthConf)
    }
  }

  /** Auto mode must NOT touch a variable-span join (independent lo/hi
    * columns: no width is inferable, and no sticky numeric width exists
    * to misapply) — the exact hazard the mode was introduced to remove.
    */
  test("auto mode: variable-span joins are left alone") {
    try {
      assert(joined(Some(RangeJoinBucketRule.Auto))
        .queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    } finally spark.conf.unset(RangeJoinBucketRule.WidthConf)
  }

  // --- interval-overlap extension (r6) -----------------------------------

  /** Two interval tables with independent, sometimes-inverted endpoints —
    * the adversarial domain for the overlap rewrite's orientation-
    * insensitive bucket cover (an inverted interval can still satisfy the
    * two-sided condition, and the rewrite must not lose it).
    */
  private def overlapJoined(widthConf: Option[String]) = {
    import spark.implicits._
    widthConf match {
      case Some(v) => spark.conf.set(RangeJoinBucketRule.WidthConf, v)
      case None    => spark.conf.unset(RangeJoinBucketRule.WidthConf)
    }
    if (!spark.experimental.extraOptimizations.contains(RangeJoinBucketRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinBucketRule
    val as = (0 until 250).map { i =>
      val lo: java.lang.Long =
        if (i % 37 == 0) null else (i * 7919L % 2000L) - 1000L
      val hi: java.lang.Long =
        if (lo == null) null
        else if (i % 11 == 0) lo - 40L // inverted, can still overlap
        else lo + (i * 29L % 210L)
      (i.toLong, lo, hi)
    }.toDF("aid", "alo", "ahi")
    val bs = (0 until 220).map { i =>
      val lo: java.lang.Long =
        if (i % 41 == 0) null else (i * 104729L % 2000L) - 1000L
      val hi: java.lang.Long =
        if (lo == null) null
        else if (i % 13 == 0) lo - 60L
        else lo + (i * 37L % 180L)
      (i.toLong, lo, hi)
    }.toDF("bid", "blo", "bhi")
    as.join(bs, col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid")
  }

  test("overlap rewrite ≡ theta join over nulls and inverted intervals (fixed widths)") {
    try {
      val want = overlapJoined(None)
      assert(want.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      val wantRows = want.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(wantRows.nonEmpty)
      forAll(Table("width", 1L, 7L, 64L, 100L, 1000L, 100000L)) { w =>
        val got = overlapJoined(Some(w.toString))
        val plan = got.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__graft_bucket"),
          s"W=$w: overlap rule did not rewrite:\n$plan")
        assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
          .sameElements(wantRows), s"W=$w: overlap rewrite diverged")
      }
    } finally spark.conf.unset(RangeJoinBucketRule.WidthConf)
  }

  test("auto mode: overlap spans inferred from literal offsets, both sides ≤2 buckets") {
    import spark.implicits._
    if (!spark.experimental.extraOptimizations.contains(RangeJoinBucketRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinBucketRule
    def build() = {
      val xs = rawPoints.toDF("aid", "x")
      val ys = rawAnchors.toDF("bid", "y")
      // overlap of [x, x+173] and [y−97, y]: x ≤ y AND y−97 ≤ x+173
      xs.join(ys, col("x") <= col("y") && col("y") - 97L <= col("x") + 173L)
        .select("aid", "bid")
    }
    spark.conf.unset(RangeJoinBucketRule.WidthConf)
    val want = build()
    assert(want.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
    val wantRows = want.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(wantRows.nonEmpty)
    spark.conf.set(RangeJoinBucketRule.WidthConf, RangeJoinBucketRule.Auto)
    try {
      val got = build()
      val plan = got.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__graft_bucket"),
        s"auto overlap did not infer+rewrite:\n$plan")
      assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        .sameElements(wantRows), "auto overlap rewrite diverged")
    } finally spark.conf.unset(RangeJoinBucketRule.WidthConf)
  }

  test("auto mode: variable-span overlap and equality-conjunct joins are left alone") {
    try {
      // independent endpoints: no span inferable in auto mode
      assert(overlapJoined(Some(RangeJoinBucketRule.Auto))
        .queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      // a cross-side equality means Spark already has an equi-join: the
      // rule must stand down even though the overlap conjuncts match
      import spark.implicits._
      spark.conf.set(RangeJoinBucketRule.WidthConf, "50")
      val as = (0 until 100).map(i => (i.toLong, i % 7L, (i * 13L) % 500L))
        .toDF("aid", "ak", "ax")
      val bs = (0 until 100).map(i => (i.toLong, i % 7L, (i * 17L) % 500L))
        .toDF("bid", "bk", "bx")
      val eq = as.join(bs, col("ak") === col("bk") &&
        col("ax") <= col("bx") + 60L && col("bx") <= col("ax") + 60L)
      assert(!eq.queryExecution.executedPlan.toString.contains("__graft_bucket"),
        "rule must stand down on equality conjuncts")
      assert(eq.count() > 0)
    } finally spark.conf.unset(RangeJoinBucketRule.WidthConf)
  }

  /** A malformed width value disables the rule instead of failing every
    * query optimized afterwards in the session.
    */
  test("malformed width conf disables the rule, never fails the query") {
    try {
      val got = joined(Some("not-a-number"))
      assert(got.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
      assert(got.collect().nonEmpty)
    } finally spark.conf.unset(RangeJoinBucketRule.WidthConf)
  }
}
