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

  private def joined(widthConf: Option[Long]) = {
    import spark.implicits._
    widthConf match {
      case Some(w) => spark.conf.set(RangeJoinBucketRule.WidthConf, w.toString)
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
        val got = joined(Some(w))
        val plan = got.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin") && plan.contains("__graft_bucket"),
          s"W=$w: rule did not rewrite:\n$plan")
        assert(got.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
          .sameElements(wantRows), s"W=$w: rewritten join diverged")
      }
    } finally spark.conf.unset(RangeJoinBucketRule.WidthConf)
  }
}
