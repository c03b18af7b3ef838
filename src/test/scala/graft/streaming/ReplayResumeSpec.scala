package graft.streaming

import graft.SparkSpec
import graft.operators.Relational

/** The FULL production composition ([[ReplayIngest.q3ReplayResume]]):
  * replayable DSv2 transport → spilled IVM fold → per-batch snapshot →
  * mid-stream kill → checkpoint+snapshot resume. The driver's DuckDB gate
  * asserts the same thing at sf0.01; this pins it inside `sbt test` at
  * spec scale — the converged top-20 through the kill must equal the
  * batch Q3 answer exactly (the exactly-once proof over the whole fold).
  */
class ReplayResumeSpec extends SparkSpec {

  test("killed-and-resumed replay-fed spilled IVM fold converges to batch Q3") {
    val resumed = ReplayIngest.q3ReplayResume(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = Relational.q3Batch(spark, sfDir)
      .selectExpr("l_orderkey",
        "CAST(to_date(o_orderdate) AS STRING) AS o_orderdate",
        "o_orderpriority", "revenue")
      .collect().map(_.toSeq).toSeq
    assert(resumed == batch,
      "the killed-and-resumed fold must land the exact batch Q3 top-20 — " +
        "any lost or double-applied batch moves the revenue")
  }

  test("adaptive spill across a crash: measurement, latch, and MERGE all post-resume") {
    // the r14 cell: a fault injected ON the measurement batch (before its
    // offsets commit) kills the fold; the structural requires inside the
    // query pin the pre-crash snapshot to b2/un-engaged/un-spilled and the
    // engagement + spill to the resumed process. Here: the answer must
    // still be the exact batch Q3 top-20 — indifferent to the crash, the
    // resume, and where the state lived.
    val resumed = ReplayIngest.q3SpillAdaptiveResume(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val batch = Relational.q3Batch(spark, sfDir)
      .selectExpr("l_orderkey",
        "CAST(to_date(o_orderdate) AS STRING) AS o_orderdate",
        "o_orderpriority", "revenue")
      .collect().map(_.toSeq).toSeq
    assert(resumed == batch,
      "the crash-resumed adaptive fold must land the exact batch Q3 " +
        "top-20 — a mis-measured threshold or a double-folded measurement " +
        "batch moves the revenue")
  }

  test("retraction through recovery: the full ± cycle killed mid-teardown converges to empty") {
    // the r13 composition: insert+delete changelog through the replay
    // transport and the spilled fold, kill pinned to the DELETE phase by
    // the exactly-once delete counter (structural requires inside the
    // query), resume, drain — exact cancellation through the boundary.
    // A sign-handling bug across the snapshot (a delete folded twice, an
    // insert lost, a delta snapshot replaying a retraction) leaves a
    // nonzero group and fails here.
    val converged = ReplayIngest.q3ReplayResumeCycle(spark, sfDir)
    assert(converged.isEmpty,
      "the resumed full-cycle fold left residue — retraction did not " +
        "survive the snapshot/offset boundary")
  }
}
