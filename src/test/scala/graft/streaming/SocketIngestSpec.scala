package graft.streaming

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The socket transport's two contracts:
  *  - count equality: the unbounded arrival-batched ingest accumulates to
  *    the identical relation/action totals as the file-staged path
  *    (shared oracle; re-checked here against the file path directly);
  *  - IVM composition: the SAME socket batches fed through the z-set fold
  *    converge to the full-cycle answer (exactly-empty state) — arrival
  *    batching carries no semantic weight because the fold is
  *    batching-invariant by algebra, now proven over a transport whose
  *    batch boundaries are wall-clock-driven and nondeterministic.
  */
class SocketIngestSpec extends SparkSpec {

  test("socket-served changelog accumulates the file path's exact counts") {
    val got = SocketIngest.socketChangelogCounts(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val want = StreamQueries.changelogCounts(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(got == want && got.size == 6)
  }

  test("socket-fed z-set fold converges to the exactly-empty full-cycle state") {
    val ordered = Changelog.generate(spark, sfDir)
      .orderBy(col("t"), col("sub"), col("idx")).select(col("line"))
    val expected = ordered.count()
    // replay server + socket reader, but each batch steps the IVM state
    // instead of counting: batch boundaries are whatever the wall clock
    // made them, which is exactly the invariance being proven
    val (port, server, _) = SocketIngest.serveForTest(ordered)
    val state = new AtomicReference(IncrementalQ3.init(spark))
    val consumed = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = spark.readStream
      .format("socket")
      .option("host", "127.0.0.1").option("port", port)
      .load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.localCheckpoint()
        val n = b.count()
        if (n > 0) state.set(IncrementalQ3.step(state.get(), b))
        consumed.addAndGet(n)
        ()
      }
      .start()
    try {
      val deadline = System.nanoTime() + 300L * 1000000000L
      while (consumed.get() < expected && q.isActive &&
             System.nanoTime() < deadline) Thread.sleep(50)
      assert(consumed.get() == expected,
        s"consumed ${consumed.get()} of $expected before timeout")
    } finally {
      try q.stop() catch { case _: Throwable => () }
      try server.close() catch { case _: Throwable => () }
    }
    assert(IncrementalQ3.topN(state.get()).collect().isEmpty,
      "full build/tear-down cycle must converge to an empty aggregate")
  }
}
