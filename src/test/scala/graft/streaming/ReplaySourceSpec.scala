package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.{ReplayOffset, ReplayServer}

/** The replayable transport ([[graft.sources.ReplayProvider]]) — what
  * makes exactly-once COMPOSABLE, unlike the at-most-once plain socket:
  *  - REPLAYABILITY: any offset range can be fetched any number of times
  *    and always yields the identical lines (the broker contract);
  *  - the DSv2 offset round-trips through its checkpoint JSON form;
  *  - the full composition: a checkpointed streaming query over the
  *    source is KILLED mid-stream, restarted, and the accumulated totals
  *    equal the changelog's ground truth exactly (no loss, no double).
  */
class ReplaySourceSpec extends SparkSpec {

  test("any offset range replays identically, any number of times") {
    val lines = Changelog.generate(spark, sfDir)
      .orderBy(col("t"), col("sub"), col("idx")).select(col("line"))
    val handle = ReplayServer.serve(lines)
    try {
      val n = handle.expected
      assert(n > 100, s"fixture too small: $n events")
      assert(ReplayServer.count("127.0.0.1", handle.port) == n)
      // a mid-stream range, fetched twice → byte-identical; a prefix and
      // the full stream → consistent overlaps
      val mid1 = ReplayServer.fetch("127.0.0.1", handle.port, 37, 137).toVector
      val mid2 = ReplayServer.fetch("127.0.0.1", handle.port, 37, 137).toVector
      assert(mid1.size == 100 && mid1 == mid2,
        "re-fetching an offset range must return the identical events")
      val head = ReplayServer.fetch("127.0.0.1", handle.port, 0, 140).toVector
      assert(head.slice(37, 137) == mid1,
        "overlapping ranges must agree event-for-event")
      // ranges clamp to the stream: the tail past the end is empty
      assert(ReplayServer.fetch("127.0.0.1", handle.port, n, n + 50).isEmpty)
    } finally handle.close()
  }

  test("offset JSON round-trip") {
    val o = ReplayOffset(123456789L)
    assert(new graft.sources.ReplayStream("h", 1, 10, 2)
      .deserializeOffset(o.json()) == o)
  }

  test("kill-and-resume over the replay source loses and duplicates nothing") {
    // the whole exactly-once composition at spec scale: the driver query
    // (kill after ~a third, resume from checkpoint, drain) must land on
    // the exact per-(relation, action) changelog totals
    val result = ReplayIngest.replayExactlyOnce(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val truth = StreamQueries.changelogCounts(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(result == truth,
      "resumed totals must equal the changelog ground truth exactly")
  }
}
