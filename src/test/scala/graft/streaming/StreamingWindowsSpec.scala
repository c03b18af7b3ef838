package graft.streaming

import graft.SparkSpec
import graft.operators.Windows

/** Watermarked event-time windows through real Structured Streaming. */
class StreamingWindowsSpec extends SparkSpec {

  test("append-mode tumbling windows finalize exactly once and match batch") {
    val staged = java.nio.file.Files.createTempDirectory("graft-events").toString
    StreamingWindows.stage(spark, sfDir, staged, nFiles = 3)
    val q = StreamingWindows.startTumbling(spark, staged, "tumbling_sink")
    assert(q.awaitTermination(300000), "streaming query did not finish in time")
    val emitted = spark.table("tumbling_sink").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(emitted.nonEmpty, "watermark must have finalized some windows")
    // append-mode rows must be unique per (window, type)
    assert(emitted.size == spark.table("tumbling_sink").count())
    // every finalized window agrees exactly with the batch computation
    val batch = Windows.tumbling(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    emitted.foreach { case (k, v) =>
      assert(batch(k) == v, s"window $k: stream=$v batch=${batch(k)}")
    }
    // and the watermark really held data back: strictly fewer than batch
    assert(emitted.size < batch.size)
  }
}
