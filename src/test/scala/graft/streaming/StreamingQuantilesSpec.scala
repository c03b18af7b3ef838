package graft.streaming

import graft.SparkSpec

/** The streaming quantile monitor's contract: whatever the batching, the
  * accumulated sketch stays a valid sketch of the whole history — every
  * estimate's true rank inside the 2% gate — and the audit surface
  * (event types, counts, exact quantiles) is bit-equal to the batch twin
  * (sketch CONTENT may differ across batchings within the bound; the
  * emitted answer may not).
  */
class StreamingQuantilesSpec extends SparkSpec {

  test("streaming KLL fold: bound holds at any batching, audit equals batch") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toList
    val batch = rows(graft.operators.Sketches.kllQuantileBound(spark, sfDir))
    val fine = rows(StreamingQuantiles.streamKllQuantiles(spark, sfDir, maxFilesPerTrigger = 1))
    val coarse = rows(StreamingQuantiles.streamKllQuantiles(spark, sfDir, maxFilesPerTrigger = 3))
    assert(batch.nonEmpty && batch.length % 6 == 0)
    // rank_within_2pct is the last column; it must be TRUE everywhere in
    // all three runs, which makes the full rows equal despite the three
    // sketches having different ladders
    assert(fine == batch, "1-file batches must reproduce the batch audit")
    assert(coarse == batch, "3-file batches must too — batching invariance")
    assert(batch.forall(_.last == true))
  }
}
