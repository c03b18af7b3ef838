package graft.streaming

import graft.SparkSpec

class StreamingCmSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): List[Seq[Any]] =
    df.collect().map(_.toSeq).toList

  test("streaming count-min accumulation equals the batch sketch bit for bit") {
    val batch = rows(graft.operators.Sketches.cmFrequencyBound(spark, sfDir))
    val fine = rows(StreamingCm.streamCmFrequencies(spark, sfDir, maxFilesPerTrigger = 1))
    val coarse = rows(StreamingCm.streamCmFrequencies(spark, sfDir, maxFilesPerTrigger = 3))
    assert(fine == batch, "1-file batches must reproduce the batch audit")
    assert(coarse == batch, "3-file batches must too — batching invariance")
    assert(batch.nonEmpty)
  }
}
