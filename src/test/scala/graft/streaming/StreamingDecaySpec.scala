package graft.streaming

import graft.SparkSpec

class StreamingDecaySpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): List[Seq[Any]] =
    df.collect().map(_.toSeq).toList

  test("streaming decayed features equal the batch operator bit for bit") {
    val batch = rows(graft.operators.Temporal.decayedSum(spark, sfDir))
    val fine = rows(StreamingDecay.streamDecayedSum(spark, sfDir, maxFilesPerTrigger = 1))
    val coarse = rows(StreamingDecay.streamDecayedSum(spark, sfDir, maxFilesPerTrigger = 3))
    assert(fine == batch, "1-file batches must reproduce the batch features")
    assert(coarse == batch, "3-file batches must too — batching invariance")
    assert(batch.nonEmpty)
  }
}
