package graft.streaming

import graft.SparkSpec

/** The incremental profile's contract: batching-invariant (any
  * maxFilesPerTrigger lands on the same answer) and bit-equal to the
  * one-shot batch operator — exact-integer partials make both provable
  * as equalities, not tolerances.
  */
class StreamingProfileSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): List[Seq[Any]] =
    df.collect().map(_.toSeq).toList

  test("streaming co-moment accumulation equals the batch profile bit for bit") {
    val batch = rows(graft.operators.Profiling.profileCorrelation(spark, sfDir))
    val fine = rows(StreamingProfile.streamCorrelation(spark, sfDir, maxFilesPerTrigger = 1))
    val coarse = rows(StreamingProfile.streamCorrelation(spark, sfDir, maxFilesPerTrigger = 3))
    assert(fine == batch, "1-file batches must reproduce the batch profile")
    assert(coarse == batch, "3-file batches must too — batching invariance")
    assert(batch.nonEmpty)
  }
}
