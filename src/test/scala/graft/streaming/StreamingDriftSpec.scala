package graft.streaming

import graft.SparkSpec

class StreamingDriftSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): List[Seq[Any]] =
    df.collect().map(_.toSeq).toList

  test("streaming drift accumulation equals the batch profile bit for bit") {
    val batch = rows(graft.operators.Profiling.profileDrift(spark, sfDir))
    val fine = rows(StreamingDrift.streamDrift(spark, sfDir, maxFilesPerTrigger = 1))
    val coarse = rows(StreamingDrift.streamDrift(spark, sfDir, maxFilesPerTrigger = 3))
    assert(fine == batch, "1-file batches must reproduce the batch drift profile")
    assert(coarse == batch, "3-file batches must too — batching invariance")
    assert(batch.nonEmpty)
  }
}
